"""Layout invariance of the float-determinism sweep (round 9).

The failure class behind the r7/r8 `dsir_importance_weights` red:
double partial sums accumulate in partition order, so a rounded
avg/sum over a variable row set can flip its last digit between
shuffle layouts. The sweep rewrote every such aggregation to exact
DECIMAL accumulation; this test pins the guarantee the driver relies
on — the SAME query under two different `spark.sql.shuffle.partitions`
values must produce byte-identical canonical results (the verdict's
"two layouts must hash identically" criterion), so no future layout
(the driver's, a cluster's, AQE's runtime coalescing) can drift a
rounded value.
"""

from __future__ import annotations

import pytest

from biodiversity_data_ingestion_spark.plans.queries import QUERIES

from .conftest import SMOKE_DIR
from .oracle_harness import _canon

# one representative per converted aggregation shape: money sums,
# product sums, window-frame sums, decimal moments (variance / corr /
# t-test), quantized log-weight means, fixed-point float means, and
# the integer-microsecond time weighting
SWEEP_REPS = [
    "q1_pricing_summary",
    "revenue_by_nation",
    "events_classified",
    "value_histogram",
    "user_rolling_1h_value",
    "event_value_ab_ttest",
    "event_value_outliers",
    "winsorized_value_stats",
    "price_quantity_corr",
    "doc_unigram_logprob",
    "dsir_importance_weights",
    "label_centroids",
    "user_time_weighted_value",
    "incremental_monthly_agg",
    # round-10 signed-zero hardening reps: signable rounded finals
    # (log-ratios, slopes, growth, info-gain, PMI, the Holt trend fold)
    "nation_revenue_holt",
    "daily_revenue_trend",
    "doc_zipf_fit",
    "feature_info_gain",
    "lineitem_corr_matrix",
    "term_pair_pmi",
    "orders_yoy_growth",
    # round-10 addition: signable rounded ACF (corr family close)
    "daily_revenue_acf",
]


@pytest.mark.parametrize("name", SWEEP_REPS)
def test_two_shuffle_layouts_hash_identically(spark, name):
    builder = QUERIES[name]["builder"]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    coalesce_before = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled"
    )
    try:
        # AQE coalescing must be OFF here or both configs collapse to
        # the same single post-shuffle partition on sf0.001 data and
        # the two "layouts" are physically identical — the test would
        # pass even for the order-dependent double sums it exists to
        # catch (verified: groupBy on sf0.001 events coalesces to 1
        # partition under both 8 and 3)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        a = _canon(builder(spark, SMOKE_DIR).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _canon(builder(spark, SMOKE_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", coalesce_before
        )
    assert a.columns.tolist() == b.columns.tolist()
    assert len(a) == len(b), f"{name}: row count differs across layouts"
    # exact equality, NaN-safe — any drift here is the dsir bug class
    assert a.fillna("∅").eq(b.fillna("∅")).all().all(), (
        f"{name}: values differ between shuffle layouts 8 and 3"
    )


def test_layouts_actually_differ(spark):
    # vacuity canary: under the conf this module uses, the two
    # shuffle.partitions values must produce physically different
    # post-shuffle layouts — otherwise every invariance assertion above
    # compares a run against itself
    from pyspark.sql import functions as F

    from biodiversity_data_ingestion_spark.sources.tables import load_table

    ev = load_table(spark, SMOKE_DIR, "events")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    coalesce_before = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled"
    )
    try:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        n8 = ev.groupBy("event_type").agg(F.count(F.lit(1))).rdd.getNumPartitions()
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        n3 = ev.groupBy("event_type").agg(F.count(F.lit(1))).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", coalesce_before
        )
    assert (n8, n3) == (8, 3), f"layouts did not differ: {n8} vs {n3}"
