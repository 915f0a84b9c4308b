"""Semantic tests for the round-10 storage-layout / series additions
beyond their oracle parity: the layout audit must actually SHOW the
Z-order locality win, compaction bins must tile the file listing, and
the ACF zero-variance guard must fire on a constant series."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodiversity_data_ingestion_spark.plans.queries import QUERIES
from biodiversity_data_ingestion_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_layout_audit_zorder_tightens_spans(spark):
    # the point of the audit: under the Z-layout each simulated file
    # covers a small hyper-rectangle of (custkey, day), so its summed
    # custkey spans must be far tighter than the date-sorted layout's
    # (where every file spans ~the full custkey domain) and the box
    # predicate must scan fewer files
    rows = {
        r["layout"]: r
        for r in QUERIES["layout_pruning_audit"]["builder"](
            spark, SF_DIR
        ).collect()
    }
    bydate, zorder = rows["bydate"], rows["zorder"]
    assert bydate["files"] == zorder["files"]
    assert zorder["cust_span_total"] < bydate["cust_span_total"] / 2
    assert zorder["files_scanned"] < bydate["files_scanned"]
    # ... while the single-sort layout is (by construction) tighter on
    # its own sort column — the audit shows the trade, not a free lunch
    assert bydate["day_span_total"] <= zorder["day_span_total"]


def test_compaction_bins_partition_listing(spark):
    # bins must tile the file listing: every simulated file in exactly
    # one bin, per-bin totals reassemble the grand total, and bins are
    # CONTIGUOUS file-id ranges (the rewrite can stream the listing)
    bins = (
        QUERIES["file_compaction_bins"]["builder"](spark, SF_DIR)
        .orderBy("bin")
        .collect()
    )
    o = load_table(spark, SF_DIR, "orders")
    n_files = o.select(F.expr("o_orderkey div 50")).distinct().count()
    total = o.select(
        F.sum(
            F.lit(24) + F.length("o_orderpriority") + F.length("o_orderstatus")
        )
    ).collect()[0][0]
    assert sum(b["n_files"] for b in bins) == n_files
    assert sum(b["total_bytes"] for b in bins) == total
    prev_last = -1
    for b in bins:
        assert b["first_file"] == prev_last + 1, "bins must be contiguous"
        assert b["last_file"] >= b["first_file"]
        prev_last = b["last_file"]
    # quota property of cumulative binning: a bin only OPENS because the
    # running size crossed its quota boundary, so every bin except the
    # last must carry at least one full quota's worth of bytes across
    # its span start (sizes are ~1.7 KB per file vs 16 KiB target →
    # every closed bin total lands within one file-size of the target)
    for b in bins[:-1]:
        assert b["total_bytes"] >= 16384 - 2048


def test_acf_constant_series_is_null(spark, tmp_path):
    # zero-variance guard: a constant daily revenue series has no
    # defined autocorrelation — both engines must answer NULL, never
    # 0/0 (Spark non-ANSI NULL vs DuckDB IEEE NaN would diverge)
    const_dir = str(tmp_path / "const")
    # one 100.00 order per day for 60 consecutive days → every daily
    # revenue is identical, variance is exactly zero at both lags
    (
        spark.range(60)
        .select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % 5).alias("o_custkey"),
            F.lit("O").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
            F.timestamp_add(
                "DAY", F.col("id").cast("int"), F.lit("1995-01-01").cast("timestamp")
            ).alias("o_orderdate"),
            F.lit("1-URGENT").alias("o_orderpriority"),
        )
        .write.parquet(f"{const_dir}/orders.parquet")
    )
    out = QUERIES["daily_revenue_acf"]["builder"](spark, const_dir).collect()
    assert {r["lag_days"] for r in out} == {1, 7}
    for r in out:
        assert r["n_pairs"] > 0
        assert r["acf"] is None


def test_acf_counts_pairs_across_gaps(spark, tmp_path):
    # the round-10 review catch: lead(x, 7) is a ROW offset — it only
    # matches day+7 when ALL of day+1..day+6 are present, silently
    # dropping valid pairs around gaps. The day-indexed join must count
    # every (d, d+k) whose two ENDPOINTS exist, whatever lies between.
    # Series: days 0..20 with day 10 missing. Lag-7 endpoint pairs =
    # (0,7)..(13,20) minus any pair touching 10 -> 12 pairs; the buggy
    # row-offset version would also lose the 6 pairs SPANNING day 10
    # ((4,11),(5,12),(6,13),(7,14),(8,15),(9,16)) and find only 6.
    from pyspark.sql import functions as F

    from biodiversity_data_ingestion_spark.plans.queries import QUERIES

    days = [d for d in range(21) if d != 10]
    gap_dir = str(tmp_path / "gap")
    (
        spark.range(len(days))
        .select(
            F.col("id").alias("o_orderkey"),
            F.lit(0).alias("o_custkey"),
            F.lit("O").alias("o_orderstatus"),
            # distinct values so the ACF is defined (non-zero variance)
            (100.0 + 7.0 * F.col("id") % 13).alias("o_totalprice"),
            F.timestamp_add(
                "DAY",
                F.udf(lambda i: days[i], "int")(F.col("id")),
                F.lit("1995-01-01").cast("timestamp"),
            ).alias("o_orderdate"),
            F.lit("1-URGENT").alias("o_orderpriority"),
        )
        .write.parquet(f"{gap_dir}/orders.parquet")
    )
    out = {
        r["lag_days"]: r["n_pairs"]
        for r in QUERIES["daily_revenue_acf"]["builder"](spark, gap_dir).collect()
    }
    # lag 1: (d, d+1) both present for d in 0..19 except d=9,10 -> 18
    assert out[1] == 18
    # lag 7: 14 candidate starts (0..13) minus (3,10) and (10,17) -> 12
    assert out[7] == 12
