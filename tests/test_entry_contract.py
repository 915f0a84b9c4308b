"""The driver contract: __spark_entry__ must expose entry/queries/
oracle_sql with the shapes the driver harness consumes."""

from __future__ import annotations

from pyspark.sql import DataFrame

import __spark_entry__ as E


def test_entry_returns_flagship_dataframe(spark):
    df = E.entry(spark)
    assert isinstance(df, DataFrame)
    rows = df.collect()
    assert len(rows) >= 1
    # stable schema: the driver hashes on column names
    assert df.columns[0] == "l_returnflag"


def test_queries_and_oracles_align():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    # every query is a callable; every oracle a non-empty SQL string
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
    # the no-oracle set is the small by-design list, nothing else
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "species_range_hull",
        "sketch_value_stats",
        "hll_mergeable_rollup",
        "theta_user_overlap",
        "kll_value_quantiles",
        # round 4 graduated copurchase_pagerank, kmeans_clusters,
        # word_heavy_hitters_cms, semantic_dedup_corpus, ivf_kmeans_topk
        # and ivf_topk_probe to exact oracles (fixed-point integer
        # trajectories / race-free integer routing centroids / portable
        # md5 cell hashes)
    }
