"""Cluster-parallelism insurance: the constants derived from
``sc.defaultParallelism`` must behave sanely when that value is 1000+
(the cluster story SCALE.md argues), not just at the local[32] test
value. Emulated here via fan_out's multiplier (target = parallelism x
multiplier, so multiplier=64 on local[32] exercises a 2048-way target)
and via the file-less shuffle-intermediate path."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodiversity_data_ingestion_spark.functions.partitioning import fan_out

from .conftest import SF_DIR


def test_fan_out_scales_to_large_targets(spark):
    # a one-file scan fanned out to a 2048-way target must actually
    # land on 2048 partitions with the row set unchanged — no hidden
    # cap coupled to the local core count
    df = spark.read.parquet(f"{SF_DIR}/region.parquet")
    target = spark.sparkContext.defaultParallelism * 64
    out = fan_out(df, multiplier=64)
    assert out.rdd.getNumPartitions() == target
    assert sorted(r["r_regionkey"] for r in out.collect()) == sorted(
        r["r_regionkey"] for r in df.collect()
    )


def test_fan_out_noop_when_already_parallel_enough(spark):
    # file-less plan (post-shuffle intermediate) already at >= target
    # partitions: fan_out must NOT insert another exchange
    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(par * 2)
    out = fan_out(df)
    assert out is df


def test_simhash_pair_set_independent_of_parallelism(spark):
    # the explicit defaultParallelism repartition inside
    # simhash_near_pairs is a parallelism knob only: the emitted pair
    # set must be identical whatever the layout (here: a tiny
    # chunk size forces the hot-bucket chunking path too)
    from biodiversity_data_ingestion_spark.operators.dedup import (
        simhash_near_pairs,
    )

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over lazy dog number "),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )
    base = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(docs, "doc_id", "text").collect()
    }
    chunked = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(
            docs, "doc_id", "text", bucket_chunk_size=4
        ).collect()
    }
    relaid = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(
            docs.repartition(1), "doc_id", "text"
        ).collect()
    }
    assert base == chunked == relaid
    assert base  # non-vacuous: the synthetic corpus does collide
