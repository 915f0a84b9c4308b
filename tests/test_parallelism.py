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


def test_global_row_number_continuity_and_determinism(spark):
    # ranks must be exactly 1..n in order-key order ACROSS range
    # partition boundaries (the per-partition offset join is where an
    # off-by-one would hide), for any partition layout
    from biodiversity_data_ingestion_spark.functions.partitioning import (
        global_row_number,
    )

    n = 1000
    df = (
        spark.range(n)
        .withColumn("k", (F.lit(n - 1) - F.col("id")).alias("k"))  # reverse order
        .repartition(7)
    )
    out = global_row_number(df, ["k", "id"]).collect()
    assert len(out) == n
    by_rank = sorted(out, key=lambda r: r["rn"])
    assert [r["rn"] for r in by_rank] == list(range(1, n + 1))  # dense 1..n
    # rank follows the declared total order exactly
    assert [r["k"] for r in by_rank] == list(range(n))


def test_global_row_number_duplicate_keys_with_tiebreak(spark):
    # duplicate order values + unique tiebreak: still a permutation of
    # 1..n and deterministic (two runs agree row-for-row)
    from biodiversity_data_ingestion_spark.functions.partitioning import (
        global_row_number,
    )

    df = spark.range(200).withColumn("k", F.col("id") % 5).repartition(9)
    a = {r["id"]: r["rn"] for r in global_row_number(df, ["k", "id"]).collect()}
    b = {r["id"]: r["rn"] for r in global_row_number(df, ["k", "id"]).collect()}
    assert sorted(a.values()) == list(range(1, 201))
    assert a == b


def test_global_row_number_empty_and_single_partition(spark):
    from biodiversity_data_ingestion_spark.functions.partitioning import (
        global_row_number,
    )

    empty = spark.createDataFrame([], "k long")
    assert global_row_number(empty, ["k"]).count() == 0
    one = spark.createDataFrame([(3,), (1,), (2,)], "k long").coalesce(1)
    got = {r["k"]: r["rn"] for r in global_row_number(one, ["k"]).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_global_row_number_data_path_stays_distributed(spark):
    # the whole point of the primitive: the row_number window over the
    # DATA must be partitioned by the range slice (_gpid), never an
    # empty partition spec; the only SinglePartition exchange allowed
    # is the offsets branch (one row PER PARTITION, broadcast after)
    from biodiversity_data_ingestion_spark.functions.partitioning import (
        global_row_number,
    )

    df = spark.range(1000).withColumn("k", F.col("id") % 37)
    plan = (
        global_row_number(df, ["k", "id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "row_number() windowspecdefinition(_gpid" in plan
    assert plan.count("Exchange SinglePartition") == 1  # offsets branch only
    # and that branch is broadcast back, not joined by shuffle
    assert "BroadcastExchange" in plan


def test_global_row_number_reserved_name_collisions(spark):
    import pytest

    from biodiversity_data_ingestion_spark.functions.partitioning import (
        global_row_number,
    )

    df = spark.range(5).withColumn("_gpid", F.lit(0))
    with pytest.raises(ValueError, match="_gpid"):
        global_row_number(df, ["id"])
    df2 = spark.range(5).withColumn("rn", F.lit(0))
    with pytest.raises(ValueError, match="rn"):
        global_row_number(df2, ["id"])
