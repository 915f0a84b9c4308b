"""Fusion-breaking fan-out (the reference's Reshuffle pattern).

The reference inserts ``beam.Reshuffle()`` before slow per-record work so
the runner can parallelize past source fusion
(data_ingestion/src/dependencies/taxonomy_pipeline.py:69,76;
data_provenance_pipeline.py:21). The Spark analogue is a round-robin
``repartition`` — needed when the scan has fewer splits than the cluster
has cores (e.g. a single-row-group parquet file => ONE task no matter
how many executors).

``fan_out`` is a no-op when the scan already has enough splits, so at
100 TB (thousands of files/row-groups) it costs nothing; on small or
badly-laid-out inputs it buys full-cluster parallelism for CPU-bound
kernels at the price of shuffling the (small) input once.

IMPORTANT determinism caveat: only apply upstream of ORDER-INSENSITIVE
computation (per-row transforms, integer counts, min/max over hashes).
Floating-point SUMS/AVGS change with accumulation order — queries whose
oracle parity depends on file-order summation must not fan out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rn",
) -> DataFrame:
    """Dense global 1-based row numbers in ``order_cols`` order WITHOUT
    a single-partition window.

    ``row_number() OVER (ORDER BY ...)`` is the textbook scale trap: an
    empty PARTITION BY collapses the whole relation into ONE window
    task. This primitive keeps the sort distributed — the two-pass
    rank trick every shared-nothing engine uses:

    1. ``repartitionByRange(order_cols)`` — a distributed range sort;
       partitions are contiguous, ordered slices of the total order.
    2. Per-partition row counts (a map-side-combinable aggregate over
       the partition id) -> prefix-summed into per-partition OFFSETS; a
       window over that frame is fine — it has one row per partition.
    3. Within-partition ``row_number`` (each range slice is its own
       window group, so every task ranks only its own slice) plus the
       broadcast offset = the global rank.

    The stamped frame is checkpointed once so the count branch and the
    rank branch see the SAME range-partition assignment. Ranks are
    deterministic whenever ``order_cols`` is a total order (include a
    unique tiebreak column): global order is then unique regardless of
    where the range boundaries land.
    """
    # the two working columns would silently collide with (or drop)
    # same-named user data — refuse up front
    reserved = {"_gpid", "_off"} & set(df.columns)
    if reserved or out in df.columns:
        bad = sorted(reserved | ({out} if out in df.columns else set()))
        raise ValueError(
            f"global_row_number: input already has column(s) {bad}; "
            "rename them (or pass a different `out`) first"
        )
    ranged = df.repartitionByRange(*order_cols)
    stamped = ranged.withColumn("_gpid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    counts = stamped.groupBy("_gpid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_gpid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_gpid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_gpid").orderBy(*order_cols)
    return (
        stamped.join(F.broadcast(offsets), "_gpid")
        .withColumn(out, (F.row_number().over(w_in) + F.col("_off")).cast("long"))
        .drop("_gpid", "_off")
    )


def scaled_shuffle_partitions(
    paths,
    target_partition_bytes: int = 128 << 20,
    floor: int = 8,
) -> int:
    """Shuffle/state partition count derived from INPUT SIZE instead of
    a session constant: ceil(total bytes / target) with a small floor.

    ``spark.sql.shuffle.partitions`` is sized for the whole session; a
    job over one small table inherits it and pays per-partition fixed
    overhead for partitions that hold a few KB each, while a huge input
    would underfill at the same constant. Deriving the count from the
    bytes actually being processed is the scale-adaptive policy the
    optimization guide prescribes (§2.2: size partitions to 100 MB-1 GB)
    — at 100 TB this yields thousands of partitions, on testdata a
    handful. ``paths`` is an iterable of files and/or directories
    (directories are summed one level deep — the staged-replay layout).
    """
    import os as _os

    total = 0
    for p in paths:
        if _os.path.isdir(p):
            for name in _os.listdir(p):
                q = _os.path.join(p, name)
                if _os.path.isfile(q):
                    total += _os.path.getsize(q)
        elif _os.path.isfile(p):
            total += _os.path.getsize(p)
    return max(floor, -(-total // target_partition_bytes))


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Round-robin repartition to cluster parallelism iff the plan
    currently has fewer partitions than that.

    The split estimate is ``len(df.inputFiles())`` — a lower bound on
    scan splits that needs only the analyzed plan. The previous
    ``df.rdd.getNumPartitions()`` probe triggered full physical
    planning plus an RDD conversion on EVERY operator call — a
    non-trivial driver-side pass on complex plans. Under-estimating
    splits (one huge splittable file) at worst costs one bounded
    shuffle of an input that was too small to be well-laid-out anyway;
    at 100 TB (thousands of files) the estimate clears ``target`` and
    fan_out stays a no-op.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    n_files = len(df.inputFiles())
    if n_files >= target:
        return df
    if n_files == 0:
        # Plan has no file sources (createDataFrame input or a
        # post-shuffle intermediate): inputFiles() says nothing about
        # parallelism, so pay the (one-off, driver-side) RDD probe
        # rather than force an unconditional shuffle on every call.
        if df.rdd.getNumPartitions() >= target:
            return df
    return df.repartition(target)
