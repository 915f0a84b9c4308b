"""Streaming checkpoint recovery: a restarted query must resume from
committed offsets (no reprocessing of already-committed files) and the
recovered run's cumulative result must equal the batch aggregation —
the exactly-once-source contract a production stream depends on."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "k STRING, v DOUBLE").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_available(spark, src, sink, ckpt):
    stream = (
        spark.readStream.schema("k STRING, v DOUBLE").parquet(src)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)


def test_checkpoint_restart_does_not_reprocess(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    batch_a = [("a", 1.0), ("b", 2.0)]
    batch_b = [("a", 3.0), ("c", 4.0)]

    _write_batch(spark, src, batch_a)
    _run_available(spark, src, sink, ckpt)
    n_after_a = spark.read.parquet(sink).count()
    assert n_after_a == len(batch_a)

    # new file lands; the restarted query (same checkpoint) must emit
    # ONLY the new rows — committed offsets survive the restart
    _write_batch(spark, src, batch_b)
    _run_available(spark, src, sink, ckpt)

    out = spark.read.parquet(sink)
    assert out.count() == len(batch_a) + len(batch_b)  # no duplicates
    got = (
        out.groupBy("k").agg(F.round(F.sum("v"), 2).alias("s")).collect()
    )
    assert {(r.k, r.s) for r in got} == {("a", 4.0), ("b", 2.0), ("c", 4.0)}

    # and a third restart with NO new data is a clean no-op
    _run_available(spark, src, sink, ckpt)
    assert spark.read.parquet(sink).count() == len(batch_a) + len(batch_b)
