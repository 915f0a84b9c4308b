"""SparkSession factory.

Scale notes (100 TB target):
- AQE is on: runtime shuffle-partition coalescing, skew-join splitting
  and dynamic broadcast decisions replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces. On a real cluster set it ~2-3x total cores.
- Session timezone pinned to UTC so timestamp semantics are stable
  across engines (the DuckDB oracle compares naive UTC timestamps).
- Arrow enabled for the pandas-UDF kernels (geometry / embeddings).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "biodiversity-data-ingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for batch analytics.

    Local test runs use ``local[$SPARK_GRAFT_CPUS]``; on a cluster the
    master comes from spark-submit and this factory only applies SQL conf.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.ts is parquet TIMESTAMP(NANOS); read as long and
        # truncate to micros in the loaders (sources/tables.py, streaming/)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # runtime filters: a selective dim-side predicate becomes a bloom
        # filter pushed into the fact-side scan of shuffle joins — at
        # 100 TB this prunes most of the probe side before the exchange
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
        # driver/local-mode memory headroom for the 32-thread test box
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
