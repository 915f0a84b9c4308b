"""Line-oriented text parsing sources (reference parity).

P18: the reference gunzips a GTF annotation file, skips ``#`` comments
and splits tab-separated columns into {accession, record_type, info}
JSONL (airflow/dags/biodiversity_data_dag.py:44-68). Spark-first:
``spark.read.text`` + codegen'd split/filter — gzip handled natively by
the scan, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_gtf(spark: SparkSession, path: str) -> DataFrame:
    """GTF -> (accession, record_type, info): drop comment lines, split
    on tabs, project columns 1/3/9 (1-indexed, as the reference does)."""
    lines = spark.read.text(path)
    cols = F.split(F.col("value"), "\t")
    return (
        lines.where(~F.col("value").startswith("#"))
        .select(
            cols.getItem(0).alias("accession"),
            cols.getItem(2).alias("record_type"),
            cols.getItem(8).alias("info"),
        )
    )
