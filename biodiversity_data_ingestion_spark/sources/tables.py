"""Parquet table loaders for the synthetic star schema.

Mirrors the reference's sources re-expressed as columnar scans:
- S1 JSONL text scan  (reference beam/src/dependencies/my_pipeline.py:38-55)
  -> schema-on-read parquet/json scans; Catalyst prunes columns and pushes
  filters into the scan.
- S5 BigQuery query scan (data_ingestion/src/dependencies/taxonomy_pipeline.py:43-52)
  -> `load_table(...).where(...).select(...).distinct()`.
- O1 source-side sort + search_after pagination (transforms.py:62,98-107)
  is moot under a parallel scan: there is no paging cursor to order by;
  ordering appears only at declared output sorts (O3).

Scale: each table is a plain directory scan; on a cluster the same code
reads partitioned/bucketed layouts unchanged. No collect(), no driver I/O.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts may be parquet TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects; read it as raw nanos and truncate to
        # micros — the same ns -> us truncation DuckDB applies on scan.
        # Generator versions that already write micros need no conversion.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so the SQL layer (plans/) can
    run statements against them — the Spark analogue of the reference's
    BigQuery dataset (airflow/dags/biodiversity_metadata_dag.py:330-575)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
