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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TIMESTAMP regardless of the
    on-disk parquet shape. Three shapes occur in the wild:

    - TIMESTAMP(NANOS): Spark's reader surfaces it as raw nanos LongType
      under ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py)
      -> truncate to micros, same as DuckDB's scan-time ns->us cast.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): surfaces as
      TIMESTAMP_NTZ -> cast to TIMESTAMP. Session TZ is pinned UTC
      (session.py) so wall-clock semantics are unchanged; without this
      cast, withWatermark / unix_micros / bigint casts all reject NTZ.
    - TIMESTAMP: passes through.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            df = spark.read.parquet(path)
        except Exception as e:
            # TIMESTAMP(NANOS) parquet on a session without nanosAsLong
            # (e.g. the driver's own session): enable the legacy long
            # surface and retry once. This is a FALLBACK only — our
            # session factory (session.py) sets the conf up front, and
            # the normal path never mutates session conf at read time.
            # Match the nanos signature so unrelated failures (missing
            # path, corrupt footer) don't flip session-wide conf.
            msg = str(e)
            if not ("NANOS" in msg or "Illegal Parquet type" in msg):
                raise
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        return normalize_event_ts(df)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so the SQL layer (plans/) can
    run statements against them — the Spark analogue of the reference's
    BigQuery dataset (airflow/dags/biodiversity_metadata_dag.py:330-575)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_evolving_table(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read a table whose schema DRIFTED across partition writes (new
    nullable columns added over time — the schema-evolution case every
    long-lived ingestion hits). ``mergeSchema`` unions the parquet
    footers: rows from older files carry NULL for columns they predate,
    so downstream code sees one stable superset schema.

    Scale note: footer merging reads metadata only (one footer per
    file, parallelized); the data scan still prunes to the queried
    columns. For tables with thousands of files, prefer declaring the
    superset schema explicitly (spark.read.schema(...)) and skipping
    the merge pass — this helper is for the exploratory/first-read
    path.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_incremental(spark, path: str, manifest_path: str, fmt: str = "parquet"):
    """Batch-incremental file scan: read only the files under ``path``
    not yet recorded in the manifest — the nightly-crawl ingestion
    pattern (the batch twin of the streaming file source's own file
    tracking, and of the reference's gate anti-join J2 lifted from rows
    to FILES: the gate key is the file name, so the scan cost tracks
    the new data, not the table).

    Returns ``(df, new_files, commit)``; call ``commit()`` only AFTER
    the downstream write succeeds, so a failed run replays the same
    files next time (at-least-once; pair with an idempotent sink — the
    versioned-write swap or a MERGE upsert — for effective
    exactly-once).

    The manifest is a flat JSON file list — right for a per-drop
    directory (thousands of files). At millions of files the listing
    itself is the cost; store the manifest as a table and diff with an
    anti-join instead (same shape, distributed).
    """
    import glob as _glob
    import json

    seen: set[str] = set()
    if os.path.exists(manifest_path):
        seen = set(json.load(open(manifest_path))["files"])
    all_files = sorted(
        f
        for f in _glob.glob(os.path.join(path, "*"))
        if not os.path.basename(f).startswith(("_", "."))
    )
    new = [f for f in all_files if f not in seen]
    if new:
        df = spark.read.format(fmt).load(new)
    else:
        # empty frame with the table's schema, so downstream unions and
        # writes are a no-op rather than a special case
        df = spark.createDataFrame([], spark.read.format(fmt).load(path).schema)

    def commit() -> None:
        with open(manifest_path, "w") as fh:
            json.dump({"files": sorted(seen | set(new))}, fh)

    return df, new, commit


def observe_quality(df: DataFrame, cols: list[str], name: str = "bdi_quality"):
    """Attach in-flight data-quality metrics to ``df`` via Spark's
    Observation API: row count plus a null count per listed column,
    computed INSIDE whatever job first executes the frame — no second
    scan, no separate quality pass. Returns ``(df_observed, obs)``;
    read ``obs.get`` after an action.

    This is the pipeline-monitoring primitive: at 100 TB a dedicated
    quality job re-reads the table, while observe() piggybacks the
    counters on the write/aggregate already running (the accumulator
    mechanism, exposed declaratively). Metrics are named
    ``n_rows`` and ``null_<col>``.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}") for c in cols
    ]
    return df.observe(obs, *metrics), obs
