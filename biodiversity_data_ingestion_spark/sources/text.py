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
    on tabs, project columns 1/3/9 (1-indexed, as the reference does).

    Ragged lines (fewer than 9 tab-separated columns — truncated
    download, mid-record cut) are DROPPED, not half-projected:
    ``getItem(8)`` on a short array is NULL, so without the arity
    filter a cut line would yield a partial (accession, type, NULL)
    row — the self-inconsistent-row class every other source here
    quarantines. Use ``read_gtf_with_dead_letters`` to capture them."""
    good, _ = _gtf_split(spark, path, cache=False)
    return good


def read_gtf_with_dead_letters(spark: SparkSession, path: str):
    """GTF scan with the same dead-letter discipline as the JSONL/CSV/
    XML sources: returns (good, dead) where ``good`` carries only
    well-formed (>= 9 column) records and ``dead.raw_line`` carries
    non-comment lines that fail the arity check, for quarantine writes.
    One cached scan serves both branches."""
    return _gtf_split(spark, path, cache=True)


def _gtf_split(spark: SparkSession, path: str, cache: bool):
    # cache only when BOTH branches will be consumed (the dead-letter
    # variant): caching in the single-branch read_gtf path would pin
    # every scanned text partition in memory for no reuse — a real
    # footprint at corpus scale
    lines = spark.read.text(path).where(
        (~F.col("value").startswith("#")) & (F.length("value") > 0)
    )
    if cache:
        lines = lines.cache()
    cols = F.split(F.col("value"), "\t")
    well_formed = F.size(cols) >= 9
    good = (
        lines.where(well_formed)
        .select(
            cols.getItem(0).alias("accession"),
            cols.getItem(2).alias("record_type"),
            cols.getItem(8).alias("info"),
        )
    )
    dead = lines.where(~well_formed).select(F.col("value").alias("raw_line"))
    return good, dead


def read_csv_with_dead_letters(
    spark, path: str, schema, header: bool = True, sep: str = ","
):
    """CSV scan with the same dead-letter discipline as the JSONL source
    (sources/jsonl.py::read_jsonl_with_dead_letters): PERMISSIVE mode
    routes malformed lines (wrong arity, uncastable fields) into
    ``_corrupt_record`` instead of failing the job. Returns
    (good, dead); ``dead.raw_line`` carries the offending text for
    quarantine writes. One scan serves both branches (cached split).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    with_corrupt = StructType(
        [*schema.fields, StructField("_corrupt_record", StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    dead = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, dead


def read_xml_with_dead_letters(spark, path: str, schema, row_tag: str):
    """XML scan (Spark 4 native source) with the same dead-letter
    discipline as the JSONL/CSV sources: PERMISSIVE mode routes
    unparseable records into ``_corrupt_record`` instead of failing the
    job. Returns (good, dead); one cached scan serves both branches.

    Attributes surface with the default ``_`` prefix (an attribute
    ``key`` becomes column ``_key``); nested elements map to structs —
    the XML tree IS the Spark schema, so column pruning reaches the
    record parse like any other self-describing source.

    CAVEAT (this Spark build): an uncastable ELEMENT value quarantines
    as designed, but an uncastable ATTRIBUTE value throws from
    StaxXmlParser.convertAttributes before PERMISSIVE can catch it —
    type attribute-carrying fields as STRING and cast downstream if
    the feed's attributes are untrusted.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    with_corrupt = StructType(
        [*schema.fields, StructField("_corrupt_record", StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("rowTag", row_tag)
        .format("xml")
        .load(path)
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    dead = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_record")
    )
    return good, dead
