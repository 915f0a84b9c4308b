"""JSONL sources with filename capture (reference parity).

- S1 JSONL scan: ``spark.read.schema(s).json(glob)`` — schema-on-read
  replaces the reference's ReadFromText + Map(json.loads)
  (beam/src/dependencies/my_pipeline.py:38-55).
- S2 file-glob scan with species-from-filename: the reference pairs each
  line with its path and derives the species from ``occ_<Genus_species>
  .jsonl`` (data_ingestion/src/dependencies/cleaning_occs_pipeline.py:
  36-46; extract_species_name utils/helpers.py:22-28). Spark-first:
  ``input_file_name()`` + regexp, zero extra pass.

Scale: file listing is driver-side but parallelized by Spark's
InMemoryFileIndex; thousands of per-species files coalesce into batched
scan tasks (maxPartitionBytes packing), unlike the reference's
one-DoFn-per-file model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """S1: schema-on-read JSONL scan (explicit schema recommended — at
    100 TB schema inference is a full extra pass)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl_with_dead_letters(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """S1 + P16: schema-on-read JSONL scan with a dead-letter channel.

    PERMISSIVE mode routes unparseable lines into ``_corrupt_record``
    instead of failing the job — the engine analogue of the reference's
    tagged error outputs / None-filter dead letters
    (data_ingestion/src/dependencies/occurrences_pipeline.py:31-48,
    beam map_functions.py:43,275,291). Returns (good, dead) where
    ``dead`` carries the raw offending line for quarantine writes.

    Scale note: the split is two filters over ONE scan (no second
    parse); corrupt rows are usually a vanishing fraction, so the
    dead-letter branch is effectively free.
    """
    from pyspark.sql.types import StringType, StructField

    with_corrupt = StructType(
        [*schema.fields, StructField("_corrupt_record", StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # one materialization serves both branches
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    dead = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, dead


def read_species_files(
    spark: SparkSession,
    glob: str,
    schema: StructType | None = None,
    pattern: str = r"occ_(.+?)\.jsonl",
    species_col: str = "species",
) -> DataFrame:
    """S2: JSONL glob scan + species name captured from the filename
    (underscores back to spaces, mirroring extract_species_name)."""
    df = read_jsonl(spark, glob, schema)
    raw = F.regexp_extract(F.input_file_name(), pattern, 1)
    return df.withColumn(species_col, F.translate(raw, "_", " "))
