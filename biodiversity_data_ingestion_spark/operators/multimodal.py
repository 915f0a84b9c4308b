"""Multimodal (binary) column plumbing (north-star extension).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and implements the processing stages a training
-data pipeline needs — feature extraction, batch-shaped decode hooks —
as Arrow-batched ``mapInPandas`` kernels.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (`decode_media` raises NotImplementedError); the
Spark-side plumbing — schema, batch shape, partitioning, UDF signature
— is real and oracle-tested via the codec-free feature kernel
(`binary_features`: exact byte length + md5, computed with hashlib over
the raw bytes — portable to DuckDB's md5(blob)).

Scale notes: kernels are column-in/column-out over Arrow batches — no
shuffle, no driver I/O; binary payloads never pass through the Python
driver. At 100 TB you partition upstream by content-size buckets so
Arrow batches stay within executor memory
(spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import fan_out
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_FIELDS = [
    StructField("media_type", StringType(), True),   # image/audio/video
    StructField("codec", StringType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),
]


def attach_payload(df: DataFrame, text_col: str, media_type: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload column + typed metadata from a
    text column (stand-in for real image/audio bytes; utf-8 encode is
    deterministic and shared with the DuckDB oracle's encode())."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("utf-8").alias("codec"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def binary_features(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Codec-free per-payload features over the raw bytes, computed in an
    Arrow-batched mapInPandas kernel: byte length, md5 hex digest, and
    the first byte value (magic-number sniffing primitive)."""
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("n_bytes", LongType(), True),
            StructField("payload_md5", StringType(), True),
            StructField("first_byte", LongType(), True),
        ]
    )
    id_name = id_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                    "first_byte": payloads.map(
                        lambda b: int(bytes(b)[0]) if b else None
                    ),
                }
            )

    return fan_out(df.select(id_name, payload_col)).mapInPandas(kernel, schema=out_schema)


def decode_media(df: DataFrame, payload_col: str = "payload"):
    """STUB — media decode requires codec libraries (PIL/ffmpeg/librosa)
    that are not installed in this container. On a real deployment this
    becomes a mapInPandas kernel decoding each Arrow batch to pixel /
    sample arrays; the batch shape and schema contract are exactly those
    of `binary_features`."""
    raise NotImplementedError(
        "media decode needs codec libraries (PIL/ffmpeg); the Spark "
        "plumbing contract is binary_features()'s mapInPandas shape"
    )


def resize_dims_plan(
    df: DataFrame, max_side: int = 224,
    width_col: str = "media_meta.width", height_col: str = "media_meta.height",
) -> DataFrame:
    """Aspect-preserving resize planning (decode-free): the target
    (width, height) each image resizes to so its longer side is
    ``max_side``, never upscaling. Pure integer Catalyst expressions
    (floor division), so the plan is engine-exact and runs ahead of the
    (stubbed) decode kernel — at scale this is the column that routes
    payloads to resolution-bucketed decode batches."""
    w, h = F.col(width_col), F.col(height_col)
    g = F.greatest(w, h)
    scale_needed = g > max_side
    tw = F.when(scale_needed, F.floor(w * max_side / g)).otherwise(w).cast("long")
    th = F.when(scale_needed, F.floor(h * max_side / g)).otherwise(h).cast("long")
    return df.withColumn("target_width", tw).withColumn("target_height", th)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: expand each video payload row into frame
    timestamps (0, every_ms, ...) using the metadata duration — the
    explode that precedes per-frame decode. Pure Catalyst (sequence +
    explode); decode itself is the stubbed kernel above."""
    dur = F.coalesce(F.col("media_meta.duration_ms"), F.lit(0))
    return df.withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))),
    )
