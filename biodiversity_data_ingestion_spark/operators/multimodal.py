"""Multimodal (binary) column plumbing (north-star extension).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and implements the processing stages a training
-data pipeline needs — feature extraction, batch-shaped decode hooks —
as Arrow-batched ``mapInPandas`` kernels.

The container has no image/video codecs, so THOSE decode steps are a
clearly-marked stub (`decode_media` raises NotImplementedError); the
Spark-side plumbing — schema, batch shape, partitioning, UDF signature
— is real and oracle-tested via the codec-free feature kernel
(`binary_features`: exact byte length + md5, computed with hashlib over
the raw bytes — portable to DuckDB's md5(blob)). AUDIO decode is REAL:
PCM WAV parses with the stdlib ``wave`` module (`decode_wav_features`),
and `synth_wav_payload` generates deterministic WAV bytes whose decoded
features have closed forms, so the full synthesize->decode roundtrip is
oracle-checked end-to-end (`audio_decode_features`).

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
    """STUB for image/video — those decodes require codec libraries
    (PIL/ffmpeg) that are not installed in this container. On a real
    deployment this becomes a mapInPandas kernel decoding each Arrow
    batch to pixel arrays; the batch shape and schema contract are
    exactly those of `binary_features`. AUDIO is NOT stubbed: PCM WAV
    decodes for real via the stdlib — see `decode_wav_features`."""
    raise NotImplementedError(
        "image/video decode needs codec libraries (PIL/ffmpeg); the "
        "Spark plumbing contract is binary_features()'s mapInPandas "
        "shape. For PCM WAV audio use decode_wav_features (real decode)"
    )


def synth_wav_payload(df: DataFrame, id_col: str, sample_rate: int = 8000) -> DataFrame:
    """Deterministic PCM WAV synthesis (16-bit mono square wave) as an
    Arrow-batched kernel — the test-data generator for the REAL audio
    decode below. Frame count and amplitude derive from the id
    (n_frames = 160 + (id % 41)*40, amp = 1000 + (id % 100)*100), both
    multiples that keep every sample at exactly +/-amp, so downstream
    features have closed forms an SQL oracle can state without parsing
    bytes. Container-WAV via stdlib ``wave`` — no external codec."""
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [df.schema[id_col], StructField("payload", BinaryType(), True)]
    )
    id_name = id_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wavmod

        import numpy as np

        for pdf in batches:
            payloads = []
            for did in pdf[id_name]:
                did = int(did)
                n_frames = 160 + (did % 41) * 40
                amp = 1000 + (did % 100) * 100
                i = np.arange(n_frames)
                samples = np.where(i % 8 < 4, amp, -amp).astype("<i2")
                buf = io.BytesIO()
                with wavmod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({id_name: pdf[id_name], "payload": payloads})

    return fan_out(df.select(id_name)).mapInPandas(kernel, schema=out_schema)


def decode_wav_features(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """REAL media decode — PCM WAV audio parsed with the stdlib ``wave``
    module inside an Arrow-batched mapInPandas kernel (no external
    codec): container header -> (channels, rate, frames), PCM frames ->
    int16 sample array -> RMS amplitude and peak. This is the actual
    decode stage of the audio pipeline, not plumbing; only image/video
    remain stubbed (`decode_media`). Same scale shape as
    `binary_features`: column-in/column-out, no shuffle, payloads never
    touch the driver."""
    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("n_channels", LongType(), True),
            StructField("sample_rate", LongType(), True),
            StructField("n_frames", LongType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("rms", DoubleType(), True),
            StructField("peak", LongType(), True),
        ]
    )
    id_name = id_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import wave as wavmod

        import numpy as np

        def decode(b):
            if b is None:
                return (None,) * 6
            with wavmod.open(io.BytesIO(bytes(b)), "rb") as w:
                ch, width, rate, nf = (
                    w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
                )
                raw = w.readframes(nf)
            a = np.frombuffer(raw, dtype="<i2" if width == 2 else "u1").astype(np.float64)
            rms = math.sqrt(float(np.mean(a * a))) if a.size else 0.0
            peak = int(np.max(np.abs(a))) if a.size else 0
            return ch, rate, nf, nf * 1000 // rate, rms, peak

        for pdf in batches:
            rows = [decode(b) for b in pdf[payload_col]]
            cols = list(zip(*rows)) if rows else [[]] * 6
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name],
                    "n_channels": cols[0],
                    "sample_rate": cols[1],
                    "n_frames": cols[2],
                    "duration_ms": cols[3],
                    "rms": cols[4],
                    "peak": cols[5],
                }
            )

    return df.select(id_name, payload_col).mapInPandas(kernel, schema=out_schema)


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
