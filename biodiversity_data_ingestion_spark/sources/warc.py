"""WARC (Web ARChive) record support — the ingestion format of
Common Crawl, which is where web-scale training corpora actually come
from. Spark-first shape: records are opaque binary column values
(one gzip member per record, exactly the `.warc.gz` convention — each
record is independently decompressible, which is what makes the format
splittable at scale), parsed in Arrow-batched mapInPandas kernels with
the same column-in/column-out contract as the media decoders.

The synth twin builds spec-shaped WARC/1.0 response records (version
line, named headers, double-CRLF separator, Content-Length-bounded
block, trailing double-CRLF) gzip-compressed per record; the parser
walks them back with only the stdlib. Both ends are exercised by an
exact-hash oracle over closed-form features.

Scale notes: at 100 TB the records arrive as `binaryFile`/custom-split
reads of .warc.gz shards; per-record gzip members mean a shard splits
on member boundaries and each task decompresses only its slice. The
kernel here is the per-record stage of that pipeline.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.partitioning import fan_out
from pyspark.sql.types import LongType, StringType, StructField, StructType

_CRLF = b"\r\n"


def synth_warc_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One gzip-member WARC/1.0 response record per row, the document
    text as the content block. Deterministic: fixed WARC-Date, record
    id derived from the row id, gzip with mtime=0 so identical inputs
    give identical bytes."""
    import gzip as gzmod
    import io

    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("payload", BinaryType(), True),
        ]
    )
    id_name, text_name = id_col, text_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def build(did: int, text: str) -> bytes:
            body = ("" if text is None else text).encode("utf-8")
            headers = (
                b"WARC/1.0" + _CRLF
                + b"WARC-Type: response" + _CRLF
                + (
                    "WARC-Record-ID: <urn:uuid:%032x>" % did
                ).encode("ascii") + _CRLF
                + b"WARC-Date: 2024-01-01T00:00:00Z" + _CRLF
                + (
                    "WARC-Target-URI: https://example.org/doc/%d" % did
                ).encode("ascii") + _CRLF
                + ("Content-Length: %d" % len(body)).encode("ascii") + _CRLF
                + _CRLF
            )
            record = headers + body + _CRLF + _CRLF
            buf = io.BytesIO()
            with gzmod.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            return buf.getvalue()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name],
                    "payload": [
                        build(int(i), t)
                        for i, t in zip(pdf[id_name], pdf[text_name])
                    ],
                }
            )

    return fan_out(df.select(id_name, text_name)).mapInPandas(
        kernel, schema=out_schema
    )


def parse_warc_features(
    df: DataFrame, id_col: str, payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """Parse a gzip-member WARC record back: inflate, split the header
    block at the first CRLFCRLF, read the version line and named
    headers, take exactly Content-Length bytes of content. Features:
    (warc_type, target_uri, content_length, n_words) — the fields a
    crawl-ingestion pipeline keys on before text extraction. Same
    dead-letter option as the media decoders."""
    import gzip as gzmod

    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("warc_type", StringType(), True),
            StructField("target_uri", StringType(), True),
            StructField("content_length", LongType(), True),
            StructField("n_words", LongType(), True),
        ]
    )
    id_name = id_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def parse(buf):
            if buf is None:
                return (None,) * 4
            record = gzmod.decompress(bytes(buf))
            head, _, rest = record.partition(_CRLF + _CRLF)
            lines = head.split(_CRLF)
            assert lines[0].startswith(b"WARC/"), "not a WARC record"
            headers = {}
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower()] = v.strip()
            clen = int(headers[b"content-length"])
            content = rest[:clen]
            assert rest[clen : clen + 4] == _CRLF + _CRLF, "bad record end"
            text = content.decode("utf-8")
            n_words = len([w for w in text.lower().split() if w])
            return (
                headers[b"warc-type"].decode("ascii"),
                headers[b"warc-target-uri"].decode("ascii"),
                clen,
                n_words,
            )

        def _safe(b):
            try:
                return parse(b)
            except Exception:
                if on_error == "raise":
                    raise
                return (None,) * 4

        for pdf in batches:
            feats = [_safe(b) for b in pdf[payload_col]]
            cols = list(zip(*feats)) if feats else [[]] * 4
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name],
                    "warc_type": pd.array(cols[0], dtype="string"),
                    "target_uri": pd.array(cols[1], dtype="string"),
                    "content_length": pd.array(cols[2], dtype="Int64"),
                    "n_words": pd.array(cols[3], dtype="Int64"),
                }
            )

    return df.mapInPandas(kernel, schema=out_schema)
