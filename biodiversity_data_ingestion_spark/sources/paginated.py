"""Custom connector via the Spark 4 Python DataSource API.

The reference's connectors are driver-side paginated pulls: the ES
scan pages with search_after/sliced scroll and the BigQuery client
iterates result pages (SURVEY §2.1 S3/S5). This module re-expresses
that connector SHAPE inside Spark's own source contract instead of a
pre-job snapshot script:

- ``PaginatedSnapshotDataSource`` (format ``bdi_paginated``) plans one
  InputPartition per SLICE (the ES sliced-scroll parallelism model);
  each task then pulls its slice in bounded PAGES (``page_size`` rows
  per request against the backing store) and emits pyarrow
  RecordBatches — the Arrow fast path of the Python source API, so
  rows never funnel through per-row Python objects.
- The write side implements the commit protocol: every task writes a
  part-JSONL file and returns a WriterCommitMessage; ``commit()``
  publishes a manifest naming exactly the committed parts, ``abort()``
  removes orphans — the all-or-nothing bulk-sink discipline of the
  reference's ES writer (S10), files standing in for bulk requests.

The "endpoint" here is a local parquet file (the container has no
network); swapping `_open_slice` for a real paginated HTTP client
changes nothing in the Spark contract. At 100 TB the shape holds:
parallelism = slices, memory = one page per task, and the writer's
manifest commit gives atomic visibility.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _Slice(InputPartition):
    def __init__(self, slice_id: int, n_slices: int):
        self.slice_id = slice_id
        self.n_slices = n_slices


class _PaginatedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.page_size = int(options.get("page_size", 1000))
        self.n_slices = int(options.get("slices", 4))

    def partitions(self):
        return [_Slice(i, self.n_slices) for i in range(self.n_slices)]

    def read(self, part: _Slice):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        n = f.metadata.num_rows
        # contiguous row-range slice (the sliced-scroll contract: the
        # union of slices is the table, slices are disjoint)
        lo = part.slice_id * n // part.n_slices
        hi = (part.slice_id + 1) * n // part.n_slices
        # stream the slice one bounded page at a time — a task never
        # holds more than page_size rows (the remote-endpoint memory
        # contract; a real HTTP client would issue one request here)
        seen = 0
        for batch in f.iter_batches(batch_size=self.page_size):
            b_lo, b_hi = seen, seen + batch.num_rows
            seen = b_hi
            if b_hi <= lo:
                continue
            if b_lo >= hi:
                break
            s = batch.slice(
                max(lo - b_lo, 0), min(hi, b_hi) - max(lo, b_lo)
            )
            if s.num_rows:
                yield s


class _PartMessage(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _JsonlBulkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.dir = options["path"]
        self.overwrite = overwrite

    def write(self, rows):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(
            self.dir, f"part-{ctx.partitionId():05d}-{ctx.taskAttemptId()}.jsonl"
        )
        n = 0
        with open(path, "w") as fh:
            for row in rows:
                # default=str: timestamps/dates/decimals serialize as
                # ISO text instead of failing the task
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartMessage(path, n)

    def commit(self, messages):
        manifest = {
            "parts": sorted(os.path.basename(m.path) for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.dir, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class PaginatedSnapshotDataSource(DataSource):
    """format("bdi_paginated") — see module docstring."""

    @classmethod
    def name(cls):
        return "bdi_paginated"

    def schema(self):
        import pyarrow.parquet as pq
        import pyspark.sql.pandas.types as pt

        # declare the remote schema from the endpoint's own metadata
        # (one footer read on the driver — the connector's "describe")
        sch = pq.ParquetFile(self.options["path"]).schema_arrow
        return pt.from_arrow_schema(sch)

    def reader(self, schema):
        return _PaginatedReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _JsonlBulkWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration of the custom sources with a session."""
    spark.dataSource.register(PaginatedSnapshotDataSource)
    spark.dataSource.register(DropFeedStreamSource)


class _DropStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over a drop directory: offset =
    count of consumed files (sorted name order), so micro-batches are
    the replayable ranges ``files[start:end]`` — readBetweenOffsets IS
    the exactly-once replay contract (a restarted query re-reads the
    exact files of an uncommitted batch, nothing else)."""

    def __init__(self, options):
        self.dir = options["path"]
        self.fields = [
            f.strip().split()[0] for f in options["schema"].split(",")
        ]

    def _files(self):
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".jsonl")
        )

    def _rows(self, files):
        out = []
        for fn in files:
            with open(os.path.join(self.dir, fn)) as fh:
                for line in fh:
                    d = json.loads(line)
                    out.append(tuple(d[f] for f in self.fields))
        return out

    def initialOffset(self):
        return {"n": 0}

    def read(self, start):
        files = self._files()
        return iter(self._rows(files[start["n"] :])), {"n": len(files)}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(self._files()[start["n"] : end["n"]]))


class DropFeedStreamSource(DataSource):
    """format("bdi_drop_feed") — streaming twin of read_incremental:
    the nightly-drop directory as a Structured Streaming SOURCE with
    offset tracking handled by the engine's checkpoint (vs the batch
    path's manifest commit). Requires a ``schema`` option (DDL string)
    and ``path``."""

    @classmethod
    def name(cls):
        return "bdi_drop_feed"

    def schema(self):
        return self.options["schema"]

    def simpleStreamReader(self, schema):
        return _DropStreamReader(self.options)
