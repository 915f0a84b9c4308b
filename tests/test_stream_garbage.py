"""Streaming garbage tier: every stream_* query run end-to-end over a
PLANTED garbage event stream and compared bitwise against its oracle.

The batch families have had this tier since r12; streams got it late in
r13 because the runners take ``sf_dir`` — a planted ``events.parquet``
drives the real streaming execution (file source, watermark, memory
sink). Seven real defects were found and fixed when this tier landed:

- NULL event times were silently DROPPED by the watermark operators
  while the batch oracles kept them (4 divergences: tumbling, sliding,
  topk, built-in sessions) — untimed events are now quarantined in the
  shared window/session builders AND the oracles (``ts IS NOT NULL``);
- the sentinel staging's fallback ``max()`` compared None > Timestamp
  (one untimed row killed the staged replay);
- the sentinel parquet was pyarrow-written and could land a different
  physical timestamp type than the source (INT96 source -> nanos-INT64
  sentinel -> LONG under nanosAsLong -> PARQUET_COLUMN_DATA_TYPE_
  MISMATCH mid-stream) — it is now Spark-written from the staged
  file's own schema;
- the grouped-map state kernel crashed on a NULL user key
  (``int(NaN % 3)``) where SQL window partitioning emits a NULL-user
  session — the kernel now processes the NULL group with the DEFAULT
  gap (oracle mirrors via coalesce) and NULL values follow SQL sum
  semantics (row counted, value skipped, all-NULL session sum is NULL
  — a new ``nn`` state field tracks non-null values);
- the sentinel filter used ``!=``, which NULLed away the NULL-user
  session (now eqNullSafe).
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from .oracle_harness import compare, duckdb_con_raw

_GARBAGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value)
    *[
        (u * 100 + k, f"2024-01-01 0{u}:{k:02d}:00", u,
         ["click", "view", "purchase", "cart"][k % 4], float(k) + 0.5)
        for u in range(1, 6)
        for k in range(8)
    ],
    (900, None, 1, "click", 1.0),                       # NULL ts
    (901, "2024-01-01 01:00:00", None, "click", 1.0),   # NULL user
    (902, "2024-01-01 01:00:00", 2, None, 1.0),         # NULL type
    (903, "2024-01-01 01:00:00", 2, "click", None),     # NULL value
    (904, "2024-01-01 01:00:00", 3, "click", 2.0),      # same-instant dup
    (905, "2024-01-01 01:00:00", 3, "click", 2.0),
    (906, "2199-12-31 23:59:59", 4, "view", 1.0),       # far future
]


@pytest.fixture(scope="module")
def garbage_dir(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("stream_garbage")
    df = spark.createDataFrame(
        [(*r, None) for r in _GARBAGE_EVENTS],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(str(work / "_ev"))
    shutil.move(glob.glob(str(work / "_ev" / "part-*.parquet"))[0],
                str(work / "events.parquet"))
    shutil.rmtree(str(work / "_ev"))
    # dimension tables for the enrichment/join runners
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    str(work / f"{t}.parquet"))
    return str(work)


def _stream_specs():
    import sys

    sys.path.insert(0, "/root/repo")
    from biodiversity_data_ingestion_spark.plans.queries import QUERIES

    return sorted(n for n in QUERIES if n.startswith("stream_"))


@pytest.mark.parametrize("name", _stream_specs())
def test_stream_query_survives_garbage_events(spark, garbage_dir, name):
    from biodiversity_data_ingestion_spark.plans.queries import QUERIES

    spec = QUERIES[name]
    out = spec["builder"](spark, garbage_dir)  # must not raise
    if spec["oracle"] is None:
        assert out.count() >= 0
        return
    con = duckdb_con_raw()
    for t in ("events", "region", "nation", "customer", "supplier",
              "part", "orders", "lineitem", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{garbage_dir}/{t}.parquet'"
        )
    res = compare(name, out, con, spec["oracle"])
    assert res.ok, res.problems
