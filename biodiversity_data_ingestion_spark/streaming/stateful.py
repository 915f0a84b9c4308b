"""Custom stateful streaming operators (engine extension, SURVEY §2.9).

The reference's incremental story is the batch gate anti-join (J2). Its
streaming analogue is a FIRST-SEEN-WINS dedup across micro-batches:
emit each key the first time it appears and remember it in state —
implemented with ``applyInPandasWithState`` (per-key state, GroupState
timeouts available for TTL eviction).

Scale: state is one tiny record per distinct key, partitioned by key
hash across executors; at 100 TB of events the state size tracks key
cardinality, not input volume. Pair with a state-store TTL (timeout)
when keys are unbounded.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def first_seen_dedup(
    keyed: DataFrame,
    key_col: str,
    order_cols: list[str],
    payload_schema: StructType,
) -> DataFrame:
    """Emit the first-ordered row per key ONCE across the whole stream.

    ``keyed`` may be streaming or batch (same code path — batch runs it
    as a single group pass). Rows are ordered inside each micro-batch by
    ``order_cols`` so the winner within a batch is deterministic; once a
    key has emitted, later batches emit nothing for it.
    """

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(by=order_cols, kind="mergesort", ignore_index=True)
        state.update((True,))
        yield batch.head(1)

    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=payload_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_first_seen_over_events(spark, sf_dir: str, query_name: str = "bdi_first_seen") -> DataFrame:
    """Execute the stateful dedup as a real streaming query over the
    events table (file source, memory sink) and return the drained
    result: the first event per user."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, LongType, TimestampType

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    keyed = stream.select("user_id", "ts", "event_id")
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_id", LongType()),
        ]
    )
    deduped = first_seen_dedup(keyed, "user_id", ["ts", "event_id"], out_schema)
    try:
        spark.catalog.dropTempView(query_name)
    except Exception:
        pass
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return spark.table(query_name).select(
        "user_id",
        F.col("ts").alias("first_ts"),
        F.col("event_id").alias("first_event_id"),
    )
