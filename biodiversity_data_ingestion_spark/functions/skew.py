"""Skew mitigation helpers.

The reference left hot-key handling as TODOs (cleaning_occs_pipeline.py:
74, the `--shards` argument at :126). Spark gives two layers:

1. AQE skew-join splitting (enabled in session.py) — handles skewed
   JOINS automatically at runtime.
2. This module's two-phase SALTED AGGREGATION — for skewed GROUP-BY
   keys where one reducer would otherwise receive a hot key's entire
   partition. Phase 1 aggregates on (key, salt) spreading a hot key
   over `salt_buckets` reducers; phase 2 merges the partials per key.

Only re-aggregable functions compose this way (count/sum/min/max —
exactly what the reference's summaries use). For avg, carry (sum, count)
and divide in phase 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name ->
    (kind, expression) where kind in {count, sum, min, max}.

    Deterministic for these order-insensitive aggregates regardless of
    salting (integer/exact types always; float sums change accumulation
    order — same caveat as any multi-partition float aggregation).
    """
    salted = df.withColumn(
        "__salt", (F.crc32(F.concat_ws("\x00", *keys)) + F.monotonically_increasing_id()) % salt_buckets
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(expr) if kind == "count" else getattr(F, kind)(expr)).alias(f"__p_{name}")
            for name, (kind, expr) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGE[kind](F.col(f"__p_{name}")).alias(name)
            for name, (kind, expr) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-salted equi-join: spread each hot key of ``big`` over
    ``salt_buckets`` reducers by joining on (key..., salt).

    The big side takes a DETERMINISTIC per-row salt (crc32 of the whole
    row's join-irrelevant spread source — here a concat of all columns —
    is overkill; a cheap uniform spreader is enough, so we hash the
    partition-local row position via ``spark_partition_id`` + a crc of
    the key, which reproduces across retries of the same partition
    layout). The small side is replicated once per salt value with
    ``explode(sequence(...))`` — its shuffle volume multiplies by
    ``salt_buckets``, which is the explicit price of de-skewing; keep it
    for small/medium dimension sides only (a broadcastable side should
    just broadcast instead).

    Manual fallback for when AQE skew splitting can't see the skew
    (e.g. skew introduced by an upstream stage in the same exchange).
    Results equal the plain join for any `how` preserved by key
    equality; validated in test_salted_join_equals_plain.
    """
    salt = (
        F.crc32(F.concat_ws("\x00", *[F.col(c).cast("string") for c in on]))
        + F.spark_partition_id()
        + F.monotonically_increasing_id()
    ) % salt_buckets
    b = big.withColumn("__jsalt", salt.cast("int"))
    # generators can't nest inside expressions (no inline cast): the
    # int-literal sequence already yields int elements
    s = small.withColumn(
        "__jsalt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, on + ["__jsalt"], how).drop("__jsalt")
