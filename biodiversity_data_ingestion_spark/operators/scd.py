"""Slowly-changing-dimension type-2 history construction.

Generalizes the reference's last-writer-wins index sink (its ES bulk
sink keeps only the final state per ``_id``, SURVEY §2.1 S10) to a full
change history: every observed value change becomes a row with a
``[valid_from, valid_to)`` validity range; unchanged re-observations are
compressed away (SCD2 no-op suppression).

Shape: one hash exchange on the key — the lag (change detection) and
lead (range assembly) windows share the same partitioning and ordering,
so Catalyst plans a single shuffle + sort for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_compress(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
) -> DataFrame:
    """Compress an observation stream into SCD2 validity ranges.

    Returns ``key, valid_from, valid_to, value_col`` where
    ``valid_to`` is NULL for each key's current (open) row. ``tiebreak``
    orders same-timestamp observations deterministically.

    Same-timestamp value changes produce zero-length ``[t, t)`` ranges
    (a value superseded in the same instant was never valid); those are
    dropped so each key's history tiles the timeline without degenerate
    rows — found by the point-in-time hypothesis property.

    NULL-timestamp observations are quarantined up front: an untimed
    observation has no place on a validity timeline, and engines
    DISAGREE on where it would sort (Spark ascending is NULLS FIRST,
    DuckDB NULLS LAST), so letting it through silently yields a
    different history per engine.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    df = df.where(F.col(ts_col).isNotNull())
    changed = df.withColumn("__prev", F.lag(value_col).over(w)).where(
        F.col("__prev").isNull() | (F.col(value_col) != F.col("__prev"))
    )
    return (
        changed.withColumn("valid_to", F.lead(ts_col).over(w))
        .where(
            F.col("valid_to").isNull() | (F.col("valid_to") != F.col(ts_col))
        )
        .select(
            key,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            value_col,
        )
    )
