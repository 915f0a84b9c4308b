"""Join patterns (reference parity).

- J1 multi-way co-group -> collect_list aggregates + full outer join
  (beam/src/dependencies/my_pipeline.py:96-100)
- J2 incremental gate anti-join (taxonomy_pipeline.py:39-62,
  helpers.py:237-271 — documented set difference)
- J3/J4 full-outer struct merge (spatial_annotation_pipeline.py:62-69,
  98-104)
- J6 broadcast dict lookups -> broadcast() left joins
  (my_pipeline.py:113-133)

Scale: gate anti-joins broadcast the seen-key set when small (the usual
case — it's keys only); co-group aggregates rely on map-side partial
collect_list. Skewed keys are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gate_anti_join(new: DataFrame, seen: DataFrame, key: str) -> DataFrame:
    """J2: emit only rows whose key has never been seen. The gate side is
    projected to its key column first so Catalyst can broadcast it."""
    return new.join(
        F.broadcast(seen.select(key).where(F.col(key).isNotNull()).distinct()),
        key,
        "left_anti",
    )


def cogroup_collect(
    sides: dict[str, DataFrame], key: str, value_col: dict[str, str]
) -> DataFrame:
    """J1: one output row per key with a sorted list column per side
    (CoGroupByKey semantics: sides may be empty -> empty array)."""
    out = None
    for name, df in sides.items():
        agg = df.groupBy(key).agg(
            F.array_sort(F.collect_list(value_col[name])).alias(f"{name}_list")
        )
        out = agg if out is None else out.join(agg, key, "full_outer")
    for name in sides:
        out = out.withColumn(
            f"{name}_list", F.coalesce(F.col(f"{name}_list"), F.array())
        )
    return out


def full_outer_merge(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """J3/J4: full outer join keeping either side when the other is
    absent — the reference's dict-merge with empty-dict defaults."""
    return left.join(right, key, "full_outer")
