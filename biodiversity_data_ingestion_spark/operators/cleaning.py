"""Record-cleaning operators (reference parity).

- P7 coordinate/range filters with try_cast semantics
  (data_ingestion/src/dependencies/utils/cleaning_occs.py:9-78)
- P9 centroid distance anti-join (cleaning_occs.py:107-152)
- P16 null filter (occurrences_pipeline.py:37-40)
- A5 composite-key dedup (cleaning_occs_pipeline.py:64-68)
- A2/J5 cleaning summary (cleaning_summary_pipeline.py:22-75)

All pure Catalyst predicates — they push down into the parquet scan
(PushedFilters) so at 100 TB the rejected rows are skipped via row-group
statistics where possible, and the rest never leave the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import haversine_m
from .dedup import keep_min_by


def drop_zero_coords(df: DataFrame, lat: str, lon: str) -> DataFrame:
    """P7a: drop (0, 0) points (cleaning_occs.py:9-29)."""
    return df.where(~((F.col(lat) == 0.0) & (F.col(lon) == 0.0)))


def drop_out_of_range(df: DataFrame, lat: str, lon: str) -> DataFrame:
    """P7b: keep lat in [-90, 90], lon in [-180, 180]; null-unsafe parses
    drop the row (cleaning_occs.py:32-52)."""
    return df.where(
        F.col(lat).isNotNull()
        & F.col(lon).isNotNull()
        & F.col(lat).between(-90.0, 90.0)
        & F.col(lon).between(-180.0, 180.0)
    )


def filter_uncertainty(
    df: DataFrame, col: str, lo: float = 1000.0, hi: float = 5000.0
) -> DataFrame:
    """P7c: inclusive uncertainty bounds; non-numeric/missing drops the
    row (cleaning_occs.py:55-78 — bounds are INCLUSIVE, defaults
    1000..5000 m, cleaning_occs_launcher.py:16-17)."""
    v = F.col(col).try_cast("double")
    return df.where(v.isNotNull() & v.between(lo, hi))


def centroid_distance_filter(
    points: DataFrame,
    centroids: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    c_lat: str = "c_lat",
    c_lon: str = "c_lon",
    max_dist_m: float = 5000.0,
) -> DataFrame:
    """P9: drop a point if it lies within max_dist_m of ANY centroid.

    Broadcast the (small) centroid table, compute native-SQL haversine,
    and anti-join on the 'too close' matches — the whole predicate stays
    in whole-stage codegen; no Python loop per record
    (cleaning_occs.py:130-152 semantics, R=6371000 at :120).
    """
    return points.join(
        F.broadcast(centroids),
        haversine_m(F.col(lat), F.col(lon), F.col(c_lat), F.col(c_lon)) <= max_dist_m,
        "left_anti",
    )


def dedup_best_coordinate(
    df: DataFrame, keys: list[str], uncertainty: str, tiebreak: list[str]
) -> DataFrame:
    """A5: per composite key keep the record with minimal uncertainty;
    explicit tiebreak columns keep it deterministic
    (cleaning_occs.py:221-260)."""
    return keep_min_by(df, keys, [F.col(uncertainty).asc_nulls_last(), *[F.col(t) for t in tiebreak]])


def cleaning_summary(
    raw: DataFrame, cleaned: DataFrame, key: str
) -> DataFrame:
    """A2/J5: per-key total vs retained counts + percent retained
    rounded 2 (cleaning_summary_pipeline.py:22-75). Missing side
    defaults to 0 via coalesce after a left join."""
    total = raw.groupBy(key).agg(F.count(F.lit(1)).alias("total_records"))
    kept = cleaned.groupBy(key).agg(F.count(F.lit(1)).alias("retained_records"))
    return (
        total.join(kept, key, "left")
        .withColumn("retained_records", F.coalesce("retained_records", F.lit(0)))
        .withColumn(
            "percent_retained",
            F.round(F.col("retained_records") / F.col("total_records") * 100, 2),
        )
    )
