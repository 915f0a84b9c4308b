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

from ..functions.textfn import EARTH_RADIUS_M, haversine_m
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
    """P9: drop a point if it lies within max_dist_m of ANY centroid
    (cleaning_occs.py:130-152 semantics, R=6371000 at :120).

    A bare distance theta-join is a nested-loop (|points| x |centroids|
    haversine evaluations — quadratic, a non-starter at scale). Instead:
    GRID-BLOCKED spatial join. Both sides are keyed to lat/lon grid
    cells sized so any pair within max_dist_m shares a candidate cell;
    centroids are exploded to their reachable neighbor cells (latitude
    span is exact: dphi <= d/R; longitude span uses the haversine bound
    sin(dlambda/2) <= sin(d/2R)/sqrt(cos(phi_c) cos(phi_p)), capped at
    the full circle near the poles). The anti-join is then HASH-based on
    the cell key with the exact haversine as residual condition — no
    false negatives, candidate count ~ density x neighborhood.
    """
    import math as _math

    cell_deg = max_dist_m / 111194.93  # 1 deg latitude in meters at R=6371000
    n_lon = int(_math.ceil(360.0 / cell_deg))
    half_d_rad = max_dist_m / (2.0 * EARTH_RADIUS_M)

    def lat_cell(c: Column) -> Column:
        return F.floor(c / F.lit(cell_deg)).cast("long")

    def lon_cell(c: Column) -> Column:
        idx = F.floor(c / F.lit(cell_deg)).cast("long")
        return ((idx % n_lon) + n_lon) % n_lon

    pts = points.withColumn("__plat_c", lat_cell(F.col(lat))).withColumn(
        "__plon_c", lon_cell(F.col(lon))
    )

    # explode each centroid to its +-1 latitude bands x reachable lon cells
    cents = centroids.select(c_lat, c_lon).withColumn(
        "__dl", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    )
    band_lat = lat_cell(F.col(c_lat)) + F.col("__dl")
    # worst-case |latitude| inside this band (degrees), for the cos bound
    band_abs = F.least(
        F.greatest(F.abs(band_lat * F.lit(cell_deg)), F.abs((band_lat + 1) * F.lit(cell_deg))),
        F.lit(89.999),
    )
    cos_bound = F.sqrt(
        F.greatest(
            F.cos(F.radians(F.least(F.abs(F.col(c_lat)), F.lit(89.999))))
            * F.cos(F.radians(band_abs)),
            F.lit(1e-12),
        )
    )
    dlam_rad = 2.0 * F.asin(F.least(F.lit(1.0), F.lit(_math.sin(half_d_rad)) / cos_bound))
    span = F.least(
        F.ceil(F.degrees(dlam_rad) / F.lit(cell_deg)).cast("long"), F.lit(n_lon // 2)
    )
    cents = cents.select(
        c_lat,
        c_lon,
        band_lat.alias("__clat_c"),
        F.explode(F.sequence(-span, span)).alias("__k"),
    ).select(
        c_lat,
        c_lon,
        "__clat_c",
        (((lon_cell(F.col(c_lon)) + F.col("__k")) % n_lon + n_lon) % n_lon).alias("__clon_c"),
    )

    too_close = (
        (F.col("__plat_c") == F.col("__clat_c"))
        & (F.col("__plon_c") == F.col("__clon_c"))
        & (haversine_m(F.col(lat), F.col(lon), F.col(c_lat), F.col(c_lon)) <= max_dist_m)
    )
    return pts.join(F.broadcast(cents), too_close, "left_anti").drop("__plat_c", "__plon_c")


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
