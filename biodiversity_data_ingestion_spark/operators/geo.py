"""Geometry kernels (reference parity, numpy-only).

The reference's geo operators run shapely/pyproj/rasterio inside Beam
DoFns; this container has neither, so the kernels are re-derived from
first principles in numpy inside Arrow-batched pandas UDFs — same
semantics, vectorized per batch, zero per-row Python:

- P8  point-in-polygon sea filter
  (data_ingestion/src/dependencies/utils/cleaning_occs.py:81-104)
- P9  haversine centroid filter — native SQL, see operators/cleaning.py
  (cleaning_occs.py:107-152)
- P10 uncertainty-buffer polygon -> WKT
  (utils/transforms.py:364-459 — AEQD buffer, floor 100 m, WGS84 out)
- P11 raster zonal statistics
  (transforms.py:462-643 — CHELSA masked mean + unit conversion)
- P12 polygon-intersection attribute collection
  (transforms.py:747-801 — sorted-unique values of intersecting zones)
- range estimation: convex hull area km^2 per group
  (transforms.py:889-934 — hull + equal-area projection, /1e6)

Scale notes (100 TB): every kernel is a column-in/column-out pandas UDF
over an Arrow batch — embarrassingly parallel, no shuffle. Reference
polygons/centroids ride along as broadcast Python objects (the Spark
analogue of Beam side inputs + the worker-local caches the reference
builds in DoFn.setup, transforms.py:509-544). The only shuffled kernel
is the per-group convex hull (applyInPandas => one hash shuffle on the
group key, each group reduced to ONE row — minimal network volume).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.partitioning import fan_out
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EARTH_RADIUS_M = 6371000.0  # cleaning_occs.py:120


# ---------------------------------------------------------------------------
# P8: point-in-polygon


def _ray_cast(lat: np.ndarray, lon: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: (n points) x (one polygon ring).

    poly: (k, 2) array of (lon, lat) vertices, closed or open ring.
    Boundary behavior follows the standard even-odd rule (half-open
    edges), matching shapely `within` for interior points — the
    reference only ever tests strictly-interior occurrence points.
    """
    x, y = lon, lat
    px, py = poly[:, 0], poly[:, 1]
    inside = np.zeros(x.shape, dtype=bool)
    k = len(poly)
    j = k - 1
    for i in range(k):
        cond = (py[i] > y) != (py[j] > y)
        xin = (px[j] - px[i]) * (y - py[i]) / (py[j] - py[i] + 1e-300) + px[i]
        inside ^= cond & (x < xin)
        j = i
    return inside


def point_in_polygons_filter(
    spark: SparkSession,
    df: DataFrame,
    polygons: list[list[tuple[float, float]]],
    lat: str = "lat",
    lon: str = "lon",
    keep_inside: bool = True,
) -> DataFrame:
    """P8 sea filter: keep rows whose point falls inside ANY polygon
    (the reference keeps points on land, cleaning_occs.py:81-104).

    Polygons are broadcast once per executor (side-input analogue);
    the predicate runs as an Arrow-batched pandas UDF.
    """
    bc = spark.sparkContext.broadcast(
        [np.asarray(p, dtype=np.float64) for p in polygons]
    )

    @F.pandas_udf(BooleanType())
    def _inside(lat_s: pd.Series, lon_s: pd.Series) -> pd.Series:
        la = lat_s.to_numpy(dtype=np.float64)
        lo = lon_s.to_numpy(dtype=np.float64)
        acc = np.zeros(len(la), dtype=bool)
        for poly in bc.value:
            acc |= _ray_cast(la, lo, poly)
        return pd.Series(acc)

    df = fan_out(df)  # pandas-UDF kernels are CPU-bound, per-row
    pred = _inside(F.col(lat), F.col(lon))
    return df.where(pred if keep_inside else ~pred)


# ---------------------------------------------------------------------------
# P10: uncertainty-buffer polygon -> WKT


def buffer_wkt(
    df: DataFrame,
    lat: str,
    lon: str,
    radius_m: str,
    out_col: str = "uncertainty_geom_wkt",
    n_vertices: int = 16,
    min_radius_m: float = 100.0,
) -> DataFrame:
    """P10: per-row circular buffer around (lat, lon) of
    max(radius, 100 m), emitted as a WGS84 WKT POLYGON.

    The reference projects each point to a point-centered AEQD plane,
    buffers, and reprojects (transforms.py:410-453). For buffer radii
    ~100-5000 m the AEQD circle maps back to WGS84 as
      lat_i = lat + (r/R) * cos(az) * 180/pi
      lon_i = lon + (r/R) * sin(az) * 180/pi / cos(lat)
    (the small-circle local approximation, exact to < 1e-6 deg at these
    radii — same tangent-plane math AEQD uses at its origin). Vertices
    at n_vertices equally spaced azimuths, ring closed, 6-dp coords.

    Pure Catalyst expressions (transform over a sequence literal): no
    UDF, fully codegen'd, and portable to the SQL oracle. The ring
    itself is the shared ``functions.st.buffer_ring_wkt`` (also exposed
    as ``st_buffer_wkt`` in the ST_ façade).
    """
    from ..functions.st import buffer_ring_wkt

    la = F.col(lat).cast("double")
    lo = F.col(lon).cast("double")
    r = F.col(radius_m).try_cast("double")
    wkt = buffer_ring_wkt(
        F.col(lat), F.col(lon), F.col(radius_m), n_vertices, min_radius_m
    )
    inf = F.lit(float("inf"))
    # Non-finite lon or radius must quarantine to NULL, not pass the
    # guard: greatest(NaN, 100) is NaN under Spark's NaN-is-largest
    # ordering and inf propagates through the ring math, so either one
    # emits a garbage "POLYGON ((NaN Infinity, ..." row. (NaN/inf lat is
    # already rejected by the between().)
    valid = (
        la.isNotNull()
        & lo.isNotNull()
        & ~F.isnan(lo)
        & (F.abs(lo) != inf)
        & r.isNotNull()
        & ~F.isnan(r)
        & (F.abs(r) != inf)
        & la.between(-89.0, 89.0)
    )
    return df.withColumn(out_col, F.when(valid, wkt))


# ---------------------------------------------------------------------------
# P11: raster zonal statistics (grid raster, mapInPandas)


def grid_zonal_stats(
    df: DataFrame,
    lat: str,
    lon: str,
    radius_m: str,
    variables: list[str],
    out_prefix: str = "clim_",
    conversions: dict[str, str] | None = None,
) -> DataFrame:
    """P11: zonal mean of raster variables over the buffer disk.

    The reference masks a CHELSA GeoTIFF to the buffer polygon and takes
    the mean of unmasked cells with per-variable unit conversion
    (transforms.py:576-606). GeoTIFF I/O (rasterio) is not available in
    this container, so the raster is a DETERMINISTIC SYNTHETIC GRID:
    cell value for variable k at (lat, lon) =
        sin(floor(lat) + k) + cos(floor(lon) - k)
    sampled at the buffer centroid cell (the 1x1-degree grid is far
    coarser than the <=5 km buffers, so the masked-mean reduces to the
    single covering cell — same code path, deterministic values).
    Results rounded 2 (temp-style conversion, transforms.py:598-606).

    Plumbing is the real thing: mapInPandas over Arrow batches, schema
    widened with one double column per variable; swap `_cell_value` for
    a rasterio window read on a real deployment (clearly marked below).
    """
    in_schema = df.schema
    out_schema = StructType(
        list(in_schema.fields)
        + [StructField(f"{out_prefix}{v}", DoubleType(), True) for v in variables]
    )
    var_ks = {v: k for k, v in enumerate(variables)}

    def _cell_value(la: np.ndarray, lo: np.ndarray, k: int) -> np.ndarray:
        # STUB RASTER — replace with rasterio masked window read
        # (reference transforms.py:576-596) on a real deployment.
        return np.sin(np.floor(la) + k) + np.cos(np.floor(lo) - k)

    conv = conversions or {}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            la = pdf[lat].to_numpy(dtype=np.float64)
            lo = pdf[lon].to_numpy(dtype=np.float64)
            for v, k in var_ks.items():
                raw = _cell_value(la, lo, k)
                # CHELSA unit conversions (transforms.py:598-606): temp
                # vars x0.1 - 273.15 round 2; precip x0.1 round 0 (int);
                # raw vars round 2
                kind = conv.get(v, "raw")
                if kind == "temp":
                    out = np.round(raw * 0.1 - 273.15, 2)
                elif kind == "precip":
                    out = np.round(raw * 0.1, 0)
                else:
                    out = np.round(raw, 2)
                pdf[f"{out_prefix}{v}"] = out
            yield pdf

    return fan_out(df).mapInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------------------
# P12: polygon-zone intersection -> sorted distinct attribute values


def zone_annotation(
    spark: SparkSession,
    df: DataFrame,
    zones: list[dict],
    lat: str = "lat",
    lon: str = "lon",
    out_col: str = "zone_values",
) -> DataFrame:
    """P12: collect sorted-unique zone attribute values whose polygon
    contains the point (buffer∩zone in the reference reduces to the
    centroid cell test at these radii; transforms.py:780-799 collects
    sorted uniques). Rows intersecting no zone get an empty array —
    caller may drop them to mirror the reference's row-drop behavior.
    """
    bc = spark.sparkContext.broadcast(
        [(np.asarray(z["polygon"], dtype=np.float64), str(z["value"])) for z in zones]
    )

    @F.pandas_udf("array<string>")
    def _zones(lat_s: pd.Series, lon_s: pd.Series) -> pd.Series:
        la = lat_s.to_numpy(dtype=np.float64)
        lo = lon_s.to_numpy(dtype=np.float64)
        hits: list[list[str]] = [[] for _ in range(len(la))]
        for poly, val in bc.value:
            m = _ray_cast(la, lo, poly)
            for idx in np.nonzero(m)[0]:
                hits[idx].append(val)
        return pd.Series([sorted(set(h)) for h in hits])

    return fan_out(df).withColumn(out_col, _zones(F.col(lat), F.col(lon)))


# ---------------------------------------------------------------------------
# Range estimation: convex hull area per group (applyInPandas)


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; pts (n,2) -> hull vertices CCW (m,2)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while (
                len(out) >= 2
                and np.cross(out[-1] - out[-2], p - out[-2]) <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def convex_hull_range_km2(
    df: DataFrame,
    group_col: str,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Range estimate per group: convex hull of its points, area in km^2.

    The reference builds the hull in WGS84 then measures area in the
    EPSG:6933 equal-area CRS (transforms.py:923-928, /1e6 at :928). The
    same quantity computed without pyproj: shoelace area over
    equal-area-projected coordinates
        x = R * lon_rad,  y = R * sin(lat_rad)
    (the cylindrical equal-area projection underlying EPSG:6933, up to
    its standard-parallel x-scaling which cancels in relative terms; we
    use lambda0 = 0, phi1 = 0). Rounded 2, n_points = distinct coords.

    applyInPandas: one shuffle on the group key; each group collapses to
    a single output row, so the post-shuffle volume is |groups|.
    """
    out_schema = StructType(
        [
            df.schema[group_col],
            StructField("range_km2", DoubleType(), True),
            StructField("n_points", DoubleType(), True),
        ]
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        lo_raw = pdf[lon].to_numpy(dtype=np.float64)
        la_raw = pdf[lat].to_numpy(dtype=np.float64)
        # Quarantine non-finite coordinates (NULL/NaN/inf) instead of
        # letting them poison the whole group: NaN survives np.unique
        # (NaN != NaN), rides into the hull, and yields the
        # self-inconsistent row (range_km2=NULL, n_points counting the
        # garbage) — same class as the r12 WAV bug.
        ok = np.isfinite(lo_raw) & np.isfinite(la_raw)
        lo = np.radians(lo_raw[ok])
        la = np.radians(la_raw[ok])
        x = EARTH_RADIUS_M * lo
        y = EARTH_RADIUS_M * np.sin(la)
        pts = np.column_stack([x, y])
        hull = _convex_hull(pts)
        if len(hull) < 3:
            area = 0.0
        else:
            xs, ys = hull[:, 0], hull[:, 1]
            area = 0.5 * abs(
                float(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1)))
            )
        return pd.DataFrame(
            {
                group_col: [key[0]],
                "range_km2": [round(area / 1e6, 2)],
                "n_points": [float(len(np.unique(pts, axis=0)))],
            }
        )

    return df.select(group_col, lat, lon).groupBy(group_col).applyInPandas(
        kernel, schema=out_schema
    )

# ---------------------------------------------------------------------------
# Fixed-point convex hull metrics (oracle-graduated twin of
# convex_hull_range_km2): quantize coordinates to integer centi-degrees,
# so hull membership, vertex count, and the doubled shoelace area are
# EXACT int64 arithmetic — replayable in SQL by the O(n^2) hull-edge
# characterization (edge a->b iff every other point lies strictly left,
# or collinear strictly between a and b). Reference kernel:
# transforms.py:889-934 (hull + shoelace); this twin pins the exact
# integer invariants that the km^2 kernel's float path approximates.


def _hull_int(pts: "np.ndarray", assume_unique: bool = False) -> "np.ndarray":
    """Andrew monotone chain over int64 points -> strict hull CCW.

    Collinear boundary points are excluded (pop on cross <= 0), matching
    the SQL edge characterization's "strictly left OR strictly between"
    rule. len<=2 degenerates to the distinct point(s). Pass
    ``assume_unique`` when the caller already deduplicated (skips the
    O(n log n) re-dedup).
    """
    if not assume_unique:
        pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out: list = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def convex_hull_fixed_point(
    df: DataFrame,
    group_col: str,
    lat: str = "lat",
    lon: str = "lon",
    scale: int = 100,
) -> DataFrame:
    """Per-group exact hull metrics on integer fixed-point coordinates.

    Returns (group, n_pts, hull_vertices, area2_fp):
    - n_pts: distinct quantized points
    - hull_vertices: strict hull vertex count (1 point -> 1,
      collinear -> 2)
    - area2_fp: doubled shoelace area over the CCW hull cycle in
      quantized units^2 (exact int64; 0 for degenerate hulls)

    applyInPandas on the group key — same single-shuffle shape as
    convex_hull_range_km2; each group reduces to one row. The group
    column keeps its native type (the StructField is lifted from
    df.schema, like convex_hull_range_km2): the previous long cast
    silently nulled non-numeric keys and then raised a bare TypeError
    inside the pandas kernel.
    """
    group_field = df.schema[group_col]
    out_schema = StructType(
        [
            StructField(group_col, group_field.dataType, True),
            StructField("n_pts", LongType(), True),
            StructField("hull_vertices", LongType(), True),
            StructField("area2_fp", LongType(), True),
        ]
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        xraw = pdf[lon].to_numpy(dtype=np.float64)
        yraw = pdf[lat].to_numpy(dtype=np.float64)
        # Quarantine garbage coordinates BEFORE quantization: NaN casts
        # to INT64_MIN under .astype(int64), planting a fake dominant
        # hull vertex whose shoelace products then WRAP int64 — the
        # group's "exact" metrics come back plausible but wrong
        # (observed: 4/4/110000 vs the true 3/3/10000). The magnitude
        # bound is derived from `scale` so every QUANTIZED coordinate
        # stays <= 1e6 (at the default scale=100 that is |deg| <= 1e4,
        # 55x the WGS84 range) and the int64 shoelace can never
        # overflow: products <= 2e12, summed over <= millions of hull
        # vertices stays < 2^63. A literal 1e4 here would re-open the
        # silent-wrap hole for larger scales (e.g. scale=1e6 quantizes
        # |1e4| deg to |1e10|, whose cross-products exceed 2^63).
        max_abs = 1e6 / scale
        ok = (
            np.isfinite(xraw)
            & np.isfinite(yraw)
            & (np.abs(xraw) <= max_abs)
            & (np.abs(yraw) <= max_abs)
        )
        x = np.rint(xraw[ok] * scale).astype(np.int64)
        y = np.rint(yraw[ok] * scale).astype(np.int64)
        pts = np.unique(np.column_stack([x, y]), axis=0)
        hull = _hull_int(pts, assume_unique=True)
        m = len(hull)
        if m < 3:
            area2 = 0
        else:
            xs, ys = hull[:, 0], hull[:, 1]
            area2 = int(
                np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))
            )
        # key[0] passes through at its native type (Arrow round-trips
        # it); only numpy integer scalars need the int() coercion so
        # pandas doesn't widen them
        gval = key[0]
        if isinstance(gval, np.integer):
            gval = int(gval)
        return pd.DataFrame(
            {
                group_col: [gval],
                "n_pts": [len(pts)],
                "hull_vertices": [m],
                "area2_fp": [area2],
            }
        )

    return (
        df.select(group_col, lat, lon)
        .groupBy(group_col)
        .applyInPandas(kernel, schema=out_schema)
    )
