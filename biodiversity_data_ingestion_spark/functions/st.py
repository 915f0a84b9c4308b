"""ST_-style spatial column functions (PostGIS/Sedona spelling).

A façade over the engine's geo kernels giving users the familiar
`ST_*` vocabulary as PURE Catalyst column expressions — no UDF, fully
whole-stage-codegen'd, portable to SQL oracles. The pandas-UDF /
mapInPandas kernels in ``operators/geo.py`` remain the path for
polygon COLUMNS and raster work (reference transforms.py:410-453,
cleaning_occs.py:81-120); these functions cover the far more common
case where the geometry argument is a broadcast-side literal (the
reference's side-input polygons) or a per-row point.

Where the same math exists in both layers they share one
implementation (``buffer_ring_wkt`` backs ``operators.geo.buffer_wkt``)
or are asserted value-equal by tests (``st_within`` vs the numpy
ray-cast kernel).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .textfn import haversine_m

EARTH_RADIUS_M = 6371000.0  # cleaning_occs.py:120


def st_point_wkt(lon: Column, lat: Column, precision: int = 6) -> Column:
    """WKT ``POINT (x y)`` from lon/lat columns (printf formatting — no
    locale separators, portable to SQL oracles)."""
    fmt = f"POINT (%.{precision}f %.{precision}f)"
    return F.format_string(fmt, lon.cast("double"), lat.cast("double"))


def st_x(point_wkt: Column) -> Column:
    """X (lon) of a WKT POINT."""
    return F.regexp_extract(point_wkt, r"POINT \(([-0-9.]+) ", 1).cast("double")


def st_y(point_wkt: Column) -> Column:
    """Y (lat) of a WKT POINT."""
    return F.regexp_extract(point_wkt, r"POINT \([-0-9.]+ ([-0-9.]+)\)", 1).cast(
        "double"
    )


def st_distance_sphere(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters (haversine, R=6371 km — the
    reference's constant, cleaning_occs.py:120)."""
    return haversine_m(lat1, lon1, lat2, lon2)


def st_dwithin(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column, meters: float
) -> Column:
    """True when two points are within ``meters`` on the sphere."""
    return haversine_m(lat1, lon1, lat2, lon2) <= F.lit(float(meters))


def st_within(
    lat: Column, lon: Column, polygon: list[tuple[float, float]]
) -> Column:
    """Even-odd ray-cast point-in-polygon against a LITERAL (lon, lat)
    ring — convex or not, open or closed.

    The loop is unrolled at plan-build time into a chain of XOR'd
    half-open edge tests (identical arithmetic to the vectorized numpy
    kernel ``operators.geo._ray_cast``, including the 1e-300 division
    guard — equality asserted by test_st_within_matches_ray_cast_kernel).
    k edges → k codegen'd predicates; no UDF, no shuffle.
    """
    x, y = lon.cast("double"), lat.cast("double")
    poly = list(polygon)
    if poly[0] == poly[-1] and len(poly) > 1:
        poly = poly[:-1]  # open the ring; the loop closes it
    inside = F.lit(False)
    k = len(poly)
    j = k - 1
    for i in range(k):
        xi, yi = float(poly[i][0]), float(poly[i][1])
        xj, yj = float(poly[j][0]), float(poly[j][1])
        crosses = (F.lit(yi) > y) != (F.lit(yj) > y)
        xin = F.lit(xj - xi) * (y - F.lit(yi)) / F.lit(yj - yi + 1e-300) + F.lit(xi)
        inside = F.when(crosses & (x < xin), ~inside).otherwise(inside)
        j = i
    return inside


def st_within_any(
    lat: Column, lon: Column, polygons: list[list[tuple[float, float]]]
) -> Column:
    """True when the point is inside ANY of the literal rings (the
    multi-polygon side-input shape of the reference's sea filter)."""
    acc = F.lit(False)
    for poly in polygons:
        acc = acc | st_within(lat, lon, poly)
    return acc


def buffer_ring_wkt(
    lat: Column,
    lon: Column,
    radius_m: Column,
    n_vertices: int = 16,
    min_radius_m: float = 100.0,
) -> Column:
    """WKT POLYGON ring of the ``max(radius, min_radius)`` circular
    buffer around (lat, lon) — the tangent-plane AEQD approximation the
    reference uses (transforms.py:410-453), as a pure expression.

    Shared implementation: ``operators.geo.buffer_wkt`` (the P10
    operator) delegates here, and ``st_buffer_wkt`` is its ST_ alias.
    """
    r = F.greatest(radius_m.try_cast("double"), F.lit(min_radius_m))
    la, lo = lat.cast("double"), lon.cast("double")
    deg = 180.0 / math.pi
    ang = r / F.lit(EARTH_RADIUS_M) * F.lit(deg)

    def vertex(i: Column) -> Column:
        az = i.cast("double") * F.lit(2.0 * math.pi / n_vertices)
        vlat = la + ang * F.cos(az)
        vlon = lo + ang * F.sin(az) / F.cos(F.radians(la))
        return F.format_string("%.6f %.6f", vlon, vlat)

    ring = F.transform(
        F.sequence(F.lit(0), F.lit(n_vertices)), lambda i: vertex(i % n_vertices)
    )
    return F.concat(F.lit("POLYGON (("), F.array_join(ring, ", "), F.lit("))"))


st_buffer_wkt = buffer_ring_wkt
