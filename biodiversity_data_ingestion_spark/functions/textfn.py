"""Scalar text / geo column helpers (pure Catalyst expressions)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0  # reference: data_ingestion/.../cleaning_occs.py:120


def tokenize(text: Column) -> Column:
    """Whitespace tokenization of trimmed text -> array<string>.

    Mirrors the ', '.join / split string handling of the reference
    (beam/src/dependencies/utils/common_functions.py:8-22) generalized to
    token streams for the text-analysis extension ops.
    """
    return F.split(F.trim(text), r"\s+")


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters, R=6371000.

    Same formula as the reference's centroid filter
    (data_ingestion/src/dependencies/utils/cleaning_occs.py:107-127) but
    as a native SQL expression — whole-stage-codegen'd, usable inside a
    broadcast theta-join instead of a per-record Python loop.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2 * EARTH_RADIUS_M) * F.atan2(F.sqrt(a), F.sqrt(1 - a))
