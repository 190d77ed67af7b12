"""Geo helpers (SURVEY.md §2.9 geo row).

Reference: ``GeoUtils.java`` (252 LoC,
``official-tutorial/src/main/java/.../utils/GeoUtils.java``): NYC
bounding-box membership (lon -74.05..-73.7, lat 40.5..41.0,
GeoUtils.java:31-34), grid-cell id mapping, and Euclidean distance —
used by RideCleansing (``RideCleansingSolution.scala:16``) and the
taxi exercises.

All pure column arithmetic (JVM codegen) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LON_EAST = -73.7
LON_WEST = -74.05
LAT_NORTH = 41.0
LAT_SOUTH = 40.5
DELTA_LON = 0.0014  # ~100m grid, GeoUtils.java:38-42
DELTA_LAT = 0.00125
NUMBER_OF_GRID_X = 250


def is_in_nyc(lon: Column, lat: Column) -> Column:
    """GeoUtils.isInNYC (GeoUtils.java:60)."""
    return (
        (lon <= F.lit(LON_EAST))
        & (lon >= F.lit(LON_WEST))
        & (lat <= F.lit(LAT_NORTH))
        & (lat >= F.lit(LAT_SOUTH))
    )


def grid_cell(lon: Column, lat: Column) -> Column:
    """GeoUtils.mapToGridCell: x + y * grid_width."""
    x = F.floor((LON_EAST - lon) / F.lit(DELTA_LON)).cast("int")
    y = F.floor((LAT_NORTH - lat) / F.lit(DELTA_LAT)).cast("int")
    return (x + y * F.lit(NUMBER_OF_GRID_X)).cast("int")


def euclidean_km(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Equirectangular approximation (GeoUtils getEuclideanDistance)."""
    deg_len = 110.25  # km per degree latitude
    x = lat2 - lat1
    y = (lon2 - lon1) * F.cos(F.radians(lat1))
    return F.lit(deg_len) * F.sqrt(x * x + y * y)
