"""Geodesic helpers.

The reference computes line lengths as geodesic distance between region
centroids (generate_intermediate_files.py:496-501, geopy). We use the
haversine great-circle formula as a pure Column expression — JVM-side
trig inside codegen, no Python in the loop. Centroids for the synthetic
nations are derived deterministically from the nation key so the oracle
can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def synth_lat(key: Column) -> Column:
    """Deterministic pseudo-centroid latitude in [-70, 70)."""
    return (key * 7 % 140) - 70


def synth_lon(key: Column) -> Column:
    """Deterministic pseudo-centroid longitude in [-170, 170)."""
    return (key * 23 % 340) - 170


SYNTH_LAT_SQL = "(({k} * 7) % 140 - 70)"
SYNTH_LON_SQL = "(({k} * 23) % 340 - 170)"


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )
