"""Geodesic helpers as pure column expressions.

The reference computes haversine distance client-side with numpy
(/root/reference/src/check_and_create_db_v4.py:300-313). Here it is a
single Catalyst column expression — JVM-side, whole-stage-codegen'd,
no UDF, so it vectorizes and scales with the cluster instead of the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column | str,
    lng1: Column | str,
    lat2: Column | str,
    lng2: Column | str,
) -> Column:
    """Great-circle distance in km between two (lat, lng) points.

    d = 2 R asin( sqrt( sin^2(dlat/2) + cos(lat1) cos(lat2) sin^2(dlng/2) ) )

    Null coordinates propagate to a null distance (the reference's
    pandas version yields NaN; downstream speed coercion maps both
    to 0 — SURVEY.md section 2.3 ops 28-29).
    """
    lat1, lng1, lat2, lng2 = (F.col(c) if isinstance(c, str) else c for c in (lat1, lng1, lat2, lng2))
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.pow(F.sin(dlat / F.lit(2.0)), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlng / F.lit(2.0)), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))
