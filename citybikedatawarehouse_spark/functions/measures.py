"""Derived ride measures (SURVEY.md section 2.3 ops 26-29).

trip_duration: fractional seconds between two timestamps, computed by
casting to double (microsecond-precision epoch) — ``unix_timestamp``
would truncate sub-second fractions that the reference's
``.dt.total_seconds()`` keeps (check_and_create_db_v4.py:276).

speed: km/h = distance / (duration/3600). Engine-semantics note
(SURVEY section 7 risk register): pandas x/0 -> inf then coerced to 0;
Spark x/0 -> null then coerced to 0 — observable outputs converge and
a dedicated test pins that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def duration_seconds(started: Column | str, ended: Column | str) -> Column:
    """Elapsed seconds (double, fraction-preserving)."""
    started = F.col(started) if isinstance(started, str) else started
    ended = F.col(ended) if isinstance(ended, str) else ended
    return ended.cast("double") - started.cast("double")


def zero_coalesce(c: Column) -> Column:
    """Map null / NaN / +-inf to 0.0 — the observable result of the
    reference's ``fillna(0).replace([inf, -inf], 0)``
    (check_and_create_db_v4.py:280)."""
    return F.when(
        c.isNull() | F.isnan(c) | c.isin(float("inf"), float("-inf")), F.lit(0.0)
    ).otherwise(c)


def speed_kmh(distance_km: Column | str, duration_sec: Column | str) -> Column:
    """Speed in km/h with the reference's null/inf -> 0 coercion.

    ``try_divide`` because Spark 4 defaults to ANSI mode where /0
    raises; try_divide yields null, which zero_coalesce maps to 0 —
    same observable output as the reference's pandas inf -> 0 path.
    """
    d = F.col(distance_km) if isinstance(distance_km, str) else distance_km
    t = F.col(duration_sec) if isinstance(duration_sec, str) else duration_sec
    return zero_coalesce(F.try_divide(d, t / F.lit(3600.0)))
