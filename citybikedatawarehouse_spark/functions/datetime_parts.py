"""Datetime decomposition (SURVEY.md section 2.3 op 25).

The reference extracts year/quarter/month/iso-week/day/hour/minute/
second via pandas ``.dt`` accessors (check_and_create_db_v4.py:201-208).
Spark equivalents are all built-in; ``weekofyear`` is ISO-8601, same
as pandas ``isocalendar().week``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PART_FUNCS: dict[str, callable] = {
    "year": F.year,
    "quarter": F.quarter,
    "month": F.month,
    "week": F.weekofyear,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
}


def date_part(part: str, ts: Column | str) -> Column:
    ts = F.col(ts) if isinstance(ts, str) else ts
    return PART_FUNCS[part](ts).cast("int")


def with_date_parts(
    df: DataFrame,
    ts_col: str,
    parts: tuple[str, ...] = tuple(PART_FUNCS),
    prefix: str = "",
) -> DataFrame:
    """Append the requested integer date-part columns for ``ts_col``."""
    return df.withColumns({f"{prefix}{p}": date_part(p, ts_col) for p in parts})
