"""As-of (most-recent-match) join as a composition of built-in ops.

Spark has no native ASOF JOIN. The naive formulations either explode
(join on key + range, then max per left row) or serialize (per-key
applyInPandas + merge_asof). This implementation uses the *union
trick*, which costs exactly one shuffle and scales linearly:

  1. Tag left and right rows, union them by (key, ts).
  2. Sort within each key by (ts, side) — right rows first on ties so
     ``left.ts >= right.ts`` is inclusive.
  3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
     running window carries the most recent right payload forward.
  4. Keep the left rows.

At 100 TB this is one hash repartition by key + an in-partition sort —
the same cost profile as a sort-merge join, with no risk of range
explosion. Skewed keys can be salted upstream if a single key's
timeline exceeds a partition.

Callers must pre-deduplicate the right side to one row per
(key, ts) — with duplicates the carried payload would be
order-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_KEY = "__asof_key"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """For each left row, attach the right-side payload of the latest
    right row with ``right.ts <= left.ts`` on the same key (left
    outer: unmatched left rows keep null payload)."""
    payload = [c for c in right_payload]
    l_tagged = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__p_{c}") for c in payload],
    )
    r_tagged = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(_KEY)
        .orderBy(_TS, _SIDE)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        F.col(_SIDE).alias(_SIDE),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in payload
        ],
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *left.columns, *[F.col(f"__f_{c}").alias(c) for c in payload]
    )
