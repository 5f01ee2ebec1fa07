"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; salting is the explicit, plan-level tool for the cases
AQE can't fix — a skewed *aggregation* key, or a skewed join where
the hot key's rows must land on many partitions from the start.

Both operators are deterministic: the salt comes from xxhash64 of a
unique column (or the row's own payload), never from rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: partial aggregate
    on (key, salt) — spreading each hot key over ``n_salts``
    partitions — then final aggregate on the key.

    ``agg_exprs`` maps output column -> (source column, fn) with fn in
    'sum'|'count'|'min'|'max' (the re-aggregable functions; avg
    callers compose sum/count).
    """
    first = {
        "sum": F.sum,
        "count": lambda c: F.count(F.lit(1)),
        "min": F.min,
        "max": F.max,
    }
    second = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[first[fn](src).alias(f"__p_{out}") for out, (src, fn) in agg_exprs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[second[fn](f"__p_{out}").alias(out) for out, (src, fn) in agg_exprs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s join key is hot: the skewed side
    gets a deterministic salt in [0, n_salts); the other side is
    replicated n_salts times; the join runs on (key, salt), spreading
    each hot key across n_salts partitions.

    Cost: other side x n_salts (choose the SMALLER side as `other`).
    Result is identical to the plain join (asserted in tests)."""
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return s.join(o, [on, "__salt"], how).drop("__salt")
