"""Data-layout keys: Morton (Z-order) interleaving for
multi-dimensional clustering of files on disk.

Why this exists at 100 TB: parquet readers prune row groups on
min/max column statistics, but a table range-partitioned on ONE key
only prunes predicates on that key. Writing the table ordered by a
Z-ORDER key over the k hot filter columns keeps every file's min/max
box tight in ALL k dimensions, so a scan with a predicate on any of
them skips most files (the same trick Delta OPTIMIZE ZORDER BY and
Iceberg's sort orders use). The key itself is a pure Catalyst integer
expression — no UDF, no shuffle; the single pass that computes the
per-column min/max bounds is a 1-row aggregate broadcast back to the
scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of k non-negative integer
    columns into one BIGINT Morton code (column 0 owns bit positions
    0, k, 2k, ...). k * bits must be <= 63. The expression is a flat
    fold of shift/mask terms — whole-stage codegen keeps it JVM-side.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a BIGINT")
    acc = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(F.shiftleft(bit, j * k + i))
    return acc


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "z_key",
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Append a Z-order key over ``cols``: each column is first
    range-normalized to [0, 2^bits) with exact BIGINT arithmetic
    ((v - min) * (2^bits - 1) div (max - min), constant columns -> 0),
    then Morton-interleaved. Write the table sorted / range-
    partitioned by ``out_col`` (``df.repartitionByRange(out_col)``)
    to get multi-dimensional file pruning.

    The bounds pass is a single 1-row global aggregate joined back by
    broadcast — O(1) driver data, one extra scan (or zero if the
    caller supplies cached stats). Integer div keeps the bucket ids
    bit-exact across engines (no double rounding at bucket edges).

    Overflow safety: the proportional form ``(v - mn) * (2^bits - 1)``
    wraps (non-ANSI) once the column's range exceeds ~2^(63 - bits),
    so wide ranges switch to a bucket-width form that divides BEFORE
    subtracting — ``v div w - mn div w`` with
    ``w = mx div top - mn div top + 1`` — so neither ``v - mn`` nor
    ``mx - mn`` is ever materialized (those differences are exactly
    what overflows in this branch); same [0, 2^bits) codomain after
    the least() clamp, no wrap at any BIGINT range.
    """
    top = (1 << bits) - 1
    # widest range for which (v - mn) * top cannot exceed 2^63 - 1
    safe_range = ((1 << 63) - 1) // top
    if bounds is not None and all(c in bounds for c in cols):
        # caller-supplied bounds (e.g. from a table format's own
        # per-file zone stats): the bounds pass — a full aggregate
        # scan of df per write — disappears entirely. Supplied
        # bounds may be WIDER than the data (never narrower): the
        # normalization stays monotone and in-codomain, only bucket
        # resolution softens.
        joined = df
        for c in cols:
            mn, mx = bounds[c]
            joined = joined.withColumn(
                f"__mn_{c}", F.lit(int(mn)).cast("long")
            ).withColumn(f"__mx_{c}", F.lit(int(mx)).cast("long"))
    else:
        agg_bounds = df.agg(
            *[
                f
                for c in cols
                for f in (
                    F.min(F.col(c).cast("long")).alias(f"__mn_{c}"),
                    F.max(F.col(c).cast("long")).alias(f"__mx_{c}"),
                )
            ]
        )
        joined = df.crossJoin(F.broadcast(agg_bounds))
    scaled = [
        F.when(
            F.col(f"__mx_{c}") == F.col(f"__mn_{c}"), F.lit(0).cast("long")
        )
        .when(
            # try_subtract: a range beyond BIGINT yields null (not an
            # ANSI overflow error) and falls through to the safe branch
            F.try_subtract(F.col(f"__mx_{c}"), F.col(f"__mn_{c}"))
            <= F.lit(safe_range),
            F.expr(
                f"(CAST({c} AS BIGINT) - __mn_{c}) * {top} "
                f"div (__mx_{c} - __mn_{c})"
            ),
        )
        .otherwise(
            # bucket-width form, dividing BEFORE subtracting so neither
            # (v - mn) nor (mx - mn) is ever materialized; width
            # w = mx/top - mn/top + 1 > range/top keeps the quotient
            # monotone in v, and the least() clamp pins the codomain
            # to [0, 2^bits) against truncating-div corner cases
            F.least(
                F.lit(top).cast("long"),
                F.expr(
                    f"CAST({c} AS BIGINT) "
                    f"div (__mx_{c} div {top} - __mn_{c} div {top} + 1) "
                    f"- __mn_{c} "
                    f"div (__mx_{c} div {top} - __mn_{c} div {top} + 1)"
                ),
            )
        )
        for c in cols
    ]
    return joined.withColumn(out_col, morton_interleave(scaled, bits)).drop(
        *[f"__{b}_{c}" for c in cols for b in ("mn", "mx")]
    )
