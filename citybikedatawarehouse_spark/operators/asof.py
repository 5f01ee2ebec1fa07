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
    strategy: str = "auto",
    n_buckets: int = 64,
    skew_threshold: int = 2_000_000,
    sample_fraction: float = 0.01,
) -> DataFrame:
    """For each left row, attach the right-side payload of the latest
    right row with ``right.ts <= left.ts`` on the same key (left
    outer: unmatched left rows keep null payload).

    The single public entry point; ``strategy`` picks the physical
    shape (both are semantically identical — equivalence-tested on
    skewed and unskewed inputs in tests):

      * ``"plain"`` — one window per key. Cheapest when no single
        key's timeline exceeds a task (the bucketed variant measures
        ~2x constant overhead on unskewed data).
      * ``"bucketed"`` — window per (key, time-bucket) + cross-bucket
        carry; parallelism is keys x buckets, so one hot key can't
        pin a task.
      * ``"auto"`` (default) — decision by measurement, the way a
        range partitioner samples: ONE seeded ``sample_fraction``
        sample of the key columns (left+right share the window
        partition), aggregated once for both the extrapolated total
        and the extrapolated hottest-key count; bucketed iff the
        hottest key extrapolates above ``skew_threshold`` rows. One
        plan-build job over the key column only (an earlier shape
        ran a count job plus a sample job — two full key-column
        passes per call); callers that know their skew should pass
        the strategy explicitly and pay zero.
    """
    if strategy not in ("auto", "plain", "bucketed"):
        raise ValueError(f"unknown asof strategy: {strategy}")
    if strategy == "bucketed":
        return asof_join_bucketed(
            left, right, left_on, right_on, left_ts, right_ts, right_payload,
            n_buckets=n_buckets,
        )
    if strategy == "auto":
        keys = left.select(F.col(left_on).alias("__k")).unionAll(
            right.select(F.col(right_on).alias("__k"))
        )
        frac = min(1.0, max(sample_fraction, 0.0)) or 1.0
        # single job: per-key sample counts, max-combined — the
        # hottest key in a Bernoulli sample extrapolates by 1/frac.
        # A key must show >= skew_threshold * frac sampled rows to
        # trip the gate; at the default 1% that is >= 20k sampled
        # rows for a 2M-row key — far beyond sampling noise.
        hottest = (
            keys.sample(fraction=frac, seed=7)
            .groupBy("__k")
            .count()
            .agg(F.max("count"))
            .first()[0]
            or 0
        )
        if hottest / frac > skew_threshold:
            return asof_join_bucketed(
                left, right, left_on, right_on, left_ts, right_ts,
                right_payload, n_buckets=n_buckets,
            )
    payload = [c for c in right_payload]
    # a null right ts would sort nulls-first and be carried to every
    # left row as if infinitely early, but "right.ts <= left.ts" can
    # never match a null — drop null-ts/null-key right rows up front
    right = right.filter(F.col(right_ts).isNotNull() & F.col(right_on).isNotNull())
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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Skew-robust as-of join: same semantics as :func:`asof_join`,
    but the running-fill window partitions on (key, time-bucket)
    instead of key alone, so parallelism is keys x buckets — a hot
    key whose timeline dwarfs the others no longer pins a single
    task. A second, tiny window over the per-(key, bucket) summaries
    carries the last payload across bucket boundaries, and a final
    coalesce patches rows that precede their bucket's first match.

    Cost: one extra aggregation + one window + one join, all over
    keys x buckets rows (thousands, not billions) — the big table is
    still shuffled exactly once. Bucket width derives from the left
    table's observed ts range (one min/max scan at plan-build time,
    the same kind of sampling a range partitioner does).
    """
    payload = [c for c in right_payload]
    # same null hygiene as asof_join — keeps the two variants
    # semantically identical (a null right ts must match nothing, not
    # land in a null bucket)
    right = right.filter(F.col(right_ts).isNotNull() & F.col(right_on).isNotNull())
    rdt = dict(right.dtypes)
    ldt = dict(left.dtypes)

    def _epoch(col_name: str, dtype: str):
        c = F.col(col_name)
        # TIMESTAMP_NTZ has no direct numeric cast — hop through LTZ
        # (session tz is pinned UTC, so the epoch is unambiguous)
        if dtype.startswith("timestamp_ntz"):
            c = c.cast("timestamp")
        return c.cast("double")

    bounds = left.agg(
        F.min(_epoch(left_ts, ldt[left_ts])).alias("lo"),
        F.max(_epoch(left_ts, ldt[left_ts])).alias("hi"),
    ).first()
    lo = bounds["lo"] or 0.0
    width = ((bounds["hi"] or 0.0) - lo) / n_buckets
    if width <= 0:
        return asof_join(
            left, right, left_on, right_on, left_ts, right_ts, right_payload,
            strategy="plain",
        )

    def bucket(ts_col: str, dtype: str):
        return F.floor((_epoch(ts_col, dtype) - F.lit(lo)) / F.lit(width))

    pay_struct = F.struct(*[F.col(c).alias(c) for c in payload])
    null_pay = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{rdt[c]}" for c in payload) + ">"
    )
    l_tagged = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_ts).alias(_TS),
        bucket(left_ts, ldt[left_ts]).alias("__b"),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns],
        null_pay.alias("__pay"),
    )
    r_tagged = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_ts).alias(_TS),
        bucket(right_ts, rdt[right_ts]).alias("__b"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in left.columns],
        pay_struct.alias("__pay"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w_in = (
        W.partitionBy(_KEY, "__b")
        .orderBy(_TS, _SIDE)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        F.col(_KEY).alias(_KEY),
        F.col("__b").alias("__b"),
        F.col(_SIDE).alias(_SIDE),
        F.col(_TS).alias(_TS),
        F.last("__pay", ignorenulls=True).over(w_in).alias("__f"),
    )
    # last carried payload per (key, bucket): the max (ts, side) row's
    # fill — one small aggregate, then a tiny per-key window carries
    # it across bucket gaps (buckets with no right rows inherit).
    summary = filled.groupBy(_KEY, "__b").agg(
        F.max_by("__f", F.struct(_TS, _SIDE)).alias("__bucket_last")
    )
    w_carry = (
        W.partitionBy(_KEY)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = summary.select(
        _KEY,
        "__b",
        F.last("__bucket_last", ignorenulls=True).over(w_carry).alias("__prev"),
    )
    patched = (
        filled.filter(F.col(_SIDE) == 1)
        .join(carry, [_KEY, "__b"], "left")
        .withColumn("__pf", F.coalesce("__f", "__prev"))
    )
    return patched.select(
        *left.columns, *[F.col("__pf")[c].alias(c) for c in payload]
    )
