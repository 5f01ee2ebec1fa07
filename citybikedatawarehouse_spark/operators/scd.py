"""Slowly-changing-dimension type-2 merge, without Delta/Iceberg.

The reference replaces dimensions wholesale on every run
(`to_sql(if_exists='replace')`, check_and_create_db_v4.py:295) —
history is lost. This operator gives the warehouse an upsert-with-
history story using only batch primitives (MERGE INTO needs a
transactional table format; the jars aren't in this environment, so
the emulation is the documented pattern: anti-join + union):

  current dimension (id, attrs..., valid_from, valid_to, is_current)
  + updates (id, attrs..., effective_ts)
  ->
  * unchanged rows pass through
  * changed rows: old version closed (valid_to = effective_ts,
    is_current = false) + new version opened
  * brand-new ids: opened

Deterministic, idempotent for identical updates (a re-applied update
with identical attributes produces no new version). One shuffle on
the business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 23:59:59"


def scd2_init(snapshot: DataFrame, key: str, effective_ts: str) -> DataFrame:
    """Bootstrap an SCD2 dimension from a first snapshot."""
    return snapshot.select(
        "*",
        F.col(effective_ts).alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).drop(effective_ts)


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_ts: str,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``updates`` must carry one row per key (pre-deduplicate upstream
    with a max_by on the effective timestamp)."""
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    u = updates.select(
        F.col(key),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(effective_ts).alias("__eff"),
    )
    joined = cur.join(u, key, "left")
    changed_pred = F.coalesce(
        ~F.struct(*[F.col(a) for a in attrs]).eqNullSafe(
            F.struct(*[F.col(f"__u_{a}").alias(a) for a in attrs])
        ),
        F.lit(False),
    )

    # current rows with no update or identical attrs: pass through
    untouched = joined.filter(F.col("__eff").isNull() | ~changed_pred).select(
        dim.columns
    )
    # changed: close the old version ...
    closed = (
        joined.filter(F.col("__eff").isNotNull() & changed_pred)
        .withColumn("valid_to", F.col("__eff"))
        .withColumn("is_current", F.lit(False))
        .select(dim.columns)
    )
    # ... and open the new one
    opened = (
        joined.filter(F.col("__eff").isNotNull() & changed_pred)
        .select(
            F.col(key),
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            F.col("__eff").alias("valid_from"),
            F.lit(OPEN_END).cast("timestamp_ntz").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(dim.columns)
    )
    # ids never seen before
    new_ids = (
        u.join(cur, key, "left_anti")
        .select(
            F.col(key),
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            F.col("__eff").alias("valid_from"),
            F.lit(OPEN_END).cast("timestamp_ntz").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(dim.columns)
    )
    return hist.unionByName(untouched).unionByName(closed).unionByName(opened).unionByName(new_ids)
