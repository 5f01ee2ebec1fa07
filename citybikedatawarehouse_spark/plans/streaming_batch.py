"""Batch twins of the streaming-only operators, registered so the
oracle gate covers their logic (the stream execution itself is
exercised in tests/test_streaming.py — the transforms are shared,
stream/batch agnostic functions from streaming/windows.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


@register(
    "q90_stream_dedup_batch",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value FROM (
      SELECT event_id, ts, user_id, event_type, value,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY ts, user_id, event_type, value) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q90_stream_dedup_batch(spark, sf_dir):
    """Batch twin of dropDuplicatesWithinWatermark: keyed dedup on
    event_id with a pinned deterministic survivor."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("event_id").orderBy("ts", "user_id", "event_type", "value")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "q91_running_totals_batch",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q91_running_totals_batch(spark, sf_dir):
    """Batch twin of the applyInPandasWithState running totals: the
    final state per user equals the full-history aggregate."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q269_watermark_lateness",
    oracle="""
    WITH arr AS (
      SELECT ts,
             md5('arr:' || event_id) AS h
      FROM events
    ), shed AS (
      SELECT ts,
             substr(h, 1, 1) AS shard,
             max(ts) OVER (PARTITION BY substr(h, 1, 1)
                           ORDER BY substr(h, 2), ts
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS hwm
      FROM arr
    ), lat AS (
      SELECT CASE WHEN hwm IS NULL OR ts >= hwm THEN 0.0
                  ELSE epoch(hwm) - epoch(ts) END AS late_s
      FROM shed
    )
    SELECT CASE WHEN late_s = 0 THEN 'on-time'
                WHEN late_s <= 600 THEN '<=10m'
                WHEN late_s <= 3600 THEN '<=1h'
                WHEN late_s <= 86400 THEN '<=1d'
                ELSE '>1d' END AS lateness_band,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_s > 1800 THEN 1 ELSE 0 END)
                AS BIGINT) AS dropped_at_30m,
           CAST(round(max(late_s)) AS BIGINT) AS max_late_s
    FROM lat GROUP BY 1
    """,
)
def q269_watermark_lateness(spark, sf_dir):
    """Watermark-lateness profile — the tuning query you run BEFORE
    picking ``withWatermark``'s delay: replay events in a
    deterministic pseudo-arrival order (md5 of event_id — the
    testdata has no ingest timestamp, and a hash order models the
    out-of-orderness a multi-partition source delivers), track each
    shard's high-water mark (running max event time over arrivals so
    far), band every event by how far behind the shard HWM it
    arrived, and count what a 30-minute watermark would drop.

    Arrival is sharded 16 ways by the hash's first hex char exactly
    like source partitions shard a real stream (Spark's global
    watermark is the MIN over source partitions of each partition's
    max event time), so the running-max window is per-shard — 16
    parallel sequential scans, never one global ordered pass.

    Scale shape: one shuffle on the shard key (16 balanced
    hash-partitions), one per-shard ordered window, one 5-row
    aggregate. The output (lateness histogram + drop count per
    candidate delay) is O(bands); this is the batch profile that
    sizes state-store retention before the streaming job exists.
    """
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    h = F.md5(F.concat(F.lit("arr:"), F.col("event_id").cast("string")))
    arr = ev.select("ts", h.alias("h"))
    shard = F.substring("h", 1, 1)
    w = (
        W.partitionBy(shard)
        .orderBy(F.substring("h", 2, 32), "ts")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    shed = arr.select("ts", F.max("ts").over(w).alias("hwm"))
    late_s = F.when(
        F.col("hwm").isNull() | (F.col("ts") >= F.col("hwm")), F.lit(0.0)
    ).otherwise(
        F.col("hwm").cast("timestamp").cast("double")
        - F.col("ts").cast("timestamp").cast("double")
    )
    lat = shed.select(late_s.alias("late_s"))
    band = (
        F.when(F.col("late_s") == 0, "on-time")
        .when(F.col("late_s") <= 600, "<=10m")
        .when(F.col("late_s") <= 3600, "<=1h")
        .when(F.col("late_s") <= 86400, "<=1d")
        .otherwise(">1d")
    )
    return lat.groupBy(band.alias("lateness_band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_s") > 1800, 1).otherwise(0))
        .cast("bigint")
        .alias("dropped_at_30m"),
        F.round(F.max("late_s")).cast("bigint").alias("max_late_s"),
    )
