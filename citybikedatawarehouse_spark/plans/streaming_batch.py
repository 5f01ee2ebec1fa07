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
