"""Temporal operators: datetime decomposition, durations, tumbling /
sliding window aggregation, sessionization, as-of join.

Maps SURVEY.md section 2.3 ops 24-26 (timestamp parse, date-part
extraction, duration) onto the testdata tables, and adds the
streaming-shaped aggregations of section 2.4 in their batch form (the
same plans run under Structured Streaming — see streaming/windows.py;
batch keeps them oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.datetime_parts import date_part
from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


@register(
    "q32_date_parts",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)       AS y,
           CAST(quarter(o_orderdate) AS INTEGER)    AS q,
           CAST(month(o_orderdate) AS INTEGER)      AS m,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(day(o_orderdate) AS INTEGER)        AS d,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q32_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime decomposition (reference: pandas .dt accessors,
    check_and_create_db_v4.py:201-208); weekofyear is ISO-8601 in
    both engines."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            date_part("year", "o_orderdate").alias("y"),
            date_part("quarter", "o_orderdate").alias("q"),
            date_part("month", "o_orderdate").alias("m"),
            date_part("week", "o_orderdate").alias("iso_week"),
            date_part("day", "o_orderdate").alias("d"),
            "o_totalprice",
        )
        .groupBy("y", "q", "m", "iso_week", "d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "q33_time_parts",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER)   AS h,
           CAST(minute(ts) AS INTEGER) AS mi,
           CAST(second(ts) AS INTEGER) AS s,
           count(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q33_time_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            date_part("hour", "ts").alias("h"),
            date_part("minute", "ts").alias("mi"),
            date_part("second", "ts").alias("s"),
        )
        .groupBy("h", "mi", "s")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q34_epoch_duration",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           epoch(l.l_shipdate) - epoch(o.o_orderdate) AS wait_seconds,
           CAST(floor((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 86400) AS BIGINT) AS wait_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q34_epoch_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp difference as fraction-preserving seconds — the
    reference's .dt.total_seconds() (check_and_create_db_v4.py:276):
    cast-to-double epoch arithmetic, not unix_timestamp (which would
    truncate sub-second precision)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    wait = F.col("l_shipdate").cast("timestamp").cast("double") - F.col(
        "o_orderdate"
    ).cast("timestamp").cast("double")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        wait.alias("wait_seconds"),
        F.floor(wait / 86400).cast("bigint").alias("wait_days"),
    )


@register(
    "q35_tumbling_window",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q35_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation — the batch form of the
    Structured Streaming plan in streaming/windows.py (F.window
    aligns buckets to the epoch, same as floor(epoch/300))."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "q36_sliding_window",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300 - off) AS TIMESTAMP) AS window_start,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events CROSS JOIN (VALUES (0), (300)) t(off)
    GROUP BY 1
    """,
)
def q36_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 minutes: each event lands in
    exactly two windows."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


@register(
    "q37_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q37_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + cumulative sum — the
    batch twin of streaming session_window."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("double") - F.lag(
        F.col("ts").cast("timestamp").cast("double")
    ).over(w)
    flagged = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "q38_asof_join",
    oracle="""
    WITH quotes AS (
      SELECT o_custkey, o_orderdate, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           q.o_orderdate AS asof_date, q.o_totalprice AS asof_price
    FROM events e
    ASOF LEFT JOIN quotes q
      ON e.user_id = q.o_custkey AND e.ts >= q.o_orderdate
    """,
)
def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY 2.4): implemented
    with the scalable union trick in operators/asof.py — one shuffle,
    no per-row lookups; oracle uses DuckDB's native ASOF JOIN."""
    from citybikedatawarehouse_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    # deterministic right side: one row per (key, ts) — latest orderkey
    # wins. max(struct) hash-aggregates in one pass (partial+final);
    # a row_number window here would cost an extra full sort.
    quotes = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max(F.struct("o_orderkey", "o_totalprice"))["o_totalprice"].alias(
            "o_totalprice"
        )
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        quotes,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=("o_orderdate", "o_totalprice"),
        # this catalog entry IS the plain variant (q39 is the bucketed
        # twin); API users get strategy="auto"
        strategy="plain",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderdate").alias("asof_date"),
        F.col("o_totalprice").alias("asof_price"),
    )


@register(
    "q39_asof_join_bucketed",
    oracle="""
    WITH quotes AS (
      SELECT o_custkey, o_orderdate, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           q.o_orderdate AS asof_date, q.o_totalprice AS asof_price
    FROM events e
    ASOF LEFT JOIN quotes q
      ON e.user_id = q.o_custkey AND e.ts >= q.o_orderdate
    """,
)
def q39_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-robust as-of join (same semantics and oracle as q38): the
    running-fill window partitions on (key, time-bucket) so one hot
    key's timeline spreads across tasks — the plan that survives a
    single user with a billion events. See
    operators/asof.asof_join_bucketed."""
    from citybikedatawarehouse_spark.operators.asof import asof_join_bucketed

    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    quotes = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max(F.struct("o_orderkey", "o_totalprice"))["o_totalprice"].alias(
            "o_totalprice"
        )
    )
    joined = asof_join_bucketed(
        ev.select("event_id", "user_id", "ts"),
        quotes,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=("o_orderdate", "o_totalprice"),
        n_buckets=64,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderdate").alias("asof_date"),
        F.col("o_totalprice").alias("asof_price"),
    )


@register(
    "q267_interval_islands",
    oracle="""
    WITH iv AS (
      SELECT o_custkey AS cust,
             o_orderdate AS s,
             o_orderdate + INTERVAL 30 DAY AS e,
             o_orderkey AS k
      FROM orders
    ), flagged AS (
      SELECT cust, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
      WINDOW w AS (PARTITION BY cust ORDER BY s, e, k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), numbered AS (
      SELECT cust, s, e,
             sum(new_island) OVER (
               PARTITION BY cust ORDER BY s, e,
               new_island DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM flagged
    ), islands AS (
      SELECT cust, island,
             min(s) AS island_start, max(e) AS island_end,
             count(*) AS n_orders
      FROM numbered GROUP BY cust, island
    )
    SELECT cust AS c_custkey,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(date_diff('day', island_start, island_end))
                AS BIGINT) AS covered_days,
           CAST(max(date_diff('day', island_start, island_end))
                AS BIGINT) AS max_island_days,
           CAST(max(n_orders) AS BIGINT) AS max_island_orders
    FROM islands GROUP BY cust
    """,
)
def q267_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merge: every order opens a 30-day
    service interval; overlapping/touching intervals per customer
    merge into maximal "islands" of continuous coverage, and the
    query reports per-customer island count, total covered days, and
    the longest island. The classic interval-coalescing operator
    (billing coverage, sensor uptime, subscription stitching) — a
    different shape from q37's point-event sessionization (fixed gap
    between POINTS) because intervals can swallow later-starting,
    earlier-ending neighbors, so the island flag needs a running MAX
    of interval ends, not a lag of the previous point.

    Plan: one shuffle on the customer key, then two per-customer
    sort windows (running max-end, running island counter) and two
    hash aggregations — O(n) per customer, no self-join (the naive
    interval-overlap join is quadratic per key and unbounded on hot
    keys). At 100 TB this partitions by customer exactly like the
    rest of the per-key window family; a single pathological key
    with millions of intervals would bucket the window by coarse
    time range first (same remedy as q39's bucketed as-of).

    Window-order subtlety shared with the oracle: within a (cust, s)
    tie the island flag is order-sensitive row-by-row, but the
    MERGED islands are not — any s-ordering yields the same island
    partition; the cumulative-sum window orders new_island DESC
    within ties so the island-opening row numbers its own island on
    both engines.
    """
    o = _t(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("e"),
        F.col("o_orderkey").alias("k"),
    )
    w_prev = (
        W.partitionBy("cust")
        .orderBy("s", "e", "k")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "cust",
        "s",
        "e",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_cum = (
        W.partitionBy("cust")
        .orderBy(F.col("s"), F.col("e"), F.col("new_island").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    numbered = flagged.select(
        "cust", "s", "e", F.sum("new_island").over(w_cum).alias("island")
    )
    islands = numbered.groupBy("cust", "island").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return islands.groupBy(F.col("cust").alias("c_custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.datediff("island_end", "island_start"))
        .cast("bigint")
        .alias("covered_days"),
        F.max(F.datediff("island_end", "island_start"))
        .cast("bigint")
        .alias("max_island_days"),
        F.max("n_orders").cast("bigint").alias("max_island_orders"),
    )
