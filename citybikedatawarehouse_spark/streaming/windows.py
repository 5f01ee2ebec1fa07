"""Structured Streaming surface (SURVEY.md section 2.4 — the
reference's only incremental story is batch re-runs with
``if_exists='append'``; here the same windowed plans run as real
streams).

Every transform below is *stream/batch agnostic*: it takes a
DataFrame (from ``readStream`` or ``read``) and returns the
transformed DataFrame. The batch twins are registered as oracle
queries (plans/temporal.py q35-q37); streaming execution, watermarks,
late-data drops, and stateful processing are exercised in
tests/test_streaming.py via the memory sink.

Scale notes: streaming aggregations shuffle by (window, key) exactly
like their batch twins; state store size is bounded by the watermark
horizon (10 min here), so executors hold state proportional to
active windows, not history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        # LTZ, not NTZ: EventTimeWatermark requires TIMESTAMP; with the
        # engine's pinned-UTC session the wall values are identical
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over events-shaped parquet (schema
    declared: streaming sources never infer)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """5-minute tumbling count/sum per event type — the streaming
    twin of plans/temporal.q35; watermark bounds state and drops
    late rows beyond it."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


def sliding_avgs(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window average — twin of q36."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Native session windows (gap-merged) per user — the streaming
    counterpart of the lag/cumsum batch sessionization (q37)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id: state holds ids only inside
    the watermark horizon (bounded memory — the streaming form of the
    reference's drop_duplicates)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("total", T.DoubleType(), True),
    ]
)
RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum) across micro-batches — the escape hatch for
    operators windowed aggregation can't express."""

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def watermark_admitted(
    events: DataFrame,
    ts_col: str = "ts",
    batch_col: str = "batch_idx",
    window: str = "1 hour",
    delay: str = "30 minutes",
) -> DataFrame:
    """BATCH replay of Structured Streaming's per-microbatch
    watermark admission — returns exactly the rows a streaming
    windowed aggregation with ``withWatermark(ts, delay)`` would
    aggregate, given the microbatch assignment in ``batch_col``.

    Spark's contract (this is what q269's lateness profile predicts,
    now made executable): since SPARK-40925 (3.4+) a stateful
    operator carries TWO watermarks per microbatch — late-event
    FILTERING uses the watermark from the PREVIOUS microbatch, while
    state EVICTION uses the current one (the plan prints both on
    StateStoreSave). So a row of batch k reaches the aggregation
    state iff its WINDOW END is past ``max event time over batches
    <= k-2, minus delay`` (monotone, starts at -inf) — one batch
    laggier than the naive single-watermark model, which this twin's
    first implementation used and which over-predicts drops
    (verified against a live stream's numRowsDroppedByWatermark).

    Scale shape: the per-batch max is a map-side-combinable groupBy
    producing |batches| rows; the running max is a window over that
    tiny relation; the admission filter is a broadcast join back.
    Nothing beyond the original scan is corpus-scale.
    """
    from pyspark.sql import Window as W

    per_batch = events.groupBy(F.col(batch_col)).agg(
        F.max(ts_col).alias("__m")
    )
    # -2, not -1: the late-event watermark lags eviction by one batch
    prev = (
        W.orderBy(batch_col)
        .rowsBetween(W.unboundedPreceding, -2)
    )
    wm_rel = per_batch.select(
        batch_col,
        (
            F.max("__m").over(prev)
            - F.expr(f"INTERVAL {delay}")
        ).alias("__wm"),
    )
    win_end = F.window(F.col(ts_col), window)["end"]
    return (
        events.join(F.broadcast(wm_rel), batch_col)
        .where(F.col("__wm").isNull() | (win_end > F.col("__wm")))
        .drop("__wm")
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming DataFrame into an in-memory table and block
    until all available input is processed. Returns the query handle
    (caller stops it)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def run_foreach_batch_parquet(df: DataFrame, out_dir: str):
    """Exactly-once-style file sink via foreachBatch: each micro-batch
    lands in an epoch-named subdirectory, so a replayed epoch
    overwrites its own output instead of duplicating it (the
    idempotent-sink pattern for stores without transactional commit).
    Returns the started query (caller processes/stops)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return df.writeStream.foreachBatch(sink).start()


def enrich_stream_static(events: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """Stream-static join: each micro-batch joins against the (lazily
    re-read) static side — the streaming twin of the reference's
    dimension enrichment joins. Broadcast chosen by size as in batch."""
    return events.join(dim, on, how)


def stream_stream_self_join(
    events: DataFrame, window_seconds: int = 600, watermark: str = "10 minutes"
) -> DataFrame:
    """Stream-stream join with event-time bounds: pairs of events by
    the same user within ``window_seconds`` (a < b). Both sides need
    watermarks + a time-interval condition so Spark can bound the
    join state."""
    a = events.select(
        F.col("user_id"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    ).withWatermark("a_ts", watermark)
    b = events.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    ).withWatermark("b_ts", watermark)
    return a.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("a_id") < F.col("b_id"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS")),
    ).select("user_id", "a_id", "b_id", "a_ts", "b_ts")
