"""Structured Streaming execution tests: memory-sink runs of the
windowed/sessionized/deduped/stateful transforms, equivalence with
their batch twins, and watermark late-data semantics."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.sources.readers import load_table
from citybikedatawarehouse_spark.streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory,
    running_totals_stateful,
    session_counts,
    sliding_avgs,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """events table re-written as µs-timestamp parquet (the raw
    files carry TIMESTAMP(NANOS) which the file stream source can't
    consume) in a fresh dir the stream can list."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(out)
    load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")  # LTZ for watermarking
    ).write.parquet(out)
    return out


def _batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=4)
    q = run_to_memory(tumbling_counts(stream), "t_tumbling")
    try:
        got = spark.sql("SELECT * FROM t_tumbling")
        want = tumbling_counts(_batch_events(spark, events_dir))
        cols = ["window_start", "event_type", "n", "total_value"]
        assert _rows(got, cols) == _rows(want, cols)
    finally:
        q.stop()


def test_sliding_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=4)
    q = run_to_memory(sliding_avgs(stream), "t_sliding")
    try:
        got = spark.sql("SELECT * FROM t_sliding")
        want = sliding_avgs(_batch_events(spark, events_dir))
        cols = ["window_start", "n", "avg_value"]
        assert _rows(got, cols) == _rows(want, cols)
    finally:
        q.stop()


def test_session_windows_stream(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=4)
    q = run_to_memory(session_counts(stream), "t_session")
    try:
        got = spark.sql("SELECT * FROM t_session")
        total = got.agg(F.sum("n_events")).collect()[0][0]
        n_events = _batch_events(spark, events_dir).count()
        assert total == n_events  # every event lands in exactly one session
        # sessions are per-user, disjoint, gap-separated
        sess = got.orderBy("user_id", "session_start").collect()
        by_user: dict[int, list] = {}
        for r in sess:
            by_user.setdefault(r["user_id"], []).append(r)
        # session_end = last event + gap, so disjointness (not a
        # 30-min corridor) is the invariant between sessions
        for rows in by_user.values():
            for a, b in zip(rows, rows[1:]):
                assert (b["session_start"] - a["session_end"]).total_seconds() >= 0
    finally:
        q.stop()


def test_stream_dedup(spark, events_dir, tmp_path):
    """Duplicate event_ids across files within the watermark are
    dropped by dropDuplicatesWithinWatermark."""
    dup_dir = str(tmp_path / "dup")
    ev = _batch_events(spark, events_dir).limit(50).cache()
    ev.write.parquet(dup_dir)
    ev.write.mode("append").parquet(dup_dir)  # exact duplicate files
    stream = read_events_stream(spark, dup_dir, max_files_per_trigger=100)
    q = run_to_memory(dedup_within_watermark(stream), "t_dedup", output_mode="append")
    try:
        got = spark.sql("SELECT count(*) c FROM t_dedup").collect()[0]["c"]
        assert got == 50
    finally:
        q.stop()


def test_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState end state == batch per-user aggregate
    (update mode: last row per user in the memory sink is the final
    state)."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=4)
    q = run_to_memory(
        running_totals_stateful(stream), "t_state", output_mode="update"
    )
    try:
        # update mode appends one row per user per micro-batch; the
        # max n_events row per user is the final state
        got = spark.sql(
            """
            SELECT user_id, max_by(n_events, n_events) n_events,
                   round(max_by(total_value, n_events), 2) total_value
            FROM t_state GROUP BY user_id
            """
        )
        want = (
            _batch_events(spark, events_dir)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )
        cols = ["user_id", "n_events", "total_value"]
        assert _rows(got, cols) == _rows(want, cols)
    finally:
        q.stop()


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row arriving behind the watermark is dropped from an
    append-mode windowed aggregation."""
    import pandas as pd

    late_dir = str(tmp_path / "late")
    base = pd.Timestamp("2024-06-01 12:00:00")
    f1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": [base, base + pd.Timedelta(hours=2)],  # watermark -> 13:50
            "user_id": [1, 1],
            "event_type": ["a", "a"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    f2 = pd.DataFrame(
        {
            "event_id": [3],
            "ts": [base + pd.Timedelta(minutes=1)],  # 12:01 — far behind
            "user_id": [1],
            "event_type": ["a"],
            "value": [100.0],
            "props": ["{}"],
        }
    )
    from citybikedatawarehouse_spark.streaming.windows import EVENTS_STREAM_SCHEMA

    spark.createDataFrame(f1, EVENTS_STREAM_SCHEMA).write.parquet(late_dir)
    stream = read_events_stream(spark, late_dir, max_files_per_trigger=1)
    agg = tumbling_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: watermark advances to 13:50
        spark.createDataFrame(f2, EVENTS_STREAM_SCHEMA).write.mode("append").parquet(
            late_dir
        )
        q.processAllAvailable()  # batch 2: late row must be discarded
        rows = spark.sql(
            "SELECT window_start, n, total_value FROM t_late ORDER BY window_start"
        ).collect()
        # the 12:00 window closed with ONLY event_id 1 (n=1, value 1.0);
        # the late value=100 row never entered it
        assert any(
            r["window_start"].isoformat() == "2024-06-01T12:00:00" and r["n"] == 1
            and r["total_value"] == 1.0
            for r in rows
        )
        assert not any(r["total_value"] == 101.0 for r in rows)
    finally:
        q.stop()


def test_foreach_batch_parquet_sink(spark, events_dir, tmp_path):
    """foreachBatch epoch-directory sink: all rows land exactly once
    across epochs."""
    from citybikedatawarehouse_spark.streaming.windows import (
        run_foreach_batch_parquet,
    )

    out = str(tmp_path / "sink")
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = run_foreach_batch_parquet(stream.select("event_id", "ts", "value"), out)
    try:
        q.processAllAvailable()
        got = spark.read.parquet(out)
        want = _batch_events(spark, events_dir)
        assert got.count() == want.count()
        assert got.select(F.sum("event_id")).collect() == want.select(
            F.sum("event_id")
        ).collect()
    finally:
        q.stop()
