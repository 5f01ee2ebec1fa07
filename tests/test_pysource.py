"""Tests for the custom Python data source (sources/pysource.py):
batch partitioning + Arrow path, generation-contract replay, and the
stream-equals-batch law through the SimpleDataSourceStreamReader."""

from __future__ import annotations

import hashlib
import tempfile

from citybikedatawarehouse_spark.sources.pysource import (
    TYPES,
    register_synthetic_source,
)


def _read(spark, rows=1000, parts=4, seed="t"):
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("parts", parts)
        .option("seed", seed)
        .load()
    )


def test_batch_shape_and_partitions(spark):
    df = _read(spark, rows=1000, parts=4)
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 4
    assert df.select("event_id").distinct().count() == 1000
    assert df.columns == ["event_id", "etype", "amount_cents"]


def test_generation_contract_replay(spark):
    rows = {r.event_id: r for r in _read(spark, rows=200, seed="c").collect()}
    assert len(rows) == 200
    for i in (0, 7, 63, 199):
        h = hashlib.md5(f"c:{i}".encode()).hexdigest()
        assert rows[i].etype == TYPES[int(h[0], 16) % 4]
        assert rows[i].amount_cents == int(h[1:9], 16) % 100000


def test_batch_determinism(spark):
    a = sorted(map(tuple, _read(spark, rows=500, parts=3, seed="d").collect()))
    b = sorted(map(tuple, _read(spark, rows=500, parts=5, seed="d").collect()))
    assert a == b  # partitioning does not change content


def test_uneven_partition_split(spark):
    # 10 rows over 4 parts -> ceil split 3/3/3/1, no loss, no overlap
    df = _read(spark, rows=10, parts=4)
    assert df.count() == 10
    assert df.select("event_id").distinct().count() == 10


def test_stream_equals_batch_across_restarts(spark):
    """Drain the finite stream through REPEATED availableNow runs
    over one checkpoint (a Simple stream reader's availableNow caps
    at the prefetched offset, so each run advances >= 1 microbatch)
    and compare the union to the batch read: every row exactly once,
    across restarts — the checkpoint-replay contract."""
    register_synthetic_source(spark)
    out = tempfile.mkdtemp(prefix="cbdw_pysrc_out_")
    ckpt = tempfile.mkdtemp(prefix="cbdw_pysrc_ck_")

    def run_once() -> int:
        sdf = (
            spark.readStream.format("synthetic_events")
            .option("rows", 700)
            .option("seed", "s")
            .option("batch_rows", 256)
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive
        return spark.read.parquet(out).count()

    n, attempts = 0, 0
    while n < 700 and attempts < 10:
        n = run_once()
        attempts += 1
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, _read(spark, rows=700, seed="s").collect()))
    assert got == want  # exactly once: no loss, no duplicates
    assert attempts >= 2  # the drain really spanned restarts


def test_with_ts_batch_contract(spark):
    """with_ts=true adds the deterministic event-time column; the
    clock replays from the documented rule (TS_BASE + 30*i - late)."""
    from citybikedatawarehouse_spark.sources.pysource import event_ts_epoch

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 300)
        .option("seed", "wt")
        .option("with_ts", "true")
        .load()
    )
    assert df.columns == ["event_id", "etype", "amount_cents", "ts"]
    rows = {r.event_id: r.ts for r in df.collect()}
    assert len(rows) == 300
    for i in (0, 13, 77, 299):
        # UTC session: naive wall time == epoch
        import calendar

        got_epoch = calendar.timegm(rows[i].timetuple())
        assert got_epoch == event_ts_epoch("wt", i), i


def test_stream_watermark_equals_batch_admission(spark):
    """The TRUE readStream twin of q269's lateness profile: stream
    the synthetic source (20% of rows late by up to 2 h) through
    withWatermark + tumbling window in update mode, and compare the
    final per-(window, etype) counts against the BATCH replay of the
    admission rule (streaming/windows.watermark_admitted) over the
    identical rows with the identical microbatch boundaries
    (batch_idx = event_id // batch_rows — the Simple stream reader
    serves exactly batch_rows per microbatch in arrival order).

    batch_rows=64 on purpose: the late-event watermark lags one full
    microbatch behind (SPARK-40925 two-watermark semantics), so with
    256-row batches (~2.1 h of event clock each) the 2 h max lateness
    never falls behind it and nothing drops — 64-row batches make the
    admission boundary bite (~47/2000 rows drop), which is the case
    worth pinning."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.streaming.windows import (
        watermark_admitted,
    )

    register_synthetic_source(spark)
    ROWS, BATCH = 2000, 64
    OPTS = {"rows": ROWS, "seed": "wm", "batch_rows": BATCH, "with_ts": "true"}

    sdf = spark.readStream.format("synthetic_events").options(**OPTS).load()
    agg = (
        sdf.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "etype")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "etype", "n")
    )
    final: dict = {}

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            final[(r.ws, r.etype)] = r.n

    q = agg.writeStream.foreachBatch(sink).outputMode("update").start()
    q.processAllAvailable()
    q.stop()

    bdf = (
        spark.read.format("synthetic_events")
        .options(**{**OPTS, "parts": 4})
        .load()
        .withColumn("batch_idx", (F.col("event_id") / BATCH).cast("int"))
    )
    admitted = watermark_admitted(
        bdf, ts_col="ts", batch_col="batch_idx",
        window="1 hour", delay="30 minutes",
    )
    twin = {
        (r.ws, r.etype): r.n
        for r in admitted.groupBy(
            F.window("ts", "1 hour")["start"].alias("ws"), "etype"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_dropped = ROWS - admitted.count()
    assert n_dropped > 0, "fixture must actually drop late rows"
    assert final == twin


def test_watermark_admitted_property_random_batches(spark):
    """Property: for arbitrary (batch, event-time) assignments, the
    DataFrame twin equals a sequential Python replay of the
    two-watermark rule (late filter = running max over batches
    <= k-2, minus delay; admit iff window end > that watermark)."""
    import datetime

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.streaming.windows import (
        watermark_admitted,
    )

    BASE = 1704067200
    WIN_S, DELAY_S = 3600, 1800

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),        # batch idx
                st.integers(min_value=0, max_value=86400),    # ts offset s
            ),
            min_size=1,
            max_size=60,
        )
    )
    def check(rows):
        data = [
            (i, b, datetime.datetime.utcfromtimestamp(BASE + off))
            for i, (b, off) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, "row_id long, batch_idx int, ts timestamp"
        )
        got = {
            r.row_id
            for r in watermark_admitted(
                df, "ts", "batch_idx", f"{WIN_S} seconds", f"{DELAY_S} seconds"
            ).collect()
        }
        # sequential replay
        batches = sorted({b for b, _ in rows})
        max_ts = {
            b: max(BASE + off for bb, off in rows if bb == b)
            for b in batches
        }
        want = set()
        for i, (b, off) in enumerate(rows):
            pos = batches.index(b)
            prior = batches[: pos - 1] if pos >= 1 else []
            wm = (
                max(max_ts[p] for p in prior) - DELAY_S if prior else None
            )
            ts = BASE + off
            win_end = (ts // WIN_S) * WIN_S + WIN_S
            if wm is None or win_end > wm:
                want.add(i)
        assert got == want

    check()
