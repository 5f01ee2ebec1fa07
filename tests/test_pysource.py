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
