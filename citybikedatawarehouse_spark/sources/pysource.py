"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic event generator usable as BOTH a batch
source and a streaming source from pure Python — the extensibility
path for feeding Spark from systems with no JVM connector (internal
REST APIs, bespoke binary logs, simulation generators).

Reference parity: the reference ingests from files the same rows every
run (create_db_from_csv.py reads fixed CSVs); this source demonstrates
the equivalent *programmatic* contract — identical rows every run —
through Spark's pluggable source API instead of a file.

Generation rule (the oracle replays it in SQL, so it is part of the
public contract): for row ``i`` with seed ``s``::

    h           = md5(f"{s}:{i}")           # 32 hex chars
    etype       = TYPES[int(h[0], 16) % 4]  # view/cart/buy/return
    amount_cents= int(h[1:9], 16) % 100000  # 0..99999

With ``with_ts=true`` the schema gains an EVENT-TIME column whose
out-of-orderness is deterministic (the watermark-path twin tests
replay it)::

    j      = int(h[9:13], 16)
    late_s = 0 if j % 10 < 8 else j % 7200   # 20% late, up to 2 h
    ts     = TS_BASE + 30 * i - late_s       # seconds, arrival order = i

Arrival order is the row index, so each streamed microbatch of
``batch_rows`` rows carries a mostly-increasing event clock with
deterministic dips — exactly the shape ``withWatermark`` exists for,
with the drop/admit outcome computable in closed form.

Scale shape: ``partitions()`` splits the row range into ``parts``
contiguous slices, each generated independently inside its task (no
driver materialization, no cross-partition state), and ``read``
yields Arrow RecordBatches in 4096-row chunks so rows cross the
Python->JVM boundary columnar, not row-at-a-time. The streaming
reader is a ``SimpleDataSourceStreamReader`` whose offset is just the
next row index — ``readBetweenOffsets`` regenerates any slice
deterministically, which is exactly the replayability contract
exactly-once sinks need.
"""

from __future__ import annotations

import datetime
import hashlib
from typing import Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

TYPES = ("view", "cart", "buy", "return")

_SCHEMA = "event_id bigint, etype string, amount_cents bigint"
_SCHEMA_TS = _SCHEMA + ", ts timestamp"
_ARROW_CHUNK = 4096

# event-time generation constants (public contract, see module doc)
TS_BASE = 1704067200  # 2024-01-01 00:00:00 UTC
TS_STEP_S = 30
LATE_MOD_S = 7200


def _late_s(h: str) -> int:
    j = int(h[9:13], 16)
    return 0 if j % 10 < 8 else j % LATE_MOD_S


def event_ts_epoch(seed: str, i: int) -> int:
    """Event-time epoch seconds for row ``i`` (contract helper used
    by the stream-equals-batch tests to replay the clock)."""
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    return TS_BASE + TS_STEP_S * i - _late_s(h)


def _gen_row(seed: str, i: int, with_ts: bool = False) -> Tuple:
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    base = (i, TYPES[int(h[0], 16) % 4], int(h[1:9], 16) % 100000)
    if not with_ts:
        return base
    # naive UTC datetime: the engine session runs with
    # spark.sql.session.timeZone=UTC, so this is the epoch as-is
    ts = datetime.datetime.utcfromtimestamp(
        TS_BASE + TS_STEP_S * i - _late_s(h)
    )
    return base + (ts,)


def _gen_arrow_batches(seed: str, start: int, end: int, with_ts: bool = False):
    """Yield pyarrow RecordBatches for rows [start, end)."""
    import pyarrow as pa

    fields = [
        ("event_id", pa.int64()),
        ("etype", pa.string()),
        ("amount_cents", pa.int64()),
    ]
    if with_ts:
        fields.append(("ts", pa.timestamp("us")))
    sch = pa.schema(fields)
    for lo in range(start, end, _ARROW_CHUNK):
        hi = min(lo + _ARROW_CHUNK, end)
        rows = [_gen_row(seed, i, with_ts) for i in range(lo, hi)]
        arrays = [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.string()),
            pa.array([r[2] for r in rows], pa.int64()),
        ]
        if with_ts:
            arrays.append(pa.array([r[3] for r in rows], pa.timestamp("us")))
        yield pa.RecordBatch.from_arrays(arrays, schema=sch)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _with_ts(options: dict) -> bool:
    return str(options.get("with_ts", "false")).lower() == "true"


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.parts = max(1, int(options.get("parts", 4)))
        self.seed = str(options.get("seed", "synth"))
        self.with_ts = _with_ts(options)

    def partitions(self):
        per = -(-self.rows // self.parts)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition):
        yield from _gen_arrow_batches(
            self.seed, partition.start, partition.end, self.with_ts
        )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"i": next_row}; each ``read`` serves at most
    ``batch_rows`` rows, so a bounded corpus drains in
    ceil(rows/batch_rows) microbatches and then returns empty
    batches (a finite replayable stream — the shape integration
    tests want)."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.seed = str(options.get("seed", "synth"))
        self.batch_rows = int(options.get("batch_rows", 256))
        self.with_ts = _with_ts(options)

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i0 = int(start["i"])
        i1 = min(i0 + self.batch_rows, self.rows)
        return (
            iter([_gen_row(self.seed, i, self.with_ts) for i in range(i0, i1)]),
            {"i": i1},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of an arbitrary committed slice
        return iter(
            [
                _gen_row(self.seed, i, self.with_ts)
                for i in range(int(start["i"]), int(end["i"]))
            ]
        )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA_TS if _with_ts(self.options) else _SCHEMA

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotently register the source on a session (re-registering
    replaces, which is safe because the class is stateless)."""
    spark.dataSource.register(SyntheticEventsDataSource)
