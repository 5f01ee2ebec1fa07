"""transformWithState (Spark 4 typed-state API) processors: the
engagement-profile MapState and the decayed hot-key ValueState.
Stream-equals-batch for the profile; a hand-built epoch sequence
checks the decay recurrence exactly.

The transformWithState Python runtime requires google.protobuf
(its state-server protocol is proto-encoded); this sandbox does not
ship it, so the runtime tests skip — the SAME environment-stub
pattern as the multimodal codec (operators/multimodal.py) and the
JDBC sink. The processors' pure-Python state logic is still tested
below via a direct harness that fakes the state handles.

Gate re-checked round 11 (import still fails; installs remain
disallowed in this sandbox) — when google.protobuf appears, these
skips lift with no code change."""

from __future__ import annotations

import pytest

_HAS_PROTOBUF = True
try:  # transformWithState state-server protocol dependency
    from google.protobuf import descriptor  # noqa: F401
except ImportError:
    _HAS_PROTOBUF = False

needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState needs google.protobuf (absent in sandbox)",
)
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.streaming.stateful_v2 import (
    decayed_hotkey_stream,
    engagement_profile_stream,
)
from citybikedatawarehouse_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ev_v2"))
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


@needs_protobuf
def test_engagement_profile_stream_equals_batch(spark, events_dir):
    """Final MapState per (user, event_type) == batch groupBy count,
    across multiple micro-batches."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=3)
    q = run_to_memory(
        engagement_profile_stream(stream), "t_profile", output_mode="update"
    )
    try:
        got = spark.sql(
            """
            SELECT user_id, event_type, max(n) AS n
            FROM t_profile GROUP BY user_id, event_type
            """
        )
        want = (
            spark.read.parquet(events_dir)
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cols = ["user_id", "event_type", "n"]
        a = sorted(tuple(r) for r in got.select(cols).collect())
        b = sorted(tuple(r) for r in want.select(cols).collect())
        assert a == b
    finally:
        q.stop()


@needs_protobuf
def test_decayed_hotkey_recurrence(spark, tmp_path):
    """Three epochs for one user (3, 0-gap, then 2-epoch gap):
    score follows s' = s * 0.5^gap + n exactly."""
    import pandas as pd

    d = str(tmp_path / "hk")
    base = pd.Timestamp("2024-06-01")

    def write(epoch, n, name):
        pd.DataFrame(
            {
                "event_id": range(n),
                "ts": [base] * n,
                "user_id": [7] * n,
                "event_type": ["click"] * n,
                "value": [1.0] * n,
                "props": ["{}"] * n,
                "__epoch": [epoch] * n,
            }
        ).to_parquet(f"{d}/{name}.parquet")

    import os

    os.makedirs(d)
    write(0, 3, "f0")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string, __epoch long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = run_to_memory(
        decayed_hotkey_stream(stream), "t_hot", output_mode="update"
    )
    try:
        write(1, 4, "f1")
        q.processAllAvailable()
        write(3, 2, "f2")  # 2-epoch gap -> two decay steps
        q.processAllAvailable()
        rows = sorted(
            (r.epoch, r.score)
            for r in spark.sql("SELECT * FROM t_hot").collect()
        )
        # epoch 0: 3; epoch 1: 3*0.5 + 4 = 5.5; epoch 3: 5.5*0.25 + 2
        assert rows == [(0, 3.0), (1, 5.5), (3, 5.5 * 0.25 + 2)]
    finally:
        q.stop()


# ---- runtime-independent logic tests (run everywhere) ----

class _FakeMapState:
    def __init__(self):
        self.d = {}

    def containsKey(self, k):
        return k in self.d

    def getValue(self, k):
        return self.d[k]

    def updateValue(self, k, v):
        self.d[k] = v

    def keys(self):
        return iter(self.d)


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v


def test_profile_processor_logic_accumulates():
    import pandas as pd

    from citybikedatawarehouse_spark.streaming.stateful_v2 import (
        EngagementProfileProcessor,
    )

    p = EngagementProfileProcessor()
    p._counts = _FakeMapState()
    out1 = list(
        p.handleInputRows(
            (7,),
            iter([pd.DataFrame({"event_type": ["a", "a", "b"]})]),
            None,
        )
    )[0]
    out2 = list(
        p.handleInputRows(
            (7,),
            iter([pd.DataFrame({"event_type": ["b", "c"]})]),
            None,
        )
    )[0]
    final = dict(zip(out2["event_type"], out2["n"]))
    assert final == {"a": 2, "b": 2, "c": 1}
    assert dict(zip(out1["event_type"], out1["n"])) == {"a": 2, "b": 1}


def test_hotkey_processor_decay_recurrence():
    import pandas as pd

    from citybikedatawarehouse_spark.streaming.stateful_v2 import (
        DecayedHotKeyProcessor,
    )

    p = DecayedHotKeyProcessor()
    p._st = _FakeValueState()

    def step(epoch, n):
        pdf = pd.DataFrame(
            {"event_type": ["x"] * n, "__epoch": [epoch] * n}
        )
        return list(p.handleInputRows((7,), iter([pdf]), None))[0]["score"][0]

    assert step(0, 3) == 3.0
    assert step(1, 4) == 3 * 0.5 + 4
    assert step(3, 2) == (3 * 0.5 + 4) * 0.25 + 2
