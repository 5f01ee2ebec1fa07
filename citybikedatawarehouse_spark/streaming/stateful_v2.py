"""Arbitrary stateful streaming on the Spark 4 transformWithState
API (SPARK-49564's successor to applyInPandasWithState): typed,
multi-variable state (ValueState / ListState / MapState) with
explicit lifecycle — the API a 100 TB streaming deployment targets,
because state variables are individually evolvable and RocksDB-
backed instead of one opaque tuple.

Two processors:

- ``EngagementProfileProcessor``: per-user MapState
  event_type -> count, emitting the user's full updated profile
  each micro-batch. The profile a feature store serves; the MapState
  is exactly the structure applyInPandasWithState cannot express
  without serializing the whole dict into one value.
- ``DecayedHotKeyProcessor``: per-key ValueState holding
  (last_epoch, decayed_score); score decays by ``decay`` per epoch
  and adds the batch count — the streaming hot-key detector whose
  batch twin is q210's census with exponential recency weighting.

Both are deterministic given the micro-batch partitioning of input
(counts are order-free; decay depends only on epoch indices), so the
stream-equals-batch tests replay the same files through a batch
computation.

ENVIRONMENT NOTE: transformWithState's Python runtime speaks a
proto-encoded state-server protocol and needs google.protobuf,
which this sandbox does not ship — the runtime path is therefore
gated exactly like the multimodal codec and JDBC sink: processors
and plans are real and logic-tested (fake state handles in
tests/test_stateful_v2.py); the end-to-end streaming tests
skip-unless-protobuf and run anywhere the dependency exists.
(Gate re-checked round 9, 2026-08-15: ``import google.protobuf``
still fails, pip installs remain disallowed, and the sandbox has no
network route to PyPI — the 3 e2e skips stand.)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

PROFILE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


class EngagementProfileProcessor(StatefulProcessor):
    """MapState event_type -> running count per user; emits the
    full updated profile every time the user appears."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "n bigint"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        batch: dict[str, int] = {}
        for pdf in rows:
            for et, c in pdf["event_type"].value_counts().items():
                batch[et] = batch.get(et, 0) + int(c)
        for et, c in batch.items():
            prev = (
                self._counts.getValue((et,))[0]
                if self._counts.containsKey((et,))
                else 0
            )
            self._counts.updateValue((et,), (prev + c,))
        ets, ns = [], []
        for k_ in self._counts.keys():
            ets.append(k_[0])
            ns.append(self._counts.getValue(k_)[0])
        yield pd.DataFrame(
            {"user_id": [key[0]] * len(ets), "event_type": ets, "n": ns}
        )

    def close(self) -> None:
        pass


def engagement_profile_stream(events: DataFrame) -> DataFrame:
    """Per-user event-type profile via transformWithState (update
    mode, processing-time none): the last emission per (user, type)
    is the current profile row."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EngagementProfileProcessor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


HOTKEY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("epoch", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


class DecayedHotKeyProcessor(StatefulProcessor):
    """ValueState (last_epoch, score); score = score * decay^(gap)
    + batch_count. The batch `__epoch` column (stamped by the test
    harness / foreachBatch wrapper) drives decay so replays are
    deterministic."""

    DECAY = 0.5

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState(
            "hot", "last_epoch bigint, score double"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = 0
        epoch = 0
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                epoch = int(pdf["__epoch"].max())
        last_epoch, score = (
            self._st.get() if self._st.exists() else (epoch, 0.0)
        )
        score = score * (self.DECAY ** max(epoch - last_epoch, 0)) + n
        self._st.update((epoch, score))
        yield pd.DataFrame(
            {"user_id": [key[0]], "epoch": [epoch], "score": [score]}
        )

    def close(self) -> None:
        pass


def decayed_hotkey_stream(events_with_epoch: DataFrame) -> DataFrame:
    """Per-user exponentially-decayed activity score via
    transformWithState. Input must carry a ``__epoch`` bigint
    column (monotone per micro-batch)."""
    return events_with_epoch.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=DecayedHotKeyProcessor(),
        outputStructType=HOTKEY_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
