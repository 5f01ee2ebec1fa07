"""Streaming CDC SOURCE over the file-list table format: tail
``fl_changes`` incrementally — the read half of the loop the epoch
sink (``streaming/incremental.start_fl_upsert_stream``) writes:

    write stream --(exactly-once MERGE commits)--> fl table
    fl table --(this module: per-commit I/U/D feed)--> read stream

Shape: Delta's ``readChangeFeed`` with ``startingVersion`` in
micro-batch form. The source of truth for progress is ONE tiny
checkpointed offset — the last committed version this consumer has
fully processed — and each micro-batch is the union of the PER-COMMIT
diffs (``fl_changes(parent, child)`` for adjacent committed lineage
pairs), each row tagged with ``_commit_version``, rate-limited to
``versions_per_batch`` commits per batch so a consumer that fell far
behind catches up in bounded steps instead of one giant diff.

Why per-commit pairs instead of one (offset, head) diff: CDC
consumers want commit attribution (which commit deleted this key),
and net-diffing across commits would silently collapse intermediate
states a downstream audit may need. The cost model is unchanged —
each pair diff is O(that commit's changed files), the whole point of
``fl_changes``.

Delivery contract: the offset is persisted AFTER the consumer's step
returns (at-least-once); a step that is idempotent per
``_commit_version`` — e.g. an epoch-keyed overwrite sink, or a MERGE
keyed on (commit, key) — makes the pipeline exactly-once, the same
contract Spark's own foreachBatch gives. Crash between step and
offset write replays exactly the unacknowledged batch.

Scale shape: everything driver-side here is O(versions) metadata (the
lineage walk and the offset file); all row work stays in
``fl_changes``'s executor plan (touched-files-only scans, one
key-partitioned full-outer join per commit). The live-query wrapper
(``start_fl_changes_feed``) drives the cursor from a rate-source
ticker inside a real StreamingQuery, consuming at most one cursor
batch per tick — start/stop/awaitTermination lifecycle for free, no
custom JVM source needed.

Cites: Delta Lake CDF (``table_changes`` / readChangeFeed
startingVersion) and Iceberg's incremental changelog scan are the
public designs this re-expresses over operators/table_format.py;
the reference (append/replace ``to_sql`` sink,
create_db_from_csv.py:12-14) has no change capture surface at all.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OFFSET_FILE = "offset.json"

# sentinel offset meaning "before the first committed version": the
# next batch emits the initial snapshot as op=I rows (Delta CDF's
# startingVersion=0 behavior)
BEFORE_FIRST = "<before-first>"


def _read_offset(checkpoint_dir: str | None) -> str | None:
    if not checkpoint_dir:
        return None
    p = os.path.join(checkpoint_dir, _OFFSET_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["last_version"]


def _write_offset(checkpoint_dir: str | None, version: str) -> None:
    if not checkpoint_dir:
        return
    os.makedirs(checkpoint_dir, exist_ok=True)
    p = os.path.join(checkpoint_dir, _OFFSET_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_version": version}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)  # atomic: a crash leaves old or new, never torn


class FlChangesCursor:
    """Checkpointable incremental reader over a file-list table's
    committed lineage.

    ``from_version``: exclusive lower bound — the consumer has
    already seen that snapshot; the feed starts with the NEXT
    commit's changes. ``None`` starts before the beginning: the
    first batch is the initial snapshot as op=I rows tagged with the
    first committed version. A persisted checkpoint offset always
    wins over ``from_version`` (restart semantics).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        from_version: str | None = None,
        versions_per_batch: int = 4,
        checkpoint_dir: str | None = None,
    ) -> None:
        if versions_per_batch < 1:
            raise ValueError("versions_per_batch must be >= 1")
        self.spark = spark
        self.root = root
        self.versions_per_batch = versions_per_batch
        self.checkpoint_dir = checkpoint_dir
        self.offset = (
            _read_offset(checkpoint_dir)
            or from_version
            or BEFORE_FIRST
        )

    def _pending(self) -> list[str]:
        """Committed versions newer than the offset, oldest first."""
        from citybikedatawarehouse_spark.operators.table_format import (
            fl_lineage,
        )

        lineage = fl_lineage(self.root)
        if self.offset == BEFORE_FIRST:
            return lineage
        if self.offset not in lineage:
            raise ValueError(
                f"changes feed on {self.root}: offset {self.offset!r} "
                f"is not in the committed lineage {lineage} — it was "
                f"vacuumed away (consumer fell behind the retention "
                f"horizon) or belongs to an orphaned writer"
            )
        return lineage[lineage.index(self.offset) + 1 :]

    def next_batch(self) -> tuple[DataFrame, str] | None:
        """The next micro-batch as (changes_df, new_offset), or None
        when caught up. Does NOT advance the checkpoint — call
        ``ack(new_offset)`` after the batch is durably consumed."""
        from citybikedatawarehouse_spark.operators.table_format import (
            fl_changes,
            fl_read_mor,
            fl_table_props,
        )

        pending = self._pending()
        if not pending:
            return None
        take = pending[: self.versions_per_batch]

        parts: list[DataFrame] = []
        prev = self.offset
        for v in take:
            if prev == BEFORE_FIRST:
                # initial snapshot: every row is an insert — shaped
                # exactly like cdc_extract output (op, key, payload).
                # MOR view on purpose: after a vacuum the oldest
                # replayable version can carry a delete set, and a
                # plain file read would resurrect its deleted rows
                props = fl_table_props(self.root, v)
                cols = [f["name"] for f in props["schema"]]
                key = props["key"]
                payload = [c for c in cols if c != key]
                ch = fl_read_mor(self.spark, self.root, v).select(
                    F.lit("I").alias("op"), key, *payload
                )
            else:
                ch = fl_changes(self.spark, self.root, prev, v)
            parts.append(ch.withColumn("_commit_version", F.lit(v)))
            prev = v
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out, take[-1]

    def ack(self, new_offset: str) -> None:
        """Durably advance the offset — the consumer owns WHEN (after
        its sink write), which is what makes the at-least-once /
        idempotent-sink contract composable."""
        self.offset = new_offset
        _write_offset(self.checkpoint_dir, new_offset)


def run_fl_changes_stream(
    spark: SparkSession,
    root: str,
    step: Callable[[DataFrame, str], None],
    from_version: str | None = None,
    versions_per_batch: int = 4,
    checkpoint_dir: str | None = None,
    max_batches: int | None = None,
) -> int:
    """Drain the change feed through ``step(changes_df, offset)``
    until caught up (or ``max_batches``): the batch-twin pump the
    stream-equals-batch tests replay, and the availableNow-trigger
    analog for backfills. Returns the number of batches delivered."""
    cur = FlChangesCursor(
        spark, root, from_version, versions_per_batch, checkpoint_dir
    )
    n = 0
    while max_batches is None or n < max_batches:
        nxt = cur.next_batch()
        if nxt is None:
            break
        df, new_offset = nxt
        step(df, new_offset)
        cur.ack(new_offset)
        n += 1
    return n


def start_fl_changes_feed(
    spark: SparkSession,
    root: str,
    step: Callable[[DataFrame, str], None],
    from_version: str | None = None,
    versions_per_batch: int = 4,
    checkpoint_dir: str | None = None,
    ticks_per_second: int = 2,
):
    """LIVE tail of the change feed as a real StreamingQuery: a rate
    ticker drives the cursor (at most one cursor batch per tick, so
    ``versions_per_batch`` stays the rate limit), giving the
    start/stop/awaitTermination lifecycle without a custom JVM
    source. The offset checkpoint is the cursor's own (tiny JSON,
    atomic replace) — the rate ticker's checkpoint carries no state
    worth keeping."""
    cur = FlChangesCursor(
        spark, root, from_version, versions_per_batch, checkpoint_dir
    )

    def tick(_batch_df: DataFrame, _epoch_id: int) -> None:
        nxt = cur.next_batch()
        if nxt is None:
            return
        df, new_offset = nxt
        step(df, new_offset)
        cur.ack(new_offset)

    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", ticks_per_second)
        .load()
        .writeStream.foreachBatch(tick)
        .start()
    )


def replicate_changes(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    checkpoint_dir: str | None = None,
    versions_per_batch: int = 4,
    max_batches: int | None = None,
) -> int:
    """Table-to-table INCREMENTAL REPLICATION over the change feed —
    the canonical CDC consumer (Delta deep-clone-incremental /
    Fivetran-style sync), composed entirely from this module's
    cursor and the table format's own write ops, so every applied
    batch is itself an atomic commit on the replica:

    - the initial-snapshot batch (all op=I) ``fl_init``s the replica
      with the source's key/stats/zorder/layout props;
    - each later batch applies PER SOURCE COMMIT, in commit order:
      D keys -> ``fl_delete`` (merge-on-read, no replica rewrite),
      I/U payloads -> ``fl_merge_upsert`` (O(touched-files));
      within one commit the feed nets each key to at most one op, so
      delete-before-upsert is always safe.

    Exactly-once state: the offset acks after the whole batch
    applies (at-least-once delivery), and a replayed batch
    re-applies to the SAME logical state (delete of already-absent
    keys and upsert of identical rows are state-idempotent), so the
    replica converges regardless of crashes between apply and ack.
    Cost tracks the CHANGES, never the table: a 100 TB source whose
    day touched 0.1 % of keys replicates that day as O(changed
    files) reads and O(changed keys) replica commits. Returns the
    number of source commits applied."""
    from citybikedatawarehouse_spark.operators.table_format import (
        fl_delete,
        fl_init,
        fl_merge_upsert,
        fl_table_props,
    )

    applied = 0

    def step(df: DataFrame, _offset: str) -> None:
        nonlocal applied
        src_props = fl_table_props(src_root)
        key = src_props["key"]
        cols = [f["name"] for f in src_props["schema"]]
        # the diff behind this batch is a full-outer join over the
        # commit's changed files — persist it so the D-filter and the
        # I/U-filter (and the merge's constraint aggregate) compute
        # it ONCE, not once per consuming action
        df = df.persist()
        try:
            if not os.path.exists(os.path.join(dst_root, "_MANIFEST")):
                fl_init(
                    spark,
                    dst_root,
                    df.where(F.col("op") == "I").select(*cols),
                    key=key,
                    stats_cols=tuple(src_props.get("stats_cols", [])),
                    zorder_by=tuple(src_props.get("zorder_by", [])),
                    layout_files=src_props.get("layout_files", 16),
                )
                applied += 1
                return
            dels = df.where(F.col("op") == "D").select(key)
            fl_delete(spark, dst_root, dels)  # empty batch = no-op
            ups = df.where(F.col("op").isin("I", "U")).select(*cols)
            fl_merge_upsert(spark, dst_root, ups, key=key)
            applied += 1
        finally:
            df.unpersist()

    # one COMMIT per cursor batch regardless of the caller's
    # versions_per_batch: commits must apply to the replica in order
    # anyway, and a single-commit batch means the offset IS the
    # commit version — no job to rediscover which versions a batch
    # holds. versions_per_batch still bounds how many commits one
    # CALL may apply (rate limiting composes with max_batches).
    budget = (
        None
        if max_batches is None
        else max_batches * max(1, versions_per_batch)
    )
    run_fl_changes_stream(
        spark,
        src_root,
        step,
        versions_per_batch=1,
        checkpoint_dir=checkpoint_dir,
        max_batches=budget,
    )
    return applied
