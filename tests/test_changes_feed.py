"""Streaming CDC source (streaming/changes_feed.py): tailing the
file-list table's per-commit change feed — stream-equals-batch over a
multi-commit history, initial-snapshot semantics, checkpointed
resume with no gaps or duplicates, the live StreamingQuery wrapper,
and the vacuumed-offset failure mode."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.operators.table_format import (
    fl_current_version,
    fl_delete,
    fl_init,
    fl_lineage,
    fl_merge_upsert,
    fl_read_mor,
    fl_vacuum,
)
from citybikedatawarehouse_spark.streaming.changes_feed import (
    FlChangesCursor,
    run_fl_changes_stream,
    start_fl_changes_feed,
)


def _orders(spark, sf_dir):
    from citybikedatawarehouse_spark.sources.readers import load_table

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )


def _history(spark, sf_dir, tmp_path, name):
    """init -> merge (band update + tail inserts) -> MOR delete ->
    merge (re-insert a deleted subset): 4 committed versions with
    I, U and D all represented, including delete-then-reinsert."""
    root = str(tmp_path / name)
    o = _orders(spark, sf_dir)
    fl_init(
        spark, root, o, key="o_orderkey",
        zorder_by=("o_orderkey",), layout_files=8,
    )
    band = F.col("o_orderkey").between(1000, 2000)
    updates = o.where(band).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
        F.lit("R").alias("o_orderstatus"),
    )
    fl_merge_upsert(spark, root, updates, key="o_orderkey")
    doomed = fl_read_mor(spark, root).where(F.col("o_orderkey") % 10 == 7)
    fl_delete(spark, root, doomed)
    reinserts = o.where(F.col("o_orderkey") % 50 == 7).select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.lit("N").alias("o_orderstatus"),
    )
    fl_merge_upsert(spark, root, reinserts, key="o_orderkey")
    return root, o


def _apply_feed(snapshot_pd, feed_pd, key="o_orderkey"):
    """Replay the op log over a pandas snapshot, in commit order —
    the consumer-side apply the feed contract promises."""
    state = {r[key]: r for _, r in snapshot_pd.iterrows()}
    for _, r in feed_pd.sort_values("_commit_version", kind="stable").iterrows():
        if r["op"] == "D":
            state.pop(r[key], None)
        else:  # I or U: upsert the new payload
            state[r[key]] = r
    return {
        k: (v["o_custkey"], round(float(v["o_totalprice"]), 2))
        for k, v in state.items()
    }


def test_feed_applied_to_snapshot_equals_head(spark, sf_dir, tmp_path):
    """Stream-equals-batch: draining the per-commit feed from v1 and
    applying it to the v1 snapshot reproduces the head snapshot
    exactly — across a merge, a merge-on-read delete, and a
    delete-then-reinsert (which the per-commit feed must report as
    D then I, never a net U)."""
    root, o = _history(spark, sf_dir, tmp_path, "feed1")
    lineage = fl_lineage(root)
    assert len(lineage) == 4
    v1 = lineage[0]

    batches = []
    n = run_fl_changes_stream(
        spark, root, lambda df, off: batches.append(df.toPandas()),
        from_version=v1, versions_per_batch=1,
    )
    assert n == 3  # one batch per commit after v1
    import pandas as pd

    feed = pd.concat(batches, ignore_index=True)
    # delete-then-reinsert keys appear as D (one commit) then I (next)
    ks = feed[feed["o_orderkey"] % 50 == 7]
    assert set(ks["op"]) >= {"D", "I"}

    from citybikedatawarehouse_spark.operators.table_format import fl_read

    snap_v1 = fl_read(spark, root, v1).toPandas()
    head = fl_read_mor(spark, root).toPandas()
    want = {
        r["o_orderkey"]: (r["o_custkey"], round(float(r["o_totalprice"]), 2))
        for _, r in head.iterrows()
    }
    assert _apply_feed(snap_v1, feed) == want


def test_initial_snapshot_and_checkpoint_resume(spark, sf_dir, tmp_path):
    """from_version=None emits the initial snapshot as op=I; a
    checkpointed consumer killed mid-stream resumes at its offset
    with no duplicated and no skipped commits."""
    root, o = _history(spark, sf_dir, tmp_path, "feed2")
    ckpt = str(tmp_path / "ckpt2")

    seen = []
    step = lambda df, off: seen.append((off, df.toPandas()))
    n1 = run_fl_changes_stream(
        spark, root, step, versions_per_batch=1,
        checkpoint_dir=ckpt, max_batches=2,
    )
    assert n1 == 2
    lineage = fl_lineage(root)
    # batch 1 = initial snapshot of v1, all I
    off1, b1 = seen[0]
    assert off1 == lineage[0]
    assert set(b1["op"]) == {"I"}
    assert len(b1) == fl_read_mor(spark, root, lineage[0]).count()

    # "crash", then a NEW pump resumes from the checkpoint
    n2 = run_fl_changes_stream(
        spark, root, step, versions_per_batch=1, checkpoint_dir=ckpt,
    )
    assert n1 + n2 == len(lineage)  # every commit delivered exactly once
    assert [off for off, _ in seen] == lineage

    # rate limiting: versions_per_batch>1 groups commits per batch,
    # each row still tagged with its own commit version
    seen3 = []
    run_fl_changes_stream(
        spark, root,
        lambda df, off: seen3.append((off, df.toPandas())),
        versions_per_batch=10,
    )
    assert len(seen3) == 1
    assert set(seen3[0][1]["_commit_version"]) == set(lineage)


def test_live_streamingquery_tails_new_commits(spark, sf_dir, tmp_path):
    """start_fl_changes_feed is a real StreamingQuery: commits made
    WHILE it runs are picked up and delivered in order."""
    root = str(tmp_path / "feed3")
    o = _orders(spark, sf_dir).limit(200)
    fl_init(
        spark, root, o, key="o_orderkey",
        zorder_by=("o_orderkey",), layout_files=2,
    )
    v1 = fl_current_version(root)

    out = []
    q = start_fl_changes_feed(
        spark, root,
        lambda df, off: out.append((off, df.toPandas())),
        from_version=v1, versions_per_batch=1, ticks_per_second=4,
    )
    try:
        doomed = o.orderBy("o_orderkey").limit(3).select("o_orderkey")
        fl_delete(spark, root, doomed)
        ups = o.orderBy("o_orderkey").limit(5).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(9.0)
        )
        fl_merge_upsert(spark, root, ups, key="o_orderkey")
        deadline = time.monotonic() + 60
        while len(out) < 2 and time.monotonic() < deadline:
            time.sleep(0.25)
    finally:
        q.stop()
    assert [off for off, _ in out] == fl_lineage(root)[1:]
    assert set(out[0][1]["op"]) == {"D"} and len(out[0][1]) == 3
    # the 3 deleted keys re-upserted -> I; the other 2 -> U
    ops = out[1][1]["op"].value_counts().to_dict()
    assert ops == {"I": 3, "U": 2}


def test_offset_vacuumed_away_raises(spark, sf_dir, tmp_path):
    """A consumer that fell behind the retention horizon fails
    loudly, not silently-skips: its offset is no longer in the
    committed lineage after a forced vacuum."""
    root, o = _history(spark, sf_dir, tmp_path, "feed4")
    v1 = fl_lineage(root)[0]
    fl_vacuum(spark, root, keep=1, force=True)
    cur = FlChangesCursor(spark, root, from_version=v1)
    with pytest.raises(ValueError, match="lineage"):
        cur.next_batch()


def test_replication_converges_and_survives_replay(spark, sf_dir, tmp_path):
    """replicate_changes: the replica equals the source's MOR head
    after an incremental catch-up in two separately-checkpointed
    runs, and a crash-shaped replay (offset rolled back one commit)
    re-applies to the same state — convergence, not duplication."""
    import json as _json
    import pandas as pd

    from citybikedatawarehouse_spark.streaming.changes_feed import (
        replicate_changes,
    )

    src, o = _history(spark, sf_dir, tmp_path, "repl_src")
    dst = str(tmp_path / "repl_dst")
    ckpt = str(tmp_path / "repl_ckpt")

    def snap(root):
        df = fl_read_mor(spark, root).toPandas()
        return (
            df.sort_values("o_orderkey")
            .reset_index(drop=True)
            .round({"o_totalprice": 2})
        )

    # first run stops after 2 source commits (init + one)
    n1 = replicate_changes(
        spark, src, dst, checkpoint_dir=ckpt,
        versions_per_batch=1, max_batches=2,
    )
    assert n1 == 2
    # resume: applies the remaining 2 commits
    n2 = replicate_changes(
        spark, src, dst, checkpoint_dir=ckpt, versions_per_batch=1,
    )
    assert n1 + n2 == len(fl_lineage(src)) == 4
    pd.testing.assert_frame_equal(snap(dst), snap(src))

    # crash replay: roll the offset back one commit and re-apply —
    # the replayed delete/upsert must converge to the same state
    lineage = fl_lineage(src)
    with open(os.path.join(ckpt, "offset.json"), "w") as f:
        _json.dump({"last_version": lineage[-2]}, f)
    n3 = replicate_changes(
        spark, src, dst, checkpoint_dir=ckpt, versions_per_batch=1,
    )
    assert n3 == 1
    pd.testing.assert_frame_equal(snap(dst), snap(src))


def test_feed_crosses_restore_as_compensating_changes(
    spark, sf_dir, tmp_path
):
    """RESTORE is itself a commit, so the feed must emit the rollback
    as compensating changes (undoing v2's U/I), and a consumer that
    applies the whole feed lands exactly on the restored state."""
    from citybikedatawarehouse_spark.operators.table_format import (
        fl_restore,
    )

    root = str(tmp_path / "feed_restore")
    o = _orders(spark, sf_dir).limit(500)
    fl_init(
        spark, root, o, key="o_orderkey",
        zorder_by=("o_orderkey",), layout_files=2,
    )
    v1 = fl_current_version(root)
    hi = o.agg(F.max("o_orderkey")).first()[0]
    ups = (
        o.orderBy("o_orderkey").limit(5)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(5.0))
    )
    ins = o.orderBy("o_orderkey").limit(2).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(hi + 1)
    )
    fl_merge_upsert(spark, root, ups.unionByName(ins), key="o_orderkey")
    fl_restore(spark, root, v1)

    batches = []
    run_fl_changes_stream(
        spark, root, lambda df, off: batches.append(df.toPandas()),
        from_version=v1, versions_per_batch=1,
    )
    assert len(batches) == 2
    # batch 1: the merge (5 U + 2 I); batch 2: the rollback undoes it
    # (5 U back to the original payload, 2 D for the inserts)
    ops1 = batches[0]["op"].value_counts().to_dict()
    ops2 = batches[1]["op"].value_counts().to_dict()
    assert ops1 == {"U": 5, "I": 2}
    assert ops2 == {"U": 5, "D": 2}
    # net application of both batches = restored (= v1) state
    from citybikedatawarehouse_spark.operators.table_format import fl_read

    snap_v1 = fl_read(spark, root, v1).toPandas()
    import pandas as pd

    feed = pd.concat(batches, ignore_index=True)
    head = fl_read_mor(spark, root).toPandas()
    want = {
        r["o_orderkey"]: (r["o_custkey"], round(float(r["o_totalprice"]), 2))
        for _, r in head.iterrows()
    }
    assert _apply_feed(snap_v1, feed) == want


def test_live_loop_write_stream_to_read_stream(spark, tmp_path):
    """The full loop LIVE: a streaming epoch sink commits
    micro-batches into the table WHILE the CDC feed streams them
    back out concurrently — write stream -> table -> read stream.
    After both stop (plus a final catch-up drain), the feed applied
    over the initial snapshot equals the table's head state."""
    import pandas as pd

    from citybikedatawarehouse_spark.operators.table_format import (
        fl_read,
    )
    from citybikedatawarehouse_spark.streaming.incremental import (
        start_fl_upsert_stream,
    )

    root = str(tmp_path / "liveloop")
    ckpt = str(tmp_path / "liveloop_ckpt")
    seed = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    )
    fl_init(spark, root, seed, key="k", zorder_by=("k",), layout_files=2)
    v1 = fl_current_version(root)

    # writer: rate ticks -> (k = value % 80, v = value); keys 50-79
    # are inserts, the rest updates; value is the last-wins order
    updates = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 40)
        .load()
        .select(
            (F.col("value") % 80).alias("k"), F.col("value").alias("v")
        )
    )
    sink = start_fl_upsert_stream(
        updates, root, key="k", dedup_order_col="v", txn_app_id=root
    )

    feed_batches = []
    reader = start_fl_changes_feed(
        spark,
        root,
        lambda df, off: feed_batches.append(df.toPandas()),
        from_version=v1,
        versions_per_batch=1,
        checkpoint_dir=ckpt,
        ticks_per_second=4,
    )
    try:
        deadline = time.monotonic() + 90
        # run until the sink has committed a few epochs AND the live
        # reader has delivered at least two of them concurrently
        while time.monotonic() < deadline and (
            len(fl_lineage(root)) < 4 or len(feed_batches) < 2
        ):
            time.sleep(0.5)
    finally:
        sink.stop()
        reader.stop()
    assert len(fl_lineage(root)) >= 4, "sink committed too few epochs"
    assert len(feed_batches) >= 2, "live reader never caught a commit"

    # drain whatever the live reader had not yet consumed (same
    # checkpoint -> continues exactly where it stopped)
    run_fl_changes_stream(
        spark,
        root,
        lambda df, off: feed_batches.append(df.toPandas()),
        checkpoint_dir=ckpt,
    )

    snap_v1 = fl_read(spark, root, v1).toPandas()
    feed = pd.concat(feed_batches, ignore_index=True)
    head = fl_read_mor(spark, root).toPandas()
    want = {
        r["k"]: r["v"] for _, r in head.iterrows()
    }
    state = {r["k"]: r["v"] for _, r in snap_v1.iterrows()}
    for _, r in feed.sort_values("_commit_version", kind="stable").iterrows():
        if r["op"] == "D":
            state.pop(r["k"], None)
        else:
            state[r["k"]] = r["v"]
    assert state == want
