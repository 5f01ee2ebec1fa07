"""Cross-batch streaming dedup with persistent digest state.

``dropDuplicatesWithinWatermark`` (windows.py) bounds its state by
the watermark horizon — correct for event streams, wrong for corpus
ingestion, where "have we EVER seen this document" has no horizon.
This module is the streaming twin of q86_incremental_dedup
(plans/curation.py): each micro-batch is deduplicated within itself
(min-id survivor per digest — deterministic regardless of arrival
order inside the batch) and against a persistent digest-state table,
survivors are appended to the output corpus and their digests to the
state.

State is a plain parquet directory of 32-byte digests. At scale the
same loop runs unchanged with the state in a transactional table
format (Delta/Iceberg MERGE) or behind a Bloom-filter pre-check; the
anti-join already shuffles only digests, never text (q60's rule).
foreachBatch makes each micro-batch a normal batch job, so the whole
dedup plan — including AQE and broadcast of a small state side — is
the oracle-verified batch plan, executed incrementally.

Epoch replays (failure recovery) are tolerated by routing BOTH
writes to epoch-keyed subdirectories (the idempotent-sink pattern of
windows.run_foreach_batch_parquet): a replayed epoch overwrites its
own output AND its own state slice, and the state read excludes the
current epoch — so a batch can never anti-join against digests its
own crashed attempt recorded (which would yield an empty "fresh"
that overwrites the epoch dir holding the real survivors). Both
writes are idempotent under replay on plain parquet; at scale the
same loop gains atomicity-per-write from a transactional table
format (Delta/Iceberg), with the epoch key doubling as the
partition column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

DIGEST_STATE_SCHEMA = T.StructType(
    [T.StructField("digest", T.StringType(), False)]
)


def dedup_batch_against_state(
    batch: DataFrame, state_df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """One batch step: digest, within-batch min-id survivor, then
    anti-join against the accumulated state. Pure function of
    (batch, state) — unit-testable without a stream, and exactly the
    q86 batch shape."""
    digested = batch.withColumn("digest", F.md5(F.col(text_col)))
    w = Window.partitionBy("digest").orderBy(id_col)
    in_batch = (
        digested.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return in_batch.join(state_df, "digest", "left_anti")


def start_scd2_stream(
    updates_stream: DataFrame,
    state_dir: str,
    key: str,
    attrs: list[str],
    effective_ts: str,
):
    """Streaming SCD2 maintenance: each micro-batch of dimension
    updates is collapsed to its latest row per key (history inside
    one micro-batch is batch-granular — only the newest version
    opens; ordering is (effective_ts, attrs) descending, so the
    survivor is deterministic even for same-timestamp conflicts) and
    merged into the persistent dimension with operators.scd.scd2_merge
    — the incremental upsert-with-history the reference's
    ``if_exists='replace'`` wholesale reload loses.

    The state parquet is rewritten via staging-dir swap each epoch
    (the dimension is read lazily while being replaced; at scale this
    rewrite is a transactional-format MERGE and only touched
    partitions rewrite). First batch bootstraps via scd2_init."""
    import shutil

    from citybikedatawarehouse_spark.operators.scd import scd2_init, scd2_merge

    spark = updates_stream.sparkSession

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        w = Window.partitionBy(key).orderBy(
            F.col(effective_ts).desc(), *[F.col(a).desc() for a in attrs]
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        has_state = os.path.isdir(state_dir) and any(
            f.endswith(".parquet") for f in os.listdir(state_dir)
        )
        if has_state:
            dim = spark.read.parquet(state_dir)
            merged = scd2_merge(dim, latest, key, attrs, effective_ts)
        else:
            merged = scd2_init(latest, key, effective_ts)
        staging = state_dir.rstrip("/") + "__staging"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)
        os.rename(staging, state_dir)

    return updates_stream.writeStream.foreachBatch(step).start()


def start_incremental_dedup(
    docs_stream: DataFrame,
    out_dir: str,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start the streaming dedup: survivors land under
    ``out_dir/epoch=N``, digests under ``state_dir/epoch=N``.
    Returns the started query (caller processes/stops).

    Replay safety: the state READ unions every epoch slice EXCEPT the
    current one, and both writes are per-epoch overwrites — a batch
    replayed after a crash between the two writes sees exactly the
    state its first attempt saw, recomputes the same survivors, and
    overwrites both directories idempotently (the flat-append shape
    this replaced could anti-join a replay against its own digests
    and wipe the epoch's real survivors with an empty write)."""
    spark = docs_stream.sparkSession

    def _state_for(epoch_id: int) -> DataFrame:
        dirs = []
        if os.path.isdir(state_dir):
            dirs = [
                os.path.join(state_dir, d)
                for d in os.listdir(state_dir)
                if d.startswith("epoch=") and d != f"epoch={epoch_id}"
            ]
        if not dirs:
            return spark.createDataFrame([], DIGEST_STATE_SCHEMA)
        return spark.read.schema(DIGEST_STATE_SCHEMA).parquet(*dirs)

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        fresh = dedup_batch_against_state(
            batch_df, _state_for(epoch_id), id_col, text_col
        ).localCheckpoint()  # two consumers below; don't replay the join
        fresh.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        fresh.select("digest").write.mode("overwrite").parquet(
            f"{state_dir}/epoch={epoch_id}"
        )

    return docs_stream.writeStream.foreachBatch(step).start()
