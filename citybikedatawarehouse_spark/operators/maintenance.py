"""Warehouse maintenance: small-file compaction.

Streaming sinks and frequent incremental appends (the reference's
``if_exists='append'`` pattern) fragment a table into many small
files; at scale, scan cost becomes dominated by file-open overhead
and the NameNode/listing path. Compaction rewrites a parquet
directory into size-targeted files.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of the parquet data files under
    ``path`` (recursive — includes partition subdirs)."""
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_by: tuple[str, ...] = (),
) -> DataFrame:
    """Rewrite the parquet directory into ~target-sized files.

    Reads, coalesces to ceil(bytes/target) files (repartitionByRange
    when ``sort_by`` given — also restores clustering, which feeds
    min/max-based row-group skipping), writes to a staging dir, then
    swaps. Returns the compacted DataFrame handle.
    """
    df = spark.read.parquet(path)
    _, total = parquet_file_stats(path)
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartitionByRange(n_files, *sort_by)
    else:
        out = df.coalesce(n_files)
    staging = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(staging)
    # atomic-ish swap (same filesystem)
    import shutil

    backup = path.rstrip("/") + "__precompact"
    shutil.move(path, backup)
    shutil.move(staging, path)
    shutil.rmtree(backup)
    return spark.read.parquet(path)


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    key: str,
) -> tuple[int, int]:
    """MERGE INTO emulation on plain Parquet: rows in ``updates``
    replace target rows with the same ``key``; unmatched update rows
    are inserted; all other target rows carry over. Returns
    (n_replaced, n_inserted).

    Self-overwrite safety: the merged result is materialized
    (localCheckpoint) BEFORE the overwrite — Spark cannot write over
    files an active plan still reads (the classic self-join-overwrite
    failure), and the checkpoint severs that dependency. Counts ride
    the same materialization, so the write is one extra action.

    Scale path: on a transactional table format (Delta/Iceberg,
    jars not present in this sandbox) this is a real MERGE with
    file-level pruning; on partitioned plain Parquet, restrict the
    rewrite to the partitions the update keys touch (dynamic
    partition overwrite) rather than this full-table rewrite. The
    emulation keeps identical semantics at any scale — only the
    rewrite granularity changes."""
    target = spark.read.parquet(target_path)
    matched = target.join(updates.select(key), key, "left_semi")
    n_replaced = matched.count()
    n_inserted = updates.count() - n_replaced
    kept = target.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns)).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(target_path)
    return n_replaced, n_inserted
