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
