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
from pyspark.sql import functions as F


def _fs_swap(spark: SparkSession, staging: str, target: str, backup: str) -> None:
    """Swap ``staging`` into place over ``target`` through the Hadoop
    ``FileSystem`` API (rename target->backup, staging->target, delete
    backup) instead of ``shutil`` — so the same code path runs on any
    Hadoop-supported store, not just the local POSIX filesystem.

    Atomicity caveat: HDFS (and local fs) rename is atomic, so a crash
    mid-swap leaves either the old directory or the new one. On object
    stores (S3A and friends) "rename" is a server-side COPY + DELETE —
    there is a window where readers see a partial table. At that scale
    use a transactional table format (Delta/Iceberg) or publish into a
    versioned directory and flip a pointer; this helper is the plain-
    Parquet fallback, correct-on-crash only where rename is native.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path
    fs = jpath(target).getFileSystem(hconf)
    if not fs.rename(jpath(target), jpath(backup)):
        raise IOError(f"swap: rename {target} -> {backup} failed")
    if not fs.rename(jpath(staging), jpath(target)):
        # roll back so the table is never missing
        fs.rename(jpath(backup), jpath(target))
        raise IOError(f"swap: rename {staging} -> {target} failed")
    fs.delete(jpath(backup), True)


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
    _fs_swap(spark, staging, path, path.rstrip("/") + "__precompact")
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

    MERGE semantics require the source keys to be unique (SQL MERGE
    raises on multiple matches for one target row); a duplicate-key
    ``updates`` would silently produce a duplicate-key result table,
    so it is rejected up front.

    Durability: the merged result is written to a STAGING directory
    first, then swapped in (target moved aside as backup, staging
    renamed over it, backup removed) — the same pattern as
    ``compact_parquet``, through the Hadoop FileSystem API
    (``_fs_swap``; atomic where rename is native — HDFS/local — with
    a documented copy-window caveat on object stores). The target
    files are never deleted before a complete replacement exists on
    disk, so a crash mid-merge leaves either the old table or the
    new one, never neither. (A plain ``mode('overwrite')`` on the
    target would delete it first and hold the only copy in
    non-replicated executor memory.)

    Scale path: on a transactional table format (Delta/Iceberg,
    jars not present in this sandbox) this is a real MERGE with
    file-level pruning; on partitioned plain Parquet use
    ``merge_upsert_partitioned`` — it rewrites only the partitions
    the update keys touch (dynamic partition overwrite) instead of
    this full-table rewrite. On stores where rename is NOT atomic
    (object stores), use ``merge_upsert_manifest`` — versioned data
    directories published by a one-file pointer flip, crash-
    consistent everywhere. The emulation keeps identical semantics
    at any scale — only the rewrite/commit granularity changes."""
    n_updates = updates.count()
    n_update_keys = updates.select(key).distinct().count()
    if n_update_keys != n_updates:
        raise ValueError(
            f"merge_upsert: updates has {n_updates - n_update_keys} "
            f"duplicate '{key}' rows; MERGE requires unique source keys"
        )
    target = spark.read.parquet(target_path)
    matched = target.join(updates.select(key), key, "left_semi")
    n_replaced = matched.count()
    n_inserted = n_updates - n_replaced
    kept = target.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    staging = target_path.rstrip("/") + "__merging"
    merged.write.mode("overwrite").parquet(staging)
    _fs_swap(spark, staging, target_path, target_path.rstrip("/") + "__premerge")
    return n_replaced, n_inserted


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    partition_cols: tuple[str, ...],
) -> tuple[int, int]:
    """Partition-pruned MERGE on a ``partitionBy(*partition_cols)``
    parquet table: identical semantics to ``merge_upsert`` but only
    the partitions the update keys touch are rewritten — the scale
    shape for a year/month-partitioned 100 TB fact where a day's
    upsert touches one partition, not the table. Returns
    (n_replaced, n_inserted).

    How: the touched-partition set = the updates' own partition
    values (routes inserts) — after verifying no matched key CHANGES
    partition (target semi-join on key, partition tuples compared).
    The target is then read WITH a partition filter (Catalyst prunes
    the scan to those directories), merged exactly like
    ``merge_upsert``, and written back under
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` — Spark
    replaces only the partition directories present in the written
    frame, atomically per partition via the file commit protocol; no
    staging swap of the whole table, untouched partition files are
    never opened, listed for rewrite, or re-committed.

    A key whose update row lands in a DIFFERENT partition than its
    current target row is rejected: dynamic overwrite could then
    leave the stale row behind in a partition the write never
    touches (worse, silently). Partition-moving upserts need the
    full-table ``merge_upsert`` (or a real MERGE on Delta/Iceberg).
    """
    n_updates = updates.count()
    n_update_keys = updates.select(key).distinct().count()
    if n_update_keys != n_updates:
        raise ValueError(
            f"merge_upsert_partitioned: updates has "
            f"{n_updates - n_update_keys} duplicate '{key}' rows; "
            f"MERGE requires unique source keys"
        )
    if n_updates == 0:
        return 0, 0
    pcols = list(partition_cols)
    target = spark.read.parquet(target_path)
    # a matched key must stay in its partition — join target rows to
    # their update row and compare partition tuples
    moved = (
        target.select(key, *pcols)
        .join(
            updates.select(key, *[F.col(c).alias(f"__u_{c}") for c in pcols]),
            key,
        )
        .where(
            ~F.struct(*pcols).eqNullSafe(
                F.struct(*[F.col(f"__u_{c}").alias(c) for c in pcols])
            )
        )
    )
    n_moved = moved.count()
    if n_moved:
        raise ValueError(
            f"merge_upsert_partitioned: {n_moved} matched key(s) change "
            f"partition {pcols}; dynamic partition overwrite would leave "
            f"stale rows — use merge_upsert (full rewrite) for "
            f"partition-moving upserts"
        )
    # touched partitions: small distinct list (bounded by the number
    # of partition directories an upsert batch spans), rendered as an
    # OR of equality conjunctions — the exact shape Catalyst's
    # partition pruning recognizes, so the target scan lists only the
    # touched directories
    touched = [
        tuple(r[c] for c in pcols)
        for r in updates.select(*pcols).distinct().collect()
    ]
    from functools import reduce

    part_filter = reduce(
        lambda a, b: a | b,
        [
            reduce(
                lambda a, b: a & b,
                [F.col(c).eqNullSafe(F.lit(v)) for c, v in zip(pcols, t)],
            )
            for t in touched
        ],
    )
    slice_df = target.where(part_filter)
    matched = slice_df.join(updates.select(key), key, "left_semi")
    n_replaced = matched.count()
    n_inserted = n_updates - n_replaced
    kept = slice_df.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(*pcols)
            .parquet(target_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n_replaced, n_inserted


# ---------------------------------------------------------------------------
# manifest-pointer table: crash-consistent commits on plain parquet
# ---------------------------------------------------------------------------

_MANIFEST = "_MANIFEST"


def _manifest_path(root: str) -> str:
    return os.path.join(root, _MANIFEST)


def manifest_current(root: str) -> str:
    """Path of the table's current committed version directory (the
    one the ``_MANIFEST`` pointer names). Raises if the table was
    never initialized — an uncommitted staging write must NOT be
    readable, that is the whole point."""
    with open(_manifest_path(root)) as f:
        version = f.read().strip()
    if not version:
        raise IOError(f"manifest table {root}: empty _MANIFEST")
    return os.path.join(root, version)


def manifest_read(spark: SparkSession, root: str) -> DataFrame:
    """Read the current committed version of a manifest table."""
    return spark.read.parquet(manifest_current(root))


def _manifest_commit(root: str, version: str) -> None:
    """Flip the pointer: write ``_MANIFEST.tmp``, fsync it, then
    atomically rename over ``_MANIFEST`` (``os.replace`` — POSIX
    atomic; on HDFS this maps to an atomic single-file rename, on S3
    to an atomic single-object PUT, which is why the pointer is ONE
    tiny file and not the data). A crash anywhere in this function
    leaves either the old pointer (plus a harmless ``.tmp``) or the
    new pointer — never a torn table, because readers only ever
    follow the pointer."""
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(version + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(root))


def _manifest_next_version(root: str) -> str:
    versions = [
        d
        for d in os.listdir(root)
        if d.startswith("v") and d[1:].isdigit()
    ]
    n = max((int(d[1:]) for d in versions), default=0) + 1
    return f"v{n:08d}"


def manifest_init(spark: SparkSession, root: str, df: DataFrame) -> str:
    """Create a manifest table at ``root`` with ``df`` as version 1.
    Returns the committed version directory name."""
    os.makedirs(root, exist_ok=True)
    version = _manifest_next_version(root)
    df.write.mode("errorifexists").parquet(os.path.join(root, version))
    _manifest_commit(root, version)
    return version


def manifest_vacuum(root: str, keep: int = 2) -> list[str]:
    """Delete version directories older than the newest ``keep``,
    never touching the current pointer's target (asserted). Returns
    the removed directory names. Run AFTER readers of old versions
    have drained (time-travel retention is the caller's policy)."""
    import shutil

    current = os.path.basename(manifest_current(root))
    versions = sorted(
        d for d in os.listdir(root) if d.startswith("v") and d[1:].isdigit()
    )
    to_drop = [d for d in versions[:-keep] if d != current]
    for d in to_drop:
        shutil.rmtree(os.path.join(root, d))
    return to_drop


def compact_manifest(
    spark: SparkSession,
    root: str,
    target_file_mb: int = 128,
    sort_by: tuple[str, ...] = (),
) -> str:
    """``compact_parquet`` for manifest tables: rewrite the current
    version into ~target-sized files as a NEW version and flip the
    pointer — compaction becomes just another commit, with the same
    crash matrix as ``merge_upsert_manifest`` (readers never see a
    half-compacted table, and the pre-compaction version stays
    readable until vacuumed). Returns the new version name."""
    cur = manifest_current(root)
    df = spark.read.parquet(cur)
    _, total = parquet_file_stats(cur)
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    out = (
        df.repartitionByRange(n_files, *sort_by)
        if sort_by
        else df.coalesce(n_files)
    )
    version = _manifest_next_version(root)
    out.write.mode("errorifexists").parquet(os.path.join(root, version))
    _manifest_commit(root, version)
    return version


def merge_upsert_manifest(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str,
    _crash_before_commit: bool = False,
) -> tuple[int, int]:
    """``merge_upsert`` with a MANIFEST-POINTER commit instead of the
    directory swap: the merged result is written to a brand-new
    version directory, then a one-file pointer flip publishes it —
    write-new, fsync manifest, atomic replace. This is the
    crash-consistency mode for stores where directory rename is NOT
    atomic (object stores: S3A rename = copy+delete with a visible
    partial window — the ``_fs_swap`` caveat): here the data files
    are immutable once written and the only mutation readers can
    observe is the single-object pointer update. The same layout is
    the kernel of Delta/Iceberg's log; this is the minimal
    dependency-free form of it.

    Crash matrix (exercised by the crash-injection test):
    - before/while writing the new version dir -> pointer untouched,
      readers keep the full old version; the orphan staging dir is
      retried/ignored (a re-run writes the NEXT version number).
    - between data write and pointer flip
      (``_crash_before_commit``) -> same as above.
    - mid pointer write -> ``.tmp`` is torn but ``_MANIFEST`` is
      only ever REPLACED atomically; readers keep the old version.

    Returns (n_replaced, n_inserted). Old versions remain readable
    (time travel) until ``manifest_vacuum``.
    """
    n_updates = updates.count()
    n_update_keys = updates.select(key).distinct().count()
    if n_update_keys != n_updates:
        raise ValueError(
            f"merge_upsert_manifest: updates has "
            f"{n_updates - n_update_keys} duplicate '{key}' rows; "
            f"MERGE requires unique source keys"
        )
    target = manifest_read(spark, root)
    matched = target.join(updates.select(key), key, "left_semi")
    n_replaced = matched.count()
    n_inserted = n_updates - n_replaced
    kept = target.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    version = _manifest_next_version(root)
    merged.write.mode("errorifexists").parquet(os.path.join(root, version))
    if _crash_before_commit:
        raise RuntimeError(
            "merge_upsert_manifest: injected crash between data write "
            "and pointer flip (test hook)"
        )
    _manifest_commit(root, version)
    return n_replaced, n_inserted


def cdc_extract(
    old: DataFrame,
    new: DataFrame,
    key: str,
    payload_cols: tuple[str, ...],
) -> DataFrame:
    """Change-data EXTRACTION: diff two table snapshots into the
    minimal insert/update/delete op log — the inverse of the CDC
    APPLY path (q252 / streaming cdc_epoch_step), closing the loop:
    ``apply(extract(old, new), old) == new`` (asserted in tests).
    This is what a snapshot-based pipeline ships downstream when the
    source system has no log (the Debezium-less fallback), and the
    I/U/D census it yields is the audit a lakehouse writer records
    per commit.

    One full outer join on the key classifies every row: new-only ->
    I, old-only -> D, both-with-different-payload -> U, identical ->
    no row (the log stays MINIMAL — re-extracting after apply yields
    an empty log, also asserted). Null-safe payload comparison via
    struct eqNullSafe, so NULL -> value and value -> NULL both count
    as updates.

    Scale shape: one key-partitioned shuffle join; output is
    O(changed rows), not O(table). On bucketed-by-key snapshots the
    join is co-located and shuffle-free."""
    pc = list(payload_cols)
    o = old.select(key, F.struct(*pc).alias("__old"))
    n = new.select(key, F.struct(*pc).alias("__new"))
    j = o.join(n, key, "full_outer")
    return (
        j.select(
            F.when(F.col("__old").isNull(), F.lit("I"))
            .when(F.col("__new").isNull(), F.lit("D"))
            .when(
                ~F.col("__old").eqNullSafe(F.col("__new")), F.lit("U")
            )
            .otherwise(F.lit(None))
            .alias("op"),
            F.col(key),
            F.coalesce(F.col("__new"), F.col("__old")).alias("payload"),
        )
        .where(F.col("op").isNotNull())
        .select("op", key, "payload.*")
    )


def bucket_digest(
    snapshot: DataFrame,
    key: str,
    payload_cols: tuple[str, ...],
    n_buckets: int = 64,
    n_col: str = "n",
    digest_col: str = "digest",
) -> DataFrame:
    """Merkle-style bucket digest of a table snapshot: md5 each row's
    (key, payload) to a 60-bit value (15 hex chars — fits a signed
    BIGINT identically in Spark and DuckDB) and XOR-fold per key
    bucket. XOR is order-insensitive, mergeable, and cannot overflow;
    its one blind spot — an even number of IDENTICAL rows cancelling
    — cannot occur when the key participates in every row hash.

    Two digests disagree on a bucket iff the bucket's row multiset
    differs (modulo the 2^-60 xor-collision risk, which is why
    callers compare row counts alongside — q270 does). This is the
    anti-entropy primitive replicated stores repair with
    (Dynamo/Cassandra) and the SCALE pre-filter in front of
    ``cdc_extract``: at 100 TB you ship ``n_buckets`` digest rows per
    snapshot, then run the row-level full-outer join ONLY inside the
    few differing buckets.

    Row encoding is injective: each column becomes a fixed segment —
    its own 32-hex-char md5, or the literal token ``NULL`` when the
    value is NULL. ``N``/``U``/``L`` are not hex characters, so no
    value segment can imitate the null token, and the fixed 32-char
    block width removes delimiter ambiguity (a naive
    ``concat_ws(':')`` would skip NULLs entirely — ``(k, NULL, 'x')``
    == ``(k, 'x', NULL)`` — and let payload values containing the
    delimiter shift column boundaries). One caveat remains: columns
    are hashed via CAST TO STRING, so engines must agree on the cast
    rendering — integers/strings/decimals do; raw floats may not
    (round to fixed precision first, as q270's cents column does).

    Scale shape: one scan folding map-side into an ``n_buckets``-row
    aggregate; the only shuffle is those rows. Returns
    (bucket, <n_col>, <digest_col>).
    """
    segments = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("NULL"))
        for c in (key, *payload_cols)
    ]
    row_hash = F.conv(
        F.substring(F.md5(F.concat(*segments)), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (
        snapshot.withColumn("__rh", row_hash)
        .groupBy((F.col(key) % n_buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias(n_col),
            F.expr("bit_xor(__rh)").cast("bigint").alias(digest_col),
        )
    )


def zone_map_stats(
    spark: SparkSession, path: str, cols: tuple[str, ...]
) -> DataFrame:
    """Per-file zone map: (file, n_rows, min_<c>, max_<c> per stats
    column) for every parquet data file under ``path``. The read-side
    half of multi-dimensional data skipping — q77's Z-order key keeps
    each file's min/max box TIGHT at write time; this table is what a
    reader consults to skip files whose box cannot intersect a
    predicate. Parquet footers already carry these stats per
    row-group, and table formats (Delta/Iceberg) lift them into the
    commit log; this builds the same relation engine-side so the
    pruning contract is testable on plain parquet, with no format
    dependency.

    Scale shape: one scan that folds map-side into ONE row per file
    (groupBy input_file_name is keyed by file, and a file's rows are
    co-located in its scan partitions, so partial aggregation
    collapses nearly everything before the |files|-row shuffle). At
    100 TB the stats table is O(files) ~ 10^5-10^6 tiny rows — this
    is the relation you persist alongside the table (or in the
    metastore) and incrementally append to on ingest, not rebuild
    per query."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def zonemap_prune_files(
    stats: DataFrame, col: str, lo, hi
) -> tuple[list[str], int]:
    """Files whose [min_<col>, max_<col>] zone intersects [lo, hi],
    plus the total file count. Interval-overlap test with NULL
    safety: a file whose stats are NULL for the column (all-NULL
    zone, or stats never collected) is KEPT — pruning may only ever
    skip a file PROVEN disjoint, never one merely unknown, or
    skipping becomes a wrong-answer bug instead of a missed
    optimization.

    The collect here is the stats relation itself — O(files) tiny
    rows, the same thing Spark's own driver-side file index (or a
    Delta/Iceberg snapshot) holds to plan any scan; pruning shrinks
    what the executors read, it does not add driver state beyond
    the listing that already exists."""
    rows = stats.select("file", f"min_{col}", f"max_{col}").collect()
    keep = [
        r["file"]
        for r in rows
        if r[f"min_{col}"] is None
        or r[f"max_{col}"] is None
        or not (r[f"max_{col}"] < lo or r[f"min_{col}"] > hi)
    ]
    return keep, len(rows)


def manifest_versions(root: str) -> list[str]:
    """All committed-or-orphan version directories of a manifest
    table, oldest first. The current pointer's target is always a
    member; earlier entries are readable history until
    ``manifest_vacuum`` drops them; an entry NEWER than the pointer
    is an orphan from a crashed writer (readable by nobody who
    follows the pointer — exactly the crash contract)."""
    return sorted(
        d
        for d in os.listdir(root)
        if d.startswith("v") and d[1:].isdigit()
    )


def manifest_read_version(
    spark: SparkSession, root: str, version: str
) -> DataFrame:
    """Time-travel read: a SPECIFIC committed version of a manifest
    table, bypassing the current pointer. Versions are immutable
    once written (commits only ever ADD a directory and flip the
    pointer), so this read is a consistent snapshot with no
    coordination — the Delta/Iceberg ``VERSION AS OF``, in the
    dependency-free manifest layout."""
    p = os.path.join(root, version)
    if not os.path.isdir(p):
        raise IOError(
            f"manifest table {root}: no version {version!r} "
            f"(have {manifest_versions(root)})"
        )
    return spark.read.parquet(p)


def zone_map_append(
    spark: SparkSession, path: str, stats: DataFrame
) -> DataFrame:
    """Incrementally maintain a zone map after an append: compute
    min/max stats ONLY for data files not yet in ``stats`` and union
    them in — making the "persist the stats, don't rebuild per
    query" contract real. The stats columns are inferred from the
    existing relation (min_<c>/max_<c> pairs), so the appended rows
    carry the same schema.

    Scale shape: the incremental scan reads ONLY the new files
    (explicit path list -> Spark's file index holds just those), and
    the fold is O(new files) rows; the untouched history's stats are
    never recomputed. This is what ingest does at 100 TB — per-batch
    stats appended to the metastore — vs ``zone_map_stats``'s full
    rebuild, which exists for bootstrap and repair."""
    cols = [
        c[len("min_"):]
        for c in stats.columns
        if c.startswith("min_") and f"max_{c[len('min_'):]}" in stats.columns
    ]
    def _norm(p: str) -> str:
        # input_file_name() renders local files as file:/// URIs;
        # os.walk yields plain paths — compare scheme-stripped
        if p.startswith("file:"):
            return "/" + p[5:].lstrip("/")
        return p

    known = {_norm(r["file"]) for r in stats.select("file").collect()}
    all_files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    new_files = [f for f in all_files if _norm(f) not in known]
    if not new_files:
        return stats
    df = spark.read.parquet(*new_files)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    fresh = df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    return stats.select(fresh.columns).unionByName(fresh)
