"""File-list manifest table format: O(touched-files) MERGE.

The directory-version manifest (operators/maintenance.py,
``manifest_init``/``merge_upsert_manifest``) rewrites the WHOLE table
per commit — correct, but at 100 TB a merge that touches 0.1 % of the
keys cannot cost a full rewrite. This module is the file-level form,
the actual kernel of Delta/Iceberg:

- a **version is a manifest**: a small driver-side relation of
  ``(path, n_rows, min_/max_ stats per tracked column)`` — the zone
  map IS the manifest, so data skipping and merge targeting read the
  same artifact and cannot desync from each other;
- **data files are immutable and SHARED across versions**: a commit
  writes only new files and a new manifest referencing
  (untouched-old + new); time travel is free and vacuum is reference
  counting;
- **MERGE rewrites only intersecting files**: update keys are
  range-joined against the manifest's per-file key zones, files whose
  zone cannot contain any update key are carried forward by
  reference — merge cost is O(touched files + updates), not O(table).
  Pure inserts beyond every file's key range touch ZERO existing
  files;
- **commit = one pointer flip** (write files -> write manifest ->
  fsync+rename ``_MANIFEST``), the same crash matrix as the directory
  format: readers follow the pointer and can never see a torn table,
  a half-written manifest, or stats inconsistent with data.

Layout on disk::

    root/_MANIFEST                      # pointer: current version name
    root/_manifests/v00000001.parquet   # manifest (pyarrow, 1 file)
    root/_manifests/v00000001.props.json
    root/data/c_v00000001/part-*.parquet  # immutable data files

Scale shape: the manifest is O(files) tiny rows — the same
cardinality Spark's own file index holds to plan any scan; every
driver-side operation here (targeting, pruning, vacuum ref-count) is
over that relation, never the data. Executors only ever read the
file subset a manifest names and write the new files of one commit.

Cites: reference's sink is ``to_sql(if_exists='append'|'replace')``
(create_db_from_csv.py) — no versioning, no incremental merge; this
is the §2.4 warehouse-gap surface at its 100 TB shape.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.operators.maintenance import (
    _apply_layout,
    _manifest_commit,
    _norm_file_uri,
    read_pruned_files,
    zone_map_stats,
)

_MANIFEST_DIR = "_manifests"


def _pointer_path(root: str) -> str:
    return os.path.join(root, "_MANIFEST")


def fl_current_version(root: str) -> str:
    """Name of the committed current version (pointer target)."""
    with open(_pointer_path(root)) as f:
        version = f.read().strip()
    if not version:
        raise IOError(f"filelist table {root}: empty _MANIFEST")
    return version


def fl_versions(root: str) -> list[str]:
    """All committed-or-orphan manifest versions, oldest first (an
    entry newer than the pointer is a crashed writer's orphan —
    invisible to pointer-following readers)."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    return sorted(
        f[: -len(".parquet")]
        for f in os.listdir(mdir)
        # exactly vNNNNNNNN.parquet — NOT the .deletes.parquet or
        # .props.json sidecars that share the version stem
        if f.endswith(".parquet")
        and f[0] == "v"
        and f[1:-len(".parquet")].isdigit()
    )


def _next_version(root: str) -> str:
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    n = max((int(v[1:]) for v in fl_versions(root)), default=0) + 1
    return f"v{n:08d}"


def _manifest_file(root: str, version: str) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"{version}.parquet")


def fl_manifest(root: str, version: str | None = None) -> pd.DataFrame:
    """The manifest relation of a version (current by default):
    one row per data file — (path, n_rows, min_<c>/max_<c> for every
    tracked column). Driver-side pandas on purpose: it is O(files)
    metadata consulted by planning, not data."""
    if version is None:
        version = fl_current_version(root)
    p = _manifest_file(root, version)
    if not os.path.isfile(p):
        raise IOError(
            f"filelist table {root}: no version {version!r} "
            f"(have {fl_versions(root)})"
        )
    return pd.read_parquet(p)


def fl_table_props(root: str, version: str | None = None) -> dict:
    if version is None:
        version = fl_current_version(root)
    p = os.path.join(root, _MANIFEST_DIR, f"{version}.props.json")
    with open(p) as f:
        return json.load(f)


def _write_manifest(
    root: str, version: str, manifest: pd.DataFrame, props: dict
) -> None:
    """Stage a version's manifest + props. NOT visible to readers
    until the pointer flips — both artifacts are keyed by the version
    name, so a crashed writer leaves only orphans."""
    manifest.reset_index(drop=True).to_parquet(
        _manifest_file(root, version), index=False
    )
    with open(
        os.path.join(root, _MANIFEST_DIR, f"{version}.props.json"), "w"
    ) as f:
        json.dump(props, f)


def _stats_of_commit(
    spark: SparkSession, commit_dir: str, cols: tuple[str, ...]
) -> pd.DataFrame:
    """Per-file stats for a commit's freshly-written files — one scan
    folding map-side to O(files) rows (zone_map_stats), paths
    normalized to plain filesystem form."""
    rows = zone_map_stats(spark, commit_dir, cols).collect()
    recs = []
    for r in rows:
        d = r.asDict()
        d["path"] = _norm_file_uri(d.pop("file"))
        recs.append(d)
    cols_order = ["path", "n_rows"] + [
        f"{m}_{c}" for c in cols for m in ("min", "max")
    ]
    return pd.DataFrame(recs)[cols_order]


def _commit_dir(root: str, version: str) -> str:
    return os.path.join(root, "data", f"c_{version}")


def fl_init(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    key: str,
    stats_cols: tuple[str, ...] = (),
    zorder_by: tuple[str, ...] = (),
    layout_files: int = 16,
) -> str:
    """Create a file-list manifest table with ``df`` as version 1.
    The MERGE key's per-file min/max is always tracked (merge
    targeting needs it); ``stats_cols`` adds skipping columns;
    ``zorder_by`` sets the clustering every commit re-applies to the
    files it writes. Cluster by the merge key (or lead with it) to
    make merges file-sparse — the standard Delta guidance."""
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    version = _next_version(root)
    props = {
        "key": key,
        "stats_cols": list(dict.fromkeys((key, *stats_cols))),
        "zorder_by": list(zorder_by),
        "layout_files": layout_files,
    }
    out = _apply_layout(df, props)
    cdir = _commit_dir(root, version)
    out.write.mode("errorifexists").parquet(cdir)
    manifest = _stats_of_commit(spark, cdir, tuple(props["stats_cols"]))
    _write_manifest(root, version, manifest, props)
    _manifest_commit(root, version)
    return version


def fl_read(
    spark: SparkSession, root: str, version: str | None = None
) -> DataFrame:
    """Read a committed version: exactly the files its manifest
    names (files are immutable and shared, so any version is a
    consistent snapshot with no coordination)."""
    paths = sorted(fl_manifest(root, version)["path"])
    if not paths:
        raise IOError(f"filelist table {root}: empty manifest")
    return spark.read.parquet(*paths)


def fl_read_pruned(
    spark: SparkSession,
    root: str,
    preds: dict[str, tuple],
    version: str | None = None,
) -> tuple[DataFrame, int, int]:
    """Zone-map-pruned read straight off the manifest (the stats ARE
    the manifest): keep files whose [min, max] intersects every
    ``col -> (lo, hi)`` range; NULL-stats files always kept; an
    all-pruned result is an empty relation with the table schema.
    Returns (df, n_read, n_total)."""
    m = fl_manifest(root, version)
    props = fl_table_props(root, version)
    missing = [c for c in preds if c not in props["stats_cols"]]
    if missing:
        raise ValueError(
            f"filelist table {root}: no stats for {missing} "
            f"(tracked: {props['stats_cols']})"
        )
    keep = pd.Series(True, index=m.index)
    for col, (lo, hi) in preds.items():
        mn, mx = m[f"min_{col}"], m[f"max_{col}"]
        disjoint = (mx < lo) | (mn > hi)
        keep &= ~(disjoint & mn.notna() & mx.notna())
    files = sorted(m.loc[keep, "path"])
    schema_src = sorted(m["path"])[0]
    return read_pruned_files(spark, files, schema_src), len(files), len(m)


def fl_merge_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str,
    _crash_before_commit: bool = False,
    extra_props: dict | None = None,
) -> tuple[int, int, int, int]:
    """MERGE (upsert) that rewrites ONLY the data files whose key
    zone intersects the update keys; every other file is carried into
    the new version BY REFERENCE. Pure inserts beyond all existing
    key ranges rewrite zero files. Returns
    (n_replaced, n_inserted, files_rewritten, files_total).

    Targeting is exact per file: the distinct update keys are joined
    against the broadcast manifest key-zones (``key BETWEEN min AND
    max``) — a file is touched iff at least one update key falls
    inside its zone (NULL-zone files conservatively touched).
    Touched files are read ONCE; their non-updated rows survive via
    anti-join; updates (matched + fresh inserts) union in; the slice
    is re-clustered on the table's committed Z-order spec and written
    as the commit's new files, sized to the touched-file count so
    file granularity is stable under repeated merges.

    Commit = stage new files -> stage manifest(untouched + new rows)
    + props -> pointer flip. Crash anywhere before the flip leaves
    the old version fully intact (data files are never mutated, the
    old manifest still names them); a replayed merge writes the next
    version number. ``extra_props`` rides the commit (the streaming
    epoch / txnVersion pattern).

    Scale shape: ONE broadcast range join of distinct update keys x
    O(files) zones for targeting; one scan of the touched subset for
    the merge itself; shuffle volume O(touched + updates). The
    100 TB merge this repo's directory-format could not express.
    """
    props = fl_table_props(root)
    if props["key"] != key:
        raise ValueError(
            f"filelist table {root}: merge key {key!r} != table key "
            f"{props['key']!r}"
        )
    n_updates = updates.count()
    if n_updates == 0:
        # empty micro-batches are routine in streaming — a no-op, not
        # an empty commit (which would write an unreadable 0-file dir)
        return 0, 0, 0, len(fl_manifest(root))
    n_update_keys = updates.select(key).distinct().count()
    if n_update_keys != n_updates:
        raise ValueError(
            f"fl_merge_upsert: updates has "
            f"{n_updates - n_update_keys} duplicate '{key}' rows; "
            f"MERGE requires unique source keys"
        )
    m = fl_manifest(root)
    zones = spark.createDataFrame(
        m[["path", f"min_{key}", f"max_{key}"]]
    )
    touched = {
        r["path"]
        for r in updates.select(key)
        .distinct()
        .join(
            F.broadcast(zones),
            (F.col(f"min_{key}").isNull())
            | (F.col(f"max_{key}").isNull())
            | F.col(key).between(F.col(f"min_{key}"), F.col(f"max_{key}")),
        )
        .select("path")
        .distinct()
        .collect()
    }
    untouched_m = m[~m["path"].isin(touched)]
    schema_src = sorted(m["path"])[0]
    touched_df = read_pruned_files(spark, sorted(touched), schema_src)
    # merge-on-read interaction: rows already deleted must not count
    # as matches nor survive into the rewritten files (applying the
    # set here folds those deletes for free), and any update key is
    # REMOVED from the delete set in the same commit — an upsert of a
    # deleted key is a re-insert, and a stale set entry would silently
    # hide it from every reader
    dels = fl_delete_keys(root)
    if len(dels):
        touched_df = touched_df.join(
            F.broadcast(spark.createDataFrame(dels)), key, "left_anti"
        )

    matched = touched_df.join(updates.select(key), key, "left_semi")
    n_replaced = matched.count()
    n_inserted = n_updates - n_replaced
    kept = touched_df.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates.select(*touched_df.columns))

    version = _next_version(root)
    slice_props = {**props, "layout_files": max(1, len(touched))}
    cdir = _commit_dir(root, version)
    _apply_layout(merged, slice_props).write.mode(
        "errorifexists"
    ).parquet(cdir)
    fresh = _stats_of_commit(spark, cdir, tuple(props["stats_cols"]))
    manifest = pd.concat([untouched_m, fresh], ignore_index=True)
    if extra_props:
        props = {**props, **extra_props}
    _write_manifest(root, version, manifest, props)
    if len(dels):
        surviving = dels[
            ~dels[key].isin(
                [r[key] for r in updates.select(key).distinct().collect()]
            )
        ]
        if len(surviving):
            surviving.reset_index(drop=True).to_parquet(
                _deletes_file(root, version), index=False
            )
    if _crash_before_commit:
        raise RuntimeError(
            "fl_merge_upsert: injected crash between manifest write "
            "and pointer flip (test hook)"
        )
    _manifest_commit(root, version)
    return n_replaced, n_inserted, len(touched), len(m)


def fl_vacuum(spark: SparkSession, root: str, keep: int = 2) -> list[str]:
    """Reference-counting vacuum: drop manifests older than the
    newest ``keep`` (never the pointer's target), then delete every
    data file no kept manifest references. Shared files survive as
    long as ANY kept version names them — deleting a version can
    never corrupt another. Returns deleted file paths."""
    current = fl_current_version(root)
    versions = fl_versions(root)
    drop = [v for v in versions[:-keep] if v != current]
    keep_versions = [v for v in versions if v not in drop]
    referenced: set[str] = set()
    for v in keep_versions:
        referenced |= set(fl_manifest(root, v)["path"])
    doomed: set[str] = set()
    for v in drop:
        doomed |= set(fl_manifest(root, v)["path"]) - referenced
        os.remove(_manifest_file(root, v))
        for sidecar in (
            os.path.join(root, _MANIFEST_DIR, f"{v}.props.json"),
            _deletes_file(root, v),
        ):
            if os.path.isfile(sidecar):
                os.remove(sidecar)
    for p in sorted(doomed):
        os.remove(p)
    return sorted(doomed)


# ---------------------------------------------------------------------------
# merge-on-read deletes + compaction (Iceberg-v2 delete-vector shape)
# ---------------------------------------------------------------------------


def _deletes_file(root: str, version: str) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"{version}.deletes.parquet")


def fl_delete_keys(root: str, version: str | None = None) -> pd.DataFrame:
    """The version's cumulative delete set (one column, the table
    key) — empty if the version carries none. Part of the version's
    immutable commit artifacts, so time-travel reads apply the
    delete state AS OF that version."""
    if version is None:
        version = fl_current_version(root)
    p = _deletes_file(root, version)
    if not os.path.isfile(p):
        key = fl_table_props(root, version)["key"]
        return pd.DataFrame({key: []})
    return pd.read_parquet(p)


def _apply_deletes(
    spark: SparkSession, df: DataFrame, root: str, version: str | None
) -> DataFrame:
    dels = fl_delete_keys(root, version)
    if len(dels) == 0:
        return df
    key = dels.columns[0]
    return df.join(
        F.broadcast(spark.createDataFrame(dels)), key, "left_anti"
    )


def fl_read_mor(
    spark: SparkSession, root: str, version: str | None = None
) -> DataFrame:
    """Merge-on-read: the version's files MINUS its delete set (one
    broadcast anti-join — the read-side cost of not rewriting on
    delete). ``fl_read`` stays the raw file view; use this one when
    the table uses ``fl_delete``."""
    return _apply_deletes(spark, fl_read(spark, root, version), root, version)


def fl_read_pruned_mor(
    spark: SparkSession,
    root: str,
    preds: dict[str, tuple],
    version: str | None = None,
) -> tuple[DataFrame, int, int]:
    df, n_read, n_total = fl_read_pruned(spark, root, preds, version)
    return _apply_deletes(spark, df, root, version), n_read, n_total


def fl_delete(
    spark: SparkSession,
    root: str,
    keys: DataFrame,
    _crash_before_commit: bool = False,
) -> tuple[int, str]:
    """DELETE BY KEY without rewriting any data file (merge-on-read,
    the Iceberg v2 delete-vector shape): the new version carries the
    SAME manifest (every file by reference) plus a cumulative delete
    set; readers (`fl_read_mor`) anti-join it out. Scattered deletes
    — the worst case for copy-on-write, which would rewrite every
    touched file — cost one tiny sidecar write here; the rewrite is
    deferred to ``fl_compact``, which folds the set at a time of the
    table's choosing. Returns (n_delete_keys, version).

    Commit = stage manifest copy + merged delete set + props ->
    pointer flip; same crash matrix as every other commit."""
    props = fl_table_props(root)
    key = props["key"]
    new_keys = keys.select(key).distinct().toPandas()
    old = fl_delete_keys(root)
    merged = (
        pd.concat([old, new_keys], ignore_index=True)
        .drop_duplicates()
        .reset_index(drop=True)
    )
    version = _next_version(root)
    _write_manifest(root, version, fl_manifest(root), props)
    merged.to_parquet(_deletes_file(root, version), index=False)
    if _crash_before_commit:
        raise RuntimeError(
            "fl_delete: injected crash between sidecar write and "
            "pointer flip (test hook)"
        )
    _manifest_commit(root, version)
    return len(new_keys), version


def fl_compact(
    spark: SparkSession, root: str, layout_files: int | None = None
) -> str:
    """Copy-on-write fold: rewrite the current merge-on-read state
    (files minus delete set) into a fresh clustered layout and commit
    it with an EMPTY delete set — deletes become physical, the
    read-side anti-join disappears, and streaming-epoch file
    fragmentation is bin-packed away. One full rewrite, amortized
    across every delete and small commit since the last fold — the
    OPTIMIZE of this format. Returns the new version name."""
    props = dict(fl_table_props(root))
    if layout_files is not None:
        props["layout_files"] = layout_files
    df = fl_read_mor(spark, root)
    version = _next_version(root)
    cdir = _commit_dir(root, version)
    _apply_layout(df, props).write.mode("errorifexists").parquet(cdir)
    manifest = _stats_of_commit(spark, cdir, tuple(props["stats_cols"]))
    _write_manifest(root, version, manifest, props)
    # no deletes sidecar written: the new version's delete set is empty
    _manifest_commit(root, version)
    return version
