"""File-list manifest table format: O(touched-files) MERGE.

The directory-version manifest (operators/maintenance.py,
``manifest_init``/``merge_upsert_manifest``) rewrites the WHOLE table
per commit — correct, but at 100 TB a merge that touches 0.1 % of the
keys cannot cost a full rewrite. This module is the file-level form,
the actual kernel of Delta/Iceberg:

- a **version is a manifest**: a small driver-side relation of
  ``(path, n_rows, min_/max_ stats per tracked column, write-time
  schema)`` — the zone map IS the manifest, so data skipping and
  merge targeting read the same artifact and cannot desync from each
  other;
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
- **merge-on-read DELETE**: delete keys are EXECUTOR-WRITTEN parquet
  data files (never driver-materialized — a 100 TB table's delete
  wave can be billions of keys), applied by an AQE-planned anti-join
  and folded physically by ``fl_compact``;
- **schema evolution by field id**: add-column and rename commit a
  new manifest only — old files stay valid forever, readers map each
  file's write-time columns to the current schema by id (Iceberg's
  rule, manifest-recorded instead of parquet-field-id-recorded);
- **commit = one CAS pointer flip** (write files -> write manifest ->
  verify parent -> fsync+rename ``_MANIFEST``): versions are claimed
  with O_EXCL marker files and the flip verifies the pointer still
  names the writer's parent, so two concurrent committers cannot
  silently lose an update — exactly one wins, the loser gets
  ``CommitConflictError`` and its orphan stays invisible to readers.

Layout on disk::

    root/_MANIFEST                      # pointer: current version name
    root/_COMMIT_LOCK                   # transient CAS critical section
    root/_manifests/v00000001.parquet   # manifest (pyarrow, 1 file)
    root/_manifests/v00000001.props.json
    root/_manifests/v00000001.claim     # O_EXCL version-number claim
    root/data/c_v00000001/part-*.parquet   # immutable data files
    root/deletes/d_v00000002/part-*.parquet  # immutable delete-key files

Scale shape: the manifest is O(files) tiny rows — the same
cardinality Spark's own file index holds to plan any scan; every
driver-side operation here (targeting, pruning, vacuum ref-count) is
over that relation, never the data. Executors read only the file
subset a manifest names, write the new files of one commit, and own
the delete set end-to-end (write, anti-join, fold).

Cites: reference's sink is ``to_sql(if_exists='append'|'replace')``
(create_db_from_csv.py) — no versioning, no incremental merge; this
is the §2.4 warehouse-gap surface at its 100 TB shape.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.operators.maintenance import (
    CommitConflictError,  # noqa: F401  (re-export: the format's error)
    _apply_layout,
    _norm_file_uri,
    _persist_wanted,
    _plan_size_bytes,
    cdc_extract,
    footer_zone_stats,
    manifest_commit_cas,
    zone_map_stats,
)

_MANIFEST_DIR = "_manifests"


class CheckViolation(ValueError):
    """An updates batch (or, for ``fl_add_constraint``, the existing
    table state) violates a CHECK constraint — the commit is refused
    whole; nothing is staged or published."""
# fl_delete accumulates one immutable delete-file dir per commit; past
# this many it folds them into one (executor-side distinct + rewrite)
# so the read-side anti-join never unions an unbounded dir list
_DELETE_FOLD_AFTER = 8



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
    entry newer than the pointer is a crashed/conflicted writer's
    orphan — invisible to pointer-following readers)."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    return sorted(
        f[: -len(".parquet")]
        for f in os.listdir(mdir)
        # exactly vNNNNNNNN.parquet — NOT the .props.json / .claim
        # sidecars that share the version stem
        if f.endswith(".parquet")
        and f[0] == "v"
        and f[1:-len(".parquet")].isdigit()
    )


def _version_numbers(root: str) -> list[int]:
    """Every version number any artifact (manifest, props, claim) has
    ever used — claims count, so a crashed writer's number is never
    reissued to a second writer."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    out = []
    for f in os.listdir(mdir):
        stem = f.split(".", 1)[0]
        if stem.startswith("v") and stem[1:].isdigit():
            out.append(int(stem[1:]))
    return out


def _claim_version(root: str) -> str:
    """Atomically claim the next version number with an O_EXCL marker
    file — two concurrent writers can never stage artifacts under the
    same version name (which would let the loser's manifest overwrite
    the winner's before the CAS flip even runs)."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    n = max(_version_numbers(root), default=0) + 1
    while True:
        v = f"v{n:08d}"
        try:
            fd = os.open(
                os.path.join(mdir, f"{v}.claim"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            return v
        except FileExistsError:
            n += 1


def _fl_commit(root: str, version: str, parent: str | None) -> None:
    """CAS pointer flip: publishes ``version`` iff the pointer still
    names ``parent`` (None = table must be uninitialized); raises
    ``CommitConflictError`` otherwise, leaving the staged version as
    an invisible orphan."""
    manifest_commit_cas(root, version, parent)


def fl_lineage(root: str) -> list[str]:
    """The COMMITTED version chain, oldest first, by walking parent
    pointers back from the pointer's current target — the list
    ``fl_versions`` cannot give, because that one also returns
    crashed/conflicted writers' orphans (staged manifests the pointer
    never named). This is the history an incremental CDC consumer
    replays: every adjacent pair is one committed diff. O(versions)
    driver-side metadata reads; stops at the oldest version still on
    disk (vacuumed ancestry is simply not replayable)."""
    chain: list[str] = []
    v: str | None = fl_current_version(root)
    while v is not None:
        try:
            props = fl_table_props(root, v)
        except FileNotFoundError:
            break  # this ancestor was vacuumed: not replayable
        chain.append(v)
        v = props.get("parent")
    chain.reverse()
    return chain


def _manifest_file(root: str, version: str) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"{version}.parquet")


def fl_manifest(root: str, version: str | None = None) -> pd.DataFrame:
    """The manifest relation of a version (current by default):
    one row per data file — (path, n_rows, min_<c>/max_<c> for every
    tracked column, schema_cols = the file's write-time field-id ->
    column-name map). Driver-side pandas on purpose: it is O(files)
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
    until the pointer flips — both artifacts are keyed by the
    claimed version name, so a crashed or conflicted writer leaves
    only orphans."""
    manifest.reset_index(drop=True).to_parquet(
        _manifest_file(root, version), index=False
    )
    with open(
        os.path.join(root, _MANIFEST_DIR, f"{version}.props.json"), "w"
    ) as f:
        json.dump(props, f)


# ---------------------------------------------------------------------------
# schema-by-field-id helpers
# ---------------------------------------------------------------------------


def _schema_fields(df: DataFrame) -> list[dict]:
    """Field-id schema for a fresh table: ids are assigned once at
    init and NEVER reused — renames keep the id, adds take a new
    one (the Iceberg identity rule that makes old files readable
    forever)."""
    return [
        {"id": i + 1, "name": f.name, "type": f.dataType.simpleString()}
        for i, f in enumerate(df.schema.fields)
    ]


def _schema_sig(fields: list[dict]) -> str:
    """A file group's write-time (field id -> physical column name)
    map, stored per manifest row. Compact and canonical: reads group
    files by this string."""
    return json.dumps([[f["id"], f["name"]] for f in fields])


def _empty_relation(spark: SparkSession, props: dict) -> DataFrame:
    ddl = ", ".join(f"`{f['name']}` {f['type']}" for f in props["schema"])
    return spark.createDataFrame([], ddl)


def _read_files(
    spark: SparkSession, m_subset: pd.DataFrame, props: dict
) -> DataFrame:
    """Read a manifest subset ALIGNED to the current schema: files
    are grouped by write-time schema signature; within each group,
    current columns resolve by FIELD ID to the group's physical
    names (renames), and ids the group predates backfill as typed
    NULLs (add-column) — no data file is ever rewritten for an
    evolution commit. The group count is O(distinct schemas ever
    written), a handful; each group is one ordinary pruned parquet
    scan, so pushdown/pruning per group is untouched."""
    if len(m_subset) == 0:
        return _empty_relation(spark, props)
    cur = props["schema"]
    cur_sig = _schema_sig(cur)
    if "schema_cols" not in m_subset.columns:
        sigs = pd.Series(cur_sig, index=m_subset.index)
    else:
        sigs = m_subset["schema_cols"].fillna(cur_sig)
    parts = []
    for sig in sorted(sigs.unique()):
        paths = sorted(m_subset.loc[sigs == sig, "path"])
        dfg = spark.read.parquet(*paths)
        mapping = {fid: name for fid, name in json.loads(sig)}
        sel = []
        for f in cur:
            phys = mapping.get(f["id"])
            if phys is None:
                sel.append(F.lit(None).cast(f["type"]).alias(f["name"]))
            else:
                sel.append(F.col(phys).alias(f["name"]))
        parts.append(dfg.select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _manifest_cols_order(cols: tuple[str, ...]) -> list[str]:
    return ["path", "n_rows"] + [
        f"{m}_{c}" for c in cols for m in ("min", "max")
    ] + ["schema_cols"]


def _stats_of_commit(
    spark: SparkSession,
    commit_dir: str,
    cols: tuple[str, ...],
    schema_sig: str,
) -> pd.DataFrame:
    """Per-file stats for a commit's freshly-written files: parquet
    FOOTER metadata when every tracked column's footer stats are
    trustworthy-exact (the common case — keys are integers; zero
    Spark jobs, O(files) driver-side metadata reads, the way
    Delta/Iceberg gather commit stats), else one zone_map_stats scan
    folding map-side to O(files) rows. Paths normalized to plain
    filesystem form, each row stamped with the commit's write-time
    schema signature. ``SPARK_GRAFT_FOOTER_STATS=0`` forces the scan
    path (A/B escape hatch)."""
    fast = footer_zone_stats(commit_dir, cols)
    if fast is not None:
        fast = fast.copy()
        fast["schema_cols"] = schema_sig
        cols_order = _manifest_cols_order(cols)
        if len(fast) == 0:
            return pd.DataFrame(columns=cols_order)
        return fast[cols_order]
    rows = zone_map_stats(spark, commit_dir, cols).collect()
    recs = []
    for r in rows:
        d = r.asDict()
        d["path"] = _norm_file_uri(d.pop("file"))
        d["schema_cols"] = schema_sig
        recs.append(d)
    cols_order = _manifest_cols_order(cols)
    if not recs:
        return pd.DataFrame(columns=cols_order)
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
    make merges file-sparse — the standard Delta guidance. Fails with
    ``CommitConflictError`` if the table is already initialized."""
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    version = _claim_version(root)
    props = {
        "key": key,
        "stats_cols": list(dict.fromkeys((key, *stats_cols))),
        "zorder_by": list(zorder_by),
        "layout_files": layout_files,
        "schema": _schema_fields(df),
        "delete_dirs": [],
        "parent": None,
    }
    # with a Z-order spec the layout needs a bounds pass and the
    # range partitioner a sampling pass — three computations of the
    # input without a persist. Persist ADAPTIVELY on the optimizer's
    # size estimate (no job: init has no manifest to count from):
    # when persisted, the bounds aggregate materializes the cache and
    # the input computes ONCE; below the threshold the cache build
    # measurably loses to recomputing a small local slice
    # (_persist_wanted rationale). SPARK_GRAFT_FL_PERSIST=0/1 force.
    cache_input = bool(zorder_by) and _persist_wanted(
        est_bytes=_plan_size_bytes(df)
    )
    if cache_input:
        df = df.persist()
    try:
        out = _apply_layout(df, props)
        cdir = _commit_dir(root, version)
        out.write.mode("errorifexists").parquet(cdir)
    finally:
        if cache_input:
            df.unpersist()
    manifest = _stats_of_commit(
        spark, cdir, tuple(props["stats_cols"]), _schema_sig(props["schema"])
    )
    _write_manifest(root, version, manifest, props)
    _fl_commit(root, version, parent=None)
    return version


def fl_read(
    spark: SparkSession, root: str, version: str | None = None
) -> DataFrame:
    """Read a committed version: exactly the files its manifest
    names, aligned to the version's current schema (files are
    immutable and shared, so any version is a consistent snapshot
    with no coordination). An empty manifest — a table whose every
    row was deleted then compacted — is an empty relation with the
    table schema, not an error."""
    if version is None:
        version = fl_current_version(root)
    return _read_files(
        spark, fl_manifest(root, version), fl_table_props(root, version)
    )


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
    if version is None:
        version = fl_current_version(root)
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
    return _read_files(spark, m[keep], props), int(keep.sum()), len(m)


def _zone_touched_paths(
    spark: SparkSession, m_subset: pd.DataFrame, key: str, keys_df: DataFrame
) -> set[str]:
    """Exact per-file merge/change targeting: which files' [min, max]
    key zones contain at least one update key. NULL-zone files are
    conservatively touched (driver-side — no join needed for them).

    Integer keys (every merge key in practice) take a grid-bucketed
    BROADCAST HASH JOIN: the zone set is cut into uniform integer
    buckets driver-side (a file registers in every bucket its zone
    overlaps), each key computes its bucket with one integer
    division, and the join is an equi-join on the bucket id with the
    exact between() as a post-filter. The old shape — distinct keys
    range-joined on a pure inequality — planned as a
    BroadcastNestedLoopJoin: |keys| x |files| predicate evaluations
    (at 100 TB, billions x 10^5) plus a full distinct exchange of
    the update keys; the bucketed form is O(keys + matches) with no
    key-side shuffle at all. Non-integer keys fall back to the range
    join. The collect is O(touched files) paths, the same
    cardinality the driver already plans scans with — never the keys
    themselves."""
    touched, hits = _targeting_hits(spark, m_subset, key, keys_df)
    if hits is None:
        return touched
    return touched | {r["path"] for r in hits.collect()}


def _targeting_hits(
    spark: SparkSession, m_subset: pd.DataFrame, key: str, keys_df: DataFrame
) -> tuple[set[str], DataFrame | None]:
    """The lazy half of ``_zone_touched_paths``: driver-side grid
    planning over the manifest zones, returning (paths touched with
    no Spark job needed — the NULL-zone files — , a LAZY distinct
    touched-``path`` frame to collect, or None when the zone set
    resolves entirely driver-side). Split out so ``fl_merge_upsert``
    can attach ``observe()`` metric points to ``keys_df`` and harvest
    its row counts / bounds / constraint violations from the SAME
    action that collects the touched paths — one pass over the
    updates instead of two."""
    if len(m_subset) == 0:
        return set(), None
    mn_s, mx_s = m_subset[f"min_{key}"], m_subset[f"max_{key}"]
    null_zone = mn_s.isna() | mx_s.isna()
    touched = set(m_subset.loc[null_zone, "path"])
    zones = m_subset.loc[~null_zone, ["path", f"min_{key}", f"max_{key}"]]
    if zones.empty:
        return touched, None
    paths = zones["path"].tolist()
    try:
        mins = [int(v) for v in zones[f"min_{key}"].tolist()]
        maxs = [int(v) for v in zones[f"max_{key}"].tolist()]
        exact = all(
            i == v
            for i, v in zip(
                mins + maxs,
                list(zones[f"min_{key}"]) + list(zones[f"max_{key}"]),
            )
        )
    except (TypeError, ValueError, OverflowError):
        exact = False
    gmin = min(mins) if exact else 0
    gmax = max(maxs) if exact else 0
    # python-int arithmetic: exact at any magnitude; bail to the
    # range join if the span would overflow the BIGINT bucket math
    if not exact or (gmax - gmin) >= (1 << 62):
        zdf = spark.createDataFrame(
            zones[["path", f"min_{key}", f"max_{key}"]]
        )
        hits = (
            keys_df.select(key)
            .join(
                F.broadcast(zdf),
                F.col(key).between(
                    F.col(f"min_{key}"), F.col(f"max_{key}")
                ),
            )
            .select("path")
            .distinct()
        )
        return touched, hits
    span = gmax - gmin + 1
    n_buckets = max(1, min(4 * len(zones), 4096))
    while True:
        width = -(-span // n_buckets)  # ceil
        n_pairs = sum(
            (mx - gmin) // width - (mn - gmin) // width + 1
            for mn, mx in zip(mins, maxs)
        )
        if n_pairs <= 32 * len(zones) + 1024 or n_buckets == 1:
            break
        n_buckets //= 2  # wide overlapping zones: coarser grid
    pairs = [
        (b, p, mn, mx)
        for p, mn, mx in zip(paths, mins, maxs)
        for b in range((mn - gmin) // width, (mx - gmin) // width + 1)
    ]
    zdf = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["__b", "path", "__zmn", "__zmx"])
    )
    hits = (
        keys_df.select(F.col(key).cast("long").alias("__k"))
        # keys outside the global zone span match nothing (and the
        # filter keeps __k - gmin inside BIGINT)
        .where(F.col("__k").between(F.lit(gmin), F.lit(gmax)))
        .withColumn("__b", F.expr(f"(__k - {gmin}) div {width}"))
        .join(F.broadcast(zdf), "__b")
        .where(F.col("__k").between(F.col("__zmn"), F.col("__zmx")))
        .select("path")
        .distinct()
    )
    return touched, hits


def _manifest_bounds(
    m: pd.DataFrame, zcols: list[str]
) -> dict[str, tuple[int, int]] | None:
    """Z-order bounds (col -> (min, max)) for a commit whose rows all
    come from the files of manifest subset ``m`` — derived from the
    per-file zone stats the manifest already holds, so the layout's
    bounds aggregate (an extra full pass over the commit input per
    write) is skipped. None (caller computes bounds in-plan) when any
    zone is NULL/untracked or a stat is not exactly integral —
    supplied bounds may be wider than the data but never narrower,
    and the integral check keeps them consistent with zorder_key's
    CAST(col AS BIGINT) view of the data."""
    if not zcols or len(m) == 0:
        return None
    out: dict[str, tuple[int, int]] = {}
    for c in zcols:
        if f"min_{c}" not in m.columns or f"max_{c}" not in m.columns:
            return None
        mns, mxs = m[f"min_{c}"], m[f"max_{c}"]
        if mns.isna().any() or mxs.isna().any():
            return None
        try:
            lo, hi = mns.min(), mxs.max()
            if int(lo) != lo or int(hi) != hi:
                return None
        except (TypeError, ValueError, OverflowError):
            return None
        out[c] = (int(lo), int(hi))
    return out


def _merge_bounds(
    touched_m: pd.DataFrame, counts, zcols: list[str]
) -> dict[str, tuple[int, int]] | None:
    """Z-order bounds for a MERGE commit's output: the union of the
    updates' bounds (rode the merge's existing counts aggregate —
    zero extra jobs) and the touched files' manifest zones. None ->
    the layout computes bounds in-plan (over the persisted slice)."""
    if not zcols:
        return None
    upd: dict[str, tuple[int, int]] = {}
    for c in zcols:
        lo, hi = counts[f"__zmn_{c}"], counts[f"__zmx_{c}"]
        if lo is None or hi is None:
            return None
        upd[c] = (int(lo), int(hi))
    if len(touched_m) == 0:
        return upd
    file_bounds = _manifest_bounds(touched_m, zcols)
    if file_bounds is None:
        return None
    return {
        c: (
            min(upd[c][0], file_bounds[c][0]),
            max(upd[c][1], file_bounds[c][1]),
        )
        for c in zcols
    }


def fl_merge_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str,
    _crash_before_commit: bool = False,
    _pause_before_commit=None,
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
    Touched files are read ONCE — the replaced-row count is derived
    from zero-job metadata arithmetic (touched files' manifest row
    total + update count − rows actually written, read back from the
    fresh commit's parquet footers), so there is no separate
    matched-count job and no rescan; one light semi-join count only
    when a delete set hides rows from that arithmetic. Non-updated
    rows survive via anti-join; updates (matched + fresh inserts)
    union in; the slice is re-clustered on the table's committed
    Z-order spec and written as the commit's new files, sized to the
    touched-file count so file granularity is stable under repeated
    merges.

    Merge-on-read interaction, all EXECUTOR-SIDE (no key ever crosses
    to the driver): rows already deleted are anti-joined out of the
    touched slice (folding those deletes for free), and the commit's
    surviving delete set = old set ANTI-JOIN update keys, rewritten
    as fresh delete files — an upsert of a deleted key is a
    re-insert, and a stale set entry would silently hide it from
    every reader.

    Commit = claim version -> stage new files + manifest + props ->
    CAS pointer flip (conflict -> ``CommitConflictError``, staged
    version stays an invisible orphan). Crash anywhere before the
    flip leaves the old version fully intact. ``extra_props`` rides
    the commit (the streaming epoch / txnVersion pattern).

    Scale shape: the ``updates`` lineage is persisted across the
    merge's actions and unpersisted on exit: ONE aggregate over the
    updates materializes the cache and carries the row count, CHECK
    violations, duplicate-key check and Z-order bounds together (an
    empty micro-batch returns here, before any targeting job);
    targeting is then ONE broadcast range join of distinct update
    keys x O(files) zones reading from the cache; one scan of the
    touched subset for the merge itself; shuffle volume
    O(touched + updates). The 100 TB merge this repo's
    directory-format could not express.

    Counts deliberately avoid ``observe()``/``Observation.get``: its
    py4j row fetch hard-crashes (toPyRow assertion) when AQE
    empty-relation propagation elides the metric points — e.g. an
    empty streaming micro-batch — and was seen to crash flakily even
    on non-empty replication batches.
    """
    parent = fl_current_version(root)
    props = fl_table_props(root, parent)
    if props["key"] != key:
        raise ValueError(
            f"filelist table {root}: merge key {key!r} != table key "
            f"{props['key']!r}"
        )
    zcols = list(props.get("zorder_by") or [])
    updates = updates.persist()
    merged_cached = None
    try:
        constraints = props.get("constraints") or {}
        row_metrics = [
            F.count(F.lit(1)).alias("n"),
            # CHECK constraints ride the SAME pass — enforcement
            # costs zero extra jobs; NULL predicate results count as
            # violations (the SQL CHECK rule is satisfied-or-reject
            # here, matching Delta's enforcement)
            *[
                F.sum(
                    (~F.coalesce(F.expr(sql), F.lit(False))).cast("bigint")
                ).alias(f"__viol_{name}")
                for name, sql in constraints.items()
            ],
            # Z-order bounds of the updates ride the same pass too:
            # combined with the touched files' manifest zones they
            # bound the whole merged slice, so the layout's bounds
            # pass (a full extra computation of the merge plan per
            # commit) disappears
            *[
                f
                for c in zcols
                for f in (
                    F.min(F.col(c).cast("long")).alias(f"__zmn_{c}"),
                    F.max(F.col(c).cast("long")).alias(f"__zmx_{c}"),
                )
            ],
        ]
        m = fl_manifest(root, parent)
        # ONE plain aggregate over the (persisted) updates carries the
        # row count, CHECK violations, Z-order bounds AND the
        # duplicate-source-key check (count_distinct excludes NULL —
        # counted separately); the targeting pass below then reuses
        # the materialized cache. Deliberately NOT observe()-fused
        # with targeting: Observation.get's py4j row fetch crashes
        # (toPyRow assertion) when AQE empty-relation propagation
        # elides the metric points (empty micro-batch) and was flaky
        # even on non-empty replication batches. The aggregate also
        # puts the empty-batch no-op return BEFORE any targeting job.
        agg_row = updates.agg(
            *row_metrics,
            F.count_distinct(F.col(key)).alias("__kd"),
            F.max(F.col(key).isNull().cast("int")).alias("__has_null"),
        ).first()
        counts = agg_row.asDict()
        counts["k_groups"] = counts["__kd"] + (
            1 if counts["__has_null"] else 0
        )
        n_updates = counts["n"]
        if n_updates == 0:
            # empty micro-batches are routine in streaming — a no-op,
            # not an empty commit
            return 0, 0, 0, len(m)
        for name, sql in constraints.items():
            n_viol = counts[f"__viol_{name}"]
            if n_viol:
                raise CheckViolation(
                    f"fl_merge_upsert: {n_viol} update row(s) violate "
                    f"CHECK constraint {name!r} ({sql}); nothing committed"
                )
        n_update_keys = counts["k_groups"]
        if n_update_keys != n_updates:
            raise ValueError(
                f"fl_merge_upsert: updates has "
                f"{n_updates - n_update_keys} duplicate '{key}' rows; "
                f"MERGE requires unique source keys"
            )
        keys_frame = updates.select(key).distinct()
        touched, hits = _targeting_hits(spark, m, key, keys_frame)
        if hits is not None:
            touched = touched | {r["path"] for r in hits.collect()}
        touched_m = m[m["path"].isin(touched)]
        untouched_m = m[~m["path"].isin(touched)]
        dels_df = _delete_keys_df(spark, props)
        cols = [f["name"] for f in props["schema"]]
        if not touched and dels_df is None:
            # pure-append fast path (THE streaming hot shape: every
            # batch key beyond every zone): no file intersects, so
            # there is no matched count to take and no survivor
            # anti-join to run — zero jobs beyond the write itself
            n_replaced = 0
            merged = updates.select(*cols)
        else:
            touched_df = _read_files(spark, touched_m, props)
            if dels_df is not None:
                touched_df = touched_df.join(dels_df, key, "left_anti")
            # the layout's range partitioner SAMPLES its input INSIDE
            # the write action, i.e. the merge plan (touched scan +
            # two anti-joins + union) executes once for the sample
            # pass and again for the write. Persist the slice so it
            # computes ONCE — but only when its KNOWN size (touched
            # files' manifest rows + update count, zero extra jobs)
            # says the cache build beats the recompute
            # (_persist_wanted); it is O(touched + updates) — the
            # bounded working set of the merge, spilled to disk if
            # it does not fit (never O(table)).
            cache = _persist_wanted(
                int(touched_m["n_rows"].sum()) + n_updates
            )
            kept = touched_df.join(updates.select(key), key, "left_anti")
            merged = kept.unionByName(updates.select(*cols))
            if cache:
                merged_cached = merged.persist()
                merged = merged_cached
            n_replaced = None  # resolved after the write below

        version = _claim_version(root)
        slice_props = {**props, "layout_files": max(1, len(touched))}
        cdir = _commit_dir(root, version)
        _apply_layout(
            merged, slice_props, bounds=_merge_bounds(touched_m, counts, zcols)
        ).write.mode("errorifexists").parquet(cdir)
        fresh = _stats_of_commit(
            spark,
            cdir,
            tuple(props["stats_cols"]),
            _schema_sig(props["schema"]),
        )
        if n_replaced is None:
            if dels_df is None:
                # zero-job arithmetic: the touched files' row total
                # is in the parent manifest and the commit's own row
                # total is in the fresh footer stats —
                # written = (touched - matched) + updates
                # (exact whether or not the slice was persisted)
                n_replaced = (
                    int(touched_m["n_rows"].sum())
                    + n_updates
                    - (int(fresh["n_rows"].sum()) if len(fresh) else 0)
                )
            else:
                # delete set present: rows hidden by it are unknowable
                # from metadata — one light semi-join count of the
                # (small, unpersisted) touched slice
                n_replaced = touched_df.join(
                    updates.select(key), key, "left_semi"
                ).count()
        n_inserted = n_updates - n_replaced
        manifest = pd.concat([untouched_m, fresh], ignore_index=True)
        delete_dirs: list[str] = []
        if dels_df is not None:
            # surviving deletes = old set minus re-inserted keys —
            # one distributed anti-join, folded into a single fresh
            # delete dir (never collected to the driver); write
            # unconditionally, then a footer read decides emptiness —
            # one Spark job instead of an exists-probe plus a write
            surviving = dels_df.distinct().join(
                updates.select(key), key, "left_anti"
            )
            ddir = _delete_dir(root, version)
            surviving.write.mode("errorifexists").parquet(ddir)
            if _parquet_rows(ddir):
                delete_dirs = [ddir]
            else:
                shutil.rmtree(ddir, ignore_errors=True)
        new_props = {**props, "delete_dirs": delete_dirs, "parent": parent}
        if extra_props:
            new_props.update(extra_props)
        _write_manifest(root, version, manifest, new_props)
        if _pause_before_commit is not None:
            _pause_before_commit()
        if _crash_before_commit:
            raise RuntimeError(
                "fl_merge_upsert: injected crash between manifest write "
                "and pointer flip (test hook)"
            )
        _fl_commit(root, version, parent)
        return n_replaced, n_inserted, len(touched), len(m)
    finally:
        if merged_cached is not None:
            merged_cached.unpersist()
        updates.unpersist()


def fl_vacuum(
    spark: SparkSession,
    root: str,
    keep: int = 2,
    retain_hours: float = 168.0,
    force: bool = False,
) -> list[str]:
    """Reference-counting vacuum: drop manifests older than the
    newest ``keep`` (never the pointer's target), then delete every
    data file — and every delete-set dir — no kept manifest/props
    references. Shared artifacts survive as long as ANY kept version
    names them — deleting a version can never corrupt another.

    Retention guard (Delta's ``VACUUM ... RETAIN`` rule): a version
    COMMITTED within the last ``retain_hours`` (default 7 days) is
    never dropped, even when it falls outside ``keep`` — a reader
    that resolved that version name before the vacuum (time travel,
    a long scan, ``fl_changes`` over a window) must still find its
    manifest and every file it references. There is no reader-lease
    registry on a shared filesystem, so recency IS the lease; size
    ``retain_hours`` above the longest query/retention window.
    ``force=True`` bypasses the horizon — TORN-READ HAZARD: any
    reader mid-query on a force-dropped version will see its files
    deleted underneath it (FileNotFoundException mid-scan). Returns
    deleted data-file paths."""
    current = fl_current_version(root)
    versions = fl_versions(root)
    drop = [v for v in versions[:-keep] if v != current]
    if not force:
        horizon = time.time() - retain_hours * 3600.0
        drop = [
            v
            for v in drop
            if os.path.getmtime(_manifest_file(root, v)) < horizon
        ]
    keep_versions = [v for v in versions if v not in drop]
    referenced: set[str] = set()
    referenced_dels: set[str] = set()
    for v in keep_versions:
        referenced |= set(fl_manifest(root, v)["path"])
        referenced_dels |= set(fl_table_props(root, v).get("delete_dirs", []))
    doomed: set[str] = set()
    doomed_dels: set[str] = set()
    for v in drop:
        doomed |= set(fl_manifest(root, v)["path"]) - referenced
        doomed_dels |= (
            set(fl_table_props(root, v).get("delete_dirs", []))
            - referenced_dels
        )
        os.remove(_manifest_file(root, v))
        for sidecar in (
            os.path.join(root, _MANIFEST_DIR, f"{v}.props.json"),
            os.path.join(root, _MANIFEST_DIR, f"{v}.claim"),
        ):
            if os.path.isfile(sidecar):
                os.remove(sidecar)
    for p in sorted(doomed):
        os.remove(p)
    for d in sorted(doomed_dels):
        shutil.rmtree(d, ignore_errors=True)
    return sorted(doomed)


# ---------------------------------------------------------------------------
# merge-on-read deletes + compaction (Iceberg-v2 delete-vector shape)
# ---------------------------------------------------------------------------


def _delete_dir(root: str, tag: str) -> str:
    return os.path.join(root, "deletes", f"d_{tag}")


def _parquet_rows(path: str) -> int:
    """Row count of a freshly-written parquet dir from the file
    FOOTERS (driver-side metadata read, O(files) milliseconds) — so
    commit bookkeeping never costs a second Spark job over data the
    executors just wrote. A dir with no part files (an empty frame's
    write) counts 0."""
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(path):
        if f.endswith(".parquet") and not f.startswith(("_", ".")):
            total += pq.read_metadata(os.path.join(path, f)).num_rows
    return total


def _delete_keys_df(
    spark: SparkSession, props: dict, key: str | None = None
) -> DataFrame | None:
    """The version's cumulative delete set as an EXECUTOR-read
    relation (union of the version's immutable delete-key files), or
    None when empty. Each dir is read SEPARATELY and its single
    column positionally renamed to the current key name BEFORE the
    union — a multi-dir ``spark.read.parquet(*dirs)`` resolves
    columns by NAME across files, so after a key rename the dirs
    written under the old name would read as all-NULL and the
    deleted rows would silently resurface. Per-dir positional
    binding keys the files by position, which is exactly the rename
    contract (delete files are single-column by construction — the
    assertion makes that structural). May contain duplicate keys
    across files — harmless to the anti-joins that consume it."""
    dirs = props.get("delete_dirs") or []
    if not dirs:
        return None
    key = key or props["key"]
    parts = []
    for d in dirs:
        df = spark.read.parquet(d)
        if len(df.columns) != 1:
            raise ValueError(
                f"delete dir {d}: expected exactly 1 column, found "
                f"{df.columns} — positional key binding would mis-bind"
            )
        parts.append(df.toDF(key))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)  # positional: all sides already renamed
    return out


def fl_delete_keys(
    spark: SparkSession, root: str, version: str | None = None
) -> pd.DataFrame:
    """Introspection/test helper ONLY: the version's distinct delete
    set as pandas — O(set) driver memory by definition, which is why
    no write path calls it. ``fl_delete``/``fl_merge_upsert`` keep
    the set executor-side end to end."""
    if version is None:
        version = fl_current_version(root)
    props = fl_table_props(root, version)
    dels = _delete_keys_df(spark, props)
    if dels is None:
        return pd.DataFrame({props["key"]: []})
    return dels.distinct().toPandas()


def _apply_deletes(
    spark: SparkSession, df: DataFrame, root: str, version: str | None
) -> DataFrame:
    if version is None:
        version = fl_current_version(root)
    props = fl_table_props(root, version)
    dels = _delete_keys_df(spark, props)
    if dels is None:
        return df
    # no forced broadcast: the delete files' sizes are known to the
    # planner, so AQE/size stats pick broadcast while the set is
    # small and a shuffled anti-join once it is not — a billion-key
    # delete set must not try to build a broadcast table
    return df.join(dels, props["key"], "left_anti")


def fl_read_mor(
    spark: SparkSession, root: str, version: str | None = None
) -> DataFrame:
    """Merge-on-read: the version's files MINUS its delete set (one
    anti-join — the read-side cost of not rewriting on delete).
    ``fl_read`` stays the raw file view; use this one when the table
    uses ``fl_delete``."""
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
    SAME manifest (every file by reference) plus the delete set;
    readers (`fl_read_mor`) anti-join it out. Scattered deletes —
    the worst case for copy-on-write, which would rewrite every
    touched file — cost one executor-parallel write of the batch's
    distinct keys here; the rewrite is deferred to ``fl_compact``,
    which folds the set at a time of the table's choosing. Returns
    (n_delete_keys, version).

    Scale shape: the keys NEVER land on the driver — they are
    written as immutable parquet delete files by the executors and
    re-read by the executors of every MOR read. Each delete commit
    adds one dir of files; past ``_DELETE_FOLD_AFTER`` dirs the set
    is folded (distinct + rewrite, also executor-side) so read-side
    work stays bounded. Commit = claim version -> stage delete files
    + manifest copy + props -> CAS pointer flip; same crash/conflict
    matrix as every other commit."""
    import uuid as _uuid

    parent = fl_current_version(root)
    props = fl_table_props(root, parent)
    key = props["key"]
    # stage into a temp dir FIRST and claim the version only once the
    # batch proves non-empty: empty delete batches are routine in
    # streaming, and claiming up front would leak one orphan .claim
    # marker per empty batch forever (claimed numbers are never
    # reissued). An empty batch must also be a no-op, not an empty
    # commit — a committed zero-row dir would make the delete set
    # non-empty forever, so every later read pays the anti-join and
    # merges lose the pure-append fast path.
    tdir = _delete_dir(root, f"tmp_{_uuid.uuid4().hex}")
    keys.select(key).distinct().write.mode("errorifexists").parquet(tdir)
    n_new = _parquet_rows(tdir)  # footer read, no second Spark job
    if n_new == 0:
        shutil.rmtree(tdir, ignore_errors=True)
        return 0, parent
    version = _claim_version(root)
    ddir = _delete_dir(root, version)
    os.rename(tdir, ddir)  # same filesystem: atomic move into place
    dirs = list(props.get("delete_dirs") or []) + [ddir]
    if len(dirs) > _DELETE_FOLD_AFTER:
        fdir = _delete_dir(root, f"{version}_fold")
        # per-dir positional binding (not spark.read.parquet(*dirs)):
        # dirs written before a key rename carry the old column name,
        # and a multi-dir read resolves by name -> NULLs. Route
        # through the same reader every consumer uses.
        (
            _delete_keys_df(spark, {"delete_dirs": dirs, "key": key})
            .distinct()
            .write.mode("errorifexists")
            .parquet(fdir)
        )
        dirs = [fdir]
    new_props = {**props, "delete_dirs": dirs, "parent": parent}
    _write_manifest(root, version, fl_manifest(root, parent), new_props)
    if _crash_before_commit:
        raise RuntimeError(
            "fl_delete: injected crash between sidecar write and "
            "pointer flip (test hook)"
        )
    _fl_commit(root, version, parent)
    return n_new, version


def fl_compact(
    spark: SparkSession, root: str, layout_files: int | None = None
) -> str:
    """Copy-on-write fold: rewrite the current merge-on-read state
    (files minus delete set) into a fresh clustered layout and commit
    it with an EMPTY delete set — deletes become physical, the
    read-side anti-join disappears, and streaming-epoch file
    fragmentation is bin-packed away. One full rewrite, amortized
    across every delete and small commit since the last fold — the
    OPTIMIZE of this format. A state left empty by deletes commits an
    explicitly-empty manifest (``fl_read`` then returns an empty
    relation with the table schema). Returns the new version name."""
    parent = fl_current_version(root)
    props = dict(fl_table_props(root, parent))
    if layout_files is not None:
        props["layout_files"] = layout_files
    props["delete_dirs"] = []
    props["parent"] = parent
    df = fl_read_mor(spark, root, parent)
    version = _claim_version(root)
    sig = _schema_sig(props["schema"])
    cols = tuple(props["stats_cols"])
    # persist the MOR state across the emptiness probe, the range
    # partitioner's sampling pass and the write (otherwise the
    # files-minus-delete-set plan computes up to three times) —
    # adaptively, on the manifest's row total (an upper bound of the
    # MOR state; below the threshold the cache build loses to the
    # recompute, _persist_wanted). Z-order bounds come from the
    # manifest zones when complete — wider than the post-delete data
    # is fine, narrower impossible
    cached = _persist_wanted(int(fl_manifest(root, parent)["n_rows"].sum()))
    if cached:
        df = df.persist()
    try:
        if df.limit(1).count() == 0:
            # every row deleted: commit an explicitly-empty manifest
            # (no data dir at all) — fl_read returns an empty
            # relation with the table schema, and the delete set is
            # gone
            manifest = pd.DataFrame(columns=_manifest_cols_order(cols))
        else:
            cdir = _commit_dir(root, version)
            bounds = _manifest_bounds(
                fl_manifest(root, parent), list(props.get("zorder_by") or [])
            )
            _apply_layout(df, props, bounds=bounds).write.mode(
                "errorifexists"
            ).parquet(cdir)
            manifest = _stats_of_commit(spark, cdir, cols, sig)
    finally:
        if cached:
            df.unpersist()
    _write_manifest(root, version, manifest, props)
    _fl_commit(root, version, parent)
    return version


def fl_add_constraint(
    spark: SparkSession, root: str, name: str, sql_expr: str
) -> str:
    """ADD a CHECK constraint (Delta ``ALTER TABLE ADD CONSTRAINT``):
    the EXISTING merge-on-read state is validated first (one scan,
    one count — a constraint the data already violates is refused,
    never recorded), then the constraint commits as metadata and
    every later ``fl_merge_upsert``/epoch sink batch is validated
    inside the merge's existing counts aggregate — enforcement costs
    zero additional Spark jobs. A NULL predicate result counts as a
    violation. Returns the new version name."""
    parent = fl_current_version(root)
    props = fl_table_props(root, parent)
    constraints = dict(props.get("constraints") or {})
    if name in constraints:
        raise ValueError(
            f"filelist table {root}: constraint {name!r} already exists"
        )
    existing = fl_read_mor(spark, root, parent)
    n_viol = existing.where(
        ~F.coalesce(F.expr(sql_expr), F.lit(False))
    ).count()
    if n_viol:
        raise CheckViolation(
            f"fl_add_constraint: {n_viol} existing row(s) violate "
            f"{name!r} ({sql_expr}); constraint not added"
        )
    constraints[name] = sql_expr
    version = _claim_version(root)
    _write_manifest(
        root,
        version,
        fl_manifest(root, parent),
        {**props, "constraints": constraints, "parent": parent},
    )
    _fl_commit(root, version, parent)
    return version


def fl_drop_constraint(spark: SparkSession, root: str, name: str) -> str:
    """DROP a CHECK constraint (metadata-only commit)."""
    parent = fl_current_version(root)
    props = fl_table_props(root, parent)
    constraints = dict(props.get("constraints") or {})
    if name not in constraints:
        raise ValueError(
            f"filelist table {root}: no constraint {name!r} "
            f"(have {sorted(constraints)})"
        )
    del constraints[name]
    version = _claim_version(root)
    _write_manifest(
        root,
        version,
        fl_manifest(root, parent),
        {**props, "constraints": constraints, "parent": parent},
    )
    _fl_commit(root, version, parent)
    return version


def fl_optimize(
    spark: SparkSession,
    root: str,
    small_rows: int,
    target_rows_per_file: int | None = None,
) -> tuple[str, int, int]:
    """Incremental OPTIMIZE: bin-pack ONLY the files smaller than
    ``small_rows`` into the table's clustered layout; every other
    file is carried by reference. This is the scale-path
    defragmenter — ``fl_compact`` rewrites the WHOLE table (its job
    is folding the delete set), which a 100 TB table cannot afford
    just because a streaming sink dribbled small epoch commits;
    OPTIMIZE's cost is O(small files), so it can run continuously
    behind the sink. Purely a LAYOUT commit: rows are moved, never
    added, dropped, or delete-folded — the delete set (if any)
    carries unchanged and keeps hiding the same keys in old and new
    files alike. Returns (version, files_packed, files_total) —
    (current, 0, n) no-op when fewer than two files qualify."""
    parent = fl_current_version(root)
    props = fl_table_props(root, parent)
    m = fl_manifest(root, parent)
    small = m[m["n_rows"] < small_rows]
    if len(small) < 2:
        return parent, 0, len(m)
    big = m[~m.index.isin(small.index)]
    df = _read_files(spark, small, props)
    n_small_rows = int(small["n_rows"].sum())
    per_file = target_rows_per_file or max(small_rows, 1)
    slice_props = {
        **props,
        "layout_files": max(1, -(-n_small_rows // per_file)),
    }
    version = _claim_version(root)
    cdir = _commit_dir(root, version)
    # bounds from the packed files' own zones (skips the bounds
    # pass); persist the small-file slice across the sampling pass
    # and the write — adaptively on its exact row count
    # (_persist_wanted; OPTIMIZE's slice is re-read small files, the
    # cheapest possible recompute)
    bounds = _manifest_bounds(small, list(props.get("zorder_by") or []))
    cached = _persist_wanted(n_small_rows)
    if cached:
        df = df.persist()
    try:
        _apply_layout(df, slice_props, bounds=bounds).write.mode(
            "errorifexists"
        ).parquet(cdir)
    finally:
        if cached:
            df.unpersist()
    fresh = _stats_of_commit(
        spark, cdir, tuple(props["stats_cols"]), _schema_sig(props["schema"])
    )
    manifest = pd.concat([big, fresh], ignore_index=True)
    _write_manifest(root, version, manifest, {**props, "parent": parent})
    _fl_commit(root, version, parent)
    return version, len(small), len(m)


def fl_set_zorder(
    spark: SparkSession,
    root: str,
    zorder_by: tuple[str, ...],
    stats_cols: tuple[str, ...] = (),
) -> str:
    """ALTER TABLE CLUSTER BY (cluster-spec evolution, the Delta
    liquid-clustering story): a METADATA-ONLY commit that changes the
    Z-order spec — and extends the tracked stats columns — without
    rewriting a single data file. Existing files keep their old
    layout; their manifest rows carry NULL zones for newly tracked
    columns, which every consumer already treats conservatively
    (pruning keeps NULL-zone files, merge targeting touches them).
    From this commit on, every write (merge, OPTIMIZE, compact)
    re-clusters ITS OUTPUT on the new spec and records real stats —
    so the table migrates to the new clustering incrementally, at
    the pace of its own writes, and ``fl_compact`` finishes the job
    in one rewrite when the table chooses. Returns the new version.

    Cites: Delta clustered tables (ALTER TABLE ... CLUSTER BY) /
    Iceberg's write-order metadata — the reference has no layout
    control at all (heap tables, create_db_from_csv.py)."""
    parent = fl_current_version(root)
    props = fl_table_props(root, parent)
    names = {f["name"] for f in props["schema"]}
    unknown = [c for c in (*zorder_by, *stats_cols) if c not in names]
    if unknown:
        raise ValueError(
            f"filelist table {root}: no column(s) {unknown} "
            f"(schema: {sorted(names)})"
        )
    new_stats = list(
        dict.fromkeys(
            [*props["stats_cols"], *stats_cols, *zorder_by]
        )
    )
    m = fl_manifest(root, parent).copy()
    for c in new_stats:
        for side in ("min", "max"):
            col = f"{side}_{c}"
            if col not in m.columns:
                m[col] = pd.NA  # NULL zone: conservatively unprunable
    new_props = {
        **props,
        "zorder_by": list(zorder_by),
        "stats_cols": new_stats,
        "parent": parent,
    }
    version = _claim_version(root)
    _write_manifest(root, version, m, new_props)
    _fl_commit(root, version, parent)
    return version


def fl_restore(spark: SparkSession, root: str, version: str) -> str:
    """RESTORE (rollback): commit ``version``'s exact state — manifest,
    delete set, schema, layout spec — as a NEW version (Delta RESTORE
    semantics: history is never rewritten, the rollback is itself an
    auditable commit, and the undone versions stay time-travelable
    until vacuum). Metadata-only: data files are immutable and
    shared, so restoring a 100 TB table writes one manifest + one
    pointer flip. The restored-to version must still exist (not yet
    vacuumed). Returns the new version name."""
    parent = fl_current_version(root)
    if version == parent:
        return parent
    m = fl_manifest(root, version)  # raises if vacuumed/unknown
    props = {**fl_table_props(root, version), "parent": parent}
    new_version = _claim_version(root)
    _write_manifest(root, new_version, m, props)
    _fl_commit(root, new_version, parent)
    return new_version


# ---------------------------------------------------------------------------
# schema evolution: add-column / rename-column by field id
# ---------------------------------------------------------------------------


def fl_add_column(
    spark: SparkSession, root: str, name: str, type_str: str
) -> str:
    """ADD COLUMN as a metadata-only commit: the new field takes a
    fresh field id in the table schema; NO data file is rewritten —
    readers backfill typed NULLs for files that predate the field
    (``_read_files``' id mapping). Subsequent writes (merge/compact)
    produce files that carry the column physically. Returns the new
    version name."""
    parent = fl_current_version(root)
    props = fl_table_props(root, parent)
    schema = props["schema"]
    if any(f["name"] == name for f in schema):
        raise ValueError(
            f"filelist table {root}: column {name!r} already exists"
        )
    # validate the type string the same way reads will consume it
    spark.createDataFrame([], f"`{name}` {type_str}")
    new_field = {
        "id": max(f["id"] for f in schema) + 1,
        "name": name,
        "type": type_str,
    }
    version = _claim_version(root)
    new_props = {**props, "schema": schema + [new_field], "parent": parent}
    _write_manifest(root, version, fl_manifest(root, parent), new_props)
    _fl_commit(root, version, parent)
    return version


def fl_rename_column(
    spark: SparkSession, root: str, old: str, new: str
) -> str:
    """RENAME COLUMN as a metadata-only commit: the field keeps its
    id, only the current name changes — old files stay valid (their
    manifest rows record the write-time physical name; reads resolve
    by id). The table key, stats columns, Z-order spec and the
    manifest's min_/max_ stat headers are renamed in the same commit
    so targeting/pruning never look up a stale name; delete-key
    files need nothing (their single column binds positionally).
    Returns the new version name."""
    parent = fl_current_version(root)
    props = fl_table_props(root, parent)
    schema = props["schema"]
    if not any(f["name"] == old for f in schema):
        raise ValueError(f"filelist table {root}: no column {old!r}")
    if any(f["name"] == new for f in schema):
        raise ValueError(
            f"filelist table {root}: column {new!r} already exists"
        )
    import re as _re

    referencing = [
        n
        for n, sql in (props.get("constraints") or {}).items()
        if _re.search(rf"\b{_re.escape(old)}\b", sql)
    ]
    if referencing:
        raise ValueError(
            f"filelist table {root}: column {old!r} is referenced by "
            f"CHECK constraint(s) {referencing} — drop them first and "
            f"re-add under the new name"
        )
    new_schema = [
        {**f, "name": new} if f["name"] == old else f for f in schema
    ]
    new_props = {**props, "schema": new_schema, "parent": parent}
    if props["key"] == old:
        new_props["key"] = new
    if old in props.get("stats_cols", []):
        new_props["stats_cols"] = [
            new if c == old else c for c in props["stats_cols"]
        ]
    if old in props.get("zorder_by", []):
        new_props["zorder_by"] = [
            new if c == old else c for c in props["zorder_by"]
        ]
    m = fl_manifest(root, parent)
    if old in props.get("stats_cols", []):
        m = m.rename(
            columns={f"min_{old}": f"min_{new}", f"max_{old}": f"max_{new}"}
        )
    version = _claim_version(root)
    _write_manifest(root, version, m, new_props)
    _fl_commit(root, version, parent)
    return version


# ---------------------------------------------------------------------------
# CDC read: change feed between two committed versions
# ---------------------------------------------------------------------------


def fl_changes(
    spark: SparkSession,
    root: str,
    from_version: str,
    to_version: str | None = None,
) -> DataFrame:
    """Change feed: the minimal (op I/U/D, key, payload) log that
    turns the ``from_version`` snapshot into ``to_version`` (current
    by default) — the READ half of the epoch sink's write half, what
    an incremental consumer tails instead of re-diffing snapshots.

    Touched-files only, the whole point of the format: the two
    manifests are diffed driver-side (O(files) rows); rows are read
    ONLY from files present in exactly one version, plus the
    carried-over files a delete-set delta targets via the same
    broadcast key-zone range join MERGE uses. Both sides align to the
    TO-version schema by field id, so evolution between the versions
    is handled (added columns compare as NULLs on the old side). A
    file rewrite that changed nothing (compaction) contributes no
    rows — identical (key, payload) pairs cancel in the final
    classification (``cdc_extract``'s full-outer join).

    Net-diff semantics (what comparing two snapshots can know): D
    rows carry the key's FROM-version payload — an intermediate
    update that was itself deleted before ``to_version`` is invisible
    to the diff, exactly as in Delta's CDF when reading across the
    same range. U rows carry the new payload. Scale shape: O(changed
    files + delete deltas) scan,
    one key-partitioned full-outer join of the two changed-region
    images; never O(table)."""
    if to_version is None:
        to_version = fl_current_version(root)
    props_new = fl_table_props(root, to_version)
    props_old = fl_table_props(root, from_version)
    key = props_new["key"]
    payload = [f["name"] for f in props_new["schema"] if f["name"] != key]
    m_old = fl_manifest(root, from_version)
    m_new = fl_manifest(root, to_version)
    old_paths, new_paths = set(m_old["path"]), set(m_new["path"])
    removed = m_old[~m_old["path"].isin(new_paths)]
    added = m_new[~m_new["path"].isin(old_paths)]
    carried = m_new[m_new["path"].isin(old_paths)]

    old_dels = _delete_keys_df(spark, props_old, key)
    new_dels = _delete_keys_df(spark, props_new, key)

    old_side = _read_files(spark, removed, props_new)
    if old_dels is not None:
        old_side = old_side.join(old_dels, key, "left_anti")
    new_side = _read_files(spark, added, props_new)
    if new_dels is not None:
        new_side = new_side.join(new_dels, key, "left_anti")

    def _set_minus(a: DataFrame | None, b: DataFrame | None):
        if a is None:
            return None
        a = a.distinct()
        return a if b is None else a.join(b, key, "left_anti")

    # carried files never changed content; only delete-set deltas can
    # change what a reader sees in them — target just those files
    for delta, grow_old in (
        (_set_minus(new_dels, old_dels), True),   # newly deleted -> D
        (_set_minus(old_dels, new_dels), False),  # undeleted -> I
    ):
        if delta is None:
            continue
        touched = _zone_touched_paths(spark, carried, key, delta)
        if not touched:
            continue
        rows = _read_files(
            spark, carried[carried["path"].isin(touched)], props_new
        ).join(delta, key, "left_semi")
        if grow_old:
            old_side = old_side.unionByName(rows)
        else:
            new_side = new_side.unionByName(rows)

    return cdc_extract(old_side, new_side, key, tuple(payload))
