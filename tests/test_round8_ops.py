"""Law tests for the round-8 session-2 operators: interval islands
(q267), k-anonymity (q268), watermark lateness (q269), and the merkle
bucket-digest diff (q270). Oracle parity proves value equality; these
pin the structural invariants a hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# q267 interval islands
# ---------------------------------------------------------------------------


def test_interval_islands_conservation(spark, sf_dir):
    """Every order lands in exactly one island: per-customer
    max_island_orders <= order count, islands >= 1, and covered_days
    >= 30 (a lone order already covers its own 30-day interval) while
    covered_days <= 30 * n_orders (merging never adds days)."""
    out = QUERIES["q267_interval_islands"](spark, sf_dir)
    orders_per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = out.join(orders_per_cust, "c_custkey")
    assert j.count() == orders_per_cust.count()  # every customer present
    bad = j.where(
        (F.col("n_islands") < 1)
        | (F.col("n_islands") > F.col("n_orders"))
        | (F.col("max_island_orders") > F.col("n_orders"))
        | (F.col("covered_days") < 30)
        | (F.col("covered_days") > 30 * F.col("n_orders"))
        | (F.col("max_island_days") > F.col("covered_days"))
    )
    assert bad.count() == 0


def test_interval_islands_single_interval_identity(spark, sf_dir):
    """A customer whose orders all share one date has exactly one
    30-day island — checked by constructing that corpus."""
    iv = spark.createDataFrame(
        [(1, "1995-01-01"), (1, "1995-01-01"), (1, "1995-01-15")],
        "o_custkey int, d string",
    ).select(
        "o_custkey",
        F.col("d").cast("timestamp").alias("o_orderdate"),
        F.monotonically_increasing_id().alias("o_orderkey"),
    )
    import tempfile
    import os

    tmp = tempfile.mkdtemp(prefix="cbdw_iv_")
    for t in ("orders",):
        iv.write.mode("overwrite").parquet(os.path.join(tmp, f"{t}.parquet"))
    out = QUERIES["q267_interval_islands"](spark, tmp).collect()
    assert len(out) == 1
    row = out[0].asDict()
    # Jan 1 + 30d covers Jan 15's start -> one island, 44 days
    assert row["n_islands"] == 1
    assert row["covered_days"] == 44
    assert row["max_island_orders"] == 3


# ---------------------------------------------------------------------------
# q268 k-anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_threshold_and_nonempty(spark, sf_dir):
    out = QUERIES["q268_k_anonymity"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0  # the audit finds violating classes at test SF
    assert all(r.group_n < 5 for r in rows)
    # violating classes are a subset of the true QI census
    census = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
        )
        .count()
    )
    truth = {
        (r.c_nationkey, r.c_mktsegment, r.bal_band): r["count"]
        for r in census.collect()
    }
    for r in rows:
        assert truth[(r.c_nationkey, r.c_mktsegment, r.bal_band)] == r.group_n


# ---------------------------------------------------------------------------
# q269 watermark lateness
# ---------------------------------------------------------------------------


def test_watermark_lateness_partitions_all_events(spark, sf_dir):
    """Bands partition the event set; drop counts only live in bands
    later than 30 min; on-time events have zero max lateness."""
    out = QUERIES["q269_watermark_lateness"](spark, sf_dir)
    rows = {r.lateness_band: r for r in out.collect()}
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows.values()) == n_events
    if "on-time" in rows:
        assert rows["on-time"].dropped_at_30m == 0
        assert rows["on-time"].max_late_s == 0
    if "<=10m" in rows:
        assert rows["<=10m"].dropped_at_30m == 0  # 10 min < 30 min delay
    for band in (">1d", "<=1d"):
        if band in rows:
            assert rows[band].dropped_at_30m == rows[band].n_events


# ---------------------------------------------------------------------------
# q270 bucket-digest diff
# ---------------------------------------------------------------------------


def test_bucket_digest_diff_flags_only_mutated_buckets(spark, sf_dir):
    """The mutation predicate (k % 97 == 0 updates, k % 101 == 1
    deletes) determines exactly which buckets may appear; every
    flagged bucket must contain a mutated key and every bucket with a
    mutated key must be flagged (xor digest changes whenever one row
    hash changes and row counts move on deletes)."""
    out = QUERIES["q270_bucket_digest_diff"](spark, sf_dir)
    flagged = {r.bucket for r in out.collect()}
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    mutated = {
        r.bucket
        for r in o.where((F.col("k") % 97 == 0) | (F.col("k") % 101 == 1))
        .select((F.col("k") % 64).alias("bucket"))
        .distinct()
        .collect()
    }
    assert flagged == mutated


def test_bucket_digest_diff_row_delta_tracks_deletes(spark, sf_dir):
    out = QUERIES["q270_bucket_digest_diff"](spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    deletes = (
        o.where(F.col("k") % 101 == 1)
        .groupBy((F.col("k") % 64).alias("bucket"))
        .count()
    )
    truth = {r.bucket: r["count"] for r in deletes.collect()}
    for r in out.collect():
        assert r.row_delta == -truth.get(r.bucket, 0)


def test_bucket_digest_diff_flags_insert_only_bucket(spark):
    """Symmetric detection: a bucket populated ONLY in snapshot B
    (pure inserts into a bucket empty in A) must flag — the case a
    one-directional left join from A can never see."""
    from citybikedatawarehouse_spark.operators.maintenance import (
        bucket_digest,
    )

    # keys 0..7 all land in bucket 0 (k % 8 with k multiples of 8
    # avoided): A has keys {1}, B has keys {1, 2} plus key 10 -> a
    # NEW bucket 2 that A never populates
    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "x"), (10, "y")], "k long, v string")
    da = bucket_digest(a, "k", ("v",), 8, "n_a", "dig_a")
    db = bucket_digest(b, "k", ("v",), 8, "n_b", "dig_b")
    diff = da.join(db, "bucket", "full_outer").where(
        F.col("n_a").isNull()
        | F.col("n_b").isNull()
        | (F.col("dig_a") != F.col("dig_b"))
        | (F.col("n_a") != F.col("n_b"))
    )
    flagged = {r.bucket for r in diff.collect()}
    assert flagged == {10 % 8}


# ---------------------------------------------------------------------------
# q273 SCD2 point-in-time lookup
# ---------------------------------------------------------------------------


def test_pit_lookup_partitions_every_order(spark, sf_dir):
    """Validity ranges partition time per key: the PIT join matches
    every order EXACTLY once (row conservation), and orders after the
    effective date of a re-segmented customer attribute to
    MACHINERY."""
    out = QUERIES["q273_scd2_pit_lookup"](spark, sf_dir)
    n_joined = out.agg(F.sum("n_orders")).collect()[0][0]
    assert n_joined == load_table(spark, sf_dir, "orders").count()
    # as-was attribution: for a %3==0 customer, post-1998 orders are
    # MACHINERY, pre-1998 orders keep the original segment
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    moved = c.where((F.col("c_custkey") % 3 == 0)).select(
        "c_custkey", "c_mktsegment"
    )
    post = (
        o.join(moved, o.o_custkey == moved.c_custkey)
        .where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .count()
    )
    machinery_post = (
        out.where((F.col("c_mktsegment") == "MACHINERY") & (F.col("y") >= 1998))
        .agg(F.sum("n_orders"))
        .collect()[0][0]
    )
    # MACHINERY-post includes natively-MACHINERY non-moved customers
    assert machinery_post >= post  # moved customers all land there


# ---------------------------------------------------------------------------
# q267 property test: window-chain merge == reference interval merge
# ---------------------------------------------------------------------------


def _ref_merge(dates: list[int], span: int = 30):
    """Reference interval merge in plain Python: sorted sweep."""
    iv = sorted((d, d + span) for d in dates)
    islands = []
    for s, e in iv:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
            islands[-1][2] += 1
        else:
            islands.append([s, e, 1])
    return islands


def test_interval_islands_matches_reference_sweep(spark):
    """The distributed window-chain merge equals the sequential sweep
    on adversarial layouts: duplicates, containment, chains that
    merge only transitively, and isolated points."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.integers(min_value=0, max_value=200),
            min_size=1,
            max_size=20,
        )
    )
    def check(day_offsets):
        import datetime
        import os
        import tempfile

        from citybikedatawarehouse_spark.plans.catalog import QUERIES as Q

        base = datetime.datetime(1995, 1, 1)
        rows = [
            (1, base + datetime.timedelta(days=d), i)
            for i, d in enumerate(day_offsets)
        ]
        df = spark.createDataFrame(
            rows, "o_custkey int, o_orderdate timestamp_ntz, o_orderkey long"
        )
        tmp = tempfile.mkdtemp(prefix="cbdw_prop_iv_")
        df.write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
        out = Q["q267_interval_islands"](spark, tmp).collect()
        ref = _ref_merge(day_offsets)
        assert len(out) == 1
        row = out[0].asDict()
        assert row["n_islands"] == len(ref)
        assert row["covered_days"] == sum(e - s for s, e, _ in ref)
        assert row["max_island_days"] == max(e - s for s, e, _ in ref)
        assert row["max_island_orders"] == max(n for _, _, n in ref)

    check()


# ---------------------------------------------------------------------------
# plan pins for the session-2 queries
# ---------------------------------------------------------------------------


def _plan(spark, name, sf_dir, mode="formatted"):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_interval_islands_plan_has_no_join(spark, sf_dir):
    """The interval merge must stay a window chain — a Join appearing
    here means someone rewrote it as the quadratic interval
    self-join."""
    plan = _plan(spark, "q267_interval_islands", sf_dir)
    assert "Join" not in plan, plan


def test_bucket_digest_plan_joins_aggregates_not_tables(spark, sf_dir):
    """q270's join must consume the 64-row digest AGGREGATES and be
    symmetric: FULL OUTER on bucket (a left join can never flag a
    bucket populated only in snapshot B). BroadcastHashJoin does not
    support full outer, so the tiny (64x64-row) join sorts+merges —
    irrelevant at that size."""
    plan = _plan(spark, "q270_bucket_digest_diff", sf_dir)
    assert "FullOuter" in plan, plan
    # the scans fold into partial aggregates before any exchange
    assert plan.count("HashAggregate") >= 4, plan  # 2 snapshots x partial+final


def test_pit_lookup_plan_broadcasts_dim(spark, sf_dir):
    plan = _plan(spark, "q273_scd2_pit_lookup", sf_dir)
    assert "BroadcastHashJoin" in plan, plan


def test_k_anonymity_plan_is_single_aggregate(spark, sf_dir):
    plan = _plan(spark, "q268_k_anonymity", sf_dir)
    assert "Join" not in plan, plan
    # exactly ONE shuffle (the tree renders each node once as
    # "Exchange (n)"; the details section repeats it as "(n) Exchange")
    assert plan.count("Exchange (") == 1, plan


# ---------------------------------------------------------------------------
# q274 UDTF chunker: cross-implementation law vs the native chunker
# ---------------------------------------------------------------------------


def test_udtf_chunker_equals_native_chunker(spark, sf_dir):
    """At the SAME window/stride, the Python UDTF must reproduce the
    native explode/sequence chunker row for row — the guarantee that
    the TVF surface and the hot path share one tokenization/hash
    convention."""
    from citybikedatawarehouse_spark.functions.udtfs import register_udtfs
    from citybikedatawarehouse_spark.plans.text import chunk_manifest

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("__udtf_law_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_fp
        FROM __udtf_law_docs d, LATERAL chunk_doc(d.text, 64, 32) c
        """
    )
    native = chunk_manifest(docs, window=64, stride=32)
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, native.collect()))
    assert a == b


def test_bucket_digest_property_random_mutations(spark):
    """Property: for arbitrary tables and arbitrary mutation sets,
    the digest diff flags exactly the buckets containing a mutated or
    deleted key (xor-collision risk 2^-60 — negligible for test
    sizes)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from citybikedatawarehouse_spark.operators.maintenance import (
        bucket_digest,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),  # key
                st.integers(min_value=-100, max_value=100),  # payload
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        st.sets(st.integers(min_value=0, max_value=500), max_size=10),
        st.sets(st.integers(min_value=0, max_value=500), max_size=10),
    )
    def check(rows, upd_keys, del_keys):
        a = spark.createDataFrame(rows, "k long, v long")
        present = {k for k, _ in rows}
        b = (
            a.where(~F.col("k").isin(list(del_keys)) if del_keys else F.lit(True))
            .select(
                "k",
                (
                    F.col("v")
                    + F.when(F.col("k").isin(list(upd_keys)), 1).otherwise(0)
                ).alias("v") if upd_keys else F.col("v"),
            )
        )
        da = bucket_digest(a, "k", ("v",), 8, "n_a", "dig_a")
        db = bucket_digest(b, "k", ("v",), 8, "n_b", "dig_b")
        diff = da.join(db, "bucket", "full_outer").where(
            F.col("n_a").isNull()
            | F.col("n_b").isNull()
            | (F.col("dig_a") != F.col("dig_b"))
            | (F.col("n_a") != F.col("n_b"))
        )
        flagged = {r.bucket for r in diff.collect()}
        touched = {
            k % 8 for k in (upd_keys | del_keys) if k in present
        }
        assert flagged == touched
    check()


def test_bucket_digest_null_and_delimiter_safety(spark):
    """The row encoding must be injective over NULLs and delimiter-
    lookalike payloads: with the old concat_ws(':') scheme all four
    of these distinct rows hashed IDENTICALLY for the same key —
    (NULL,'x') == ('x',NULL) (NULL skipped) and ('2:3','') == ('2','3')
    (delimiter ambiguity) — so a snapshot mutation between them was
    invisible to the diff. Per-column md5 segments + an explicit
    NULL token make every digest distinct."""
    from citybikedatawarehouse_spark.operators.maintenance import (
        bucket_digest,
    )

    variants = [
        (None, "x"),
        ("x", None),
        ("2:3", ""),
        ("2", "3"),
        (None, None),
        ("", ""),
    ]
    digests = []
    for v1, v2 in variants:
        snap = spark.createDataFrame(
            [(1, v1, v2)], "k long, p1 string, p2 string"
        )
        d = bucket_digest(snap, "k", ("p1", "p2"), 8).collect()
        assert len(d) == 1 and d[0]["n"] == 1
        digests.append(d[0]["digest"])
    assert len(set(digests)) == len(variants), digests


# ---------------------------------------------------------------------------
# q271 variant shred: malformed-JSON semantics
# ---------------------------------------------------------------------------


def test_variant_shred_counts_malformed_json_as_invalid(spark, tmp_path):
    """n_valid must MEASURE validity, not assume it: a malformed
    props row yields NULL from try_parse_json (ok=0) instead of
    crashing the job — matching the oracle's json_valid semantics.
    (Plain parse_json throws on the bad row, making the counter
    vacuous: 'ok' could only ever be 0 for NULL input.)"""
    import datetime

    rows = [
        (1, datetime.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 3}'),
        (2, datetime.datetime(2024, 1, 1), 2, "view", 1.0, "{not json"),
        (3, datetime.datetime(2024, 1, 1), 3, "view", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.coalesce(1).write.parquet(str(sf / "events.parquet"))
    out = QUERIES["q271_variant_shred"](spark, str(sf)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 3
    assert r["n_valid"] == 1  # only the well-formed row
    assert r["k_sum"] == 3 and r["k_min"] == 3 and r["k_max"] == 3


# ---------------------------------------------------------------------------
# q275/q276 KMV sketch plan shape (round 9)
# ---------------------------------------------------------------------------


def test_kmv_overlap_plan_takeordered_no_cartesian(spark, sf_dir):
    """q275's bottom-k must run as TakeOrderedAndProject
    (per-partition heaps merged at k*P rows — never a global Sort),
    and the 1-row scalar attachments must stay broadcast: no
    CartesianProduct anywhere."""
    plan = _plan(spark, "q275_kmv_overlap", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmv_matrix_plan_no_cartesian_and_windowed_bottomk(spark, sf_dir):
    """q276's per-segment bottom-k is the segment-partitioned window
    (low-cardinality groups), the theta attachments broadcast, and
    nothing degenerates to a cartesian product."""
    plan = _plan(spark, "q276_kmv_overlap_matrix", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
