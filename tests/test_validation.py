"""Validation-operator tests: each check fires on planted violations
and stays silent on clean data; the citibike star schema built by the
ETL passes its own declared constraints."""

from __future__ import annotations

import pytest

from citybikedatawarehouse_spark.operators.validation import (
    check_accepted_values,
    check_foreign_key,
    check_not_null,
    check_primary_key,
    check_value_range,
    citibike_star_checks,
    validation_report,
)


@pytest.fixture(scope="module")
def dirty(spark):
    parent = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    child = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 99), (13, None)], "cid int, pid int"
    )
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y"), (None, "z")], "k int, v string"
    )
    return parent, child, dup


def test_primary_key_counts_dups_and_nulls(dirty):
    _, _, dup = dirty
    row = check_primary_key(dup, "k").collect()[0]
    assert row["violations"] == 2  # one duplicate + one null
    assert row["kind"] == "primary_key"


def test_primary_key_clean(dirty):
    parent, _, _ = dirty
    assert check_primary_key(parent, "id").collect()[0]["violations"] == 0


def test_foreign_key_orphans(dirty):
    parent, child, _ = dirty
    row = check_foreign_key(child, "pid", parent, "id").collect()[0]
    assert row["violations"] == 1  # pid=99; null pid is not a violation


def test_not_null(dirty):
    _, child, _ = dirty
    assert check_not_null(child, "pid").collect()[0]["violations"] == 1


def test_value_range_and_accepted_values(spark):
    df = spark.createDataFrame([(0.5,), (-1.0,), (2.0,), (None,)], "x double")
    assert (
        check_value_range(df, "x", min_val=0.0, max_val=1.0).collect()[0]["violations"]
        == 2
    )
    df2 = spark.createDataFrame([("a",), ("b",), ("zz",)], "s string")
    assert (
        check_accepted_values(df2, "s", ["a", "b"]).collect()[0]["violations"] == 1
    )


def test_report_shape(dirty):
    parent, child, dup = dirty
    rep = validation_report(
        [check_primary_key(dup, "k"), check_foreign_key(child, "pid", parent, "id")]
    )
    rows = rep.collect()
    assert len(rows) == 2
    assert set(rep.columns) == {"constraint_name", "kind", "violations"}


def test_citibike_star_passes_own_constraints(spark, tmp_path):
    """The ETL output satisfies every constraint the reference DDL
    declares — including the six FK relationships the derive-mode
    fact never joined on."""
    from citybikedatawarehouse_spark.etl import run_citibike_etl
    from tests.citibike_fixture import write_fixture

    path = str(tmp_path / "rides.csv")
    write_fixture(path)
    result = run_citibike_etl(spark, path)
    report = citibike_star_checks(result.tables).collect()
    # the fully-null-end fixture row yields a null end_station_id,
    # which FK semantics ignore; everything else must be 0
    bad = {r["constraint_name"]: r["violations"] for r in report if r["violations"]}
    assert bad == {}, f"unexpected violations: {bad}"


def test_fused_fact_constraints_match_individual_checks(spark):
    """check_fact_constraints must emit exactly the rows the
    per-check composition produced (same labels, kinds, counts) —
    it is a plan fusion, not a semantic change."""
    from citybikedatawarehouse_spark.operators.validation import (
        check_fact_constraints,
        check_foreign_key,
        check_not_null,
        check_value_range,
        validation_report,
    )

    fact = spark.createDataFrame(
        [
            (10, 1, 5.0),
            (99, 2, None),     # orphan FK + null speed
            (None, 3, -1.0),   # null FK is NOT an orphan; negative value
        ],
        "fk_col int, other int, speed double",
    )
    dim = spark.createDataFrame([(10,), (11,)], "id int")
    fused = {
        (r["constraint_name"], r["kind"]): r["violations"]
        for r in check_fact_constraints(
            fact,
            fks=[("fk_col", dim, "id")],
            not_nulls=["speed"],
            non_negative=["speed"],
        ).collect()
    }
    individual = {
        (r["constraint_name"], r["kind"]): r["violations"]
        for r in validation_report(
            [
                check_foreign_key(fact, "fk_col", dim, "id"),
                check_not_null(fact, "speed"),
                check_value_range(fact, "speed", min_val=0.0, name="speed_non_negative"),
            ]
        ).collect()
    }
    assert fused == individual
    assert fused[("fk(fk_col->id)", "foreign_key")] == 1
    assert fused[("not_null(speed)", "not_null")] == 1
    assert fused[("speed_non_negative", "value_range")] == 1


def test_column_stats_match_direct_recount(spark, sf_dir):
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.plans.catalog import QUERIES
    from citybikedatawarehouse_spark.sources.readers import load_table

    rows = {(r.tbl, r.col): r for r in QUERIES["q255_column_stats"](spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    r = rows[("orders", "o_custkey")]
    assert r.n_rows == o.count()
    assert r.n_nulls == 0
    assert r.ndv == o.select("o_custkey").distinct().count()
    assert int(r.min_val) == o.agg(F.min("o_custkey")).collect()[0][0]


def test_fd_audit_verdicts(spark, sf_dir):
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rows = {r.fd: r for r in QUERIES["q256_fd_audit"](spark, sf_dir).collect()}
    assert rows["o_orderkey -> o_custkey"].holds == 1
    assert rows["n_nationkey -> n_regionkey"].holds == 1
    assert rows["o_custkey -> o_orderstatus"].holds == 0
    assert rows["o_custkey -> o_orderstatus"].n_violating_lhs > 0
    # a held FD reports zero violators by definition
    for r in rows.values():
        assert (r.holds == 1) == (r.n_violating_lhs == 0)


def test_joinsize_estimate_within_sampling_error(spark, sf_dir):
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    r = QUERIES["q257_joinsize_estimate"](spark, sf_dir).collect()[0]
    assert r.n_estimated == r.n_sample_join * 100
    # 10% x 10% Bernoulli: relative error is a few percent at these
    # sizes; allow a wide 40% band (never vacuous: estimate > 0)
    assert r.n_sample_join > 0
    assert abs(r.rel_error) < 0.4
