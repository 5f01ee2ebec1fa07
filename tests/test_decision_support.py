"""Model and plan invariants for the decision-support shapes
(q227-q233, TPC-H Q8/Q9/Q15/Q17/Q19/Q21/Q22 adapted). Cross-engine
value equality is proven by test_oracle_parity; these pin the laws a
matching oracle cannot see (tie keeping, exact-integer thresholds,
decorrelation equivalence, share identities) and the plan shapes the
100 TB story depends on (OR pushdown, single-pass Q21 aggregate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.sources.readers import load_table


def _plan(spark, name, sf_dir, mode="formatted"):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


# ------------------------------------------------------- q227 (Q15)

def test_top_supplier_is_argmax_with_ties(spark, sf_dir):
    """Every returned supplier carries exactly the global max of the
    quarter revenue relation (>= 1 row; all rows equal)."""
    out = QUERIES["q227_top_supplier"](spark, sf_dir).collect()
    assert len(out) >= 1
    cents = {r.revenue_cents for r in out}
    assert len(cents) == 1  # ties all carry the same (max) revenue
    # recompute the max independently from the raw fact
    l = load_table(spark, sf_dir, "lineitem")
    mx = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("c")
        )
        .agg(F.max("c"))
        .collect()[0][0]
    )
    assert cents == {mx}


# ------------------------------------------------------- q228 (Q17)

def test_small_quantity_threshold_is_strict_half_average(spark, sf_dir):
    """Each surviving item's quantity is strictly below half its
    part's average — re-derived per part in exact integers, and at
    least one part has both kept and dropped lineitems (the filter
    is neither vacuous nor total)."""
    l = load_table(spark, sf_dir, "lineitem")
    pa = {
        r.l_partkey: (r.sum_qty, r.n)
        for r in l.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    kept = (
        l.join(
            load_table(spark, sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", "l_quantity")
        .collect()
    )
    n_kept = 0
    for r in kept:
        s, n = pa[r.l_partkey]
        if int(r.l_quantity) * 2 * n < s:
            n_kept += 1
    total = QUERIES["q228_small_quantity_revenue"](spark, sf_dir).agg(
        F.sum("n_items")
    ).collect()[0][0]
    assert total == n_kept
    assert 0 < n_kept < len(kept)


# ------------------------------------------------------- q229 (Q19)

def test_disjunctive_brands_push_below_join(spark, sf_dir):
    """The union of the three branches' brand terms must reach the
    part scan (Catalyst factors `p_brand IN (...)` out of the OR),
    and the quantity envelope must reach the lineitem scan."""
    plan = _plan(spark, "q229_disjunctive_revenue", sf_dir)
    assert "PushedFilters:" in plan
    # brand disjunction factored onto the part side
    assert "Brand#11" in plan and "Brand#22" in plan and "Brand#9" in plan
    scan_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("p_brand" in ln for ln in scan_lines)


def test_disjunctive_rows_match_per_branch_recount(spark, sf_dir):
    """Each output brand's n_items equals a direct recount of its
    own conjunctive branch (the OR can be evaluated branchwise)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    branches = {
        "Brand#11": j.where(
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        ),
        "Brand#22": j.where(
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        ),
        "Brand#9": j.where(
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        ),
    }
    out = {
        r.p_brand: r.n_items
        for r in QUERIES["q229_disjunctive_revenue"](spark, sf_dir).collect()
    }
    for brand, df in branches.items():
        assert out.get(brand, 0) == df.count()


# ------------------------------------------------------- q230 (Q21)

def test_sole_supplier_aggregate_equals_exists_form(spark, sf_dir):
    """The single-pass aggregate must equal the literal
    EXISTS / NOT-EXISTS formulation run as Spark semi/anti joins."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    l2 = l.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_suppkey").alias("sk"),
    )
    has_other_line = l.join(
        l2,
        (l.l_orderkey == l2.ok) & (l.l_linenumber != l2.ln),
        "left_semi",
    )
    cand = has_other_line.join(
        l2,
        (has_other_line.l_orderkey == l2.ok)
        & (has_other_line.l_suppkey != l2.sk),
        "left_anti",
    ).select("l_suppkey", "l_orderkey").distinct()
    expected = (
        cand.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    s = load_table(spark, sf_dir, "supplier")
    exp_by_name = {
        r.s_name: r.n
        for r in cand.join(s, cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r.s_name: r.n_orders
        for r in QUERIES["q230_sole_supplier_orders"](spark, sf_dir).collect()
    }
    assert got == exp_by_name
    assert sum(got.values()) == sum(r.n for r in expected)


def test_sole_supplier_plan_is_single_fact_scan(spark, sf_dir):
    """The scale story: the Spark plan must NOT self-join lineitem —
    one scan of the fact, grouped. (The classic form scans it three
    times.)"""
    plan = _plan(spark, "q230_sole_supplier_orders", sf_dir)
    assert plan.count("lineitem.parquet") <= 1


# ------------------------------------------------------- q231 (Q22)

def test_rich_idle_customers_threshold_and_antijoin(spark, sf_dir):
    """Survivors all (a) beat the positive-balance average in exact
    integers and (b) have zero orders since the 2000-01-01 cutoff —
    and the predicate is non-vacuous in BOTH directions."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    bal = c.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    pos = bal.where(F.col("cents") > 0).agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    with_orders = {
        r.o_custkey
        for r in o.where(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
        ).select("o_custkey").distinct().collect()
    }
    exp = [
        r
        for r in bal.collect()
        if r.cents * pos.n > pos.s and r.c_custkey not in with_orders
    ]
    out = QUERIES["q231_rich_idle_customers"](spark, sf_dir).agg(
        F.sum("n_customers"), F.sum("total_bal_cents")
    ).collect()[0]
    assert out[0] == len(exp)
    assert out[1] == sum(r.cents for r in exp)
    assert 0 < len(exp) < bal.count()


# ------------------------------------------------------- q232 (Q8)

def test_market_share_identity(spark, sf_dir):
    """Per year: 0 <= nation <= total, share == round(ratio, 6), and
    summing nation cents over ALL supplier nations reproduces the
    total (conservation across the conditional sum)."""
    rows = QUERIES["q232_market_share"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.nation_cents <= r.total_cents
        assert abs(r.mkt_share - round(r.nation_cents / r.total_cents, 6)) < 1e-12


# ------------------------------------------------------- q233 (Q9)

def test_parttype_profit_conserves_filtered_revenue(spark, sf_dir):
    """Summing profit over all (nation, year) cells equals the
    filtered fact's total discounted revenue — no row lost or
    double-counted across the join tree."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    direct = (
        l.join(
            p.where(F.col("p_type") == "PROMO").select("p_partkey"),
            l.l_partkey == F.col("p_partkey"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
        )
        .collect()[0][0]
    )
    out = QUERIES["q233_parttype_profit"](spark, sf_dir).agg(
        F.sum("profit_cents")
    ).collect()[0][0]
    assert out == direct


# ------------------------------------------------------- plan pins

def test_market_share_no_cartesian_no_shuffled_dims(spark, sf_dir):
    """q232's 7-relation tree: no cartesian product anywhere, and
    every dim-side join is a broadcast (the only allowed non-BHJ at
    scale is the lineitem-orders fact join)."""
    plan = _plan(spark, "q232_market_share", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") <= 1  # at most the fact join


def test_gdpr_cascade_is_all_broadcast(spark, sf_dir):
    """q241's cascade joins and the orphan proof are cohort-bounded:
    every join must broadcast — a sort-merge join here means a fact
    table went through a shuffle for a ~2% cohort probe."""
    plan = _plan(spark, "q241_gdpr_cascade_audit", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_top_supplier_quarter_filter_pushed(spark, sf_dir):
    """q227's ship-date quarter filter must reach the lineitem scan."""
    plan = _plan(spark, "q227_top_supplier", sf_dir)
    read = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in read)
