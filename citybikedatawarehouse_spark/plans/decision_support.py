"""Decision-support query shapes (TPC-H Q8/Q9/Q15/Q17/Q19/Q21/Q22
adapted to the driver star schema — no partsupp / commitdate /
phone columns exist, so each query keeps the CLASSIC PLAN SHAPE and
swaps the missing column for an available one).

The reference (LauraIkic/CityBikeDataWarehouse) serves exactly this
category of reporting query off its star schema (the dimensional
model built by `create_db_from_csv.py` exists to be queried like
this); these complete the catalog's coverage of the canonical
decision-support plan shapes that were still missing:

- scalar-subquery-on-aggregate (Q15 top supplier, Q22 rich-idle),
- correlated-average decorrelation (Q17 small-quantity),
- disjunctive multi-branch predicates / OR pushdown (Q19),
- multi-EXISTS / NOT-EXISTS self-reference collapsed to a
  single-pass aggregate (Q21 sole-supplier),
- two-level conditional share rollup (Q8 market share),
- part-filtered multi-dim profit rollup (Q9).

Cross-engine determinism follows catalog conventions: money is
summed as integer cents (`round(x * 100)` -> BIGINT) before any
division; threshold comparisons against averages are done in exact
integer arithmetic (`bal_cents * n > sum_cents`, never a float
average); shares are `round(x, 6)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


def _rev_cents(price="l_extendedprice", disc="l_discount"):
    """Discounted revenue in exact integer cents (q01's formula)."""
    return F.round(F.col(price) * (1 - F.col(disc)) * 100).cast("bigint")


# ---------------------------------------------------------------------------
# q227 — top supplier by quarterly revenue (TPC-H Q15 shape)
# ---------------------------------------------------------------------------

@register(
    "q227_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS revenue_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate <  DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey,
           s.s_name,
           CAST(r.revenue_cents AS BIGINT) AS revenue_cents
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.revenue_cents = (SELECT max(revenue_cents) FROM rev)
    """,
)
def q227_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by revenue in a ship-date quarter — the TPC-H
    Q15 shape (revenue view + scalar MAX subquery, ties kept). The
    classic formulation creates a view and compares each supplier's
    revenue to the view's global max; here the view is the
    per-supplier aggregate and the scalar is a 1-row broadcast.

    Scale shape: the quarter filter is pushed to the parquet scan
    (shipdate range -> PushedFilters), the per-supplier aggregate is
    map-side-combinable to |suppliers| rows, the global max is a
    1-row reduce of THAT (never of lineitem), and the winner filter
    plus the supplier-name join both run broadcast. One corpus scan,
    one corpus-scale shuffle (the supplier agg), everything after is
    dimension-sized."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )
    top = rev.agg(F.max("revenue_cents").alias("max_cents"))
    return (
        rev.join(F.broadcast(top), rev.revenue_cents == top.max_cents)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q228 — small-quantity order revenue by brand (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

@register(
    "q228_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n_li
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 2 * pa.n_li < pa.sum_qty
    GROUP BY p.p_brand
    """,
)
def q228_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from small-quantity lineitems by brand — the TPC-H
    Q17 shape: each lineitem is compared against HALF THE AVERAGE
    quantity ordered for its own part (a correlated scalar AVG
    subquery in the classic form), decorrelated into a per-part
    aggregate joined back to the fact. The threshold test is done in
    exact integers (qty * 2 * n < sum_qty, quantities are integral)
    so no float-average tie can flip a row between engines.

    Scale shape: the decorrelated form is the scale plan — ONE extra
    aggregate over lineitem keyed by partkey (map-side combinable to
    |parts| rows) instead of one correlated subquery execution per
    probe row; the per-part relation and the part dim both broadcast
    back onto the fact, so the probe side never shuffles. At 100 TB
    the per-part aggregate shuffles |parts| rows, not |lineitem|."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(pa), l.l_partkey == pa.pa_partkey)
        .where(
            F.col("l_quantity").cast("bigint") * 2 * F.col("n_li")
            < F.col("sum_qty")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q229 — disjunctive predicate revenue (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

@register(
    "q229_disjunctive_revenue",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    GROUP BY p.p_brand
    """,
)
def q229_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue matching any of three brand/size/quantity bundles —
    the TPC-H Q19 shape: a disjunction of conjunctive branches
    spanning BOTH join sides. The interesting optimizer work is
    predicate decomposition: Catalyst factors the brand-side terms
    (`p_brand IN (...)`) below the join onto the part scan and the
    quantity envelope (1..50) onto the lineitem scan, leaving only
    the cross-side residual above the join — OR does not defeat
    pushdown when expressed declaratively.

    Scale shape: part is a broadcast dim, so the fact side never
    shuffles before the final 3-row aggregate; the lineitem scan
    keeps its quantity range in PushedFilters. Grouping by brand
    reports which branch each surviving row came from (a row's brand
    uniquely selects its branch)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#11") & size.between(1, 15) & qty.between(1, 20))
        | ((brand == "Brand#22") & size.between(10, 30) & qty.between(10, 35))
        | ((brand == "Brand#9") & size.between(20, 50) & qty.between(20, 50))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(_rev_cents()).cast("bigint").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q230 — sole-supplier multi-item orders (TPC-H Q21 shape)
# ---------------------------------------------------------------------------

@register(
    "q230_sole_supplier_orders",
    oracle="""
    WITH cand AS (
      SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
      FROM lineitem l1
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_linenumber <> l1.l_linenumber)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey)
    )
    SELECT s.s_name,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM cand c
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    GROUP BY s.s_name
    """,
)
def q230_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier, how many MULTI-item orders they fulfilled
    single-handedly — the TPC-H Q21 logical shape (EXISTS another
    lineitem in the order / NOT EXISTS a lineitem from a different
    supplier). The oracle states it in the classic correlated
    two-subquery form; the Spark plan collapses both subqueries into
    ONE single-pass aggregate over the fact: per order,
    `count(DISTINCT l_linenumber) >= 2` is the EXISTS (another line,
    DIFFERENT linenumber — plain count(*) would wrongly admit orders
    whose extra rows share a linenumber) and `count(DISTINCT
    l_suppkey) = 1` is the NOT EXISTS, with `min(l_suppkey)`
    recovering the sole supplier.

    Scale shape: the classic form scans lineitem three times and
    runs two self-joins; the aggregate form is one scan and one
    orderkey-keyed shuffle (map-side combinable), producing
    |orders|-bounded rows that immediately collapse to |suppliers|.
    This is THE decorrelation win to demand from an engine at
    100 TB — self-EXISTS over a fact table must become a grouped
    scan, never a fact-fact join."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_linenumber").alias("n_lines"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.min("l_suppkey").alias("sole_suppkey"),
    )
    sole = per_order.where((F.col("n_lines") >= 2) & (F.col("n_supps") == 1))
    return (
        sole.join(F.broadcast(s), sole.sole_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# q231 — rich idle customers by nation (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

@register(
    "q231_rich_idle_customers",
    oracle="""
    WITH cb AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    ),
    thr AS (
      SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
             CAST(count(*) AS BIGINT) AS n_pos
      FROM cb WHERE bal_cents > 0
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(c.bal_cents) AS BIGINT) AS total_bal_cents
    FROM cb c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN thr
    WHERE c.bal_cents * thr.n_pos > thr.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY n.n_name
    """,
)
def q231_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balances and NO RECENT
    order (none since 2000-01-01), rolled up by nation — the TPC-H
    Q22 shape (global scalar AVG subquery + anti join against
    orders). Q22's literal "never ordered" predicate is vacuous on
    the driver data (every customer has orders at every SF), so the
    anti-join keeps the same shape on a recency-filtered orders
    side — 5 survivors at sf0.001 / 55 at sf0.01, non-empty by
    construction. The average test runs in exact integers
    (`bal_cents * n_pos > sum_cents`) so cross-engine float
    summation order cannot flip a borderline customer.

    Scale shape: the threshold is a 1-row reduce over the customer
    dim (broadcast back as a literal pair); the NOT EXISTS is a
    LEFT ANTI join — at fact scale Spark shuffles orders projected
    to its custkey column only (or broadcasts the rich-customer
    minority side under AQE); the final rollup is |nations| rows.
    No correlated per-row probing anywhere."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    cb = c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    thr = cb.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("sum_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = cb.join(F.broadcast(thr)).where(
        F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents")
    )
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("bal_cents").cast("bigint").alias("total_bal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q232 — national market share within a region (TPC-H Q8 shape)
# ---------------------------------------------------------------------------

_SHARE_REGION = "ASIA"
_SHARE_NATION = "NATION_2"

@register(
    "q232_market_share",
    oracle=f"""
    WITH flows AS (
      SELECT year(o.o_orderdate) AS order_year,
             ns.n_name AS supp_nation,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = '{_SHARE_REGION}'
    )
    SELECT CAST(order_year AS INTEGER) AS order_year,
           CAST(sum(CASE WHEN supp_nation = '{_SHARE_NATION}'
                         THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           round(sum(CASE WHEN supp_nation = '{_SHARE_NATION}'
                          THEN cents ELSE 0 END) * 1.0 / sum(cents), 6)
             AS mkt_share
    FROM flows
    GROUP BY order_year
    """,
)
def q232_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One supplier nation's share of a customer region's yearly
    purchase volume — the TPC-H Q8 shape: the 7-relation join tree
    (fact ⋈ orders ⋈ customer-side dim chain ⋈ supplier-side dim
    chain), then a conditional-sum share per year. Share = exact
    integer cents over exact integer cents, divided once and rounded
    to 6 at the very end.

    Scale shape: identical join skeleton to q186 (Q7) — the ONLY
    corpus-scale shuffle is lineitem ⋈ orders on orderkey (bucketing
    both by orderkey makes it shuffle-free at rest); customer,
    supplier, and both nation arms plus region broadcast. The
    region filter runs on the customer-side nation dim BEFORE the
    fact join, shrinking the probe stream; the share is computed in
    the same |years|-row aggregate as the sums, not a second pass."""
    sf = sf_dir
    l = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    nc = (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == _SHARE_REGION)
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    flows = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("order_year"),
            "supp_nation",
            _rev_cents().alias("cents"),
        )
    )
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == _SHARE_NATION, F.col("cents")).otherwise(
            F.lit(0)
        )
    )
    return flows.groupBy(
        F.col("order_year").cast("int").alias("order_year")
    ).agg(
        nation_cents.cast("bigint").alias("nation_cents"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.round(nation_cents * 1.0 / F.sum("cents"), 6).alias("mkt_share"),
    )


# ---------------------------------------------------------------------------
# q233 — part-type profit rollup by supplier nation (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

_PROFIT_PTYPE = "PROMO"

@register(
    "q233_parttype_profit",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE p.p_type = '{_PROFIT_PTYPE}'
    GROUP BY 1, 2
    """,
)
def q233_parttype_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit contribution of one part type by supplier nation and
    order year — the TPC-H Q9 shape with the available columns (no
    partsupp/supplycost in the driver schema, so profit is the
    discounted revenue, same formula as q01). The selective part
    filter runs INSIDE the broadcast dim before the fact join.

    Scale shape: part/supplier/nation broadcast; the part-type
    filter makes the part build side a ~1/6 subset, and because the
    join is INNER, that selectivity prunes the fact stream at the
    probe — a 100 TB scan keeps only matching partkeys before the
    one real shuffle (lineitem ⋈ orders). Rollup output is
    |nations| × |years| rows."""
    sf = sf_dir
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    o = _t(spark, sf, "orders")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    psel = p.where(F.col("p_type") == _PROFIT_PTYPE).select("p_partkey")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(F.broadcast(psel), l.l_partkey == F.col("p_partkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(
            "supp_nation",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(_rev_cents()).cast("bigint").alias("profit_cents"),
        )
    )
