"""Relational operator surface: scans, filters, projections, joins,
aggregations, windows, set ops, dedup, validation.

Covers SURVEY.md section 2.1-2.3 (re-expressed over the driver
testdata star schema) and the section 2.4 gap inventory (aggregations,
window functions, semi/anti/range joins, set ops, cube/rollup/
grouping sets) — the analytical surface the reference delegates to
Power BI, here first-class Spark plans.

Oracle-parity conventions (see plans/catalog.py docstring):
  * identical output aliases on both sides;
  * double aggregates rounded identically on both sides (sum of
    2-decimal money at scale 2; averages/ratios at scale 6);
  * float literals in oracle SQL written ``::DOUBLE`` (DuckDB parses
    bare decimals as DECIMAL, Spark as double);
  * deterministic total order wherever limits/windows bite
    (tie-broken by a unique key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t

# --------------------------------------------------------------------------
# scans / filters / projections
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 2)                                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
           round(avg(l_quantity), 6)                                          AS avg_qty,
           round(avg(l_extendedprice), 6)                                     AS avg_price,
           round(avg(l_discount), 6)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter -> hash aggregate (partial+final
    map-side combine is automatic). The flagship query."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 45.0::DOUBLE
    """,
)
def q02_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate — both reach the parquet scan
    (PushedFilters / ReadSchema; asserted in tests/test_plans.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") > 45.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "q06_predicate_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.03::DOUBLE AND l_discount <= 0.07::DOUBLE
      AND l_quantity < 24.0::DOUBLE
    """,
)
def q06_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate scan -> global agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


@register(
    "q03_topk_revenue",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q03_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join -> agg -> deterministic top-k.
    customer scales with SF (sf x 150k) so it gets NO broadcast hint —
    AQE's autoBroadcastJoinThreshold picks broadcast at small SF and
    shuffle join at large SF; lineitem-orders is the real join."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q05_region_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q05_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Only the constant-size dims
    (region: 5 rows, nation: 25 rows) carry broadcast hints;
    customer (sf x 150k) and supplier (sf x 10k) are fact-scale in
    TPC-H — a forced broadcast would override AQE's size check and
    OOM executors at large SF, so those joins are left to
    AQE/autoBroadcastJoinThreshold (broadcast while small, shuffle
    join when not)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q04_exists_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q04_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS as a left-semi join + aggregate."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q07_left_join_enrich",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q07_left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer equi join — the reference's only join kind
    (check_and_create_db_v4.py:240-270). customer is fact-scale, so
    no broadcast hint: AQE decides by measured size."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "q08_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE c.c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no jumbo (>400k) order. The right side is
    FILTERED before the anti-join so the check is non-vacuous: the
    generator gives every customer at least one order, making a
    plain no-orders anti-join return the empty set at every SF — a
    hash match on nothing (the q147 lesson). 400k keeps 20/202/1997
    result rows at sf0.001/0.01/0.1."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q31_range_join",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
    """,
)
def q31_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate riding on an equi key: Catalyst executes the
    equi part as the join key and the interval as a post-filter — no
    cartesian blowup."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 60 DAY")),
        )
        .select("o_orderkey", "l_linenumber", "l_quantity")
    )


# --------------------------------------------------------------------------
# dedup & set ops (SURVEY section 2.2 ops 14-17)
# --------------------------------------------------------------------------


@register(
    "q10_distinct_dedup",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q10_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row dedup == the reference's drop_duplicates()
    (check_and_create_db_v4.py:147 etc.) — a hash aggregate."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "q11_keyed_dedup_first",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey FROM (
      SELECT c_custkey, c_name, c_nationkey,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    """,
)
def q11_keyed_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with a *deterministic* survivor (min key) — the
    reference's drop_duplicates(subset=...) keeps 'first seen', which
    has no distributed meaning; we pin the survivor instead."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "c_name", "c_nationkey")
    )


_UNION_ORACLE_BRANCHES = """
    SELECT c_custkey AS acct_key, c_name AS acct_name, c_nationkey AS nationkey,
           c_acctbal AS acctbal, 'customer' AS side
    FROM customer
    {op}
    SELECT s_suppkey AS acct_key, s_name AS acct_name, s_nationkey AS nationkey,
           s_acctbal AS acctbal, 'supplier' AS side
    FROM supplier
"""


def _union_branches(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("acct_key"),
        F.col("c_name").alias("acct_name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("side"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("acct_key"),
        F.col("s_name").alias("acct_name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return c, s


@register("q12_union_all", oracle=_UNION_ORACLE_BRANCHES.format(op="UNION ALL"))
def q12_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertical union == the reference's pd.concat
    (check_and_create_db_v4.py:176,198) — by-name, no shuffle."""
    c, s = _union_branches(spark, sf_dir)
    return c.unionByName(s)


@register("q13_union_distinct", oracle=_UNION_ORACLE_BRANCHES.format(op="UNION"))
def q13_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _union_branches(spark, sf_dir)
    return c.unionByName(s).distinct()


@register(
    "q14_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q14_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q15_except",
    oracle="""
    SELECT l_shipdate AS d FROM lineitem
    EXCEPT
    SELECT o_orderdate AS d FROM orders
    """,
)
def q15_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship dates on which nothing was ordered. Previously ran on
    nationkeys, where supplier covers all 25 nations from sf0.01 up
    — an always-empty (vacuous) result. Ship dates trail order dates
    by up to ~4 months, so the tail keeps this non-empty at every
    SF (1291/101/95 rows)."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_shipdate").alias("d"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderdate").alias("d"))
    return li.subtract(o)


@register(
    "q16_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey AS custkey FROM customer
    """,
)
def q16_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference — keeps duplicate cardinality."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------


@register(
    "q17_window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q17_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — THE window idiom the reference's Power BI
    layer would otherwise provide."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q18_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def q18_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q19_window_lag_lead",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           lag(l_quantity)  OVER w AS prev_qty,
           lead(l_quantity) OVER w AS next_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def q19_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
    )


@register(
    "q20_window_rank_suite",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q20_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


# --------------------------------------------------------------------------
# multi-dimensional aggregation
# --------------------------------------------------------------------------


@register(
    "q21_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) + 2*grouping(l_linestatus) AS INTEGER) AS gid,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q21_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (
            F.grouping("l_returnflag").cast("int")
            + F.lit(2) * F.grouping("l_linestatus").cast("int")
        ).alias("gid"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q22_rollup",
    oracle="""
    SELECT year(o_orderdate) AS y, o_orderpriority,
           round(sum(o_totalprice), 2) AS total,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    """,
)
def q22_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn("y", F.year("o_orderdate"))
    return o.rollup("y", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q23_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q23_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q24_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q24_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q25_agg_stats",
    oracle="""
    SELECT l_linestatus,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty,
           round(avg(l_quantity), 6) AS avg_qty,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(avg(l_extendedprice), 6) AS avg_price
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q25_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
    )


@register(
    "q26_sort_limit_topk",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 20
    """,
)
def q26_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — no full sort."""
    p = _t(spark, sf_dir, "part")
    return (
        p.orderBy(F.col("p_retailprice").desc(), "p_partkey")
        .select("p_partkey", "p_name", "p_retailprice")
        .limit(20)
    )


@register(
    "q27_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_O", "F": "qty_F"})
    )


# --------------------------------------------------------------------------
# constraint validation (replaces unenforced PK/FK DDL — SURVEY 1.3)
# --------------------------------------------------------------------------


@register(
    "q29_pk_uniqueness",
    oracle="""
    SELECT 'orders.o_orderkey' AS constraint_name,
           count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_keys,
           count(*) - count(DISTINCT o_orderkey) AS violations
    FROM orders
    """,
)
def q29_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIMARY KEY as a validation op: Spark doesn't enforce
    constraints (reference DDL check_and_create_db_v4.py:97), so the
    engine checks them declaratively."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.lit("orders.o_orderkey").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("violations"),
    )


@register(
    "q30_fk_orphans",
    oracle="""
    SELECT count(*) AS orphan_rows FROM (
      SELECT l_orderkey FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    )
    """,
)
def q30_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOREIGN KEY as an anti-join orphan count."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
    )


@register(
    "q32b_shipmode_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_quantity >= 25.0::DOUBLE THEN 1 ELSE 0 END) AS BIGINT)
               AS high_qty_lines,
           CAST(sum(CASE WHEN l_quantity <  25.0::DOUBLE THEN 1 ELSE 0 END) AS BIGINT)
               AS low_qty_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def q32b_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional (CASE) aggregation."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") >= 25.0, 1).otherwise(0))
            .cast("bigint")
            .alias("high_qty_lines"),
            F.sum(F.when(F.col("l_quantity") < 25.0, 1).otherwise(0))
            .cast("bigint")
            .alias("low_qty_lines"),
        )
    )


@register(
    "q33b_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0::DOUBLE * sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0.0::DOUBLE END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q33b_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio over a part join
    (part is sf x 200k — fact-scale, so no broadcast hint; AQE
    decides)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share_pct")
        )
    )


@register(
    "q34b_nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, CAST(y AS INTEGER) AS y,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS y,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE n1.n_name IN ('NATION_3', 'NATION_8') AND n2.n_name IN ('NATION_3', 'NATION_8')
    )
    GROUP BY supp_nation, cust_nation, y
    """,
)
def q34b_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape: two-nation trade volume by year — double
    nation-dimension join with IN filters. Only the 25-row nation
    dims get broadcast hints; supplier/customer are fact-scale (AQE
    decides)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    nations = ["NATION_3", "NATION_8"]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation").isin(nations) & F.col("cust_nation").isin(nations))
        .withColumn("y", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "y")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q35b_returned_item_ranking",
    oracle="""
    SELECT c_custkey, c_name, n_name, c_acctbal,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q35b_returned_item_ranking(spark, sf_dir):
    """TPC-H Q10 shape: top returned-item customers by lost revenue.
    Fact-side filters reach the parquet scan; nation broadcasts; the
    sorted limit runs as TakeOrderedAndProject (no full sort at any
    scale). c_custkey tiebreak keeps the limit boundary deterministic
    across engines."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        # sum exact integer cents, not doubles: per-row products are
        # bit-identical across engines, and an integer sum is
        # order-independent — immune to the last-ulp drift that a
        # rounded double sum hits at half-cent boundaries
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("bigint")
                ).cast("double")
                / 100
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q36b_large_order_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q36b_large_order_customers(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold, joined back to the order and customer. The HAVING
    aggregate is partial+final (map-side combine) and shrinks the
    join input before any wide join happens."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__raw_qty"))
        # filter on the RAW sum (as the oracle's HAVING does), round
        # only the projected output — a boundary value like 150.0001
        # must pass the threshold but still print rounded
        .filter(F.col("__raw_qty") > 150)
        .select("l_orderkey", F.round("__raw_qty", 2).alias("sum_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@register(
    "q120_moving_avg_range",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day_num,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(day_cents / 100.0, 2) AS day_revenue,
           round(avg(day_cents) OVER (
                   ORDER BY day_num
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                 ) / 100.0, 6) AS ma7,
           CAST(count(*) OVER (
                   ORDER BY day_num
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS n_days
    FROM daily
    """,
)
def q120_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average of daily order revenue — the
    VALUE-BASED (RANGE) window frame the rows-frame suite (q18/q19)
    does not cover: the frame is "all days within 6 calendar days
    before mine", so gaps in the date axis shrink the window
    (n_days < 7) instead of silently pulling older rows in, which is
    the correctness difference between RANGE and ROWS on sparse time
    axes.

    Determinism across engines: revenue is summed in exact integer
    CENTS (bigint) before the window — double summation order
    differs between Spark's sequential frame accumulation and
    DuckDB's segment-tree window aggregation, and at day-revenue
    magnitudes that last-ulp drift would round differently at the
    1e-6 boundary often enough to break the hash gate; integer sums
    make avg = exact_sum/count, bit-identical.

    Scale shape: the corpus-sized input collapses to one row per DAY
    in a map-side-combinable aggregate BEFORE any window — the
    window runs on O(years x 365) rows in a single bounded
    partition (a constant partition spec, so unpartitioned-window
    warnings stay meaningful for data paths). The same pattern at
    100 TB: never window the fact table on a global order, window
    the pre-aggregate."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.to_date("o_orderdate").alias("day"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("day_num"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("day_cents")
        )
    )
    w = (
        W.partitionBy(F.lit(0))
        .orderBy("day_num")
        .rangeBetween(-6, W.currentRow)
    )
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("day_cents") / 100.0, 2).alias("day_revenue"),
        F.round(F.avg("day_cents").over(w) / 100.0, 6).alias("ma7"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days"),
    )


@register(
    "q121_gap_fill_locf",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day_num,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM orders GROUP BY 1
    ),
    bounds AS (SELECT min(day_num) AS lo, max(day_num) AS hi FROM daily),
    axis AS (SELECT unnest(generate_series(lo, hi)) AS day_num FROM bounds),
    joined AS (
      SELECT a.day_num, d.day_cents FROM axis a LEFT JOIN daily d USING (day_num)
    )
    SELECT strftime(DATE '1970-01-01' + to_days(CAST(day_num AS INTEGER)),
                    '%Y-%m-%d') AS day,
           round(day_cents / 100.0, 2) AS day_revenue,
           round(last_value(day_cents IGNORE NULLS) OVER (
                   ORDER BY day_num
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) / 100.0, 2) AS filled_revenue,
           day_cents IS NULL AS is_gap
    FROM joined
    """,
)
def q121_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward:
    materialize the FULL day axis between the series' min and max
    day (generate_series twin), left-join the observed daily
    revenue, and fill gaps with the latest preceding observation
    (``last(..., ignorenulls)``). The resample/interpolate primitive
    dashboards and feature pipelines need — a naive groupBy silently
    drops empty days, and a downstream moving average (q120) over
    the gappy series is biased.

    Determinism: revenue in exact integer cents (q120's rule); LOCF
    is a pure function of the ordered axis. Scale shape: the fact
    table collapses to one row per day BEFORE the axis join; the
    axis explode and the LOCF window run on O(days) rows in one
    bounded partition (constant partition spec — never the fact
    table)."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("day_cents")
    )
    bounds = daily.agg(
        F.min("day_num").alias("__lo"), F.max("day_num").alias("__hi")
    )
    axis = bounds.select(
        F.explode(F.sequence("__lo", "__hi")).alias("day_num")
    )
    joined = axis.join(daily, "day_num", "left")
    w = (
        W.partitionBy(F.lit(0))
        .orderBy("day_num")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("day_num")),
            "yyyy-MM-dd",
        ).alias("day"),
        F.round(F.col("day_cents") / 100.0, 2).alias("day_revenue"),
        F.round(
            F.last("day_cents", ignorenulls=True).over(w) / 100.0, 2
        ).alias("filled_revenue"),
        F.col("day_cents").isNull().alias("is_gap"),
    )
