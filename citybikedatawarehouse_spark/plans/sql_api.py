"""Spark SQL API surface: the same Catalyst frontend through SQL text
(the reference's query path is SQL strings shipped to PostgreSQL —
SURVEY.md section 3 EP3; here the SQL goes through Spark's ANTLR
parser into the identical logical plans the DataFrame API builds).

Covers the subquery family the DataFrame API expresses differently:
scalar subqueries, correlated EXISTS, IN-subqueries, CTEs — plus the
deterministic smoke query (SURVEY section 2.1 op 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_tables


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    load_tables(spark, sf_dir)  # registers temp views for all tables
    return spark.sql(query)


_SCALAR_SUBQ = """
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2)
               AS delta_vs_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""


@register("q100_scalar_subquery", oracle=_SCALAR_SUBQ)
def q100_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery (computed once, broadcast as a
    literal into the filter)."""
    return _sql(spark, sf_dir, _SCALAR_SUBQ)


_CORRELATED_EXISTS = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0
    )
"""


@register("q101_correlated_exists", oracle=_CORRELATED_EXISTS)
def q101_correlated_exists(spark, sf_dir):
    """Correlated EXISTS — decorrelated by Catalyst into a left-semi
    join (same physical plan as the DataFrame form, q08)."""
    return _sql(spark, sf_dir, _CORRELATED_EXISTS)


_IN_SUBQ = """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_partkey IN (
      SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0
    )
"""


@register("q102_in_subquery", oracle=_IN_SUBQ)
def q102_in_subquery(spark, sf_dir):
    return _sql(spark, sf_dir, _IN_SUBQ)


_CTE = """
    WITH nation_rev AS (
      SELECT c_nationkey AS nationkey,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    ),
    ranked AS (
      SELECT nationkey, revenue,
             rank() OVER (ORDER BY revenue DESC, nationkey) AS rnk
      FROM nation_rev
    )
    SELECT n.n_name, r.revenue, CAST(r.rnk AS INTEGER) AS rnk
    FROM ranked r JOIN nation n ON n.n_nationkey = r.nationkey
    WHERE r.rnk <= 10
"""


@register("q103_cte_pipeline", oracle=_CTE)
def q103_cte_pipeline(spark, sf_dir):
    """Multi-stage CTE: join -> aggregate -> window rank -> join back
    to the dimension."""
    return _sql(spark, sf_dir, _CTE)


_ABOVE_GROUP_AVG = """
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
      FROM customer
    )
    WHERE c_acctbal > nation_avg
"""


@register("q104_above_group_avg", oracle=_ABOVE_GROUP_AVG)
def q104_above_group_avg(spark, sf_dir):
    """Correlated-aggregate comparison via a window (one pass; the
    correlated-subquery phrasing would rescan the group)."""
    return _sql(spark, sf_dir, _ABOVE_GROUP_AVG)


_SMOKE = """
    SELECT * FROM nation ORDER BY n_nationkey LIMIT 10
"""


@register("q105_smoke_limit", oracle=_SMOKE)
def q105_smoke_limit(spark, sf_dir):
    """The reference's smoke query (SELECT * ... LIMIT 10,
    check_and_create_db.py:127) with a deterministic order."""
    return _sql(spark, sf_dir, _SMOKE)


@register(
    "q106_salted_aggregate",
    oracle="""
    SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty,
           count(*) AS n, round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q106_salted_aggregate(spark, sf_dir):
    """Two-stage salted aggregation (operators/skew.py) — identical
    results to the plain groupBy, hot keys spread over 16 partitions
    in the first stage. The oracle IS the plain aggregate."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.operators.skew import salted_aggregate
    from citybikedatawarehouse_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        ["l_suppkey"],
        {
            "total_qty": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "max_price": ("l_extendedprice", "max"),
        },
        salt_col="l_orderkey",
        n_salts=16,
    )
    return out.select(
        "l_suppkey",
        F.round("total_qty", 2).alias("total_qty"),
        "n",
        F.round("max_price", 2).alias("max_price"),
    )


@register(
    "q107_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def q107_salted_join(spark, sf_dir):
    """Salted replicated join (operators/skew.py) — the explicit
    skew tool when AQE can't pre-split a hot key; result must equal
    the plain join (the oracle)."""
    from citybikedatawarehouse_spark.operators.skew import salted_join
    from citybikedatawarehouse_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_suppkey", "suppkey"
    )
    s = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "suppkey"
    )
    return salted_join(
        li, s, on="suppkey", salt_col="l_orderkey", n_salts=8
    ).select("l_orderkey", "l_linenumber", "s_name")


_LATERAL_TOPN = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 3
    ) t
"""


@register("q172_lateral_topn", oracle=_LATERAL_TOPN)
def q172_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery — the SQL-standard per-row top-N
    (top-3 customers by balance per nation) that PostgreSQL users
    write constantly and the reference's warehouse would serve with
    exactly this text. Catalyst decorrelates the LATERAL into the
    same rank-window plan the DataFrame form (q17) builds, so the
    per-group top-N never becomes N correlated executions — the
    decorrelation IS the scale story. Deterministic tie-break on
    c_custkey keeps both engines' LIMIT stable."""
    return _sql(spark, sf_dir, _LATERAL_TOPN)
