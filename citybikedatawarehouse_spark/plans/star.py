"""Star-schema ETL surface, exercised on the driver testdata.

The citibike-specific builders live in operators/dims.py /
operators/fact.py and are golden-tested in tests/test_citibike_etl.py
with a reference-shaped fixture (FIXTURES.md section A). The queries
here express the same *operators* — dimension build (project + dedup +
deterministic surrogate key), timestamp-grain date dimension, fact
assembly with derived keys, haversine, speed coercion — over the
testdata tables so the DuckDB oracle can check them end-to-end.

Key design point vs the reference (SURVEY.md section 7): surrogate
keys are deterministic sha2 over the natural key, so the fact side
derives them *without joining the dimension at all* — at 100 TB the
fact build is join-free and shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.datetime_parts import date_part
from citybikedatawarehouse_spark.functions.geo import haversine_km
from citybikedatawarehouse_spark.functions.keys import surrogate_key, surrogate_key_sql
from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


@register(
    "q40_dim_build",
    oracle=f"""
    SELECT {surrogate_key_sql('o_orderpriority')} AS id,
           o_orderpriority AS type
    FROM (SELECT DISTINCT o_orderpriority FROM orders)
    """,
)
def q40_dim_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension build: project -> dedup -> surrogate key. Mirrors the
    reference member/rideable dimension (check_and_create_db_v4.py:
    147-151) with a deterministic key instead of uuid4."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(F.col("o_orderpriority").alias("type"))
        .distinct()
        .select(surrogate_key("type").alias("id"), "type")
    )


@register(
    "q41_date_dim_build",
    oracle=f"""
    SELECT {surrogate_key_sql('d')} AS id,
           CAST(year(d) AS INTEGER)       AS year,
           CAST(quarter(d) AS INTEGER)    AS quarter,
           CAST(month(d) AS INTEGER)      AS month,
           CAST(weekofyear(d) AS INTEGER) AS week,
           CAST(day(d) AS INTEGER)        AS day,
           CAST(hour(d) AS INTEGER)       AS hour,
           CAST(minute(d) AS INTEGER)     AS minute,
           CAST(second(d) AS INTEGER)     AS second,
           d AS date
    FROM (SELECT DISTINCT o_orderdate AS d FROM orders)
    """,
)
def q41_date_dim_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-grain date dimension (reference date_dimension,
    check_and_create_db_v4.py:110-123,186-234): dedup on the full
    timestamp, all parts derived — ISO week like pandas isocalendar."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderdate").alias("d")).distinct()
    return d.select(
        surrogate_key("d").alias("id"),
        date_part("year", "d").alias("year"),
        date_part("quarter", "d").alias("quarter"),
        date_part("month", "d").alias("month"),
        date_part("week", "d").alias("week"),
        date_part("day", "d").alias("day"),
        date_part("hour", "d").alias("hour"),
        date_part("minute", "d").alias("minute"),
        date_part("second", "d").alias("second"),
        F.col("d").alias("date"),
    )


@register(
    "q42_fact_derived_keys",
    oracle=f"""
    SELECT o_orderkey,
           {surrogate_key_sql('o_orderpriority')} AS priority_dim_id,
           {surrogate_key_sql('o_orderdate')}     AS date_dim_id,
           o_totalprice
    FROM orders
    """,
)
def q42_fact_derived_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact assembly with *derived* dimension keys: because surrogate
    keys are deterministic functions of the natural key, the fact side
    computes them directly — zero joins, zero shuffles (the reference
    needs six left joins here, check_and_create_db_v4.py:240-270)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        surrogate_key("o_orderpriority").alias("priority_dim_id"),
        surrogate_key("o_orderdate").alias("date_dim_id"),
        "o_totalprice",
    )


_COORD_SQL = """
      SELECT c_custkey,
             40.70::DOUBLE + (c_custkey % 60)  * 0.001::DOUBLE AS lat1,
             -74.10::DOUBLE + (c_custkey % 80) * 0.001::DOUBLE AS lng1,
             40.70::DOUBLE + (c_nationkey % 60) * 0.001::DOUBLE AS lat2,
             -74.10::DOUBLE + (c_nationkey % 80) * 0.001::DOUBLE AS lng2
      FROM customer
"""


def _coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        (F.lit(40.70) + (F.col("c_custkey") % 60) * F.lit(0.001)).alias("lat1"),
        (F.lit(-74.10) + (F.col("c_custkey") % 80) * F.lit(0.001)).alias("lng1"),
        (F.lit(40.70) + (F.col("c_nationkey") % 60) * F.lit(0.001)).alias("lat2"),
        (F.lit(-74.10) + (F.col("c_nationkey") % 80) * F.lit(0.001)).alias("lng2"),
    )


@register(
    "q43_haversine",
    oracle=f"""
    SELECT c_custkey,
           round(2.0::DOUBLE * 6371.0::DOUBLE * asin(sqrt(
               pow(sin(radians(lat2 - lat1) / 2.0::DOUBLE), 2)
             + cos(radians(lat1)) * cos(radians(lat2))
               * pow(sin(radians(lng2 - lng1) / 2.0::DOUBLE), 2)
           )), 6) AS distance_km
    FROM ({_COORD_SQL})
    """,
)
def q43_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine as a pure column expression (reference: numpy,
    check_and_create_db_v4.py:300-313) over deterministic synthetic
    coordinates; rounded at 1e-6 km (mm) because libm sin/cos differ
    across engines in the last ulp."""
    pts = _coords(spark, sf_dir)
    return pts.select(
        "c_custkey",
        F.round(haversine_km("lat1", "lng1", "lat2", "lng2"), 6).alias("distance_km"),
    )


@register(
    "q44_speed_coercion",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (epoch(l_shipdate) - epoch(o_orderdate)) <= 0
                     OR l_quantity IS NULL
                THEN 0.0::DOUBLE
                ELSE round(l_quantity /
                           ((epoch(l_shipdate) - epoch(o_orderdate)) / 3600.0::DOUBLE), 9)
           END AS qty_per_hour
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def q44_speed_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate with the reference's null/inf -> 0 coercion semantics
    (check_and_create_db_v4.py:279-280): pandas produces inf on /0 and
    coerces to 0; Spark produces null on /0 and coerces to 0 — the
    observable output converges (SURVEY section 7 risk register)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    dur = F.col("l_shipdate").cast("timestamp").cast("double") - F.col(
        "o_orderdate"
    ).cast("timestamp").cast("double")
    rate = F.round(F.col("l_quantity") / (dur / F.lit(3600.0)), 9)
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.when((dur <= 0) | F.col("l_quantity").isNull(), F.lit(0.0))
        .otherwise(rate)
        .alias("qty_per_hour"),
    )


@register(
    "q171_geo_neighbor_pairs",
    oracle=f"""
    WITH p AS (SELECT c_custkey, lat1 AS lat, lng1 AS lng
               FROM ({_COORD_SQL})),
    -- oracle is the BRUTE-FORCE all-pairs sweep: a hash match proves
    -- the Spark side's grid blocking missed nothing (the q62 pattern)
    d AS (
      SELECT a.c_custkey AS custkey_1, b.c_custkey AS custkey_2,
             round(2.0::DOUBLE * 6371.0::DOUBLE * asin(sqrt(
                 pow(sin(radians(b.lat - a.lat) / 2.0::DOUBLE), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lng - a.lng) / 2.0::DOUBLE), 2)
             )), 6) AS distance_km
      FROM p a JOIN p b ON a.c_custkey < b.c_custkey
    )
    SELECT custkey_1, custkey_2, distance_km
    FROM d WHERE distance_km <= 0.15
    """,
)
def q171_geo_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial proximity self-join: all point pairs within 150 m, via
    GRID-CELL BLOCKING — each point lands in one 0.002°×0.002° cell;
    the left side explodes into its 3×3 cell neighborhood and joins
    the right side's single cell, and only block-colliding pairs pay
    the haversine. Pigeonhole-complete at this radius: 0.002° is
    ≥ 150 m in both axes at this latitude, so any qualifying pair is
    in the same or an adjacent cell — which the BRUTE-FORCE oracle
    verifies outright (the LSH candidates-then-verify discipline,
    q62's gate pattern, applied to space). The station-proximity
    query the reference's bike-share schema exists to serve.

    Scale shape: one shuffle on the cell key; cost is Σ|cell|²
    over 9 cells per point instead of N² (cells are ~200 m² patches,
    so occupancy is density-bounded); the trig runs only on
    candidates. Threshold compares the 1e-6-rounded distance on both
    engines so a last-ulp libm difference cannot flip a boundary
    pair."""
    pts = _coords(spark, sf_dir).select(
        "c_custkey", F.col("lat1").alias("lat"), F.col("lng1").alias("lng")
    )
    cell = 0.002
    cx = F.floor(F.col("lng") / cell).cast("long")
    cy = F.floor(F.col("lat") / cell).cast("long")
    b = pts.select(
        F.col("c_custkey").alias("custkey_2"),
        F.col("lat").alias("lat_2"),
        F.col("lng").alias("lng_2"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    offsets = F.expr(
        "explode(transform(sequence(0, 8),"
        " i -> struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy)))"
    )
    a = pts.select(
        F.col("c_custkey").alias("custkey_1"),
        F.col("lat").alias("lat_1"),
        F.col("lng").alias("lng_1"),
        cx.alias("__cx"),
        cy.alias("__cy"),
    ).select(
        "custkey_1", "lat_1", "lng_1", offsets.alias("o"), "__cx", "__cy"
    ).select(
        "custkey_1",
        "lat_1",
        "lng_1",
        (F.col("__cx") + F.col("o.dx")).alias("cx"),
        (F.col("__cy") + F.col("o.dy")).alias("cy"),
    )
    return (
        a.join(b, ["cx", "cy"])
        .filter(F.col("custkey_1") < F.col("custkey_2"))
        .withColumn(
            "distance_km",
            F.round(haversine_km("lat_1", "lng_1", "lat_2", "lng_2"), 6),
        )
        .filter(F.col("distance_km") <= 0.15)
        .select("custkey_1", "custkey_2", "distance_km")
    )
