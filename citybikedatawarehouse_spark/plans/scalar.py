"""Scalar-function and semi-structured coverage: math suite,
datetime arithmetic, conditionals/null handling, percentiles,
array aggregation, explode/posexplode, map ops over JSON, structs,
unpivot, cross join (SURVEY.md section 2.3 op 30 and the section 2.4
string/json/array/map gap row).

Engine-parity notes baked into the oracles: DuckDB ceil() returns
DOUBLE (Spark BIGINT -> cast), date_trunc returns DATE (-> cast
TIMESTAMP), '+ INTERVAL' returns TIMESTAMP while Spark add_months
returns DATE (-> cast both to TIMESTAMP), bare decimal literals are
DECIMAL (-> ::DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


@register(
    "q28_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q28_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont, both R-7); the approximate variant is
    q28b (rows-only — sketches don't cross engines)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("qty_p25"),
    )


@register(
    "q28b_approx_aggregates",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_parts_within_15pct,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
           TRUE AS approx_p50_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q28b_approx_aggregates(spark, sf_dir):
    """Sketch-based aggregates: HLL++ distinct count + t-digest-style
    approximate percentile. The sketches can't be reproduced in
    another engine, so the query is SELF-ORACLED: it computes the
    exact value AND the sketch in the same pass and emits the exact
    value plus a within-tolerance flag; the oracle recomputes the
    exact side and asserts the flags are literally TRUE. The error
    bounds (HLL++ default rsd=5% -> 15% = 3 sd; percentile_approx
    default accuracy 10000 -> well under 1%) are the documented
    guarantees; tests/test_approx.py asserts them too."""
    li = _t(spark, sf_dir, "lineitem")
    exact_parts = F.count_distinct("l_partkey")
    exact_p50 = F.expr("percentile(l_extendedprice, 0.5)")
    return li.groupBy("l_returnflag").agg(
        exact_parts.alias("exact_parts"),
        (
            F.abs(F.approx_count_distinct("l_partkey") - exact_parts)
            <= 0.15 * exact_parts
        ).alias("approx_parts_within_15pct"),
        F.round(exact_p50, 6).alias("exact_p50"),
        (
            F.abs(F.percentile_approx("l_extendedprice", 0.5) - exact_p50)
            <= 0.01 * exact_p50
        ).alias("approx_p50_within_1pct"),
    )


@register(
    "q45_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(exp(l_discount), 9)        AS e_disc,
           round(ln(l_extendedprice), 9)    AS ln_price,
           round(log10(l_extendedprice), 9) AS log10_price,
           round(sqrt(l_quantity), 9)       AS sqrt_qty,
           round(pow(l_quantity, 2), 2)     AS qty_sq,
           abs(l_discount - 0.05::DOUBLE)   AS abs_disc_delta,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CASE WHEN l_discount - 0.05::DOUBLE > 0 THEN 1.0::DOUBLE
                WHEN l_discount - 0.05::DOUBLE < 0 THEN -1.0::DOUBLE
                ELSE 0.0::DOUBLE END         AS disc_sign,
           l_orderkey % 7                   AS key_mod
    FROM lineitem
    """,
)
def q45_math_suite(spark, sf_dir):
    """The trig/exp/log scalar family (reference uses numpy for its
    haversine only — check_and_create_db_v4.py:302-311; Spark runs
    them codegen'd in the JVM)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.exp("l_discount"), 9).alias("e_disc"),
        F.round(F.ln("l_extendedprice"), 9).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 9).alias("log10_price"),
        F.round(F.sqrt("l_quantity"), 9).alias("sqrt_qty"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "q46_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)   AS plus_3m,
           CAST(last_day(o_orderdate) AS TIMESTAMP)            AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)         AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER)             AS doy,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95
    FROM orders
    """,
)
def q46_datetime_suite(spark, sf_dir):
    """Datetime arithmetic beyond part-extraction: truncation, month
    arithmetic, day-of-week/year, day differences. (DuckDB dayofweek
    is 0=Sunday; Spark dayofweek is 1=Sunday -> +1 on the oracle.)"""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.add_months("o_orderdate", 3).cast("timestamp_ntz").alias("plus_3m"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .alias("days_since_95"),
    )


@register(
    "q47_conditionals",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS segment_masked,
           least(c_acctbal, 5000.0::DOUBLE)    AS bal_capped,
           greatest(c_acctbal, 0.0::DOUBLE)    AS bal_floored,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           (c_acctbal IS NULL) AS bal_is_null
    FROM customer
    """,
)
def q47_conditionals(spark, sf_dir):
    """Conditional / null-handling family: coalesce, nullif,
    least/greatest, CASE, IS NULL."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("SUPPRESSED")
        ).alias("segment_masked"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_capped"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floored"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
    )


@register(
    "q48_array_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(array_agg(n_name)), '|') AS nations,
           array_to_string(list_sort(list_distinct(array_agg(n_name))), '|')
               AS distinct_nations,
           CAST(len(array_agg(n_name)) AS INTEGER) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def q48_array_agg(spark, sf_dir):
    """Array aggregation: collect_list/collect_set sorted for
    determinism (collection order is partition-dependent; the sorted
    multiset is the well-defined result).

    The aggregate is computed as a real array (collect_list /
    collect_set + array_sort); the surfaced column is the
    '|'-joined canonical string because the driver's comparator
    canonicalizes via pandas sort_values, which cannot hash
    array-typed cells (CORRECTNESS_r02: TypeError unhashable list).
    Same information, hashable shape."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias(
            "nations"
        ),
        F.array_join(F.array_sort(F.collect_set("n_name")), "|").alias(
            "distinct_nations"
        ),
        F.size(F.collect_list("n_name")).alias("n"),
    )


@register(
    "q49_posexplode",
    oracle=r"""
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, words[i] AS word
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
          FROM documents WHERE doc_id < 50),
         UNNEST(range(1, len(words) + 1)) t(i)
    """,
)
def q49_posexplode(spark, sf_dir):
    """Lateral array explosion with position — the generator/UNNEST
    operator family."""
    from citybikedatawarehouse_spark.functions.textfns import words

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.posexplode(words("text")).alias("pos", "word"))


@register(
    "q56_map_ops",
    oracle="""
    SELECT event_id, 'k' AS map_key,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS map_value
    FROM events
    """,
)
def q56_map_ops(spark, sf_dir):
    """JSON -> typed map -> exploded key/value pairs: from_json with
    a declared MapType, then explode (the schema-on-read path for
    semi-structured props columns)."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id", F.explode(m).alias("map_key", "map_value")
    )


@register(
    "q57_struct_ops",
    oracle="""
    SELECT o_orderkey, o_orderpriority AS pri, o_totalprice AS price
    FROM orders WHERE o_totalprice > 100000.0::DOUBLE
    """,
)
def q57_struct_ops(spark, sf_dir):
    """Struct build + field access round-trip (nested projection
    pruning keeps this free)."""
    o = _t(spark, sf_dir, "orders")
    s = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderpriority").alias("pri"), F.col("o_totalprice").alias("price")
        ).alias("meta"),
    )
    return s.filter(F.col("meta.price") > 100000.0).select(
        "o_orderkey", F.col("meta.pri").alias("pri"), F.col("meta.price").alias("price")
    )


@register(
    "q58_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS value
    FROM lineitem
    """,
)
def q58_unpivot(spark, sf_dir):
    """Unpivot via stack() — wide-to-long reshaping."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(2, 'quantity', l_quantity, 'price', l_extendedprice)"
        ).alias("metric", "value"),
    )


@register(
    "q59_cross_join",
    oracle="""
    SELECT r.r_name, p.o_orderpriority
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    """,
)
def q59_cross_join(spark, sf_dir):
    """Explicit small-small cross join (the only sanctioned cartesian:
    both sides are tiny dimension sets)."""
    r = _t(spark, sf_dir, "region").select("r_name")
    p = _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(p)


@register(
    "q271_variant_shred",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS ok,
             CASE WHEN json_extract(props, '$.missing') IS NULL
                  THEN 1 ELSE 0 END AS missing_null
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ok) AS BIGINT) AS n_valid,
           CAST(sum(missing_null) AS BIGINT) AS n_missing_null,
           CAST(sum(k) AS BIGINT) AS k_sum,
           CAST(min(k) AS INTEGER) AS k_min,
           CAST(max(k) AS INTEGER) AS k_max
    FROM v GROUP BY event_type
    """,
)
def q271_variant_shred(spark, sf_dir):
    """Semi-structured shredding through Spark 4's VARIANT type:
    ``try_parse_json`` ingests the props column as an open-schema
    binary variant (no declared schema — unlike q56's from_json
    MapType; the try_ form yields NULL on malformed input instead of
    throwing, so ``n_valid`` genuinely measures validity and matches
    the oracle's json_valid semantics — plain parse_json would crash
    the job on the first bad row while DuckDB counted it),
    ``variant_get`` extracts typed paths, ``try_variant_get`` probes
    an ABSENT path (returns null, never throws — the
    schema-evolution contract), and the aggregate shreds per event
    type. VARIANT is the lakehouse answer to schema drift in
    semi-structured columns: encode once, path-extract with
    predicate-level cost instead of re-parsing JSON text per access,
    and at 100 TB the binary encoding scans ~2-8x faster than
    repeated get_json_object string parsing of the same column.

    Scale shape: parse + both extractions are per-row expressions in
    whole-stage codegen feeding ONE map-side-combinable groupBy on
    the low-cardinality event type; nothing here shuffles more than
    |event_types| rows."""
    ev = _t(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.missing", "string")
    shred = ev.select(
        "event_type",
        k.alias("k"),
        F.when(v.isNotNull(), 1).otherwise(0).alias("ok"),
        F.when(missing.isNull(), 1).otherwise(0).alias("missing_null"),
    )
    return shred.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("n_valid"),
        F.sum("missing_null").cast("bigint").alias("n_missing_null"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.min("k").cast("int").alias("k_min"),
        F.max("k").cast("int").alias("k_max"),
    )
