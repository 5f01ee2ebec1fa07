"""Warehouse-lifecycle operators as driver-gated catalog queries:
SCD2 upsert-with-history (the fix for the reference's
``to_sql(if_exists='replace')`` history loss,
check_and_create_db_v4.py:295) and small-file compaction (the fix
for its ``if_exists='append'`` fragmentation).

Both are deterministic end-to-end so they can carry DuckDB oracles:
q108 re-expresses the merge as set algebra in SQL; q109 proves the
compaction round-trip is lossless (content digest equality) and
emits the file-reduction claim as a self-oracled boolean.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


@register(
    "q108_scd2_merge",
    oracle="""
    WITH cur AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '1995-01-01' AS valid_from,
             TIMESTAMP '9999-12-31 23:59:59' AS valid_to,
             TRUE AS is_current
      FROM customer
    ),
    upd AS (
      -- every third customer moves segment + balance; plus a batch of
      -- brand-new ids offset by 1,000,000
      SELECT c_custkey, 'MACHINERY' AS c_mktsegment,
             round(c_acctbal + 100.0, 2) AS c_acctbal,
             TIMESTAMP '1996-06-01' AS eff
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'FURNITURE', 0.0::DOUBLE,
             TIMESTAMP '1996-06-01'
      FROM customer WHERE c_custkey % 100 = 0
    ),
    changed AS (
      SELECT c.c_custkey, c.c_mktsegment AS old_seg, c.c_acctbal AS old_bal,
             u.c_mktsegment, u.c_acctbal, u.eff, c.valid_from
      FROM cur c JOIN upd u USING (c_custkey)
      WHERE c.c_mktsegment IS DISTINCT FROM u.c_mktsegment
         OR c.c_acctbal   IS DISTINCT FROM u.c_acctbal
    )
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(valid_from AS VARCHAR) AS valid_from,
           CAST(valid_to AS VARCHAR) AS valid_to, is_current
    FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
    UNION ALL  -- closed old versions
    SELECT c_custkey, old_seg, old_bal, CAST(valid_from AS VARCHAR),
           CAST(eff AS VARCHAR), FALSE FROM changed
    UNION ALL  -- opened new versions
    SELECT c_custkey, c_mktsegment, c_acctbal, CAST(eff AS VARCHAR),
           '9999-12-31 23:59:59', TRUE
    FROM changed
    UNION ALL  -- never-seen ids
    SELECT c_custkey, c_mktsegment, c_acctbal, CAST(eff AS VARCHAR),
           '9999-12-31 23:59:59', TRUE
    FROM upd WHERE c_custkey NOT IN (SELECT c_custkey FROM cur)
    """,
)
def q108_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge (operators/scd.py — anti-join + union emulation of
    MERGE INTO, one shuffle on the business key): bootstrap the
    customer dimension, apply one deterministic update batch
    (changed segment/balance for every third key + new ids), return
    the full versioned dimension. The oracle replays the same merge
    as set algebra."""
    from citybikedatawarehouse_spark.operators.scd import scd2_init, scd2_merge

    c = _t(spark, sf_dir, "customer")
    snapshot = c.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.lit("1995-01-01").cast("timestamp_ntz").alias("eff"),
    )
    dim = scd2_init(snapshot, key="c_custkey", effective_ts="eff")
    updates = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            F.lit("MACHINERY").alias("c_mktsegment"),
            F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
            F.lit("1996-06-01").cast("timestamp_ntz").alias("eff"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("FURNITURE").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
                F.lit("1996-06-01").cast("timestamp_ntz").alias("eff"),
            )
        )
    )
    merged = scd2_merge(
        dim, updates, key="c_custkey",
        attrs=["c_mktsegment", "c_acctbal"], effective_ts="eff",
    )
    # string-typed validity bounds: the 9999-12-31 open sentinel
    # overflows nanosecond timestamps in pandas-based comparators,
    # and ts->string renders identically in Spark and DuckDB
    return merged.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        "is_current",
    )


@register(
    "q109_compaction",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash,
           TRUE AS files_reduced
    FROM documents
    """,
)
def q109_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip (operators/maintenance.py):
    fragment the documents table into 64 files, compact to
    size-targeted files, and prove (a) content survives bit-exact
    (doc_id + md5(text) vs the source — the oracle) and (b) the file
    count actually dropped (self-oracled boolean; exact counts are
    parallelism-dependent, the reduction claim is not)."""
    from citybikedatawarehouse_spark.operators.maintenance import (
        compact_parquet,
        parquet_file_stats,
    )

    d = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="cbdw_compact_")
    # the returned DataFrame reads the compacted dir lazily (the
    # driver collects it later), so the dir must outlive this call —
    # clean up at interpreter exit, never materialize through the
    # driver here
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    work = base + "/documents"
    d.repartition(64).write.mode("overwrite").parquet(work)
    n_before, _ = parquet_file_stats(work)
    compacted = compact_parquet(spark, work, target_file_mb=128)
    n_after, _ = parquet_file_stats(work)
    return compacted.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.lit(n_after < n_before).alias("files_reduced"),
    )


def _zorder_oracle_sql(bits: int = 16) -> str:
    """DuckDB replay of the q77 Z-order key: same 1-row bounds agg,
    same exact-BIGINT bucket scaling ('div' == '//'), same 32-term
    shift/mask interleave (custkey owns even bit positions, epoch-day
    odd) — generated programmatically to match
    functions/layout.morton_interleave term by term."""
    top = (1 << bits) - 1
    terms = []
    for j in range(bits):
        terms.append(f"(((sx >> {j}) & 1) << {2 * j})")
        terms.append(f"(((sy >> {j}) & 1) << {2 * j + 1})")
    interleave = " | ".join(terms)
    return f"""
    WITH b AS (
      SELECT min(o_custkey) AS mnx, max(o_custkey) AS mxx,
             min(datediff('day', DATE '1970-01-01', o_orderdate)) AS mny,
             max(datediff('day', DATE '1970-01-01', o_orderdate)) AS mxy
      FROM orders
    ),
    scaled AS (
      SELECT o_orderkey,
             CASE WHEN mxx = mnx THEN 0
                  ELSE (CAST(o_custkey AS BIGINT) - mnx) * {top} // (mxx - mnx)
             END AS sx,
             CASE WHEN mxy = mny THEN 0
                  ELSE (datediff('day', DATE '1970-01-01', o_orderdate) - mny)
                       * {top} // (mxy - mny)
             END AS sy
      FROM orders CROSS JOIN b
    )
    SELECT o_orderkey, CAST({interleave} AS BIGINT) AS z_key
    FROM scaled
    """


@register("q77_zorder_key", oracle=_zorder_oracle_sql())
def q77_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout key over orders(o_custkey, o_orderdate): the
    write-side half of multi-dimensional file pruning. Sorting or
    range-partitioning the table by this key before writing keeps
    every parquet file's min/max box tight in BOTH dimensions, so
    scans filtering on customer OR date range skip most files — the
    Delta OPTIMIZE ZORDER BY / Iceberg sort-order trick, as a pure
    Catalyst integer expression (no UDF, no extra shuffle; the bounds
    pass is a 1-row aggregate broadcast back)."""
    from citybikedatawarehouse_spark.functions.layout import zorder_key

    o = _t(spark, sf_dir, "orders").withColumn(
        "__epoch_day", F.datediff("o_orderdate", F.lit("1970-01-01"))
    )
    return zorder_key(o, ["o_custkey", "__epoch_day"], bits=16).select(
        "o_orderkey", "z_key"
    )
