"""Sinks: Parquet-backed tables with the reference's append/replace
semantics (SURVEY.md section 2.1 ops 2-4).

The reference writes through SQLAlchemy ``to_sql(if_exists=...)``
into PostgreSQL heap tables; here the warehouse is columnar Parquet:

  * ``if_exists='append'``  -> ``mode('append')``
  * ``if_exists='replace'`` -> ``mode('overwrite')``
  * ``to_sql(dtype={...})`` (typed sink, check_and_create_db_v4.py:217-234)
    -> explicit casts before write (callers pass ``casts``).

At 100 TB the fact table must be partitioned; ``partition_by`` maps to
Parquet directory partitioning so queries with year/month predicates
get partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    casts: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to Parquet with optional typed casts and
    directory partitioning."""
    if casts:
        df = df.select(
            *[
                F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
                for c in df.columns
            ]
        )
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Save as a managed catalog table (metastore-backed)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def export_packed_corpus(
    docs: DataFrame,
    out_dir: str,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Trainer-export sink: write the corpus as packed training
    sequences — directory-partitioned by ``shard`` and sorted within
    each shard by (bin_id, ord_key, id) so a trainer (or a
    ``mapInPandas`` tokenizer) reads each shard as ONE contiguous,
    deterministically pre-shuffled token stream, cut every ``budget``
    tokens at the bin boundaries recorded in the rows.

    Layout contract at scale: RANGE-partitioned on the shard key
    (``repartitionByRange``), because hash repartitioning n_shards
    distinct values into n_shards partitions collides shards into
    shared tasks while other tasks sit empty. Range bounds are
    weight-balanced from a sample, so with NEAR-UNIFORM shard sizes
    (md5-mod shards are) each shard gets its own writer task; a
    heavily skewed shard distribution can still merge small shards
    into one task — output stays correct (partitionBy splits the
    directories and sortWithinPartitions leads with shard, so each
    shard is still one contiguous sorted run), only task parallelism
    degrades, and the fix there is more shards, not a different
    partitioner. Readers of a shard subset get directory partition
    pruning. Shard count = O(cluster cores) keeps tasks parallel.
    """
    from citybikedatawarehouse_spark.plans.curation import pack_assignments

    assigned = pack_assignments(docs, budget, n_shards, id_col, text_col)
    (
        assigned.repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", "bin_id", "ord_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink — the direct equivalent of the reference's
    SQLAlchemy ``to_sql`` into PostgreSQL (create_db_from_csv.py:14).

    Requires the JDBC driver jar on the Spark classpath
    (``spark.jars`` / ``--jars``). For PostgreSQL that jar must be
    supplied by the deployment; the path itself is proven end-to-end
    against embedded Apache Derby (bundled with Spark — see
    tests/test_jdbc_roundtrip.py: write -> read back -> digest
    equals the parquet twin, both overwrite and append modes, with
    int/string/double/date columns through Spark's DerbyDialect),
    and the PostgreSQL-specific dialect (URL routing, per-type DDL,
    quoting, truncate) is golden-tested against Spark's bundled
    PostgresDialect in tests/test_postgres_dialect.py — the only
    piece the sandbox cannot run is the socket to a live server
    (no driver jar, no network: documented environment gate).
    Use ``write_parquet`` for the engine's native warehouse format.

    Scale note: each Spark task opens its own connection and issues
    batched INSERTs — parallelism = input partitions. Against a real
    server, ``df.coalesce(n)`` to the connection budget first;
    ``properties['batchsize']`` (default 1000) controls rows per
    round-trip.
    """
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write ORC — the columnar interchange format for Hive-side
    consumers (built into Spark, no extra jars). Same partitioning
    contract as ``write_parquet``; Parquet remains the engine's
    native at-rest format."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
