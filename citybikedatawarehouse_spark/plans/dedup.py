"""Deduplication operators over documents (north-star extension):
exact hash dedup, n-gram Jaccard, MinHash+LSH, SimHash.
Populated incrementally; heavy lifting in operators/dedup_ops.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


@register(
    "q60_exact_dedup",
    oracle="""
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def q60_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup at scale: hash-groupBy on a content digest
    (never on the full text — the shuffle moves 32-byte keys, not
    documents), deterministic canonical survivor = min doc_id."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("canonical_doc_id"),
    )
