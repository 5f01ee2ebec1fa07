"""Text-analysis operators over the documents table (north-star
extension, SURVEY.md section 2.4): string functions, JSON extraction,
token counting, quality scoring, language-ID heuristic, document
fingerprinting. Populated incrementally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


@register(
    "q50_string_funcs",
    oracle="""
    SELECT doc_id,
           lower(substr(text, 1, 40)) AS head_lower,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           upper(lang) AS lang_upper,
           concat_ws('/', source, lang) AS source_lang,
           regexp_extract(text, 'jo[a-z]+') AS first_jo_word,
           replace(substr(text, 1, 40), ' ', '_') AS head_snake
    FROM documents
    """,
)
def q50_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar suite (reference has none — SURVEY 2.4 gap):
    lower/upper/substr/length/concat_ws/regexp_extract/replace."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 40)).alias("head_lower"),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.upper("lang").alias("lang_upper"),
        F.concat_ws("/", "source", "lang").alias("source_lang"),
        F.regexp_extract("text", "jo[a-z]+", 0).alias("first_jo_word"),
        F.replace(
            F.substring("text", 1, 40), F.lit(" "), F.lit("_")
        ).alias("head_snake"),
    )


@register(
    "q51_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q51_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over events.props."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )
