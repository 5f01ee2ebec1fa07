"""Text-analysis operators over the documents table (north-star
extension, SURVEY.md section 2.4): string functions, JSON extraction,
token counting, quality scoring, language-ID heuristic, document
fingerprinting. Populated incrementally."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.textfns import (
    BPE_ISH_TOKEN_PATTERN,
    LANG_MARKERS,
    fingerprint,
    language_id,
    marker_hits,
    token_count_bpe_ish,
    word_count,
    words,
)
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


def _marker_pat(markers: list[str]) -> str:
    return r"\b(" + "|".join(markers) + r")\b"


@register(
    "q52_token_count",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '{BPE_ISH_TOKEN_PATTERN}')) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace
    FROM documents
    """,
)
def q52_token_count(spark, sf_dir):
    """Token counting: whitespace words + BPE-ish sub-word tokens —
    the budgeting pass of an LLM-data pipeline."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        word_count("text").alias("n_words"),
        token_count_bpe_ish("text").alias("n_tokens"),
        F.length(F.regexp_replace("text", r"\s+", "")).cast("bigint").alias("n_nonspace"),
    )


_QUALITY_SQL = rf"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
             CAST(len(regexp_extract_all(text, '{_marker_pat(LANG_MARKERS["en"])}')) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_words, n_punct,
           round(coalesce(n_nonspace / nullif(n_words, 0), 0.0::DOUBLE), 6) AS avg_word_len,
           round(coalesce(n_stop * 1.0 / nullif(n_words, 0), 0.0::DOUBLE), 6) AS stop_ratio,
           round(coalesce(n_punct * 1.0 / nullif(n_words, 0), 0.0::DOUBLE), 6) AS punct_ratio
    FROM c
"""


@register("q53_quality_score", oracle=_QUALITY_SQL)
def q53_quality_score(spark, sf_dir):
    """Document quality signals: length, punctuation density,
    stopword ratio — the filter features of a training-data pipeline."""
    d = _t(spark, sf_dir, "documents")
    n_words = word_count("text")
    n_nonspace = F.length(F.regexp_replace("text", r"\s+", "")).cast("bigint")
    n_punct = F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)).cast(
        "bigint"
    )
    n_stop = marker_hits("text", LANG_MARKERS["en"])
    ratio = lambda num, den: F.round(  # noqa: E731
        F.coalesce(F.try_divide(num, den), F.lit(0.0)), 6
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_punct.alias("n_punct"),
        ratio(n_nonspace, n_words).alias("avg_word_len"),
        ratio(n_stop * F.lit(1.0), n_words).alias("stop_ratio"),
        ratio(n_punct * F.lit(1.0), n_words).alias("punct_ratio"),
    )


def _langid_sql() -> str:
    hit_cols = ",\n             ".join(
        f"CAST(len(regexp_extract_all(text, '{_marker_pat(m)}')) AS BIGINT) AS h_{lang}"
        for lang, m in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    cases = "\n           ".join(
        f"WHEN h_{lang} > 0 AND h_{lang} = {greatest} THEN '{lang}'" for lang in langs
    )
    return f"""
    WITH h AS (
      SELECT doc_id, lang,
             {hit_cols}
      FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE {cases} ELSE 'und' END AS predicted_lang
    FROM h
    """


@register("q54_language_id", oracle=_langid_sql())
def q54_language_id(spark, sf_dir):
    """Stopword-marker language ID (n-gram heuristic): argmax of
    per-language marker hits, fixed tie order, 'und' fallback.
    Returned next to the labeled lang for downstream agreement
    analysis (the synthetic corpus is word-soup, so disagreement is
    expected — the operator, not the model, is under test)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        language_id("text").alias("predicted_lang"),
    )


@register(
    "q55_fingerprint",
    oracle=r"""
    SELECT fp AS fingerprint, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
    FROM (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
                 regexp_split_to_array(trim(text), '\s+'))), ' ')) AS fp
      FROM documents
    )
    GROUP BY fp
    """,
)
def q55_fingerprint(spark, sf_dir):
    """Order-insensitive document fingerprint (sorted distinct word
    set -> md5): catches reshuffled near-duplicates that exact
    hashing misses; grouped to dedup clusters."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fingerprint")).groupBy(
        "fingerprint"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


@register(
    "q56b_text_normalize",
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                   '\s+', ' ', 'g'))) AS norm_hash,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                           '\s+', ' ', 'g'))) AS BIGINT) AS norm_len
    FROM documents
    """,
)
def q56b_text_normalize(spark, sf_dir):
    """Canonical text normalization (lowercase, strip non-alnum,
    collapse whitespace) — the cleaning stage before any dedup/
    tokenization pass; hashed so the oracle pins the exact bytes."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"[^a-z0-9 ]", " "), r"\s+", " "
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


@register(
    "q65_winnow_fingerprint",
    oracle=r"""
    WITH n AS (
      SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS s
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(s) - 8 + 2, 1)),
                            i -> md5(substr(s, i, 8))) AS hs
      FROM n
    ),
    f AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(hs) - 4 + 2, 1)),
                              j -> list_min(hs[j:j+3]))) AS fps
      FROM h
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM f
    """,
)
def q65_winnow_fingerprint(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (k=8-char windows, w=4
    winnow) — the position-robust shared-passage fingerprint set per
    document; equi-joining the output across docs locates copied
    spans. Pure codegen (no UDF); see
    functions/textfns.winnow_fingerprint_pairs."""
    from citybikedatawarehouse_spark.functions.textfns import (
        winnow_fingerprint_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return winnow_fingerprint_pairs(d, k=8, w=4)


_FILTER_GATES_SQL = rf"""
    WITH c AS (
      SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct
      FROM documents
    ),
    g AS (
      SELECT doc_id, lang, n_words,
             round(coalesce(n_punct * 1.0 / nullif(n_words, 0), 0.0::DOUBLE), 6) AS punct_ratio,
             round(coalesce(n_nonspace / nullif(n_words, 0), 0.0::DOUBLE), 6) AS avg_word_len
      FROM c
    )
    SELECT doc_id, lang, n_words, punct_ratio, avg_word_len,
           CASE
             WHEN n_words < 5            THEN 'too_short'
             WHEN n_words > 100000       THEN 'too_long'
             WHEN punct_ratio > 0.6      THEN 'punct_heavy'
             WHEN avg_word_len < 2.0     THEN 'degenerate_words'
             WHEN avg_word_len > 40.0    THEN 'degenerate_words'
             ELSE 'kept'
           END AS verdict
    FROM g
"""


@register("q66_quality_filter_pipeline", oracle=_FILTER_GATES_SQL)
def q66_quality_filter_pipeline(spark, sf_dir):
    """The composed KEEP/DROP decision of a training-data pipeline:
    ordered quality gates (length bounds, punctuation density,
    degenerate word length) with the FIRST failing gate as the
    verdict — the audit trail a data curator needs, not just a
    boolean. Single narrow projection over the scan: every gate is a
    Catalyst expression on features computed once (no UDF, no
    shuffle), so the filter runs at scan speed at any scale."""
    d = _t(spark, sf_dir, "documents")
    n_words = word_count("text")
    n_nonspace = F.length(F.regexp_replace("text", r"\s+", "")).cast("bigint")
    n_punct = F.size(
        F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)
    ).cast("bigint")
    ratio = lambda num, den: F.round(  # noqa: E731
        F.coalesce(F.try_divide(num, den), F.lit(0.0)), 6
    )
    feats = d.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        ratio(n_punct * F.lit(1.0), n_words).alias("punct_ratio"),
        ratio(n_nonspace, n_words).alias("avg_word_len"),
    )
    verdict = (
        F.when(F.col("n_words") < 5, "too_short")
        .when(F.col("n_words") > 100000, "too_long")
        .when(F.col("punct_ratio") > 0.6, "punct_heavy")
        .when(F.col("avg_word_len") < 2.0, "degenerate_words")
        .when(F.col("avg_word_len") > 40.0, "degenerate_words")
        .otherwise("kept")
    )
    return feats.withColumn("verdict", verdict)


@register(
    "q67_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ('0x' || substr(md5('sample:' || doc_id), 1, 8))::BIGINT % 1000 AS tick
      FROM documents
    )
    WHERE tick < CASE lang
                   WHEN 'en' THEN 900
                   WHEN 'zh' THEN 500
                   ELSE 250
                 END
    """,
)
def q67_stratified_sample(spark, sf_dir):
    """Deterministic stratified downsampling by language: keep a doc
    iff md5('sample:'||doc_id) mod 1000 falls under its stratum's
    rate (en 90%, zh 50%, rest 25%). Hash-based sampling is the
    reproducible alternative to RNG sampling for training-data
    curation: no seed state to ship, membership is a pure function of
    the id (stable across reruns, engines, and partitionings). Plan:
    a 2-column pruned scan + one whole-stage-codegen filter, zero
    shuffles. Exactly what sampleBy can't promise across engines —
    hence the cross-engine oracle."""
    d = _t(spark, sf_dir, "documents")
    tick = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    rate = (
        F.when(F.col("lang") == "en", 900)
        .when(F.col("lang") == "zh", 500)
        .otherwise(250)
    )
    return d.select("doc_id", "lang", tick.alias("__tick"), rate.alias("__rate")) \
        .filter(F.col("__tick") < F.col("__rate")).select("doc_id", "lang")


@register(
    "q68_tfidf_topterms",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, words[i] AS word
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents),
           UNNEST(range(1, len(words) + 1)) t(i)
      WHERE words[i] <> ''
    ),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
    dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, word, tf, df, tfidf, CAST(rank AS INTEGER) AS rank FROM (
      SELECT doc_id, word,
             CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) DESC,
                        word) AS rank
      FROM tf JOIN dfreq USING (word) CROSS JOIN n
    ) WHERE rank <= 3
    """,
)
def q68_tfidf_topterms(spark, sf_dir):
    """Top-3 terms per document by tf-idf — the corpus-statistics
    text op (keyword extraction / quality signals for curation).

    Scale shape: term frequencies in ONE shuffle of the exploded
    words keyed (doc, word); document frequency aggregates FROM the
    tf relation (word-keyed, combiner-friendly — never re-explodes
    text); the corpus size joins in as a broadcast of one row, and
    the final top-k is a doc-partitioned window. Ranking happens on
    the ROUNDED score with a word tie-break, so the order is
    identical in the DuckDB replay (ln() is transcendental — raw
    doubles drift last-ulp across engines)."""
    d = _t(spark, sf_dir, "documents")
    from citybikedatawarehouse_spark.functions.textfns import words as _words
    from pyspark.sql import Window

    w = d.select(
        "doc_id", F.explode(_words("text")).alias("word")
    ).filter(F.col("word") != "")
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.round(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    return (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "word", "tf", "df", tfidf.alias("tfidf"))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
    )


_BM25_TERMS = ("spark", "table", "hash")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_ctes(
    terms: tuple[str, ...] = _BM25_TERMS,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> str:
    """Shared oracle fragment (q111 + q118): the ``per``/``stats``
    CTEs plus a ``lex`` CTE holding every doc's rounded BM25 score —
    per-doc term frequencies via list_filter, corpus stats in one
    tiny aggregate, Robertson/Sparck-Jones idf with the +1 floor
    (never negative), score summed in fixed term order. ONE builder
    so the two scorers can never drift apart."""
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(arr, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"""CASE WHEN tf{i} > 0 THEN
              ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1)
              * tf{i} * {k1 + 1} / (tf{i} + {k1} * (1 - {b} + {b} * dl / avgdl))
            ELSE 0 END"""
        for i in range(len(terms))
    )
    return f"""
    per AS (
      SELECT doc_id,
             CAST(len(arr) AS DOUBLE) AS dl,
             {tf_cols}
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
            FROM documents)
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, {df_cols}
      FROM per
    ),
    lex AS (
      SELECT doc_id, round({score}, 6) AS score
      FROM per CROSS JOIN stats
    )"""


def bm25_per(
    docs: DataFrame,
    terms: tuple[str, ...] = _BM25_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The per-document BM25 staging relation: (id, dl, tf0..tfn).
    Everything downstream (corpus stats, scores, and q253's
    relevance grades) derives from this one projection, so a caller
    with several consumers can persist it and pay the corpus scan
    once. The token array is STAGED to a column first (HOF arguments
    are excluded from Catalyst subexpression elimination — an
    unbound words() expression here re-tokenizes each row once per
    tf filter plus once for dl, the winnow_fingerprint trap)."""
    staged = docs.select(id_col, words(text_col).alias("__w"))

    def _tf(term):
        # one-arg lambda on purpose: a second (defaulted) parameter
        # makes Spark bind the HOF's (element, index) form
        return F.size(F.filter(F.col("__w"), lambda x: x == F.lit(term)))

    return staged.select(
        id_col,
        F.size("__w").cast("double").alias("dl"),
        *[_tf(t).cast("double").alias(f"tf{i}") for i, t in enumerate(terms)],
    )


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = _BM25_TERMS,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 scoring core (shared by q111 and q118's lexical branch):
    every doc with a positive score for ``terms``, as
    (id, rounded score). Ranking/cutting is the caller's business.

    Scale shape: one corpus scan builds the staged per-doc relation
    (``bm25_per``); per-term tf is an array-filter count in the scan
    projection (no explode, no shuffle); corpus stats (N, avgdl,
    per-term df) collapse to ONE tiny aggregate row broadcast back.
    Determinism: dl/tf/df are integer-valued doubles (exact under
    any summation order), one ln per term, score rounded to 6,
    fixed term order."""
    per = bm25_per(docs, terms, id_col=id_col, text_col=text_col)
    return bm25_scores_from_per(per, terms, k1=k1, b=b, id_col=id_col)


def bm25_scores_from_per(
    per: DataFrame,
    terms: tuple[str, ...] = _BM25_TERMS,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 scores from an already-built ``bm25_per`` relation —
    the seam q253 uses to share one persisted staging scan between
    its grade and score legs."""
    stats = per.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int"))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    contrib = [
        F.when(
            F.col(f"tf{i}") > 0,
            F.log(
                (F.col("n_docs") - F.col(f"df{i}") + 0.5)
                / (F.col(f"df{i}") + 0.5)
                + 1
            )
            * F.col(f"tf{i}")
            * (k1 + 1)
            / (
                F.col(f"tf{i}")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        ).otherwise(F.lit(0.0))
        for i in range(len(terms))
    ]
    score = F.round(sum(contrib[1:], contrib[0]), 6)
    return (
        per.crossJoin(F.broadcast(stats))
        .select(id_col, score.alias("score"))
        .filter(F.col("score") > 0)
    )


@register(
    "q111_bm25_topk",
    oracle=f"""
    WITH {_bm25_ctes()}
    SELECT doc_id, score FROM lex
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q111_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval (Robertson et al., TREC-3): top-20
    documents for the fixed query {spark, table, hash} with k1=1.2,
    b=0.75 and the +1-floored idf (never negative). The lexical
    retrieval op of a curation stack — quality-scoring corpora
    against seed queries, mining domain-relevant documents, or the
    BM25 half of hybrid (lexical+vector) retrieval (q118). Scoring
    core + scale notes in ``bm25_scores``; the top-k here is a
    TakeOrdered, not a global sort."""
    return (
        bm25_scores(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


# shared oracle fragment (q112 + q124): the per-chunk relation of
# the 64-token/stride-32 chunking — ONE definition so the manifest
# and the chunk-dedup pipeline built on it can never drift
_CHUNK_CTES = """
    s AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
             len(regexp_split_to_array(trim(text), '\\s+')) AS dl
      FROM documents
    ),
    c AS (
      SELECT doc_id, w, dl,
             unnest(generate_series(0, (dl - 1) // 32)) AS chunk_id
      FROM s
    ),
    cm AS (
      SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
             CAST(least(64, dl - chunk_id * 32) AS BIGINT) AS n_tokens,
             md5(array_to_string(
               list_slice(w, chunk_id * 32 + 1,
                          least(chunk_id * 32 + 64, dl)), ' ')) AS chunk_fp
      FROM c
    )"""


def chunk_manifest(
    docs: DataFrame,
    window: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking core (shared by q112 and the property
    tests): one row per chunk with ``chunk_id`` (dense from 0),
    ``n_tokens`` (= min(window, dl - chunk_id*stride)) and an md5
    ``chunk_fp`` over the chunk's space-joined tokens. Chunk starts
    are every ``stride`` tokens while a token remains, so every token
    is covered and consecutive chunks overlap by window - stride.

    Pure narrow fan-out — tokenize once in the scan projection,
    explode a per-doc start sequence (bounded by dl/stride rows per
    doc), slice + hash per chunk; zero shuffles, zero UDFs. The
    token array is BOUND TO A COLUMN before the explode/slice stage
    (lambdas do not subexpression-eliminate — the
    winnow_fingerprint trap)."""
    staged = docs.select(id_col, words(text_col).alias("__w")).select(
        id_col, "__w", F.size("__w").alias("__dl")
    )
    chunked = staged.select(
        id_col,
        "__w",
        "__dl",
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.col("__dl") - 1) / stride).cast("int")
            )
        ).alias("chunk_id"),
    )
    return chunked.select(
        id_col,
        "chunk_id",
        F.least(F.lit(window), F.col("__dl") - F.col("chunk_id") * stride)
        .cast("bigint")
        .alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.col("__w"), F.col("chunk_id") * stride + 1, window),
            )
        ).alias("chunk_fp"),
    )


@register(
    "q112_doc_chunks",
    oracle=f"""
    WITH {_CHUNK_CTES}
    SELECT doc_id, chunk_id, n_tokens, chunk_fp FROM cm
    """,
)
def q112_doc_chunks(spark, sf_dir):
    """Sliding-window document chunking (window=64 tokens, stride=32,
    50% overlap) — the chunking step in front of an embedding model
    for retrieval indexes: one row per chunk with its token count and
    an md5 content fingerprint (the join key for chunk-level dedup
    and for linking chunk embeddings back to text). Core + scale
    notes in ``chunk_manifest``; coverage law proven over arbitrary
    corpora in tests/test_properties.py."""
    return chunk_manifest(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


# shared oracle fragment (q114 + q119): the distinct per-doc word
# trigram relation — ONE definition so the novelty signal and the
# hot-list it feeds can never desynchronize on shingle semantics
_SHINGLE_CTES = r"""
    s AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS shingle
      FROM s, UNNEST(range(1, len(w) - 1)) t(i)
      WHERE len(w) >= 3
    )"""


def doc_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct per-doc word-trigram relation (shared by q114 and
    q119, mirroring _SHINGLE_CTES): (id, shingle) with the shingle a
    space-joined 3-token slice, distinct within a doc. Docs under 3
    tokens emit nothing. The token array is staged to a column
    before the transform/slice (the winnow_fingerprint trap)."""
    staged = docs.select(id_col, words(text_col).alias("__w")).select(
        id_col, "__w", F.size("__w").alias("__n")
    )
    return staged.filter(F.col("__n") >= 3).select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.col("__n") - 2),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, 3)),
                )
            )
        ).alias("shingle"),
    )


@register(
    "q114_ngram_novelty",
    oracle=f"""
    WITH {_SHINGLE_CTES},
    first AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
    SELECT doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS novelty
    FROM sh JOIN first USING (shingle)
    GROUP BY doc_id
    """,
)
def q114_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word trigrams whose global FIRST occurrence (min doc_id) is this
    doc. Low novelty = the doc is mostly recombined already-seen
    text — the soft-dedup signal curation pipelines threshold where
    exact/MinHash dedup (q60-q64) only catches whole-doc overlap,
    and the corpus-level twin of q85's within-doc repetition gate.

    Scale shape: ONE explode of distinct per-doc shingles, explicitly
    repartitioned by shingle so the first-seen aggregate and the
    join-back both ride the SAME exchange (ReusedExchange — the q62
    verify pattern; without it the shingle relation is recomputed
    from a second corpus scan AND reshuffled, and the naive
    broadcast of first-seen is impossible at scale since distinct
    shingles grow with the corpus). Then one doc-keyed aggregate.
    min-doc-id first-seen is deterministic under any partitioning;
    the ratio rounds to 6 on both engines. Docs under 3 tokens have
    no trigrams and emit no row. Plan pinned by
    tests/test_plans.py::test_ngram_novelty_exchange_reuse."""
    sh = doc_shingles(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    ).repartition("shingle")
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("bigint")
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
    )


@register(
    "q119_hot_ngrams",
    oracle=f"""
    WITH {_SHINGLE_CTES}
    SELECT shingle, count(*) AS df
    FROM sh GROUP BY shingle
    ORDER BY df DESC, shingle LIMIT 20
    """,
)
def q119_hot_ngrams(spark, sf_dir):
    """Corpus hot-trigram list: the 20 word trigrams present in the
    most documents. The boilerplate/contamination detector of a
    curation stack — shingles that appear across a large fraction of
    docs are templates, headers, or license text (candidates for
    stripping), and the same list seeds decontamination screens
    (q69/q89) and the hot-shingle caps the MinHash path already
    applies (q61/q62).

    Scale shape: one corpus scan -> distinct per-doc shingle explode
    (shared ``doc_shingles`` relation) -> map-side-combinable
    (shingle, count) aggregate -> TakeOrdered top-20. No global
    sort; the aggregate's combiner means only distinct shingles
    cross the wire."""
    sh = doc_shingles(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "shingle")
        .limit(20)
    )


# shared oracle fragment (q122 + q125): the per-doc entropy relation
_ENTROPY_CTES = r"""
    w AS (
      SELECT doc_id, words[i] AS word
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents),
           UNNEST(range(1, len(words) + 1)) t(i)
      WHERE words[i] <> ''
    ),
    wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
    n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY 1),
    ent AS (
      SELECT doc_id, n AS n_words,
             count(*) AS n_distinct,
             round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy
      FROM wc JOIN n USING (doc_id)
      GROUP BY doc_id, n
    )"""


def word_entropy_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc unigram entropy core (shared by q122 and q125,
    mirroring _ENTROPY_CTES): (id, n_words, n_distinct, entropy)
    with entropy = -sum p ln p in nats, rounded to 6. One explode,
    one (doc, word)-keyed count (map-side combinable), one doc-keyed
    aggregate — the q68 tf shape without the corpus-wide df join."""
    w = docs.select(id_col, F.explode(words(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    wc = w.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("c"))
    n = wc.groupBy(id_col).agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    return (
        wc.join(n, id_col)
        .groupBy(id_col, "n")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
        .select(id_col, F.col("n").alias("n_words"), "n_distinct", "entropy")
    )


@register(
    "q122_word_entropy",
    oracle=f"""
    WITH {_ENTROPY_CTES}
    SELECT doc_id, n_words, n_distinct, entropy FROM ent
    """,
)
def q122_word_entropy(spark, sf_dir):
    """Per-document unigram (word) entropy in nats: -sum p ln p over
    the doc's word distribution. The information-density quality
    signal Gopher-class filters threshold from both ends — near-zero
    entropy = a repeated-token degenerate doc (the q85 failure mode
    seen distribution-wide), implausibly high entropy-per-length =
    random noise. Complements q53's ratio features and q87's
    corpus-LM logprob (this one needs no corpus vocabulary, so it
    works on the first pass over unseen data).

    Core + scale notes in ``word_entropy_scores``. Cross-engine: the
    entropy sum's term order differs between engines, but per-doc
    terms are few and O(1)-magnitude, so rounding to 6 absorbs
    last-ulp drift (the q73 precedent)."""
    return word_entropy_scores(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


@register(
    "q124_chunk_dedup_pipeline",
    oracle=f"""
    WITH {_CHUNK_CTES},
    r AS (
      SELECT doc_id, chunk_id,
             row_number() OVER (PARTITION BY chunk_fp
                                ORDER BY doc_id, chunk_id) AS rn
      FROM cm
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_frac
    FROM r GROUP BY doc_id
    """,
)
def q124_chunk_dedup_pipeline(spark, sf_dir):
    """Chunk-level dedup audit (chunking composed with exact dedup —
    the retrieval-side e2e twin of q92's curation pipeline): chunk
    every doc (q112's shared core), then mark each chunk a duplicate
    iff an identical-fingerprint chunk exists at a smaller
    (doc_id, chunk_id). Per-doc output (n_chunks, n_dup_chunks,
    dup_frac) is exactly the skip-list an embedding stage consumes —
    duplicate chunks are never re-embedded, which on boilerplate-
    heavy corpora is the single biggest embedding-cost lever.

    Plan shape: chunking's narrow fan-out -> one chunk_fp-keyed
    exchange on which the canonical-rank window rides -> one
    doc-keyed aggregate. Only 32-byte fingerprints shuffle, never
    chunk text (q60's rule); two shuffles total for the composed
    pipeline, no materialization barrier."""
    cm = chunk_manifest(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    w = Window.partitionBy("chunk_fp").orderBy("doc_id", "chunk_id")
    r = cm.select(
        "doc_id", "chunk_id", F.row_number().over(w).alias("__rn")
    )
    dup = (F.col("__rn") > 1).cast("bigint")
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(dup).alias("n_dup_chunks"),
        F.round(F.sum(dup).cast("double") / F.count(F.lit(1)), 6).alias(
            "dup_frac"
        ),
    )


@register(
    "q125_curriculum_buckets",
    oracle=f"""
    WITH {_ENTROPY_CTES},
    th AS (
      SELECT round(quantile_cont(CAST(entropy AS DOUBLE), 0.25), 6) AS t1,
             round(quantile_cont(CAST(entropy AS DOUBLE), 0.5), 6) AS t2,
             round(quantile_cont(CAST(entropy AS DOUBLE), 0.75), 6) AS t3
      FROM ent
    )
    SELECT CASE WHEN entropy <= t1 THEN 1
                WHEN entropy <= t2 THEN 2
                WHEN entropy <= t3 THEN 3
                ELSE 4 END AS phase,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS phase_tokens,
           round(min(entropy), 6) AS min_entropy,
           round(max(entropy), 6) AS max_entropy
    FROM ent CROSS JOIN th
    GROUP BY 1
    """,
)
def q125_curriculum_buckets(spark, sf_dir):
    """Curriculum phase assignment: docs bucketed into 4 phases by
    entropy quartile — the curriculum-learning manifest (train on
    low-entropy/simple text first, anneal toward the complex tail),
    and equally the distribution audit behind entropy-based quality
    cutoffs (q122's gate thresholds are usually set AS quantiles).
    Emits per-phase (n_docs, token mass, entropy range).

    Scale shape: the entropy relation computes once; exact
    interpolated quartiles collapse to ONE 3-value row broadcast
    back (Spark `percentile` and DuckDB `quantile_cont` share the
    linear-interpolation definition; thresholds round to 6 before
    the comparison so a last-ulp lerp difference cannot flip a
    boundary doc); one final phase-keyed aggregate. Exact percentile
    needs a sort of the SCORES only (8-byte doubles, not docs) — at
    extreme scale swap in approx_percentile and accept the
    documented error band."""
    ent = word_entropy_scores(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    th = ent.agg(
        F.transform(
            F.percentile(F.col("entropy").cast("double"), F.lit([0.25, 0.5, 0.75])),
            lambda x: F.round(x, 6),
        ).alias("__th")
    )
    phase = (
        F.when(F.col("entropy") <= F.col("__th")[0], 1)
        .when(F.col("entropy") <= F.col("__th")[1], 2)
        .when(F.col("entropy") <= F.col("__th")[2], 3)
        .otherwise(4)
    )
    return (
        ent.crossJoin(F.broadcast(th))
        .groupBy(phase.alias("phase"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("phase_tokens"),
            F.round(F.min("entropy"), 6).alias("min_entropy"),
            F.round(F.max("entropy"), 6).alias("max_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# q143 — distributed BPE merge training (fixed rounds, oracle-replayed)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_apply_merge(col, left: str, right: str):
    """Greedy left-to-right application of ONE merge (left,right) →
    left||right over a symbol array, as a JVM-side HOF fold: scan
    symbols, merging whenever the accumulator's last element is
    `left` and the incoming symbol is `right` (after a merge the new
    token becomes the last element, so 'aaaa' under (a,a) yields
    [aa, aa] — standard BPE greedy semantics)."""
    return F.aggregate(
        col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _bpe_pairs(syms_col):
    """Adjacent symbol pairs of one array (empty when < 2 symbols —
    guarded because Spark's sequence(1, 0) counts DOWN). Built from
    the passed Column, so any symbol column binds correctly (the
    earlier F.expr body hard-coded the '__syms' name: a caller
    passing a differently-named column would silently bind whatever
    '__syms' resolved to, or fail analysis)."""
    return F.when(
        F.size(syms_col) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms_col) - 1),
            lambda i: F.struct(
                F.element_at(syms_col, i.cast("int")).alias("l"),
                F.element_at(syms_col, (i + 1).cast("int")).alias("r"),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<l:string,r:string>>)"))


def _bpe_rounds_sql(n_rounds: int = _BPE_ROUNDS) -> str:
    """The shared WITH-body replaying the merge trainer in DuckDB:
    word types (wt), space-delimited char sequences (s0), then one
    (pair-count p{k}, argmax m{k}, leftmost-first iterated
    replacement a{k} -> s{k}) block per round — equivalent to the
    Spark fold; a single `replace()` call is NOT, because adjacent
    occurrences share their delimiter space and non-overlapping
    replace skips the second one. q143 appends the merges select,
    q159 appends the per-doc encode join."""
    parts = [r"""
    WITH RECURSIVE wt AS (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''
      ) GROUP BY w
    ),
    s0 AS (
      SELECT w, freq,
             ' ' || array_to_string(
               list_transform(range(1, length(w) + 1),
                              i -> substr(w, i, 1)), ' ') || ' ' AS seq
      FROM wt
    )"""]
    for k in range(1, n_rounds + 1):
        prev = f"s{k - 1}"
        parts.append(f""",
    p{k} AS (
      SELECT ls[i] AS l, ls[i + 1] AS r, sum(freq) AS cnt
      FROM (SELECT freq, string_split(trim(seq), ' ') AS ls FROM {prev}),
           UNNEST(range(1, len(ls))) t(i)
      GROUP BY 1, 2
    ),
    m{k} AS (
      SELECT l, r, cnt FROM p{k}
      ORDER BY cnt DESC, l, r LIMIT 1
    ),
    a{k} AS (
      SELECT w, freq, seq FROM {prev}
      UNION ALL
      SELECT w, freq,
             substr(seq, 1, position((SELECT ' ' || l || ' ' || r || ' ' FROM m{k}) IN seq) - 1)
             || ' ' || (SELECT l || r FROM m{k}) || ' '
             || substr(seq, position((SELECT ' ' || l || ' ' || r || ' ' FROM m{k}) IN seq)
                            + length((SELECT ' ' || l || ' ' || r || ' ' FROM m{k})))
      FROM a{k}
      WHERE position((SELECT ' ' || l || ' ' || r || ' ' FROM m{k}) IN seq) > 0
    ),
    s{k} AS (
      SELECT w, freq, seq FROM a{k}
      WHERE position((SELECT ' ' || l || ' ' || r || ' ' FROM m{k}) IN seq) = 0
    )""")
    return "".join(parts)


def _bpe_oracle(n_rounds: int = _BPE_ROUNDS) -> str:
    finals = "\n      UNION ALL\n".join(
        f"      SELECT {k} AS merge_rank, l AS left_sym, r AS right_sym,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM m{k}"
        for k in range(1, n_rounds + 1)
    )
    return _bpe_rounds_sql(n_rounds) + f"""
    SELECT * FROM (
{finals}
    )
    """


def _bpe_encode_oracle(n_rounds: int = _BPE_ROUNDS) -> str:
    """q159 replay: the trained s{n} symbol table joined back onto
    the per-doc word relation — token counts per doc under the
    learned merges."""
    return _bpe_rounds_sql(n_rounds) + f"""
    SELECT dw.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(e.n_tok) AS BIGINT) AS n_tokens,
           round(sum(e.n_tok) * 1.0 / count(*), 6) AS tokens_per_word
    FROM (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents WHERE trim(text) <> ''
    ) dw
    JOIN (
      SELECT w, len(string_split(trim(seq), ' ')) AS n_tok FROM s{n_rounds}
    ) e USING (w)
    GROUP BY dw.doc_id
    """


@register("q143_bpe_merges", oracle=_bpe_oracle())
def q143_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training, first 3 merge rounds: the
    corpus collapses to WORD TYPES with frequencies (the classic BPE
    preprocessing — pair statistics are per type × freq, so the
    iteration cost is O(vocabulary), not O(corpus)), then each round
    counts adjacent symbol pairs, picks the most frequent
    (deterministic tie-break: count desc, left, right), and applies
    the merge greedily left-to-right as a JVM-side HOF fold.
    Returns one row per learned merge (rank, pair, count) — the
    merges table a tokenizer ships.

    Scale shape: ONE corpus-scale shuffle (the word-type groupBy) no
    matter how many rounds; each round then shuffles only the pair
    relation (bounded by vocabulary × word length) and collects ONE
    row to the driver (the k-row pattern of kmeans/power-iteration).
    The oracle replays every round — counts, tie-breaks, and the
    greedy application (leftmost-first recursive replacement, which
    equals the fold) — so the hash gate proves the whole training
    loop, not just the final table."""
    d = _t(spark, sf_dir, "documents")
    wt = (
        d.filter(F.trim("text") != "")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges, _ = _bpe_train(wt)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count long",
    )


def _bpe_train(wt: DataFrame, n_rounds: int = _BPE_ROUNDS):
    """Run the merge-training loop over a (w, freq) word-type
    relation. Returns (merges, final_syms): the learned merge list
    [(rank, l, r, count)] and the post-merge symbol table
    (w, freq, __syms) — q143 ships the former, q159 encodes the
    corpus with the latter. One corpus-scale shuffle total (the
    caller's word-type groupBy); each round shuffles only the
    vocabulary-bounded pair relation and collects ONE row."""
    syms = wt.select(
        "w",
        "freq",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("__syms"),
    ).localCheckpoint(eager=True)
    # deserialized ON PURPOSE: this relation is VOCAB-bounded (distinct
    # words + freq), not corpus-bounded, and every merge round rescans
    # it — storing serialized measured 2x slower (4.05 vs 2.04 s at
    # sf0.1) for no memory-wall protection a bounded relation needs

    merges = []
    for rank in range(1, n_rounds + 1):
        pair_rows = (
            syms.select("freq", F.explode(_bpe_pairs(F.col("__syms"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        top = pair_rows[0]
        merges.append((rank, top["l"], top["r"], int(top["cnt"])))
        syms = syms.select(
            "w",
            "freq",
            _bpe_apply_merge(F.col("__syms"), top["l"], top["r"]).alias(
                "__syms"
            ),
        ).localCheckpoint(eager=True)
    return merges, syms


@register("q159_bpe_encode", oracle=_bpe_encode_oracle())
def q159_bpe_encode(spark, sf_dir):
    """Tokenizer INFERENCE under the q143-trained merges: per-doc
    token counts after applying all learned merges — the budgeting
    number an LLM-data pipeline actually bills by (q52's BPE-ish
    regex approximates it; this is the real learned-merge count).
    Returns (doc_id, n_words, n_tokens, tokens_per_word).

    Scale shape: training is vocabulary-bound (see _bpe_train); the
    encode side never re-runs the fold per document — token counts
    are computed once per WORD TYPE (size of the post-merge symbol
    array) and joined back onto the per-doc word relation, where the
    type table is vocabulary-sized and broadcastable. One
    corpus-scale shuffle for the type build, one for the per-doc
    aggregate; the join side is broadcast.

    Oracle: the shared round-replay CTE chain (_bpe_rounds_sql)
    proves the same merges, then the same type-level token counts
    joined on the per-doc word relation."""
    d = _t(spark, sf_dir, "documents")
    dw = d.filter(F.trim("text") != "").select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    wt = dw.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    _, syms = _bpe_train(wt)
    n_tok = syms.select("w", F.size("__syms").alias("n_tok"))
    return (
        dw.join(F.broadcast(n_tok), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("n_tok") * 1.0 / F.count(F.lit(1)), 6
            ).alias("tokens_per_word"),
        )
    )


@register(
    "q158_bigram_logprob",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents WHERE trim(text) <> ''
    ),
    uni AS (
      SELECT u AS w1, count(*) AS c1 FROM (
        SELECT unnest(ws) AS u FROM w
      ) GROUP BY u
    ),
    vocab AS (SELECT count(*) AS v FROM uni),
    bi AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM w, UNNEST(range(1, len(ws))) t(i)
    ),
    bic AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2)
    SELECT b.doc_id,
           count(*) AS n_bigrams,
           round(sum(ln((bic.c2 + 0.5)
                        / (uni.c1 + 0.5 * (SELECT v FROM vocab))))
                 / count(*), 6) AS avg_logprob
    FROM bi b
    JOIN bic ON bic.w1 = b.w1 AND bic.w2 = b.w2
    JOIN uni ON uni.w1 = b.w1
    GROUP BY b.doc_id
    """,
)
def q158_bigram_logprob(spark, sf_dir):
    """Per-document average bigram log-probability under the
    corpus's own add-0.5-smoothed bigram LM — the second-order
    fluency gate above q87's unigram scorer: a document of common
    words in IMPROBABLE order (shuffled text, keyword stuffing)
    scores high on unigrams but low here. ln P(w2|w1) =
    ln((c(w1,w2)+0.5)/(c(w1)+0.5·V)).

    Determinism: counts are integers, V is one scalar, and the only
    FP is the per-bigram ln + a rounded mean (the q87 rule). Scale
    shape: ONE corpus tokenization staged per row feeds both the
    count fit and the scoring explode; the bigram/unigram count
    relations are Zipf-bounded and joined to the exploded bigrams
    by key (broadcast at realistic vocabulary sizes)."""
    d = _t(spark, sf_dir, "documents")
    w = d.filter(F.trim("text") != "").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("ws")
    )
    uni = (
        w.select(F.explode("ws").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    v = uni.count()
    bi = w.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS w1,"
                    "             element_at(ws, i + 1) AS w2))"
                ),
            ).otherwise(
                F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)")
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    bic = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = bi.join(bic, ["w1", "w2"]).join(uni, "w1")
    logp = F.log(
        (F.col("c2") + 0.5) / (F.col("c1") + 0.5 * F.lit(float(v)))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum(logp) / F.count(F.lit(1)), 6).alias("avg_logprob"),
    )


@register(
    "q166_lexical_diversity",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, source, words[i] AS word, i
      FROM (SELECT doc_id, source,
                   regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents WHERE trim(text) <> ''),
           UNNEST(range(1, len(words) + 1)) t(i)
    ),
    tri AS (
      SELECT source, word || ' ' || lead(word) OVER w2
             || ' ' || lead(word, 2) OVER w2 AS gram
      FROM w
      WINDOW w2 AS (PARTITION BY doc_id ORDER BY i)
    ),
    tstat AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_trigrams,
             CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct_trigrams,
             CAST(max(cnt) AS BIGINT) AS top_gram_n
      FROM (SELECT source, gram, count(*) OVER (PARTITION BY source, gram)
                   AS cnt
            FROM tri WHERE gram IS NOT NULL)
      GROUP BY source
    ),
    wstat AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT word) AS BIGINT) AS n_types
      FROM w GROUP BY source
    )
    SELECT source,
           n_tokens, n_types,
           round(n_types * 1.0 / n_tokens, 6) AS type_token_ratio,
           round(n_distinct_trigrams * 1.0 / n_trigrams, 6)
             AS trigram_diversity,
           round(top_gram_n * 1.0 / n_trigrams, 6) AS top_gram_share
    FROM wstat JOIN tstat USING (source)
    """,
)
def q166_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical-diversity audit: type-token ratio, distinct-
    trigram ratio, and the hottest trigram's share — the corpus-level
    repetition fingerprint that catches template farms and boilerplate
    feeds BEFORE per-document gates (a source can pass every per-doc
    filter (q85) while being 500 near-identical templates; only the
    source-level distinct ratios see that).

    Scale shape: one corpus explode; trigrams via per-doc lead windows
    riding a single doc-keyed exchange; all three ratios come from
    source-keyed aggregates (map-side combined for counts; the
    distinct counts shuffle (source, gram) pairs — Zipf-bounded far
    below corpus size)."""
    d = _t(spark, sf_dir, "documents")
    w = (
        d.filter(F.trim("text") != "")
        .select(
            "doc_id",
            "source",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("i", "word"),
        )
    )
    w2 = Window.partitionBy("doc_id").orderBy("i")
    tri = w.select(
        "source",
        F.concat_ws(
            " ", "word", F.lead("word").over(w2), F.lead("word", 2).over(w2)
        ).alias("gram"),
        F.lead("word", 2).over(w2).alias("__ok"),
    ).filter(F.col("__ok").isNotNull())
    gcnt = tri.groupBy("source", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    tstat = gcnt.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_trigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_trigrams"),
        F.max("cnt").cast("bigint").alias("top_gram_n"),
    )
    wstat = w.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count_distinct("word").cast("bigint").alias("n_types"),
    )
    return wstat.join(tstat, "source").select(
        "source",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types") * 1.0 / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        F.round(
            F.col("n_distinct_trigrams") * 1.0 / F.col("n_trigrams"), 6
        ).alias("trigram_diversity"),
        F.round(F.col("top_gram_n") * 1.0 / F.col("n_trigrams"), 6).alias(
            "top_gram_share"
        ),
    )


@register(
    "q188_source_jsd",
    oracle=r"""
    WITH wc AS (
      SELECT source, w, count(*) AS c
      FROM (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
            FROM documents)
      GROUP BY source, w
    ),
    tot AS (SELECT source, sum(c) AS n FROM wc GROUP BY source),
    pairs AS (
      SELECT a.source AS s1, b.source AS s2
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    contrib AS (
      SELECT p.s1, p.s2, wc.w, wc.c * 1.0 / t.n AS pw, 0.0 AS qw
      FROM wc JOIN tot t USING (source) JOIN pairs p ON wc.source = p.s1
      UNION ALL
      SELECT p.s1, p.s2, wc.w, 0.0, wc.c * 1.0 / t.n
      FROM wc JOIN tot t USING (source) JOIN pairs p ON wc.source = p.s2
    ),
    pq AS (
      SELECT s1, s2, w, sum(pw) AS p, sum(qw) AS q
      FROM contrib GROUP BY s1, s2, w
    )
    SELECT s1 AS source_a, s2 AS source_b,
           round(sum(
             CASE WHEN p > 0 THEN 0.5 * p * log2(2.0 * p / (p + q)) ELSE 0 END
             + CASE WHEN q > 0 THEN 0.5 * q * log2(2.0 * q / (p + q)) ELSE 0 END
           ), 6) AS jsd_bits
    FROM pq GROUP BY s1, s2
    """,
)
def q188_source_jsd(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence (bits) between the unigram
    distributions of every source pair — the bounded, symmetric
    distribution distance curation pipelines use to quantify how
    different two corpora actually are before mixing them (q97/q162)
    or to detect a source drifting release-over-release (the
    distributional sibling of q151's binned PSI). JSD ∈ [0, 1] bit;
    0 = identical unigram mix.

    No outer join: each pair's (word, p, q) support union is built
    by UNION ALL of the two sources' contribution rows and one
    re-aggregate — absent words land as exact zeros on the other
    side, the pattern that keeps the plan two joins + two combinable
    aggregates at any vocabulary size. The pair table is O(sources²)
    and broadcast.

    Scale shape: one corpus tokenize → (source, word) count, each
    word row replicated once per pair it participates in
    (sources are few; fan-out = n_sources−1), word-keyed shuffle,
    per-pair 1-row sum. Zero-guards keep 0·log terms exact zeros in
    both engines; the log2 term sum rounds once at 1e-6."""
    from citybikedatawarehouse_spark.functions.textfns import words

    d = _t(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(words("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = wc.groupBy("source").agg(F.sum("c").alias("n"))
    t1 = tot.select(F.col("source").alias("s1"))
    t2 = tot.select(F.col("source").alias("s2"))
    pairs = t1.crossJoin(t2).where(F.col("s1") < F.col("s2"))
    wcn = wc.join(tot, "source").select(
        "source", "w", (F.col("c") * F.lit(1.0) / F.col("n")).alias("f")
    )
    left = wcn.join(
        F.broadcast(pairs), wcn.source == pairs.s1
    ).select("s1", "s2", "w", F.col("f").alias("pw"), F.lit(0.0).alias("qw"))
    right = wcn.join(
        F.broadcast(pairs), wcn.source == pairs.s2
    ).select("s1", "s2", "w", F.lit(0.0).alias("pw"), F.col("f").alias("qw"))
    pq = (
        left.unionAll(right)
        .groupBy("s1", "s2", "w")
        .agg(F.sum("pw").alias("p"), F.sum("qw").alias("q"))
    )
    p, q = F.col("p"), F.col("q")
    term = F.when(
        p > 0, F.lit(0.5) * p * F.log2(F.lit(2.0) * p / (p + q))
    ).otherwise(F.lit(0.0)) + F.when(
        q > 0, F.lit(0.5) * q * F.log2(F.lit(2.0) * q / (p + q))
    ).otherwise(F.lit(0.0))
    return pq.groupBy(
        F.col("s1").alias("source_a"), F.col("s2").alias("source_b")
    ).agg(F.round(F.sum(term), 6).alias("jsd_bits"))


_PHRASE = ("spark", "table")


@register(
    "q195_phrase_search",
    oracle=r"""
    WITH pos AS (
      SELECT doc_id, ws[i] AS w, CAST(i AS BIGINT) AS p
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
            FROM documents),
           UNNEST(range(1, len(ws) + 1)) t(i)
      WHERE ws[i] IN ('spark', 'table')
    )
    SELECT a.doc_id,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(a.p) AS BIGINT) AS first_pos
    FROM pos a JOIN pos b
      ON b.doc_id = a.doc_id AND b.p = a.p + 1
    WHERE a.w = 'spark' AND b.w = 'table'
    GROUP BY a.doc_id
    """,
)
def q195_phrase_search(spark, sf_dir):
    """Exact PHRASE search ("spark table") via a positional index —
    the retrieval capability bag-of-words BM25 (q111) structurally
    lacks: posting lists carry word POSITIONS, and a phrase match is
    an adjacency self-join (position + 1) within the document. Emits
    match count and first occurrence position per document — the
    snippet anchor a highlighter needs.

    Scale shape: ONE tokenize pass; only the phrase's own terms
    survive the scan-side filter before the explode, so the posting
    relation is term-frequency-sized, not corpus-sized; the
    adjacency join is keyed on (doc, position) — co-partitioned by
    doc. Longer phrases chain the same join per extra term (or
    k-word window structs); stop-word-heavy phrases ride the same
    hot-term cap as the Jaccard index."""
    from citybikedatawarehouse_spark.functions.textfns import words

    d = _t(spark, sf_dir, "documents")
    first, second = _PHRASE
    pos = (
        d.select("doc_id", F.posexplode(words("text")).alias("p", "w"))
        .where(F.col("w").isin(*_PHRASE))
        # 1-based to match UNNEST WITH ORDINALITY
        .select("doc_id", "w", (F.col("p") + 1).cast("bigint").alias("p"))
    )
    a = pos.where(F.col("w") == first).select(
        "doc_id", F.col("p").alias("pa")
    )
    b = pos.where(F.col("w") == second).select(
        "doc_id", F.col("p").alias("pb")
    )
    return (
        a.join(b, (a.doc_id == b.doc_id) & (b.pb == a.pa + 1))
        .select(a.doc_id, "pa")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("pa").cast("bigint").alias("first_pos"),
        )
    )


_COLLOC_WINDOW = 4  # partner within the next 4 tokens
_COLLOC_MIN_COUNT = 20
_COLLOC_TOPK = 20


@register(
    "q196_collocations",
    oracle=rf"""
    WITH pos AS (
      SELECT doc_id, ws[i] AS w, CAST(i AS BIGINT) AS p, len(ws) AS n
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
            FROM documents),
           UNNEST(range(1, len(ws) + 1)) t(i)
    ),
    uni AS (SELECT w, count(*) AS c FROM pos GROUP BY w),
    tot AS (SELECT count(*) AS n_tokens FROM pos),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2, count(*) AS cp
      FROM pos a JOIN pos b
        ON b.doc_id = a.doc_id
       AND b.p BETWEEN a.p + 1 AND a.p + {_COLLOC_WINDOW}
      GROUP BY a.w, b.w
      HAVING count(*) >= {_COLLOC_MIN_COUNT}
    ),
    scored AS (
      SELECT p.w1, p.w2, CAST(p.cp AS BIGINT) AS pair_count,
             round(log2(p.cp * 1.0 * t.n_tokens / ({_COLLOC_WINDOW} * 1.0)
                        / (u1.c * 1.0 * u2.c)), 6) AS pmi
      FROM pairs p
      JOIN uni u1 ON u1.w = p.w1
      JOIN uni u2 ON u2.w = p.w2
      CROSS JOIN tot t
    )
    SELECT w1, w2, pair_count, pmi FROM (
      SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn
      FROM scored
    ) WHERE rn <= {_COLLOC_TOPK}
    """,
)
def q196_collocations(spark, sf_dir):
    """Collocation extraction: top-20 ordered word pairs by pointwise
    mutual information within a forward {span}-token window — the
    corpus-statistics pass that surfaces multiword expressions
    ("hash join", "stream window") which unigram and adjacent-bigram
    views (q87/q158) both miss. PMI ≈ log2(P(a,b) / (P(a)·P(b)))
    with the window-pair space normalized by window size; a minimum
    pair count keeps rare-pair PMI noise out (the classic
    Church & Hanks 1990 setup).

    Scale shape: ONE tokenize pass; the window fan-out is a per-row
    HOF over each doc's token array (pairs = tokens × window, no
    positional self-join, no shuffle until the (w1, w2) count);
    unigram counts and the 1-row token total join back keyed and
    broadcast. Top-k is a TakeOrdered on the rounded score."""
    from citybikedatawarehouse_spark.functions.textfns import words

    d = _t(spark, sf_dir, "documents")
    staged = d.select(words("text").alias("ws"))
    pair_structs = F.flatten(
        F.transform(
            "ws",
            lambda x, i: F.transform(
                F.slice(
                    "ws",
                    i + F.lit(2),
                    F.least(
                        F.lit(_COLLOC_WINDOW),
                        F.greatest(F.size("ws") - i - 1, F.lit(0)),
                    ),
                ),
                lambda y: F.struct(x.alias("w1"), y.alias("w2")),
            ),
        )
    )
    pairs = (
        staged.select(F.explode(pair_structs).alias("pp"))
        .groupBy(F.col("pp.w1").alias("w1"), F.col("pp.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cp"))
        .where(F.col("cp") >= _COLLOC_MIN_COUNT)
    )
    toks = staged.select(F.explode("ws").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_tokens"))
    scored = (
        pairs.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("cp").cast("bigint").alias("pair_count"),
            F.round(
                F.log2(
                    F.col("cp")
                    * F.lit(1.0)
                    * F.col("n_tokens")
                    / F.lit(float(_COLLOC_WINDOW))
                    / (F.col("c1") * F.lit(1.0) * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(_COLLOC_TOPK)


# ---------------------------------------------------------------------------
# q226 — snippet extraction for BM25 hits (retrieval UX)
# ---------------------------------------------------------------------------

_SNIP_TOPK = 10
_SNIP_RADIUS = 30
_SNIP_LEN = 60


def _snippet_oracle() -> str:
    cand = "\n      UNION ALL ".join(
        f"SELECT doc_id, score, rank, text, '{t}' AS term, "
        f"strpos(text, '{t}') AS pos FROM topd"
        for t in _BM25_TERMS
    )
    return f"""
    WITH {_bm25_ctes()},
    topd AS (
      SELECT doc_id, score, text, rank FROM (
        SELECT l.doc_id, l.score, d.text,
               row_number() OVER (ORDER BY l.score DESC, l.doc_id)
                 AS rank
        FROM lex l JOIN documents d USING (doc_id)
        WHERE l.score > 0
      ) WHERE rank <= {_SNIP_TOPK}
    ),
    cand AS (
      {cand}
    ),
    pick AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY pos, term) AS rn
        FROM cand WHERE pos > 0
      ) WHERE rn = 1
    )
    SELECT doc_id, score, CAST(rank AS INTEGER) AS rank, term,
           CAST(pos AS INTEGER) AS pos,
           substr(text, greatest(1, pos - {_SNIP_RADIUS}), {_SNIP_LEN})
             AS snippet
    FROM pick
    """


@register("q226_bm25_snippets", oracle=_snippet_oracle())
def q226_bm25_snippets(spark, sf_dir):
    """Snippet extraction over the q111 BM25 top-10: for each hit,
    a 60-char window centered on the FIRST matched query term
    (earliest position; position ties break by term order) plus the
    term and its offset — the keyword-in-context presentation layer
    a retrieval stack serves next to scores, completing the lexical
    story (score → rank → show WHY it matched). Shares q111's
    scoring core and oracle fragment, so ranking can never drift
    from the registered retriever.

    Scale shape: scoring is bm25_scores' one staged-tokenization
    scan; the top-10 cut happens BEFORE text-position work, so
    locate/substr run on 10 rows regardless of corpus size; the
    term unpivot is 3 rows per hit."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    top = (
        bm25_scores(d)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_SNIP_TOPK)
        .join(d, "doc_id")
        .select(
            "doc_id",
            "score",
            "text",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .alias("rank"),
        )
    )
    cand = top.select(
        "doc_id",
        "score",
        "rank",
        "text",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"),
                        F.locate(t, F.col("text")).alias("pos"),
                    )
                    for t in _BM25_TERMS
                ]
            )
        ).alias("c"),
    ).select(
        "doc_id", "score", "rank", "text",
        F.col("c.term").alias("term"), F.col("c.pos").alias("pos"),
    )
    pick = (
        cand.where(F.col("pos") > 0)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos", "term")
            ),
        )
        .where(F.col("rn") == 1)
    )
    return pick.select(
        "doc_id",
        "score",
        F.col("rank").cast("int").alias("rank"),
        "term",
        F.col("pos").cast("int").alias("pos"),
        F.substring(
            "text",
            F.greatest(F.lit(1), F.col("pos") - _SNIP_RADIUS),
            _SNIP_LEN,
        ).alias("snippet"),
    )


# ---------------------------------------------------------------------------
# q239 — TextRank keyword scores over the word-adjacency graph
# ---------------------------------------------------------------------------

_TR_ITER = 5
_TR_DAMPING = 0.85


def _textrank_oracle() -> str:
    """q133's round-unrolled PageRank replay, on the word-adjacency
    edge base instead of co-purchase pairs (identical recurrence, so
    a rank bug in either engine cannot hide behind the edge
    builder)."""
    head = """
    WITH tok AS (
      SELECT doc_id, ls, t.i AS pos, ls[t.i] AS w
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS ls
            FROM documents) d,
           UNNEST(range(1, len(ls) + 1)) t(i)
    ),
    adj AS (
      SELECT a.w AS w1, b.w AS w2
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND a.w <> b.w
    ),
    edges AS (
      SELECT DISTINCT w1 AS src, w2 AS dst FROM adj
      UNION SELECT DISTINCT w2, w1 FROM adj
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    steps = []
    d = _TR_DAMPING
    for k in range(1, _TR_ITER + 1):
        steps.append(f""",
    r{k} AS (
      SELECT n.node,
             (1 - {d}) / (SELECT n FROM nn)
               + {d} * coalesce(inf.inflow, 0) AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(r.pr / d.deg) AS inflow
        FROM edges e JOIN deg d ON e.src = d.src
                     JOIN r{k - 1} r ON r.node = e.src
        GROUP BY e.dst
      ) inf USING (node)
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node AS word, round(pr, 10) AS pr FROM r{_TR_ITER}
    """
    )


@register("q239_textrank_keywords", oracle=_textrank_oracle())
def q239_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau, EMNLP'04):
    PageRank over the undirected word-adjacency graph (edges between
    consecutive tokens), the unsupervised keyword extractor that
    needs no training data — the text-suite twin of q133, REUSING
    the same `operators/graph.pagerank` fit so both graph workloads
    exercise one code path.

    Scale shape: the adjacency build is one corpus scan with a
    length-linear HOF pair fan-out (the token array is materialized
    in its own projection first — HOF lambdas do not
    subexpression-eliminate); the DISTINCT collapses it to at most
    |vocab|^2 edges BEFORE the iterative fit, so PageRank runs on a
    vocabulary-bounded graph no matter the corpus size (the same
    vocab-bounded story as BPE training, q143). Iteration cost and
    layout are q133's: one src exchange reused, per-round
    contribution aggregate only."""
    from citybikedatawarehouse_spark.operators.graph import pagerank

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("ws")
    )
    pair_structs = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "i -> struct(element_at(ws, i) AS w1, "
        "element_at(ws, i + 1) AS w2))"
    )
    adj = (
        toks.where(F.size("ws") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .where(F.col("w1") != F.col("w2"))
    )
    edges = (
        adj.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .union(adj.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
        .distinct()
    )
    pr = pagerank(edges, damping=_TR_DAMPING, n_iter=_TR_ITER)
    return pr.select(
        F.col("node").alias("word"), F.round("rank", 10).alias("pr")
    )


# ---------------------------------------------------------------------------
# q253 — retrieval quality: nDCG@10 of the BM25 ranking
# ---------------------------------------------------------------------------

# 1/log2(rank+1) for ranks 1..10, shared verbatim with the oracle so
# both engines use bit-identical discount constants
_NDCG_W = [
    1.0, 0.6309297535714575, 0.5, 0.43067655807339306,
    0.38685280723454163, 0.3562071871080222, 0.3333333333333333,
    0.31546487678572877, 0.3010299956639812, 0.2890648263178879,
]


def _ndcg_oracle() -> str:
    w_vals = ", ".join(f"({r + 1}, {w!r})" for r, w in enumerate(_NDCG_W))
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH w(rnk, disc) AS (VALUES {w_vals}),
    graded AS (
      SELECT t.doc_id, CAST(least(sum(CASE WHEN t.w IN ({terms})
                                           THEN 1 ELSE 0 END), 7)
                            AS INTEGER) AS rel
      FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
            FROM documents) t
      GROUP BY t.doc_id
    ),
    ranked AS (
      SELECT b.doc_id, b.rnk, g.rel
      FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM ({_bm25_oracle_body()})
      ) b JOIN graded g ON g.doc_id = b.doc_id
      WHERE b.rnk <= 10
    ),
    ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
      FROM graded
    ),
    dcg AS (
      SELECT round(sum((power(2.0, r.rel) - 1) * w.disc), 6) AS dcg,
             CAST(sum(CASE WHEN r.rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_relevant_in_top
      FROM ranked r JOIN w ON w.rnk = r.rnk
    ),
    idcg AS (
      SELECT round(sum((power(2.0, i.rel) - 1) * w.disc), 6) AS idcg
      FROM ideal i JOIN w ON w.rnk = i.rnk
      WHERE i.rnk <= 10
    )
    SELECT d.dcg, i.idcg,
           round(d.dcg / i.idcg, 6) AS ndcg_at_10,
           d.n_relevant_in_top
    FROM dcg d CROSS JOIN idcg i
    """


def _bm25_oracle_body() -> str:
    """The q111 oracle's scored relation (doc_id, score) — extracted
    from the registered oracle text between its WITH prologue and
    the final top-k cut, kept as a structured call (NOT string
    surgery on the rendered SQL — the q152 ADVICE failure mode)."""
    from citybikedatawarehouse_spark.plans.catalog import ORACLES

    sql = ORACLES["q111_bm25_topk"]
    # the registered oracle ends with an ORDER BY ... LIMIT 20 cut on
    # a scored relation; reuse everything above the cut
    cut = sql.rindex("ORDER BY")
    return f"SELECT doc_id, score FROM ({sql[:cut]} ) "


@register("q253_ndcg_at_10", oracle=_ndcg_oracle())
def q253_ndcg_at_10(spark, sf_dir):
    """nDCG@10 of the q111 BM25 ranking against an INDEPENDENT
    graded-relevance signal (how many of the query's terms the
    document actually contains, 0-3) — the ranking-quality metric
    that complements the recommender family's hit@k/MRR (q237):
    nDCG rewards putting HIGHLY relevant docs early, not just any
    hit. Discounts 1/log2(rank+1) are shared literal constants with
    the oracle (bit-identical doubles); IDCG is the ideal ordering
    over the whole corpus' grades, so ndcg = 1 means the ranking
    found the best possible top-10.

    Scale shape: ONE corpus scan builds the shared ``bm25_per``
    staging relation (doc, dl, per-term tf), persisted serialized —
    the grade leg (rel = capped Σtf) and the BM25 score leg both
    read it, where the round-6 shape tokenized the corpus twice
    (the 2.2×-at-10× outlier the round-6 VERDICT flagged). Corpus
    stats are a 1-row broadcast; both top-10s are TakeOrdered; joins
    after the cuts run on 10-row relations."""
    from pyspark import StorageLevel

    d = _t(spark, sf_dir, "documents")
    per = bm25_per(d.select("doc_id", "text")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    tf = sum(F.col(f"tf{i}") for i in range(len(_BM25_TERMS)))
    graded = per.select(
        "doc_id", F.least(tf, F.lit(7.0)).cast("int").alias("rel")
    )
    top = (
        bm25_scores_from_per(per)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), "doc_id")
            ),
        )
        .where(F.col("rnk") <= 10)
        .join(graded, "doc_id")
    )
    ideal = graded.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("rel").desc(), "doc_id")),
    ).where(F.col("rnk") <= 10)
    w_df = F.broadcast(
        d.sparkSession.createDataFrame(
            [(r + 1, w) for r, w in enumerate(_NDCG_W)], "rnk int, disc double"
        )
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) * F.col("disc")
    dcg = top.join(w_df, "rnk").agg(
        F.round(F.sum(gain), 6).alias("dcg"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_relevant_in_top"),
    )
    idcg = ideal.join(w_df, "rnk").agg(F.round(F.sum(gain), 6).alias("idcg"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        "dcg",
        "idcg",
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
        "n_relevant_in_top",
    )


@register(
    "q274_udtf_chunks",
    oracle="""
    WITH s AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
             len(regexp_split_to_array(trim(text), '\\s+')) AS dl
      FROM documents
    ),
    c AS (
      SELECT doc_id, w, dl,
             unnest(generate_series(0, (dl - 1) // 16)) AS chunk_id
      FROM s
    )
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(least(32, dl - chunk_id * 16) AS BIGINT) AS n_tokens,
           md5(array_to_string(
             list_slice(w, chunk_id * 16 + 1,
                        least(chunk_id * 16 + 32, dl)), ' ')) AS chunk_fp
    FROM c
    """,
)
def q274_udtf_chunks(spark, sf_dir):
    """Document chunking through a PYTHON TABLE FUNCTION (Spark 4
    ``@udtf``, functions/udtfs.py): the docs view lateral-joins
    ``chunk_doc(text, 32, 16)`` in SQL, proving the row-to-rows TVF
    extensibility surface end to end against the same chunk-manifest
    oracle semantics q112 uses natively (different window/stride, so
    the two queries cannot shadow each other's results).

    This is deliberately NOT the hot path — the native chunker
    (plans/text.chunk_manifest: explode over a sequence, zero Python)
    is; see functions/udtfs.py for the rule. What the oracle gate
    buys here: the UDTF's Python tokenization provably matches the
    SQL/native convention token for token, hash for hash — the
    property you need before trusting a bespoke Python parser in a
    pipeline.

    Scale shape: one scan, per-row lateral expansion bounded by
    dl/stride rows per doc, no shuffle at all (the oracle compare
    sorts; the query itself is narrow)."""
    from citybikedatawarehouse_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        "__q274_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_fp
        FROM __q274_docs d, LATERAL chunk_doc(d.text, 32, 16) c
        """
    )


# ---------------------------------------------------------------------------
# q279 — feature hashing (the hashing-trick vectorizer), collision census
# ---------------------------------------------------------------------------

_FH_BUCKETS = 1024


@register(
    "q279_feature_hashing",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lower(words[i]) AS word
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents),
           UNNEST(range(1, len(words) + 1)) t(i)
      WHERE words[i] <> ''
    ),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
    hashed AS (
      SELECT doc_id, word, tf,
             CAST(('0x' || substr(md5('fh:' || word), 1, 8))::BIGINT
                  % {_FH_BUCKETS} AS INTEGER) AS bucket,
             CASE WHEN ('0x' || substr(md5('fh:' || word), 9, 1))::BIGINT >= 8
                  THEN 1 ELSE -1 END AS sign
      FROM tf
    )
    SELECT bucket,
           CAST(count(DISTINCT word) AS BIGINT)   AS n_terms,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(tf) AS BIGINT)                AS abs_mass,
           CAST(sum(sign * tf) AS BIGINT)         AS net_weight
    FROM hashed
    GROUP BY bucket
    """,
)
def q279_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (Weinberger et al. 2009, the scikit/VW
    "hashing trick"): every token maps to one of {_FH_BUCKETS}
    buckets via an md5 hash, with a SIGNED contribution (second hash
    nibble -> +/-1) so collisions cancel in expectation instead of
    biasing upward — the fixed-width featurizer that replaces an
    unbounded vocabulary with a constant-size vector, which is what
    makes text -> features feasible on a corpus whose vocabulary
    never fits a dictionary (no fit pass, no vocab broadcast, new
    words never re-shape the schema). Output is the corpus-level
    COLLISION CENSUS of the hash space — per bucket: distinct terms
    landing there, documents touched, raw mass, and the signed net
    weight — i.e. the audit you run to size the hash width before
    training.

    Scale shape: tokenize+tf is q68's one exploded shuffle keyed
    (doc, word); bucket/sign are per-row codegen md5s; the census
    folds map-side into <= {_FH_BUCKETS} rows regardless of corpus
    size (the two COUNT(DISTINCT)s expand-aggregate on word/doc
    within each bucket, still combiner-friendly). Per-doc sparse
    vectors — groupBy(doc_id, bucket) — are the same plan minus the
    final fold; the census is what is bounded enough to RETURN.
    """
    d = _t(spark, sf_dir, "documents")
    w = (
        d.select("doc_id", F.explode(words("text")).alias("tok"))
        .select("doc_id", F.lower("tok").alias("word"))
        .filter(F.col("word") != "")
    )
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    h = F.md5(F.concat(F.lit("fh:"), F.col("word")))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
        % _FH_BUCKETS
    ).cast("int")
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") >= 8, F.lit(1)
    ).otherwise(F.lit(-1))
    hashed = tf.select(
        "doc_id", "word", "tf", bucket.alias("bucket"), sign.alias("sign")
    )
    return hashed.groupBy("bucket").agg(
        F.countDistinct("word").alias("n_terms"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").cast("bigint").alias("abs_mass"),
        F.sum(F.col("sign") * F.col("tf")).cast("bigint").alias("net_weight"),
    )


# plain docstring with placeholders, filled after the def (the q216/
# q220/q268 pattern — an inline .format() expression would leave
# __doc__ None)
q279_feature_hashing.__doc__ = q279_feature_hashing.__doc__.format(
    _FH_BUCKETS=_FH_BUCKETS
)
