"""Training-data curation operators (north-star extension beyond
SURVEY.md section 2.4): sequence packing to a token budget,
deterministic dataset splits, Gopher-style repetition filtering,
embedding int8 quantization, and incremental (cross-batch) dedup.

These are the export-side operators of an LLM data pipeline — the
steps between "corpus is clean" (plans/dedup.py, plans/text.py) and
"tensors hit the trainer". All are pure Catalyst plans with DuckDB
oracles; determinism comes from md5-keyed decisions (no RNG state),
the same contract as q67_stratified_sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from citybikedatawarehouse_spark.functions.textfns import (
    word_count,
    words,
)
from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


def _md5_tick(tag: str, id_col: str, mod: int) -> F.Column:
    """Deterministic per-row tick in [0, mod): first 8 hex digits of
    md5(tag || id) as an integer, mod ``mod``. Pure function of the
    id — stable across reruns, engines, and partitionings."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


def pack_assignments(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc-level packing assignment (the shared core of
    q83_sequence_pack and the packed-corpus export writer): appends
    ``tok`` (whitespace token count), ``shard`` (md5 hash mod
    n_shards), ``ord_key`` (md5 shuffle order within the shard),
    ``cum`` (running token total through this doc within the shard)
    and ``bin_id`` (which budget-sized training sequence the doc's
    FIRST token lands in). One shuffle, keyed by shard.

    Invariant (first-token assignment, one row per doc): within a
    shard, ordered by (ord_key, id), bin ids are non-decreasing and
    start at 0, but they are NOT dense — a doc with tok > budget
    spans several budget windows, and the windows it covers entirely
    contain no doc *start*, so the next doc's bin skips them
    (precisely: bin[i+1] - bin[i] = g >= 2 implies tok[i] >
    (g-1)*budget). Callers that need dense bins with exact budget
    fill — i.e. the actual token-stream cuts — use
    ``pack_segments``, which splits each doc into one row per budget
    window it overlaps."""
    d = docs.select(
        "*",
        word_count(text_col).alias("tok"),
        F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))).alias(
            "ord_key"
        ),
        _md5_tick("shard:", id_col, n_shards).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("ord_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.withColumn("cum", F.sum("tok").over(w)).withColumn(
        "bin_id",
        ((F.col("cum") - F.col("tok")) / budget).cast("bigint"),
    )


def pack_segments(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-stream packing segments (true GPT-style "pack then
    split"): each doc contributes ONE ROW PER BUDGET WINDOW it
    overlaps in the concatenated shard stream — ``bin_id`` plus
    ``seg_tok`` (how many of the doc's tokens land in that window).

    Invariants (the ones ``pack_assignments`` deliberately does not
    have): per shard, bin ids are DENSE from 0, every bin except the
    shard's last holds exactly ``budget`` tokens, and token totals
    are conserved (sum(seg_tok) per doc = tok). A doc spanning k
    windows appears k times; trainers cut sequences exactly at the
    recorded boundaries.

    Plan: pack_assignments' single shard-keyed window, then a narrow
    ``explode(sequence(first_bin, last_bin))`` — per-row fan-out is
    ceil(tok/budget), so corpus-scale blowup is bounded by
    total_tokens/budget extra rows, never quadratic. No second
    shuffle."""
    a = pack_assignments(docs, budget, n_shards, id_col, text_col)
    first_bin = F.col("bin_id")
    last_bin = ((F.col("cum") - 1) / budget).cast("bigint")
    seg = a.withColumn(
        "seg_bin", F.explode(F.sequence(first_bin, last_bin))
    )
    lo = F.greatest(F.col("cum") - F.col("tok"), F.col("seg_bin") * budget)
    hi = F.least(F.col("cum") - 1, (F.col("seg_bin") + 1) * budget - 1)
    return (
        seg.withColumn("seg_tok", (hi - lo + 1).cast("bigint"))
        .drop("bin_id")
        .withColumnRenamed("seg_bin", "bin_id")
    )


@register(
    "q83_sequence_pack",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tok,
             md5('pack:' || doc_id) AS ord_key,
             ('0x' || substr(md5('shard:' || doc_id), 1, 8))::BIGINT % 8 AS shard
      FROM documents
    ),
    packed AS (
      SELECT shard, tok,
             sum(tok) OVER (PARTITION BY shard ORDER BY ord_key, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT shard, CAST((cum - tok) // 512 AS BIGINT) AS bin_id,
           count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY 1, 2
    """,
)
def q83_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents in a deterministic
    md5-shuffled order and cut every BUDGET tokens (GPT-style "pack
    then split" — a document is assigned to the bin its first token
    lands in: bin = (cumsum - tok) div BUDGET). Emits the packing
    manifest (shard, bin, n_docs, tokens).

    Scale design: a single global running sum would serialize the
    corpus through one task, so packing is sharded — shard =
    md5('shard:'||id) mod S, and the window partitions by shard. One
    shuffle, S-way parallel; at 100 TB raise S to O(cluster cores)
    (each shard still packs deterministically, and shard membership
    is a pure hash so the manifest is reproducible). The reference
    has no packing op (its unit is one CSV row); this is the
    north-star trainer-export step.
    """
    assigned = pack_assignments(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        budget=512,
        n_shards=8,
    )
    return assigned.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("bin_tokens"),
    )


@register(
    "q110_pack_segments",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tok,
             md5('pack:' || doc_id) AS ord_key,
             ('0x' || substr(md5('shard:' || doc_id), 1, 8))::BIGINT % 8 AS shard
      FROM documents
    ),
    packed AS (
      SELECT shard, tok,
             CAST(sum(tok) OVER (PARTITION BY shard ORDER BY ord_key, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM toks
    ),
    segs AS (
      SELECT shard, tok, cum,
             unnest(generate_series((cum - tok) // 512, (cum - 1) // 512))
               AS bin_id
      FROM packed
    )
    SELECT shard, CAST(bin_id AS BIGINT) AS bin_id,
           count(*) AS n_segs,
           CAST(sum(least(cum - 1, (bin_id + 1) * 512 - 1)
                    - greatest(cum - tok, bin_id * 512) + 1) AS BIGINT)
             AS bin_tokens
    FROM segs
    GROUP BY 1, 2
    """,
)
def q110_pack_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level packing manifest (GPT-style pack-THEN-split):
    the shard token stream is cut every 512 tokens, and a doc
    overlapping k windows contributes k segments. Unlike q83's
    doc-level manifest (first-token assignment, bins may skip where
    a doc spans whole windows), this manifest's bins are dense from
    0 per shard and every non-final bin holds exactly 512 tokens —
    the shape a trainer's data loader actually consumes.

    Scale design: same single shard-keyed shuffle as q83; the
    segment fan-out is a narrow explode bounded by
    total_tokens/budget extra rows. The reference has no packing op;
    this is the north-star trainer-export step."""
    segs = pack_segments(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        budget=512,
        n_shards=8,
    )
    return segs.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum("seg_tok").alias("bin_tokens"),
    )


@register(
    "q84_dataset_split",
    oracle="""
    WITH t AS (
      SELECT source, n_chars,
             ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 AS tick
      FROM documents
    )
    SELECT CASE WHEN tick < 90 THEN 'train'
                WHEN tick < 95 THEN 'valid'
                ELSE 'test' END AS split,
           source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM t
    GROUP BY 1, 2
    """,
)
def q84_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/valid/test split: membership =
    md5('split:'||id) mod 100 — a pure function of the id, so the
    split survives reruns, repartitioning, and engine changes (no
    randomSplit seed state to ship), and a document can never migrate
    between splits when the corpus grows. Emits the per-(split,
    source) manifest a training job reads. Plan: 3-column pruned
    scan, one hash aggregate — no shuffle beyond the agg exchange."""
    d = _t(spark, sf_dir, "documents")
    tick = _md5_tick("split:", "doc_id", 100)
    split = (
        F.when(tick < 90, "train").when(tick < 95, "valid").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "q85_repetition_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id, words[i] AS word, i
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents),
           UNNEST(range(1, len(words) + 1)) t(i)
    ),
    grams AS (
      SELECT doc_id, word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY i) AS gram
      FROM w
    ),
    gc AS (
      SELECT doc_id, gram, count(*) AS c
      FROM grams WHERE gram IS NOT NULL
      GROUP BY 1, 2
    ),
    rep AS (
      SELECT doc_id,
             round(max(c) * 1.0 / sum(c), 6) AS top_gram_frac,
             sum(c) AS n_grams
      FROM gc GROUP BY doc_id
    ),
    sym AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_sym,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words
      FROM documents
    )
    SELECT r.doc_id, r.top_gram_frac,
           round(s.n_sym * 1.0 / s.n_words, 6) AS symbol_ratio,
           (r.top_gram_frac > 0.06 OR s.n_sym * 1.0 / s.n_words > 0.5) AS flagged
    FROM rep r JOIN sym s ON r.doc_id = s.doc_id
    """,
)
def q85_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    word-2-grams taken by the single most frequent 2-gram (boilerplate
    / looping-generation detector) and the symbol-to-word ratio, plus
    the gate verdict. Real pipelines drop flagged docs; emitting the
    scores keeps the oracle able to check the arithmetic, not just
    the survivor set.

    Plan shape: 2-grams come from posexplode + a lead() window keyed
    (doc_id, pos) — the window and the per-doc aggregate share one
    hash-partition-by-doc_id exchange, so the whole scoring pass is
    scan -> explode -> 1 shuffle -> agg. No self-join on the gram
    table (the naive zip-the-array-against-itself plan), no UDF. At
    100 TB the explode multiplies rows by doc length but keys stay
    (doc_id, gram) — skew-free (a doc's grams all land in one
    partition, bounded by max doc length, not corpus size)."""
    d = _t(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", F.posexplode(words("text")).alias("pos", "word")
    )
    gram = F.concat_ws(
        " ",
        F.col("word"),
        F.lead("word").over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    grams = (
        ex.select("doc_id", gram.alias("gram"))
        .filter(F.col("gram").contains(" "))  # drop the tail NULL-lead gram
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rep = grams.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_gram_frac"),
    )
    sym = d.select(
        "doc_id",
        (
            F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0))
            .cast("bigint")
        ).alias("n_sym"),
        word_count("text").alias("n_words"),
    )
    symbol_ratio = F.col("n_sym") / F.col("n_words")
    return (
        rep.join(sym, "doc_id")
        .select(
            "doc_id",
            "top_gram_frac",
            F.round(symbol_ratio, 6).alias("symbol_ratio"),
            ((F.col("top_gram_frac") > 0.06) | (symbol_ratio > 0.5)).alias(
                "flagged"
            ),
        )
    )


@register(
    "q78_embedding_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    m AS (SELECT vec_id, max(abs(v)) AS mx FROM e GROUP BY vec_id)
    SELECT e.vec_id,
           round(m.mx, 6) AS abs_max,
           CAST(sum(CAST(round(e.v * 127 / m.mx) AS BIGINT)) AS BIGINT) AS q_sum,
           round(max(abs(e.v - round(e.v * 127 / m.mx) * m.mx / 127)), 6) AS max_err
    FROM e JOIN m ON e.vec_id = m.vec_id
    GROUP BY e.vec_id, m.mx
    """,
)
def q78_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization audit: per vector,
    scale = 127 / max|v|, q_i = round(v_i * 127 / max|v|), and the
    reconstruction error max|v_i - q_i/scale| — the compression step
    before shipping embeddings to an ANN index or a trainer (4x
    smaller than float32, 75% less shuffle volume for every
    similarity op downstream).

    All higher-order functions on the array column — aggregate() for
    abs-max and the two sums, transform() for the quantized values —
    zero explode, zero shuffle: per-row work stays inside
    whole-stage codegen. The oracle replays it element-wise via
    unnest (the proven q70 idiom), same double math: v*127/mx written
    identically on both sides so IEEE gives bit-equal inputs to
    round()."""
    emb = _t(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    with_max = emb.select(
        "vec_id",
        dbl.alias("v"),
        F.aggregate(
            dbl,
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x)),
        ).alias("mx"),
    )
    q = F.transform(
        F.col("v"), lambda x: F.round(x * 127 / F.col("mx")).cast("bigint")
    )
    err = F.zip_with(
        F.col("v"),
        q,
        lambda v, qi: F.abs(v - qi * F.col("mx") / 127),
    )
    return with_max.select(
        "vec_id",
        F.round(F.col("mx"), 6).alias("abs_max"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("q_sum"),
        F.round(
            F.aggregate(
                err, F.lit(0.0), lambda acc, x: F.greatest(acc, x)
            ),
            6,
        ).alias("max_err"),
    )


@register(
    "q87_unigram_logprob",
    oracle="""
    WITH w AS (
      SELECT doc_id, words[i] AS word
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents),
           UNNEST(range(1, len(words) + 1)) t(i)
      WHERE words[i] <> ''
    ),
    uni AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
    tot AS (SELECT count(*) AS t FROM w)
    SELECT w.doc_id,
           count(*) AS n_words,
           round(avg(-ln(uni.cnt * 1.0 / tot.t)), 6) AS avg_neg_logprob
    FROM w JOIN uni USING (word) CROSS JOIN tot
    GROUP BY w.doc_id
    """,
)
def q87_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality score (the simplified CCNet-style filter):
    each document scored by the average negative log-probability of
    its words under the corpus's own unigram distribution — low
    scores mean generic/common-word text, high scores mean rare-word
    (or noisy) text; real pipelines gate on both tails.

    Scale shape: one explode -> word-count agg (map-side combined:
    the shuffle carries distinct words, not occurrences) -> the
    unigram table joins BACK to the exploded words by word key.
    Vocabulary is Zipf-bounded (millions of rows at web scale, far
    under the corpus size), so AQE broadcasts it and the scoring pass
    is shuffle-free beyond the per-doc aggregate; the grand total is
    a 1-row broadcast."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(words("text")).alias("word")).filter(
        F.col("word") != ""
    )
    uni = w.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    tot = w.agg(F.count(F.lit(1)).alias("t"))
    return (
        w.join(uni, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(-F.log(F.col("cnt") / F.col("t"))), 6).alias(
                "avg_neg_logprob"
            ),
        )
    )


@register(
    "q79_matryoshka_truncate",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             CAST(embedding[i] AS DOUBLE) AS v,
             i
      FROM embeddings,
           UNNEST(range(1, len(embedding) + 1)) t(i)
    )
    SELECT vec_id,
           round(sqrt(sum(CASE WHEN i <= 16 THEN v * v ELSE 0 END)), 6)
             AS norm_16,
           round(sqrt(sum(CASE WHEN i <= 16 THEN v * v ELSE 0 END))
                 / sqrt(sum(v * v)), 6) AS norm_retention
    FROM e
    GROUP BY vec_id
    """,
)
def q79_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: keep the first 16 of 64
    dims and report the truncated norm and the norm retention ratio —
    the decision metric for serving shorter embeddings (MRL-trained
    models concentrate mass in the prefix; near-1 retention means the
    16-dim prefix is safe for coarse retrieval). Pure HOF folds
    (slice + aggregate), zero explode, zero shuffle beyond the scan.

    Float caveat shared with q78: the prefix fold accumulates in
    array order on both engines, so the doubles agree bit-exactly
    before the 6-decimal rounding."""
    emb = _t(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def ssq(arr):
        return F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc + x * x
        )

    n16 = F.sqrt(ssq(F.slice(dbl, 1, 16)))
    nfull = F.sqrt(ssq(dbl))
    return emb.select(
        "vec_id",
        F.round(n16, 6).alias("norm_16"),
        F.round(n16 / nfull, 6).alias("norm_retention"),
    )


@register(
    "q86_incremental_dedup",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, source, md5(text) AS digest,
             ('0x' || substr(md5('batch:' || doc_id), 1, 8))::BIGINT % 5 = 0
               AS incoming
      FROM documents
    ),
    survivors AS (
      SELECT i.doc_id, i.source, i.digest
      FROM (SELECT * FROM tagged WHERE incoming) i
      WHERE NOT EXISTS (
        SELECT 1 FROM tagged e
        WHERE NOT e.incoming AND e.digest = i.digest
      )
    )
    SELECT doc_id, source, digest FROM (
      SELECT doc_id, source, digest,
             row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
      FROM survivors
    ) WHERE rn = 1
    """,
)
def q86_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-batch) exact dedup: an incoming batch
    (deterministic 20% slice by md5 mod — stand-in for today's crawl)
    is deduplicated AGAINST the existing corpus (anti-join on content
    digest) and then WITHIN itself (min-doc_id survivor per digest).
    This is the steady-state shape of production dedup — you never
    re-dedup the whole corpus, you dedup the delta against it.

    Scale design: both legs shuffle 32-byte digests, never text
    (q60's rule). The anti-join and the within-batch survivor pick
    hash-partition by the same digest key, so AQE plans one exchange
    per side; the existing-corpus side would be a Bloom-filter
    pushdown at 100 TB (Spark's InjectRuntimeFilter does this for
    free when the incoming side is selective)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5("text").alias("digest"),
        (_md5_tick("batch:", "doc_id", 5) == 0).alias("incoming"),
    )
    incoming = d.filter(F.col("incoming"))
    existing = d.filter(~F.col("incoming")).select("digest")
    fresh = incoming.join(existing, "digest", "left_anti")
    w = Window.partitionBy("digest").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "digest")
    )


@register(
    "q89_split_leakage",
    oracle=r"""
    WITH tagged AS (
      SELECT doc_id, text,
             ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 AS tick
      FROM documents
    ),
    test_sh AS (
      SELECT DISTINCT
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS words
            FROM tagged WHERE tick >= 95),
           UNNEST(range(1, len(words) - 1)) t(i)
    ),
    train_sh AS (
      SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
            FROM tagged WHERE tick < 90),
           UNNEST(range(1, len(words) - 1)) t(i)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM train_sh JOIN test_sh USING (shingle)
    GROUP BY doc_id
    """,
)
def q89_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: q84's deterministic split is only safe if
    no training document shares content with the held-out test split
    — near-duplicates that straddle the split boundary leak eval
    answers into training. This runs the q69 decontamination operator
    with the TEST SPLIT as the benchmark: every train-split document
    sharing a word 3-gram with any test document is flagged with its
    overlap count; the pipeline re-buckets or drops the flagged docs.

    Same scale shape as q69: the test split is 5% and its distinct
    shingles broadcast; the train side is scanned once, shuffled only
    for the map-side-combined per-doc count."""
    from citybikedatawarehouse_spark.operators.dedup_ops import decontaminate

    d = _t(spark, sf_dir, "documents")
    tick = _md5_tick("split:", "doc_id", 100)
    tagged = d.withColumn("__tick", tick)
    return decontaminate(
        tagged.filter(F.col("__tick") < 90),
        tagged.filter(F.col("__tick") >= 95),
        n=3,
    )


@register(
    "q92_curation_e2e",
    oracle=r"""
    WITH c AS (
      SELECT doc_id, text,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct
      FROM documents
    ),
    g AS (
      SELECT doc_id, text, n_words,
             round(coalesce(n_punct * 1.0 / nullif(n_words, 0), 0.0::DOUBLE), 6) AS punct_ratio,
             round(coalesce(n_nonspace / nullif(n_words, 0), 0.0::DOUBLE), 6) AS avg_word_len
      FROM c
    ),
    kept AS (
      SELECT doc_id, text FROM g
      WHERE NOT (n_words < 5 OR n_words > 100000 OR punct_ratio > 0.6
                 OR avg_word_len < 2.0 OR avg_word_len > 40.0)
    ),
    dedup AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS canon
        FROM kept
      ) WHERE doc_id = canon
    ),
    train AS (
      SELECT doc_id, text FROM dedup
      WHERE ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 < 90
    ),
    toks AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok,
             md5('pack:' || doc_id) AS ord_key,
             ('0x' || substr(md5('shard:' || doc_id), 1, 8))::BIGINT % 8 AS shard
      FROM train
    ),
    packed AS (
      SELECT shard, tok,
             sum(tok) OVER (PARTITION BY shard ORDER BY ord_key, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT shard, CAST((cum - tok) // 512 AS BIGINT) AS bin_id,
           count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY 1, 2
    """,
)
def q92_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation capstone: quality gates (q66's thresholds) ->
    exact content dedup (min-id survivor per digest) -> deterministic
    train split (q84's tick < 90) -> sequence packing (q83), composed
    as ONE lazy plan whose output is the packing manifest of the
    export-ready training corpus. This is the plan a real pipeline
    submits nightly; the stages exist separately for audit, and this
    query proves they compose without materialization barriers.

    Plan shape: scan -> narrow quality filter (codegen, at scan
    speed) -> one digest-keyed window for the dedup survivor -> tick
    filter -> one shard-keyed window + agg for packing. Two shuffles
    total for the whole pipeline (digest, shard); Catalyst pipelines
    the three filters into the scan side of the first exchange."""
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
        "text",
        n_words.alias("n_words"),
        ratio(n_punct * F.lit(1.0), n_words).alias("punct_ratio"),
        ratio(n_nonspace, n_words).alias("avg_word_len"),
    )
    kept = feats.filter(
        ~(
            (F.col("n_words") < 5)
            | (F.col("n_words") > 100000)
            | (F.col("punct_ratio") > 0.6)
            | (F.col("avg_word_len") < 2.0)
            | (F.col("avg_word_len") > 40.0)
        )
    ).select("doc_id", "text")
    w_digest = Window.partitionBy(F.md5("text"))
    deduped = (
        kept.withColumn("__canon", F.min("doc_id").over(w_digest))
        .filter(F.col("doc_id") == F.col("__canon"))
        .select("doc_id", "text")
    )
    train = deduped.filter(_md5_tick("split:", "doc_id", 100) < 90)
    assigned = pack_assignments(train, budget=512, n_shards=8)
    return assigned.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("bin_tokens"),
    )


@register(
    "q97_mixture_sample",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok,
             ('0x' || substr(md5('mix:' || doc_id), 1, 8))::BIGINT % 1000000 AS tick
      FROM documents
    ),
    totals AS (
      SELECT source, CAST(sum(tok) AS BIGINT) AS src_tokens,
             CAST(sum(sum(tok)) OVER () AS BIGINT) AS corpus_tokens,
             CAST(count(*) OVER () AS BIGINT) AS n_sources
      FROM toks GROUP BY source
    ),
    rates AS (
      SELECT source, src_tokens,
             CAST(floor(least(1.0, (corpus_tokens * 0.5 / n_sources) / src_tokens)
                        * 1000000) AS BIGINT) AS thresh
      FROM totals
    )
    SELECT t.source,
           r.src_tokens,
           CAST(count(*) FILTER (WHERE t.tick < r.thresh) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(tok) FILTER (WHERE t.tick < r.thresh), 0) AS BIGINT)
             AS kept_tokens
    FROM toks t JOIN rates r USING (source)
    GROUP BY t.source, r.src_tokens
    """,
)
def q97_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing: hit a token budget (50% of the
    corpus) with EQUAL token share per source — the mixture-weighting
    step of training-data assembly ("each source contributes its
    target share, oversized sources downsample, undersized ones keep
    everything"). Per-source accept rate = min(1, target/src_tokens),
    applied as a deterministic md5 tick threshold (same integer
    threshold both engines: the double rate is computed by the
    identical formula, scaled, and explicitly FLOORED — a bare bigint
    cast truncates in Spark but rounds in DuckDB), so membership is
    reproducible and the mixture never resamples already-shipped
    docs on rerun. Emits the per-source audit (kept counts/tokens vs
    the source's total).

    Plan shape: one scan -> per-source token agg (tiny) -> window
    grand totals on the agg -> broadcast the rates back -> one
    filtered re-aggregation. The corpus is scanned twice (stats pass
    + apply pass) — the unavoidable two-phase shape of
    budget-targeting; at 100 TB the stats pass reads only (source,
    token-count) columns."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        word_count("text").alias("tok"),
        _md5_tick("mix:", "doc_id", 1_000_000).alias("tick"),
    )
    totals = d.groupBy("source").agg(F.sum("tok").alias("src_tokens"))
    # grand totals as a 1-row broadcast joined back to the per-source
    # agg (not an unpartitioned window: same values on these few
    # rows, but keeps WindowExec warnings meaningful). The threshold
    # is FLOORED explicitly on both engines — Spark's bigint cast
    # truncates while DuckDB's rounds to nearest, so a bare cast can
    # differ by 1 whenever the scaled rate's fraction is >= 0.5 and a
    # doc's md5 tick sits exactly on the boundary.
    grand = totals.agg(
        F.sum("src_tokens").alias("__corpus_tokens"),
        F.count(F.lit(1)).alias("__n_sources"),
    )
    rates = totals.crossJoin(F.broadcast(grand)).select(
        "source",
        "src_tokens",
        F.floor(
            F.least(
                F.lit(1.0),
                (F.col("__corpus_tokens") * 0.5 / F.col("__n_sources"))
                / F.col("src_tokens"),
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("thresh"),
    )
    kept = F.col("tick") < F.col("thresh")
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "src_tokens")
        .agg(
            F.sum(kept.cast("bigint")).alias("n_kept"),
            F.coalesce(
                F.sum(F.when(kept, F.col("tok"))), F.lit(0)
            ).cast("bigint").alias("kept_tokens"),
        )
    )


@register(
    "q98_length_buckets",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT), 1) AS tok
      FROM documents
    )
    SELECT CAST(floor(log2(tok)) AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(min(tok) AS BIGINT) AS min_tok,
           CAST(max(tok) AS BIGINT) AS max_tok,
           CAST(sum(tok) AS BIGINT) AS sum_tok,
           CAST(count(*) * max(tok) - sum(tok) AS BIGINT) AS padding_waste
    FROM toks
    GROUP BY 1
    """,
)
def q98_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents grouped into
    power-of-two token-length buckets (bucket = floor(log2(tokens)))
    with the padding waste each bucket would pay if batched to its
    max length — the accounting behind bucketed batch assembly for
    inference and non-packed training (padding cost is the quantity
    the bucketing minimizes vs one global max-length batch).

    Log-width buckets instead of ntile quantiles on purpose: a
    quantile bucketing needs a global sort (single-task bottleneck)
    or approximate quantiles (not bit-reproducible cross-engine);
    floor(log2) is a pure per-row expression — no shuffle beyond the
    final aggregate, deterministic everywhere, and bucket ids are
    stable as the corpus grows (a doc never changes bucket when data
    is added, unlike quantiles)."""
    d = _t(spark, sf_dir, "documents")
    tok = F.greatest(word_count("text"), F.lit(1))
    return (
        d.select(F.floor(F.log2(tok)).cast("bigint").alias("bucket"), tok.alias("tok"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("tok").alias("min_tok"),
            F.max("tok").alias("max_tok"),
            F.sum("tok").alias("sum_tok"),
            (F.count(F.lit(1)) * F.max("tok") - F.sum("tok")).alias("padding_waste"),
        )
    )


@register(
    "q113_weighted_sample",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok,
             ('0x' || substr(md5('wsamp:' || doc_id), 1, 8))::BIGINT % 1000000
               AS tick
      FROM documents
    )
    SELECT doc_id, tok,
           round(ln(1000000.0 / (tick + 0.5)) / tok, 9) AS key
    FROM t
    ORDER BY key, doc_id LIMIT 100
    """,
)
def q113_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement, weight =
    token count (Efraimidis-Spirakis exponential sort keys): each doc
    gets key = Exp(1)/weight with the uniform drawn from its md5 tick
    — u = (tick+0.5)/1e6, key = ln(1/u)/tok — and the sample is the
    100 smallest keys. Token-weighted selection is how curation
    pipelines draw inspection/eval subsets whose TOKEN mass (not doc
    count) is representative; the md5 tick makes membership a pure
    function of the id — reproducible across reruns, engines, and
    partitionings, the same contract as q67/q84.

    Scale shape: a 2-column pruned scan, per-row key arithmetic in
    codegen, and a TakeOrdered top-k — no global sort, no shuffle
    beyond the k-row final. Determinism across engines: the key is
    rounded to 9 decimals BEFORE ranking (ln drifts last-ulp between
    libm implementations) with a doc_id tie-break."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        word_count("text").alias("tok"),
        _md5_tick("wsamp:", "doc_id", 1_000_000).alias("__tick"),
    )
    key = F.round(
        F.log(F.lit(1000000.0) / (F.col("__tick") + F.lit(0.5)))
        / F.col("tok"),
        9,
    )
    return (
        t.select("doc_id", "tok", key.alias("key"))
        .orderBy("key", "doc_id")
        .limit(100)
    )


@register(
    "q116_dedup_rate_by_source",
    oracle="""
    SELECT source, lang,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6)
             AS dup_rate
    FROM documents
    GROUP BY source, lang
    """,
)
def q116_dedup_rate_by_source(spark, sf_dir):
    """Per-(source, language) duplication audit: exact-duplicate rate
    = 1 - distinct digests / docs. The triage report a curation run
    produces BEFORE deduplicating — which feeds are copy-paste-heavy,
    which languages a crawler double-fetched — so dedup effort and
    mixture weights (q97) can be set per source instead of corpus-
    wide.

    Scale shape: digests (32 bytes) aggregate, never raw text (q60's
    rule); one partial_count + distinct-digest aggregate keyed
    (source, lang) — Spark plans count(DISTINCT) as a two-phase
    expand/agg, both phases map-side combinable."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.round(
            F.lit(1.0)
            - F.countDistinct(F.md5("text")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


@register(
    "q127_source_quota_filter",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('quota:' || doc_id), doc_id) AS rn
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN rn <= 40 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(min(CASE WHEN rn <= 40 THEN doc_id END) AS BIGINT)
             AS sample_min_id
    FROM ranked GROUP BY source
    """,
)
def q127_source_quota_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota: cap every source at 40 docs,
    selected by deterministic md5 rank — the "no single feed may
    dominate" curation guard that complements q97's token-share
    mixture (q97 rebalances proportions; this enforces a hard
    ceiling). md5-ordering makes the kept subset a pure function of
    the ids: reproducible across reruns and engines, and docs never
    churn in/out of the quota when unrelated sources grow. Emits the
    per-source audit (total, kept, min kept id as a spot-check
    handle).

    Scale shape: one source-keyed exchange carrying (doc_id, source)
    only — the rank window and the final aggregate ride it together;
    no text ever shuffles. Skewed sources cost one partition's sort,
    bounded by the largest source's (id, hash) pairs — salt via
    composite (source, md5 bucket) keys if one source is a large
    corpus fraction."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    ranked = d.select("doc_id", "source").withColumn(
        "__rn", F.row_number().over(w)
    )
    kept = F.col("__rn") <= 40
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.min(F.when(kept, F.col("doc_id"))).cast("bigint").alias(
            "sample_min_id"
        ),
    )


@register(
    "q151_length_drift_psi",
    oracle=r"""
    WITH tok AS (
      SELECT source,
             CAST(floor(log2(greatest(
               len(regexp_split_to_array(trim(text), '\s+')), 1)))
               AS BIGINT) AS bucket
      FROM documents WHERE trim(text) <> ''
    ),
    per_src AS (
      SELECT source, bucket, count(*) AS n FROM tok GROUP BY 1, 2
    ),
    src_tot AS (
      SELECT source, sum(n) AS tot FROM per_src GROUP BY source
    ),
    ref AS (
      SELECT bucket, sum(n) AS n_ref FROM per_src GROUP BY bucket
    ),
    ref_tot AS (SELECT sum(n_ref) AS tot_ref FROM ref),
    cells AS (
      SELECT s.source,
             r.bucket,
             coalesce(p.n, 0) * 1.0 / s.tot AS p,
             r.n_ref * 1.0 / (SELECT tot_ref FROM ref_tot) AS q
      FROM src_tot s CROSS JOIN ref r
      LEFT JOIN per_src p ON p.source = s.source AND p.bucket = r.bucket
    )
    SELECT source,
           round(sum((greatest(p, 0.0005) - q)
                     * ln(greatest(p, 0.0005) / q)), 6) AS psi,
           CAST(count(*) AS BIGINT) AS n_buckets
    FROM cells GROUP BY source
    """,
)
def q151_length_drift_psi(spark, sf_dir):
    """Population-stability-index drift audit: per source, how far
    its document-length distribution (log2 word-count buckets, the
    q98 axis) sits from the corpus-wide reference —
    PSI = Σ (p−q)·ln(p/q) with the standard 0.0005 floor on empty
    source cells (reference cells are never empty by construction:
    every bucket in the grid comes from the corpus itself). The
    ingest-monitoring gate: PSI > 0.25 on a feed flags a
    distribution shift (crawler change, truncation bug, new
    template) before it skews training mixtures.

    Determinism: p and q are exact integer-count ratios; ln/round at
    1e-6 is far above libm ulp variance. Scale shape: one token-count
    scan → (source, bucket) counts; the PSI grid is
    sources × buckets rows — everything after the first aggregate is
    metadata-sized."""
    d = _t(spark, sf_dir, "documents")
    tok = d.filter(F.trim("text") != "").select(
        "source",
        F.floor(
            F.log2(
                F.greatest(
                    F.size(F.split(F.trim("text"), r"\s+")), F.lit(1)
                )
            )
        )
        .cast("bigint")
        .alias("bucket"),
    )
    per_src = tok.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    src_tot = per_src.groupBy("source").agg(F.sum("n").alias("tot"))
    ref = per_src.groupBy("bucket").agg(F.sum("n").alias("n_ref"))
    ref_tot = ref.agg(F.sum("n_ref").alias("tot_ref"))
    cells = (
        src_tot.crossJoin(F.broadcast(ref))
        .crossJoin(F.broadcast(ref_tot))
        .join(per_src, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            (F.coalesce("n", F.lit(0)) * 1.0 / F.col("tot")).alias("p"),
            (F.col("n_ref") * 1.0 / F.col("tot_ref")).alias("q"),
        )
    )
    p_f = F.greatest(F.col("p"), F.lit(0.0005))
    return cells.groupBy("source").agg(
        F.round(F.sum((p_f - F.col("q")) * F.log(p_f / F.col("q"))), 6).alias(
            "psi"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )


@register(
    "q162_temperature_mixture",
    oracle="""
    WITH cnt AS (
      SELECT source, count(*) AS n_docs,
             CAST(floor(sqrt(count(*)) * 1000000) AS BIGINT) AS iw
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(iw) AS s FROM cnt),
    quota AS (
      SELECT source, n_docs,
             CAST((200 * iw) // (SELECT s FROM tot) AS BIGINT) AS quota
      FROM cnt
    ),
    ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5('tmix:' || doc_id), doc_id
             ) AS BIGINT) AS rn
      FROM documents
    )
    SELECT r.doc_id, r.source, r.rn AS rank_in_source, q.quota
    FROM ranked r JOIN quota q USING (source)
    WHERE r.rn <= q.quota
    """,
)
def q162_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (the T5/Pile data-mixing
    rule): per-source sampling weight proportional to n^alpha with
    alpha = 0.5, so small sources are UP-weighted relative to their
    raw share and giant crawls stop drowning everything — the
    statistics-driven sibling of q97's fixed-ratio mixture. A 200-doc
    budget is allocated as integer quotas and filled per source by
    deterministic md5 rank.

    Cross-engine determinism: sqrt is IEEE-correctly-rounded in both
    engines, but a SUM of doubles is order-dependent — so weights
    are quantized to integers FIRST (floor(sqrt(n)*1e6)) and the
    normalizing total and quotas are pure bigint arithmetic
    (the 'integer cents' rule from the catalog conventions).

    Scale shape: one count aggregate (map-side combined), a 1-row
    total broadcast, per-source rank windows bounded by source
    cardinality, and a broadcast join of the source-sized quota
    relation. The corpus shuffles once (the rank window)."""
    d = _t(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.floor(F.sqrt(F.count(F.lit(1))) * 1_000_000)
        .cast("bigint")
        .alias("iw"),
    )
    tot = cnt.agg(F.sum("iw").alias("s"))
    quota = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            # exact bigint floor-div (`div`), matching the oracle's
            # `//` — double-divide-then-cast can truncate 1 off for
            # quotients within 1 ulp of an integer at huge weights
            F.expr("(200 * iw) div s").alias("quota"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("tmix:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("bigint").alias("rank_in_source"),
    )
    return (
        ranked.join(F.broadcast(quota.drop("n_docs")), "source")
        .filter(F.col("rank_in_source") <= F.col("quota"))
        .select("doc_id", "source", "rank_in_source", "quota")
    )


@register(
    "q164_dsir_resample",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, source, words[i] AS word
      FROM (SELECT doc_id, source,
                   regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents),
           UNNEST(range(1, len(words) + 1)) t(i)
      WHERE words[i] <> ''
    ),
    vocab AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM w),
    tgt AS (
      SELECT word, count(*) AS cnt FROM w WHERE source = 'src0'
      GROUP BY word
    ),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM w WHERE source = 'src0'),
    crp AS (
      SELECT word, count(*) AS cnt FROM w WHERE source <> 'src0'
      GROUP BY word
    ),
    ct AS (SELECT CAST(count(*) AS BIGINT) AS t FROM w WHERE source <> 'src0'),
    scored AS (
      SELECT w.doc_id, w.source,
             count(*) AS n_words,
             round(avg(
               ln((coalesce(tgt.cnt, 0) + 1) * 1.0 / (tt.t + vocab.v))
               - ln((coalesce(crp.cnt, 0) + 1) * 1.0 / (ct.t + vocab.v))
             ), 6) AS avg_logratio
      FROM w
      LEFT JOIN tgt USING (word)
      LEFT JOIN crp USING (word)
      CROSS JOIN tt CROSS JOIN ct CROSS JOIN vocab
      WHERE w.source <> 'src0'
      GROUP BY w.doc_id, w.source
    )
    SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words,
           avg_logratio, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY avg_logratio DESC, doc_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 100
    """,
)
def q164_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (Data Selection via
    Importance Resampling, Xie et al. 2023, simplified to unigrams):
    score every candidate document by the average log-ratio of
    target-domain vs general-corpus unigram probability (add-1
    smoothed over the joint vocabulary) and keep the top-100 — the
    principled replacement for hand-tuned quality filters when a
    trusted target sample exists. 'src0' documents stand in for the
    target domain; everything else is the candidate pool.

    Determinism: scores are rounded to 6 decimals BEFORE ranking and
    tie-broken by doc_id, so engine-level float-order drift cannot
    reorder the cut.

    Scale shape: one corpus explode; both LM tables are
    Zipf-bounded word-keyed aggregates (map-side combined) that
    broadcast back onto the exploded words; totals and vocabulary
    size are 1-row broadcasts; the only corpus-scale exchanges are
    the per-doc aggregate and the global top-100
    (TakeOrderedAndProject, never a full sort)."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "source", F.explode(words("text")).alias("word")
    ).filter(F.col("word") != "")
    vocab = w.agg(F.count_distinct("word").alias("v"))
    is_t = F.col("source") == "src0"
    tgt = w.filter(is_t).groupBy("word").agg(F.count(F.lit(1)).alias("tcnt"))
    tt = w.filter(is_t).agg(F.count(F.lit(1)).alias("tt"))
    crp = (
        w.filter(~is_t).groupBy("word").agg(F.count(F.lit(1)).alias("ccnt"))
    )
    ct = w.filter(~is_t).agg(F.count(F.lit(1)).alias("ct"))
    scored = (
        w.filter(~is_t)
        .join(tgt, "word", "left")
        .join(crp, "word", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.round(
                F.avg(
                    F.log(
                        (F.coalesce("tcnt", F.lit(0)) + 1)
                        * 1.0
                        / (F.col("tt") + F.col("v"))
                    )
                    - F.log(
                        (F.coalesce("ccnt", F.lit(0)) + 1)
                        * 1.0
                        / (F.col("ct") + F.col("v"))
                    )
                ),
                6,
            ).alias("avg_logratio"),
        )
    )
    # TakeOrderedAndProject first (never a global sort / unpartitioned
    # corpus-scale window), then rank the surviving 100 rows — the
    # post-limit window touches 100 rows, not the candidate pool
    top = scored.orderBy(F.col("avg_logratio").desc(), "doc_id").limit(100)
    win = Window.orderBy(F.col("avg_logratio").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(win).cast("int"))


# ---------------------------------------------------------------------------
# q225 — new-content yield curve (novelty per ingest decile)
# ---------------------------------------------------------------------------

@register(
    "q225_novelty_curve",
    oracle=r"""
    WITH bounds AS (
      SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents
    ),
    db AS (
      SELECT d.doc_id,
             least(CAST(floor((d.doc_id - b.lo) * 10.0
                              / (b.hi - b.lo + 1)) AS INTEGER), 9)
               AS bucket,
             d.text
      FROM documents d CROSS JOIN bounds b
    ),
    sh AS (
      SELECT DISTINCT bucket, doc_id,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM (SELECT bucket, doc_id,
                   regexp_split_to_array(trim(text), '\s+') AS words
            FROM db),
           UNNEST(range(1, len(words) - 1)) t(i)
    ),
    per_bucket AS (
      SELECT bucket, count(DISTINCT shingle) AS n_shingles,
             count(DISTINCT doc_id) AS n_docs
      FROM sh GROUP BY bucket
    ),
    first_seen AS (
      SELECT shingle, min(bucket) AS fb FROM sh GROUP BY shingle
    ),
    news AS (
      SELECT fb AS bucket, count(*) AS n_new FROM first_seen GROUP BY fb
    )
    SELECT CAST(p.bucket AS INTEGER) AS bucket,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           CAST(p.n_shingles AS BIGINT) AS n_shingles,
           CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new_shingles,
           round(coalesce(n.n_new, 0) * 1.0 / p.n_shingles, 6)
             AS new_ratio,
           CAST(sum(coalesce(n.n_new, 0))
                  OVER (ORDER BY p.bucket) AS BIGINT)
             AS cum_distinct_shingles
    FROM per_bucket p LEFT JOIN news n USING (bucket)
    """,
)
def q225_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-content yield curve: split the corpus into 10 ingest-order
    buckets (doc_id deciles — min/max-normalized floor arithmetic,
    one broadcast bounds row), and per bucket report how many
    distinct 3-gram shingles it touches, how many are NEW (first
    seen there), the new ratio, and the cumulative distinct count.
    This is the "data value of scale" curve every corpus acquisition
    decision reads: a new_ratio collapsing toward 0 means the next
    crawl increment buys almost no new content and dedup (q60–q64)
    will delete most of it — measure BEFORE paying to process it.

    Scale shape: one explode to (bucket, shingle) pairs; first-seen
    is a map-side-combinable min per shingle; per-bucket distincts
    aggregate the same exploded relation; the cumulative window runs
    over 10 rows. One corpus-scale shuffle family (shingle-keyed),
    the q61 cost shape."""
    from citybikedatawarehouse_spark.operators.dedup_ops import shingles

    d = _t(spark, sf_dir, "documents")
    bounds = d.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    db = d.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "text",
        F.least(
            F.floor(
                (F.col("doc_id") - F.col("lo"))
                * 10.0
                / (F.col("hi") - F.col("lo") + 1)
            ).cast("int"),
            F.lit(9),
        ).alias("bucket"),
    )
    sh = (
        shingles(db, n=3)
        .join(db.select("doc_id", "bucket"), "doc_id")
        .select("bucket", "doc_id", "shingle")
        .localCheckpoint(eager=True)  # feeds per-bucket AND first-seen
    )
    per_bucket = sh.groupBy("bucket").agg(
        F.count_distinct("shingle").alias("n_shingles"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    news = (
        sh.groupBy("shingle")
        .agg(F.min("bucket").alias("fb"))
        .groupBy(F.col("fb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    joined = per_bucket.join(F.broadcast(news), "bucket", "left").select(
        "bucket",
        "n_docs",
        "n_shingles",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.col("n_new").cast("bigint").alias("n_new_shingles"),
        F.round(
            F.col("n_new") * F.lit(1.0) / F.col("n_shingles"), 6
        ).alias("new_ratio"),
        F.sum("n_new").over(wc).cast("bigint").alias(
            "cum_distinct_shingles"
        ),
    )


# ---------------------------------------------------------------------------
# q254 — IPF (raking) mixture weights to uniform source x lang margins
# ---------------------------------------------------------------------------

_IPF_ROUNDS = 10


def _ipf_oracle() -> str:
    """Unrolled iterative proportional fitting: 10 rounds of
    row-scale (source margin) then column-scale (lang margin), each
    weight rounded to 12 per half-round so float-summation drift
    cannot accumulate; margins target the UNIFORM distribution."""
    head = """
    WITH cells AS MATERIALIZED (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS MATERIALIZED (
      SELECT CAST(sum(n) AS BIGINT) AS n_total,
             CAST(count(DISTINCT source) AS BIGINT) AS n_src,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_lang
      FROM (SELECT source, lang, n FROM cells)
    ),
    w0 AS MATERIALIZED (
      SELECT source, lang, n, 1.0 AS w FROM cells
    )"""
    steps = []
    for r in range(1, _IPF_ROUNDS + 1):
        steps.append(f""",
    r{r} AS MATERIALIZED (
      SELECT c.source, c.lang, c.n,
             round(c.w * (t.n_total * 1.0 / t.n_src)
                   / rm.row_mass, 12) AS w
      FROM w{r - 1} c
      JOIN (SELECT source, sum(n * w) AS row_mass
            FROM w{r - 1} GROUP BY source) rm ON rm.source = c.source
      CROSS JOIN tot t
    ),
    w{r} AS MATERIALIZED (
      SELECT c.source, c.lang, c.n,
             round(c.w * (t.n_total * 1.0 / t.n_lang)
                   / cm.col_mass, 12) AS w
      FROM r{r} c
      JOIN (SELECT lang, sum(n * w) AS col_mass
            FROM r{r} GROUP BY lang) cm ON cm.lang = c.lang
      CROSS JOIN tot t
    )""")
    tail = f"""
    SELECT c.source, c.lang, c.n AS n_docs,
           round(c.w, 6) AS weight,
           round(c.n * c.w / t.n_total, 6) AS weighted_share
    FROM w{_IPF_ROUNDS} c CROSS JOIN tot t
    """
    return head + "".join(steps) + tail


@register("q254_ipf_mixture", oracle=_ipf_oracle())
def q254_ipf_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of per-cell sampling
    weights so the document mixture simultaneously matches a uniform
    SOURCE margin and a uniform LANGUAGE margin — the two-margin
    generalization of q97/q162's single-axis mixture control: when a
    training recipe specifies both "equal share per source" and a
    language distribution, per-axis scaling alone breaks the other
    axis; IPF alternates row/column scalings and converges to the
    unique min-KL reweighting (Deming-Stephan). Ten fixed rounds,
    each weight rounded to 12 per half-round (both engines walk the
    identical lattice); output is the per-cell weight and achieved
    share. Empty cells simply don't exist in the relation — IPF on a
    sparse table targets the margins as closely as the support
    allows.

    Scale shape: the corpus collapses to the |sources| x |langs|
    cell table in ONE scan; all 20 scalings run on that dim-sized
    relation (row/col masses are groupBys over <= 100 rows) with
    localCheckpoint per round. Weights then drive the actual
    sampling pass (q113's token-weighted sampler) in one further
    scan."""
    d = _t(spark, sf_dir, "documents")
    cells = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.countDistinct("source").cast("bigint").alias("n_src"),
        F.countDistinct("lang").cast("bigint").alias("n_lang"),
    )
    w = cells.withColumn("w", F.lit(1.0))
    for _ in range(_IPF_ROUNDS):
        rm = w.groupBy(F.col("source").alias("rs")).agg(
            F.sum(F.col("n") * F.col("w")).alias("row_mass")
        )
        w = (
            w.join(F.broadcast(rm), w.source == F.col("rs"))
            .crossJoin(F.broadcast(tot))
            .select(
                "source", "lang", "n",
                F.round(
                    F.col("w")
                    * (F.col("n_total") * 1.0 / F.col("n_src"))
                    / F.col("row_mass"),
                    12,
                ).alias("w"),
            )
        )
        cm = w.groupBy(F.col("lang").alias("cl")).agg(
            F.sum(F.col("n") * F.col("w")).alias("col_mass")
        )
        w = (
            w.join(F.broadcast(cm), w.lang == F.col("cl"))
            .crossJoin(F.broadcast(tot))
            .select(
                "source", "lang", "n",
                F.round(
                    F.col("w")
                    * (F.col("n_total") * 1.0 / F.col("n_lang"))
                    / F.col("col_mass"),
                    12,
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return w.crossJoin(F.broadcast(tot)).select(
        "source", "lang",
        F.col("n").alias("n_docs"),
        F.round("w", 6).alias("weight"),
        F.round(F.col("n") * F.col("w") / F.col("n_total"), 6).alias(
            "weighted_share"
        ),
    )
