"""Deduplication operators over documents (north-star extension):
exact hash dedup, n-gram Jaccard, MinHash+LSH, SimHash.
Populated incrementally; heavy lifting in operators/dedup_ops.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


@register(
    "q61_ngram_jaccard",
    oracle=r"""
    WITH sh AS (
      SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
           UNNEST(range(1, len(words) - 1)) t(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_1, id_2,
           round(i * 1.0 / (s1.n + s2.n - i), 6) AS jaccard
    FROM inter
    JOIN sz s1 ON s1.doc_id = id_1
    JOIN sz s2 ON s2.doc_id = id_2
    WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.2
    """,
)
def q61_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs >= 0.2 via inverted
    shingle index self-join (no N^2 — cost rides on shingle
    frequency).

    max_item_freq=1000 is the hot-shingle skew guard: a shingle
    shared by f docs generates f^2/2 candidate pairs in ONE task, so
    an uncapped stop-phrase shingle (say 10^6 docs at web scale) is a
    quadratic single-task bomb. The cap bounds any bucket's fan-out
    at ~500k pairs. It is lossless here: measured max shingle
    doc-frequency is 7 at sf0.01 / 25 at sf0.1 (so no qualifying
    pair loses intersection mass and the DuckDB oracle still hash-
    matches); at web scale set it to ~0.01-0.1%% of corpus size and
    accept the documented downward bias on pairs glued only by
    stop-phrases."""
    from citybikedatawarehouse_spark.operators.dedup_ops import (
        jaccard_pairs_arrays,
        shingle_arrays,
    )

    d = _t(spark, sf_dir, "documents")
    return jaccard_pairs_arrays(
        shingle_arrays(d, n=3), "doc_id", "shingle_arr", threshold=0.2,
        max_item_freq=1000,
    )


_JACCARD_08_PAIRS_SQL = r"""
    WITH sh AS (
      SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
           UNNEST(range(1, len(words) - 1)) t(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_1, id_2,
             round(i * 1.0 / (s1.n + s2.n - i), 6) AS jaccard
      FROM inter
      JOIN sz s1 ON s1.doc_id = id_1
      JOIN sz s2 ON s2.doc_id = id_2
      WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.8
    )
"""


@register(
    "q62_minhash_lsh",
    oracle=_JACCARD_08_PAIRS_SQL + "SELECT id_1, id_2, jaccard FROM pairs",
)
def q62_minhash_lsh(spark, sf_dir):
    """MinHash(k=32) + LSH(16 bands x 2 rows) candidate generation
    with exact-Jaccard verification at >= 0.8 — the full scale path
    (banded buckets, candidate-restricted verify: exact jaccard is
    computed ONLY for bucket-colliding pairs, never all pairs).

    Oracle-paired: the DuckDB oracle computes exact all-pairs jaccard
    >= 0.8, so a hash match proves LSH recall was 100%% on this
    corpus at this threshold. 16x2 banding makes that robust to
    boundary pairs on ANY corpus, not just this one: P(miss) per
    pair = (1-j^2)^16 <= 0.36^16 ~ 8e-8 at j=0.8 (the previous 8x4
    banding left ~1.5%% per-pair miss probability just above the
    threshold — a data-dependent gate risk, now closed). The seeded
    permutations keep the result deterministic, so the gate cannot
    flake. The signature-agreement ESTIMATE mode (verify='signature',
    the even cheaper path that never touches text again) keeps its
    accuracy bounds asserted in tests/test_dedup.py."""
    from citybikedatawarehouse_spark.operators.dedup_ops import minhash_lsh_dedup

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_dedup(d, threshold=0.8, verify="exact")


def _simhash_oracle_sql() -> str:
    """DuckDB replay of the md5-based SimHash: same word counts, same
    64 bit-sums (+cnt/-cnt by md5 bit), same sign fingerprint —
    then brute-force Hamming <= 3 over all pairs (fine for an oracle
    at sf0.01; the Spark side's banded join is the shape that
    scales). Generated programmatically: 64 bit-sum columns."""
    bit_sums = []
    for j in range(64):
        half, shift = ("hi", j - 32) if j >= 32 else ("lo", j)
        bit_sums.append(
            f"sum(CASE WHEN ({half} >> {shift}) & 1 = 1 "
            f"THEN cnt ELSE -cnt END) AS s_{j}"
        )
    fp_lo = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32)
    )
    fp_hi = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << (j - 32)} ELSE 0 END)"
        for j in range(32, 64)
    )
    return rf"""
    WITH w AS (
      SELECT doc_id, words[i] AS word
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents),
           UNNEST(range(1, len(words) + 1)) t(i)
      WHERE words[i] <> ''
    ),
    c AS (
      SELECT doc_id, word, count(*) AS cnt,
             ('0x' || substr(md5(word), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(word), 9, 8))::BIGINT AS lo
      FROM w GROUP BY doc_id, word
    ),
    s AS (SELECT doc_id, {", ".join(bit_sums)} FROM c GROUP BY doc_id),
    fp AS (SELECT doc_id, ({fp_lo})::BIGINT AS fp_lo, ({fp_hi})::BIGINT AS fp_hi FROM s)
    SELECT a.doc_id AS id_1, b.doc_id AS id_2,
           CAST(bit_count(xor(a.fp_lo, b.fp_lo))
                + bit_count(xor(a.fp_hi, b.fp_hi)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp_lo, b.fp_lo))
          + bit_count(xor(a.fp_hi, b.fp_hi)) <= 3
    """


@register("q63_simhash_neardup", oracle=_simhash_oracle_sql())
def q63_simhash_neardup(spark, sf_dir):
    """SimHash-64 near-dup pairs at Hamming <= 3 via 4x16-bit banded
    join (pigeonhole-complete at that radius: <= 3 differing bits
    across 4 blocks leaves at least one block equal, so the banded
    join provably misses nothing — which is exactly what the
    brute-force DuckDB oracle checks). Uses the md5-derived 64-bit
    word hash so both engines compute bit-identical fingerprints;
    cross-validated against exact Jaccard in tests/test_dedup.py."""
    from citybikedatawarehouse_spark.operators.dedup_ops import simhash_neardup_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_neardup_pairs(d, max_hamming=3, hash_fn="md5")


@register(
    "q64_dedup_clusters",
    oracle=(_JACCARD_08_PAIRS_SQL + """,
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    reach AS (  -- recursive transitive closure (tiny: dup clusters only)
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT d.doc_id,
           least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id,
           d.doc_id = least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS is_canonical
    FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
    GROUP BY d.doc_id
    """).replace("WITH sh AS", "WITH RECURSIVE sh AS", 1),
)
def q64_dedup_clusters(spark, sf_dir):
    """End-to-end dedup keep-list: MinHash-LSH near-dup pairs (exact-
    verified at >= 0.8, same pair set the q62 oracle proves complete)
    -> connected components via pointer-jumping label propagation ->
    canonical representative = min doc_id per cluster. The rows a
    training pipeline would KEEP are is_canonical=true.

    Oracle-paired: DuckDB computes the same components with a
    recursive-CTE transitive closure (closure size is bounded by dup
    clusters, which are tiny by construction; the Spark side's label
    propagation is the shape that scales instead)."""
    from citybikedatawarehouse_spark.operators.dedup_ops import (
        dedup_clusters,
        minhash_lsh_dedup,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(d, threshold=0.8, verify="exact")
    return dedup_clusters(d.select("doc_id"), pairs)


@register(
    "q69_decontaminate",
    oracle=r"""
    WITH bench AS (
      SELECT DISTINCT
             words[i] || ' ' || words[i+1] || ' ' || words[i+2]
             || ' ' || words[i+3] || ' ' || words[i+4] AS shingle
      FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents WHERE doc_id < 20),
           UNNEST(range(1, len(words) - 3)) t(i)
    ),
    corp AS (
      SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2]
             || ' ' || words[i+3] || ' ' || words[i+4] AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents WHERE doc_id >= 20),
           UNNEST(range(1, len(words) - 3)) t(i)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM corp JOIN bench USING (shingle)
    GROUP BY doc_id
    """,
)
def q69_decontaminate(spark, sf_dir):
    """Benchmark decontamination (the GPT-3-style n-gram overlap
    filter): flag every training document sharing at least one word
    5-gram with the held-out eval set (here: doc_id < 20 stands in
    for the benchmark suite). A training pipeline anti-joins this
    against the corpus before anything else ships.

    Scale shape: the eval suite's distinct shingles are BROADCAST
    (eval sets are thousands of docs); the 100 TB corpus is scanned
    once, never shuffled on text — the only exchange is the map-side-
    combined per-doc count of matching shingles."""
    from citybikedatawarehouse_spark.operators.dedup_ops import decontaminate

    d = _t(spark, sf_dir, "documents")
    return decontaminate(
        d.filter(F.col("doc_id") >= 20), d.filter(F.col("doc_id") < 20), n=5
    )


@register(
    "q150_cross_source_overlap",
    oracle=r"""
    WITH sh AS (
      SELECT DISTINCT source,
             md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                 || ' ' || words[i+3] || ' ' || words[i+4]) AS digest
      FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents),
           UNNEST(range(1, len(words) - 3)) t(i)
    ),
    shp AS (
      SELECT a.source AS source_1, b.source AS source_2,
             CAST(count(DISTINCT a.digest) AS BIGINT) AS n_shared_shingles
      FROM sh a JOIN sh b ON a.digest = b.digest AND a.source < b.source
      GROUP BY 1, 2
    ),
    dt AS (SELECT DISTINCT source, md5(text) AS digest FROM documents),
    dtp AS (
      SELECT a.source AS source_1, b.source AS source_2,
             CAST(count(DISTINCT a.digest) AS BIGINT) AS n_shared_texts
      FROM dt a JOIN dt b ON a.digest = b.digest AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT coalesce(s.source_1, t.source_1) AS source_1,
           coalesce(s.source_2, t.source_2) AS source_2,
           coalesce(s.n_shared_shingles, CAST(0 AS BIGINT))
             AS n_shared_shingles,
           coalesce(t.n_shared_texts, CAST(0 AS BIGINT)) AS n_shared_texts
    FROM shp s FULL JOIN dtp t
      ON s.source_1 = t.source_1 AND s.source_2 = t.source_2
    """,
)
def q150_cross_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix at TWO granularities: for
    every source pair, how many distinct word-5-gram shingles the two
    feeds share (the n-gram-level contamination signal q69's
    decontaminator keys on) and how many distinct full document texts
    appear verbatim in both (mirror / re-crawl detection). The audit
    decides dedup ORDER (dedup the pair with the largest overlap
    first). Complements q116 (within-source dup rate) and q89
    (train/eval split leakage).

    The shingle level is what makes the audit NON-VACUOUS on real
    feeds: distinct crawls rarely share byte-identical documents but
    always share boilerplate n-grams (round-5 ADVICE: the exact-text-
    only variant returned zero rows at every shipped scale, so the
    overlap join had never executed — the planted-duplicate model
    test in tests/test_dedup.py now covers the exact-text path).

    Scale shape: one corpus scan builds distinct (source, digest)
    shingle pairs — 32-byte digests, never text (q60's rule) — then
    digest-keyed self-joins whose per-digest fan-out is bounded by
    the source count, not the corpus; the final matrix is
    O(sources^2) rows."""
    from citybikedatawarehouse_spark.operators.dedup_ops import shingles

    d = _t(spark, sf_dir, "documents")
    sh = (
        shingles(
            d.select(F.col("source").alias("sid"), "text"),
            n=5,
            id_col="sid",
            text_col="text",
        )
        .select(F.col("sid").alias("source"), F.md5("shingle").alias("digest"))
        .distinct()
    )

    def pair_matrix(ds, out_col):
        a = ds.select("digest", F.col("source").alias("source_1"))
        b = ds.select("digest", F.col("source").alias("source_2"))
        return (
            a.join(b, "digest")
            .filter(F.col("source_1") < F.col("source_2"))
            .groupBy("source_1", "source_2")
            .agg(F.count_distinct("digest").alias(out_col))
        )

    shp = pair_matrix(sh, "n_shared_shingles")
    dt = d.select("source", F.md5("text").alias("digest")).distinct()
    dtp = pair_matrix(dt, "n_shared_texts")
    return (
        shp.join(dtp, ["source_1", "source_2"], "full_outer")
        .select(
            "source_1",
            "source_2",
            F.coalesce("n_shared_shingles", F.lit(0).cast("bigint")).alias(
                "n_shared_shingles"
            ),
            F.coalesce("n_shared_texts", F.lit(0).cast("bigint")).alias(
                "n_shared_texts"
            ),
        )
    )


@register(
    "q155_multisignal_dedup_audit",
    oracle=_JACCARD_08_PAIRS_SQL + """,
    planes AS (
      SELECT p, d,
             CASE WHEN ('0x' || substr(sha256('plane:' || p || ':dim:' || d), 1, 2))::INT % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS sgn
      FROM range(0, 32) t1(p) CROSS JOIN range(0, 64) t2(d)
    ),
    dots AS (
      SELECT e.vec_id, pl.p,
             round(sum(CAST(e.embedding[pl.d + 1] AS DOUBLE) * pl.sgn), 6) AS dot
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY 1, 2
    ),
    sigs AS (
      SELECT vec_id, p // 8 AS tbl,
             CAST(sum(CASE WHEN dot > 0 THEN power(2, p % 8) ELSE 0 END) AS BIGINT) AS sig
      FROM dots GROUP BY 1, 2
    ),
    capped_sigs AS (
      SELECT vec_id, tbl, sig FROM (
        SELECT vec_id, tbl, sig,
               row_number() OVER (PARTITION BY tbl, sig
                                  ORDER BY vec_id) AS rn
        FROM sigs
      ) WHERE rn <= 64
    ),
    scand AS (
      SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
      FROM capped_sigs a JOIN capped_sigs b
        ON a.tbl = b.tbl AND a.sig = b.sig
      WHERE a.vec_id < b.vec_id
    ),
    sem AS (
      SELECT id_1, id_2 FROM (
        SELECT sc.id_1, sc.id_2,
               round(sum(ae * be) / (sqrt(sum(ae * ae)) * sqrt(sum(be * be))), 6) AS cos_sim
        FROM (
          SELECT sc.id_1, sc.id_2,
                 CAST(unnest(a.embedding) AS DOUBLE) AS ae,
                 CAST(unnest(b.embedding) AS DOUBLE) AS be
          FROM scand sc
          JOIN embeddings a ON a.vec_id = sc.id_1
          JOIN embeddings b ON b.vec_id = sc.id_2
        ) sc GROUP BY 1, 2
      ) WHERE cos_sim >= 0.95
    ),
    cls AS (
      SELECT CASE
               WHEN l.id_1 IS NOT NULL AND s.id_1 IS NOT NULL THEN 'both'
               WHEN l.id_1 IS NOT NULL THEN 'lexical_only'
               ELSE 'semantic_only'
             END AS signal
      FROM (SELECT id_1, id_2 FROM pairs) l
      FULL JOIN sem s ON l.id_1 = s.id_1 AND l.id_2 = s.id_2
    )
    SELECT signal, count(*) AS n_pairs FROM cls GROUP BY signal
    """,
)
def q155_multisignal_dedup_audit(spark, sf_dir):
    """Multi-signal dedup agreement audit: the LEXICAL near-dup pair
    set (MinHash-LSH, exact-verified Jaccard ≥ 0.8 — q62's complete
    pairs) against the SEMANTIC pair set (hyperplane-LSH bucket
    candidates, exact-verified cosine ≥ 0.95 — q72's deterministic
    planes over the row-aligned embeddings), classified
    both / lexical_only / semantic_only. The calibration view that
    decides whether a corpus needs BOTH dedup passes: lexical_only =
    paraphrase-resistant copies the embedding missed; semantic_only
    = near-paraphrases string methods cannot see. Both sides carry
    their bucket caps (64 per semantic (table, signature) bucket —
    deterministic lowest-id survivors, replayed in the oracle).

    Oracle: both candidate generators replay end-to-end (exact
    all-pairs Jaccard; sha256 planes + buckets + cosine re-verify),
    then the same full-outer classification. Scale shape: each side
    keeps its own discipline (shingle/bucket caps, digest-only
    shuffles); the audit join runs on pair relations, not corpora."""
    from citybikedatawarehouse_spark.operators.dedup_ops import minhash_lsh_dedup
    from citybikedatawarehouse_spark.functions.vectors import cosine_hoisted, norm
    from citybikedatawarehouse_spark.operators.similarity_ops import (
        with_lsh_signatures,
    )

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = minhash_lsh_dedup(d, threshold=0.8, verify="exact").select(
        "id_1", "id_2"
    )
    from pyspark.sql import Window as _W

    banded = with_lsh_signatures(emb).select(
        "vec_id",
        F.col("embedding").alias("__v"),
        norm("embedding").alias("__n"),
        F.posexplode("lsh_sigs").alias("tbl", "sig"),
    )
    # bucket-size cap (the LSH discipline, q62's rule): one hot
    # bucket must not go quadratic; deterministic lowest-id members
    # survive, identically in the oracle
    w_cap = _W.partitionBy("tbl", "sig").orderBy("vec_id")
    banded = (
        banded.withColumn("__rn", F.row_number().over(w_cap))
        .filter(F.col("__rn") <= 64)
        .drop("__rn")
    )
    a = banded.select(
        F.col("vec_id").alias("id_1"),
        F.col("__v").alias("__av"),
        F.col("__n").alias("__an"),
        "tbl",
        "sig",
    )
    b = banded.select(
        F.col("vec_id").alias("id_2"),
        F.col("__v").alias("__bv"),
        F.col("__n").alias("__bn"),
        "tbl",
        "sig",
    )
    sem = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .dropDuplicates(["id_1", "id_2"])
        .select(
            "id_1",
            "id_2",
            F.round(
                cosine_hoisted("__av", "__bv", "__an", "__bn"), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.95)
        .select("id_1", "id_2")
    )
    l = lex.select("id_1", "id_2", F.lit(True).alias("__lex"))
    s = sem.select(
        F.col("id_1").alias("sid_1"),
        F.col("id_2").alias("sid_2"),
        F.lit(True).alias("__sem"),
    )
    cls = l.join(
        s, (l.id_1 == s.sid_1) & (l.id_2 == s.sid_2), "full"
    ).select(
        F.when(
            F.col("__lex").isNotNull() & F.col("__sem").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("__lex").isNotNull(), F.lit("lexical_only"))
        .otherwise(F.lit("semantic_only"))
        .alias("signal")
    )
    return cls.groupBy("signal").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "q161_cluster_safe_split",
    oracle=(_JACCARD_08_PAIRS_SQL + """,
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    reach AS (  -- recursive transitive closure (tiny: dup clusters only)
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    clusters AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
      GROUP BY d.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN tick < 90 THEN 'train'
                WHEN tick < 95 THEN 'valid'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, cluster_id,
             ('0x' || substr(md5('csplit:' || cluster_id), 1, 8))::BIGINT
               % 100 AS tick
      FROM clusters
    )
    """).replace("WITH sh AS", "WITH RECURSIVE sh AS", 1),
)
def q161_cluster_safe_split(spark, sf_dir):
    """LEAKAGE-SAFE train/valid/test split: the 90/5/5 md5 rule of
    q84, keyed on the DUP-CLUSTER canonical id instead of the doc id
    — every document inherits its near-dup cluster's split, so two
    near-duplicates can never straddle a split boundary (the failure
    q89's leakage AUDIT detects after the fact, prevented by
    construction). The q64 component chain supplies the clusters;
    singleton docs are their own cluster and split exactly as q84
    would.

    Scale shape: q64's cost profile (LSH + pointer-jumping over the
    dup graph, corpus joined once) plus a pure per-row md5 map — the
    split assignment itself adds ZERO shuffles."""
    from citybikedatawarehouse_spark.operators.dedup_ops import (
        dedup_clusters,
        minhash_lsh_dedup,
    )
    from citybikedatawarehouse_spark.plans.curation import _md5_tick

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(d, threshold=0.8, verify="exact")
    clusters = dedup_clusters(d.select("doc_id"), pairs)
    tick = _md5_tick("csplit:", "cluster_id", 100)
    split = (
        F.when(tick < 90, "train").when(tick < 95, "valid").otherwise("test")
    )
    return clusters.select("doc_id", "cluster_id", split.alias("split"))


@register(
    "q163_cdc_chunk_dedup",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, i, words[i] AS word,
             CASE WHEN ('0x' || substr(md5(words[i]), 1, 8))::BIGINT % 16 = 0
                  THEN 1 ELSE 0 END AS cut
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
            FROM documents WHERE trim(text) <> ''),
           UNNEST(range(1, len(words) + 1)) t(i)
    ),
    ch AS (
      SELECT doc_id, word, i,
             sum(cut) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS chunk_no
      FROM w
    ),
    chunks AS (
      SELECT doc_id, coalesce(chunk_no, 0) AS chunk_no,
             md5(string_agg(word, ' ' ORDER BY i)) AS chunk_digest,
             count(*) AS n_words
      FROM ch GROUP BY 1, 2
    )
    SELECT chunk_digest,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           min(doc_id) AS canonical_doc_id,
           CAST(min(n_words) AS BIGINT) AS n_words
    FROM chunks
    GROUP BY chunk_digest
    HAVING count(DISTINCT doc_id) > 1
    """,
)
def q163_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined chunking (CDC) dedup: chunk boundaries are cut
    AFTER any word whose md5 lands in 1/16 of hash space, so
    boundaries are a pure function of local CONTENT — inserting or
    deleting words early in a document shifts no distant boundary
    (the property fixed-size chunking (q112/q124) lacks, and the
    reason backup systems and SlimPajama-style pipelines chunk this
    way). Chunks repeated across documents are reported with their
    spread — the partial-overlap dedup signal exact (q60) and
    near-dup (q62) document-level passes both miss when two docs
    share a long passage at different offsets.

    Expected chunk length is the 16-word geometric mean under the
    1/16 cut rate. Scale shape: one corpus scan; the boundary flag
    and running chunk number are narrow per-doc window work riding a
    single doc-keyed exchange; the cross-doc aggregate shuffles
    32-byte chunk digests only (q60's rule), never chunk text."""
    d = _t(spark, sf_dir, "documents")
    w = (
        d.filter(F.trim("text") != "")
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("i", "word"),
        )
        .withColumn(
            "cut",
            (
                F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
                % 16
                == 0
            ).cast("int"),
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = w.withColumn(
        "chunk_no", F.coalesce(F.sum("cut").over(win), F.lit(0))
    )
    chunks = (
        ch.groupBy("doc_id", "chunk_no")
        .agg(
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(F.struct("i", "word"))
                    ).getField("word"),
                    " ",
                )
            ).alias("chunk_digest"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
    return (
        chunks.groupBy("chunk_digest")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.min("n_words").cast("bigint").alias("n_words"),
        )
        .filter(F.col("n_docs") > 1)
    )


@register(
    "q182_ngram_containment",
    oracle=r"""
    WITH sh AS (
      SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
           UNNEST(range(1, len(words) - 1)) t(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_1, id_2,
           round(i * 1.0 / least(s1.n, s2.n), 6) AS containment
    FROM inter
    JOIN sz s1 ON s1.doc_id = id_1
    JOIN sz s2 ON s2.doc_id = id_2
    WHERE i * 1.0 / least(s1.n, s2.n) >= 0.6
    """,
)
def q182_ngram_containment(spark, sf_dir):
    """Asymmetric near-dup pairs by 3-gram CONTAINMENT >= 0.6
    (|A∩B| / min(|A|,|B|)): the excerpt/quote/boilerplate-wrapper
    detector. A 50-shingle snippet verbatim inside a 5000-shingle
    page scores containment 1.0 but Jaccard 0.01 — q61's symmetric
    gate (and MinHash, which estimates Jaccard) structurally cannot
    see it, which is why web-corpus pipelines run both.

    Same single-scan inverted-index plan as q61 (shared operator,
    ``metric="containment"``): carried set sizes, one
    repartition(__item) exchange reused by the hot-shingle cap and
    the posting-list build; only the final per-pair expression
    differs."""
    from citybikedatawarehouse_spark.operators.dedup_ops import (
        jaccard_pairs_arrays,
        shingle_arrays,
    )

    d = _t(spark, sf_dir, "documents")
    return jaccard_pairs_arrays(
        shingle_arrays(d, n=3), "doc_id", "shingle_arr", threshold=0.6,
        max_item_freq=1000, metric="containment",
    )


@register(
    "q194_quality_canonicals",
    oracle=(_JACCARD_08_PAIRS_SQL + """,
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    cl AS (
      SELECT d.doc_id, d.n_chars,
             least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
      GROUP BY d.doc_id, d.n_chars
    )
    SELECT doc_id, cluster_id, CAST(n_chars AS BIGINT) AS n_chars,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id) = 1 AS is_kept
    FROM cl
    """).replace("WITH sh AS", "WITH RECURSIVE sh AS", 1),
)
def q194_quality_canonicals(spark, sf_dir):
    """Dedup canonicalization by QUALITY POLICY: within each near-dup
    cluster (q64's exact LSH→components chain) the kept document is
    the LONGEST member (n_chars, doc_id tie-break) rather than the
    lowest id — the RefinedWeb-style "keep the richest copy" rule
    that preserves the most content when near-dups differ by
    truncation. Every doc reports its cluster and keep flag, so the
    filter is one boolean predicate downstream.

    Scale shape: the cluster stage is q64's (digest-bounded pair
    volume, pointer-jumping components over the dup graph only);
    the policy adds ONE cluster-keyed window over the cluster
    membership relation — O(docs) rows, trivially partitioned.
    Swapping the ORDER BY swaps the policy (quality score, source
    priority, recency) with no other change."""
    from citybikedatawarehouse_spark.operators.dedup_ops import (
        dedup_clusters,
        minhash_lsh_dedup,
    )
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(d, threshold=0.8, verify="exact")
    cl = dedup_clusters(d.select("doc_id"), pairs).select(
        "doc_id", "cluster_id"
    )
    j = cl.join(d.select("doc_id", "n_chars"), "doc_id")
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "doc_id")
    return j.select(
        "doc_id",
        "cluster_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


@register(
    "q201_dup_cluster_census",
    oracle=(_JACCARD_08_PAIRS_SQL + """,
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    cl AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
      GROUP BY d.doc_id
    ),
    sizes AS (
      SELECT cluster_id, count(*) AS sz FROM cl GROUP BY cluster_id
    ),
    alpha AS (
      SELECT 1.0 + count(*) / sum(ln(sz / 1.5)) AS a_hat
      FROM sizes WHERE sz >= 2
    ),
    tot AS (SELECT count(*) AS n_docs FROM cl)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           round(sz * count(*) * 1.0 / (SELECT n_docs FROM tot), 6)
             AS pct_of_docs,
           round((SELECT a_hat FROM alpha), 6) AS alpha_hat
    FROM sizes GROUP BY sz
    """).replace("WITH sh AS", "WITH RECURSIVE sh AS", 1),
)
def q201_dup_cluster_census(spark, sf_dir):
    """Dup-cluster size census: the distribution every dedup run
    should publish before anyone trusts its keep-rate — how many
    singletons, pairs, triples…, what fraction of the corpus sits in
    each size, and the MLE power-law exponent of the duplicated tail
    (continuous approximation with x_min = 2:
    α̂ = 1 + n / Σ ln(size / 1.5), Clauset-Shalizi-Newman 2009). A
    web-scale corpus whose α̂ drifts down release-over-release is
    growing mega-clusters — the early-warning signal for template
    spam that per-pair thresholds cannot see.

    Scale shape: q64's cluster chain, then O(clusters) rows for the
    size census, the 1-row α̂ aggregate, and the histogram — nothing
    corpus-scale past the components stage."""
    from citybikedatawarehouse_spark.operators.dedup_ops import (
        dedup_clusters,
        minhash_lsh_dedup,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(d, threshold=0.8, verify="exact")
    cl = dedup_clusters(d.select("doc_id"), pairs).select(
        "doc_id", "cluster_id"
    )
    sizes = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("sz")
    ).localCheckpoint(eager=True)  # O(clusters) rows, three consumers
    alpha = sizes.where(F.col("sz") >= 2).agg(
        (
            F.lit(1.0)
            + F.count(F.lit(1)) / F.sum(F.log(F.col("sz") / F.lit(1.5)))
        ).alias("a_hat")
    )
    tot = cl.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sizes.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(alpha))
        .select(
            F.col("sz").cast("bigint").alias("cluster_size"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            F.round(
                F.col("sz") * F.col("n_clusters") * F.lit(1.0) / F.col("n_docs"),
                6,
            ).alias("pct_of_docs"),
            F.round(F.col("a_hat"), 6).alias("alpha_hat"),
        )
    )


# ---------------------------------------------------------------------------
# q212 — sorted-neighborhood (SNM) near-dup candidates
# ---------------------------------------------------------------------------

@register(
    "q212_sorted_neighborhood",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             list_distinct(
               regexp_split_to_array(trim(lower(text)), '\s+')) AS ws,
             lower(regexp_split_to_array(trim(text), '\s+')[1]) AS blk,
             lower(trim(text)) AS skey
      FROM documents
    ),
    nbr AS (
      SELECT doc_id, ws,
             lead(doc_id, 1) OVER w AS n1_id, lead(ws, 1) OVER w AS n1_ws,
             lead(doc_id, 2) OVER w AS n2_id, lead(ws, 2) OVER w AS n2_ws
      FROM d WINDOW w AS (PARTITION BY blk ORDER BY skey, doc_id)
    ),
    cand AS (
      SELECT least(doc_id, n1_id) AS id_1, greatest(doc_id, n1_id) AS id_2,
             len(list_intersect(ws, n1_ws)) AS i,
             len(ws) + len(n1_ws) AS u2
      FROM nbr WHERE n1_id IS NOT NULL
      UNION ALL
      SELECT least(doc_id, n2_id), greatest(doc_id, n2_id),
             len(list_intersect(ws, n2_ws)), len(ws) + len(n2_ws)
      FROM nbr WHERE n2_id IS NOT NULL
    )
    SELECT id_1, id_2, round(i * 1.0 / (u2 - i), 6) AS jaccard
    FROM cand WHERE i * 1.0 / (u2 - i) >= 0.2
    """,
)
def q212_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood (Hernandez-Stolfo SNM) near-dup candidates:
    sort documents by a normalized key (lowercased text) inside a
    blocking partition (first word), slide a window of w=2 successors,
    and score ONLY the adjacent pairs — word-set Jaccard >= 0.2. The
    third blocking family beside the inverted shingle index (q61) and
    MinHash banding (q62): SNM finds prefix-preserving edits (same
    opening, divergent tails) at O(N log N + N*w) comparisons and is
    the standard entity-resolution pass when records have a natural
    sort key (names, addresses, near-identical boilerplate openings).

    Determinism: both engines sort by binary UTF-8 (skey, doc_id), so
    the neighbor lists — and hence the candidate set — are identical;
    the similarity is pure set arithmetic on split words.

    Scale shape: ONE range shuffle (the sort) and window fan-out
    exactly w rows per doc — candidate volume is w*N by construction,
    never data-dependent (the property that makes SNM attractive when
    a hot shingle would blow up an inverted index). Blocking by first
    word caps every sort partition at the block size; at web scale
    the block key doubles as the range-partitioning key so each
    executor sorts only its blocks. The window cost is the whole
    method: pairs the sort does NOT bring within w rows are missed by
    design (recall comes from running multiple passes with different
    keys); the oracle replays the identical single-pass definition."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(
            F.split(F.trim(F.lower("text")), r"\s+")
        ).alias("ws"),
        F.lower(
            F.split(F.trim("text"), r"\s+").getItem(0)
        ).alias("blk"),
        F.lower(F.trim("text")).alias("skey"),
    )
    w = Window.partitionBy("blk").orderBy("skey", "doc_id")
    nbr = d.select(
        "doc_id",
        "ws",
        F.lead("doc_id", 1).over(w).alias("n1_id"),
        F.lead("ws", 1).over(w).alias("n1_ws"),
        F.lead("doc_id", 2).over(w).alias("n2_id"),
        F.lead("ws", 2).over(w).alias("n2_ws"),
    )

    def pairs(nid, nws):
        return (
            nbr.where(F.col(nid).isNotNull())
            .select(
                F.least("doc_id", nid).alias("id_1"),
                F.greatest("doc_id", nid).alias("id_2"),
                F.size(F.array_intersect("ws", nws)).alias("i"),
                (F.size("ws") + F.size(nws)).alias("u2"),
            )
        )

    cand = pairs("n1_id", "n1_ws").unionAll(pairs("n2_id", "n2_ws"))
    jac = F.col("i") * F.lit(1.0) / (F.col("u2") - F.col("i"))
    return cand.where(jac >= 0.2).select(
        "id_1", "id_2", F.round(jac, 6).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# q245 — Bloom-filter decontamination screen (membership sketch)
# ---------------------------------------------------------------------------

_BLOOM_M = 32768
_BLOOM_K = 2


@register(
    "q245_bloom_screen",
    oracle=rf"""
    WITH docs AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
      FROM documents
    ),
    bench AS (
      SELECT DISTINCT words[i] || ' ' || words[i+1] || ' ' || words[i+2]
             || ' ' || words[i+3] || ' ' || words[i+4] AS sh
      FROM docs, UNNEST(range(1, len(words) - 3)) t(i)
      WHERE doc_id < 20
    ),
    train_sh AS (
      SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2]
             || ' ' || words[i+3] || ' ' || words[i+4] AS sh
      FROM docs, UNNEST(range(1, len(words) - 3)) t(i)
      WHERE doc_id >= 20
    ),
    bits AS MATERIALIZED (
      SELECT DISTINCT t.j,
             ('0x' || substr(md5('bloom' || t.j || ':' || b.sh), 1, 8))::BIGINT
               % {_BLOOM_M} AS bit
      FROM bench b CROSS JOIN UNNEST(range(0, {_BLOOM_K})) t(j)
    ),
    probes AS (
      SELECT ts.doc_id, ts.sh, t.j,
             ('0x' || substr(md5('bloom' || t.j || ':' || ts.sh), 1, 8))::BIGINT
               % {_BLOOM_M} AS bit
      FROM train_sh ts CROSS JOIN UNNEST(range(0, {_BLOOM_K})) t(j)
    ),
    flagged AS (
      SELECT DISTINCT doc_id FROM (
        SELECT p.doc_id, p.sh
        FROM probes p JOIN bits b ON b.j = p.j AND b.bit = p.bit
        GROUP BY p.doc_id, p.sh HAVING count(*) = {_BLOOM_K}
      )
    ),
    truth AS (
      SELECT DISTINCT t.doc_id FROM train_sh t JOIN bench b ON b.sh = t.sh
    )
    SELECT CAST((SELECT count(DISTINCT doc_id) FROM train_sh) AS BIGINT)
             AS n_train_docs,
           CAST((SELECT count(*) FROM flagged) AS BIGINT) AS n_flagged,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_overlaps,
           CAST((SELECT count(*) FROM flagged)
                - (SELECT count(*) FROM truth) AS BIGINT) AS n_false_pos,
           round(((SELECT count(*) FROM flagged)
                  - (SELECT count(*) FROM truth)) * 1.0
                 / (SELECT count(DISTINCT doc_id) FROM train_sh), 6)
             AS fp_rate
    """,
)
def q245_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination screen — the membership sketch
    completing the trio beside count-min (q243, frequency) and HLL
    (q244, cardinality): build a 32768-bit / 2-hash Bloom filter
    over the evaluation benchmark's 5-gram shingles (doc_id < 20,
    q69's cohort and shingle definition) and flag every training
    document carrying at least one shingle whose bits are all set.
    Bloom has NO false negatives — flagged ⊇ the exact q69 overlap
    set, the property that makes it safe as a decontamination
    PRE-filter (only flagged docs need the exact check) — and the
    report measures the false-positive cost of that guarantee
    against the exact shingle join (~4% of docs at these
    parameters; m/k chosen so BOTH true overlaps and false
    positives are non-empty at every shipped SF — a 0-row sketch
    audit proves nothing).

    Scale shape: the filter is <= |eval shingles| x 2 DISTINCT bit
    rows — broadcast no matter how big eval grows in documents
    (bits saturate at m); the probe is one training scan's shingle
    explode joined against those broadcast bits; the exact join in
    production runs ONLY on the flagged subset. Bits are an
    OR-monoid: per-epoch slices union losslessly (the same contract
    as the CMS/HLL streaming twins)."""
    from citybikedatawarehouse_spark.functions.keys import bloom_bit
    from citybikedatawarehouse_spark.operators.dedup_ops import shingles

    from pyspark import StorageLevel

    d = _t(spark, sf_dir, "documents")
    # sh feeds bench, probes, truth, and the doc census — serialized
    # persist collapses 5 corpus scans to 1 (corpus-sized relation:
    # persist, never localCheckpoint — the measured OOM mode)
    sh = (
        shingles(d, n=5)
        .select("doc_id", F.col("shingle").alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bench = sh.where(F.col("doc_id") < 20).select("sh").distinct()
    train_sh = sh.where(F.col("doc_id") >= 20)
    ks = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("j"))
    bits = (
        bench.crossJoin(F.broadcast(ks))
        .select("j", bloom_bit(F.col("j"), F.col("sh"), _BLOOM_M).alias("bit"))
        .distinct()
    )
    probes = train_sh.crossJoin(F.broadcast(ks)).select(
        "doc_id", "sh", "j",
        bloom_bit(F.col("j"), F.col("sh"), _BLOOM_M).alias("bit"),
    )
    flagged = (
        probes.join(F.broadcast(bits), ["j", "bit"])
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("nb"))
        .where(F.col("nb") == _BLOOM_K)
        .select("doc_id")
        .distinct()
    )
    truth = (
        train_sh.join(
            F.broadcast(bench.select(F.col("sh").alias("bsh"))),
            train_sh.sh == F.col("bsh"),
            "left_semi",
        )
        .select("doc_id")
        .distinct()
    )
    n_docs = train_sh.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    n_flagged = flagged.agg(F.count(F.lit(1)).alias("f"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("t"))
    return (
        n_docs.crossJoin(F.broadcast(n_flagged))
        .crossJoin(F.broadcast(n_truth))
        .select(
            F.col("n").cast("bigint").alias("n_train_docs"),
            F.col("f").cast("bigint").alias("n_flagged"),
            F.col("t").cast("bigint").alias("n_true_overlaps"),
            (F.col("f") - F.col("t")).cast("bigint").alias("n_false_pos"),
            F.round((F.col("f") - F.col("t")) * 1.0 / F.col("n"), 6).alias(
                "fp_rate"
            ),
        )
    )
