"""Near-duplicate detection operators (north-star extension).

Four families, all expressed as compositions of built-in DataFrame
ops (no Python in the hot path — every hash/min/band is a Catalyst
expression, so the whole pipeline is shuffle-bounded, not CPU-bound):

  * exact: hash-groupBy on a content digest (plans/dedup.py q60)
  * n-gram Jaccard: inverted shingle index self-join — exact
    similarity, no candidate misses; cost bounded by shingle
    frequency (hot-shingle cap for skew at scale)
  * MinHash + LSH: k permutation-min signatures -> banded bucket
    join -> exact-Jaccard verification of candidates only.
    Deterministic: permutation params from a fixed seed, word hashes
    via xxhash64.
  * SimHash: 64-bit sign-aggregate fingerprint + banded Hamming
    candidate join (4x16-bit blocks: Hamming<=3 implies >=1 equal
    block — pigeonhole, no candidate misses at that radius).

Scale notes: every self-join here joins on a *derived small key*
(shingle hash, band hash, 16-bit block), never on raw text; the
explode fan-out is the dominant cost and is linear in corpus token
count. Hot keys (stop-shingles) are the skew risk — ``max_shingle_freq``
drops them (standard practice; biases Jaccard at most by the dropped
share).
"""

from __future__ import annotations

import random

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.textfns import words

MERSENNE31 = 2_147_483_647  # 2^31 - 1


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small single-file inputs scan as one partition, which strands
    CPU-heavy narrow transforms (regexp tokenize, shingle explode) on
    one core. Repartition up to the cluster's default parallelism
    when the scan is too coarse — a no-op on well-partitioned data at
    scale (measured locally: 7.4 s -> sub-second shingle build at
    sf0.1)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def doc_words(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id, word) pairs — the set representation."""
    return (
        _ensure_parallelism(docs)
        .select(id_col, F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )


def _tokens_projection(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __w token array) — the token array lives in its OWN
    projection: expressions inside higher-order-function lambdas are
    not subexpression-eliminated, so an inline split re-runs the regex
    for every element_at access (measured 2.3x slower at sf0.1). The
    optimizer keeps the two projections separate because inlining
    would duplicate a non-cheap expression."""
    return _ensure_parallelism(docs).select(
        id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("__w")
    )


def _shingle_expr(n: int):
    """Distinct n-gram array over the ``__w`` token column."""
    w = F.col("__w")
    # empty index list for docs shorter than n words (sequence() would
    # otherwise count downward and fabricate indices)
    idx = F.when(F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return F.array_distinct(sh)


def shingle_arrays(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct word n-gram shingles per document, as one array row
    per document (``(id, shingle_arr)``). The array form is the
    preferred input to :func:`jaccard_pairs_arrays` — the set size is
    ``size(shingle_arr)``, a narrow expression, so the pipeline never
    needs a per-document aggregation to learn it. Docs shorter than n
    words get an empty array (the index sequence is empty, so no ''
    placeholder ever enters the set)."""
    return _tokens_projection(docs, id_col, text_col).select(
        id_col, _shingle_expr(n).alias("shingle_arr")
    )


def shingles(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct word n-gram shingles per document (exploded form).

    Kept as explode-then-filter rather than exploding a pre-cleaned
    array: wrapping the shingle array in another array op before the
    explode de-optimizes the Generate pipeline (measured ~4x at
    sf0.1), while a post-explode filter fuses into codegen."""
    return (
        _tokens_projection(docs, id_col, text_col)
        .select(id_col, F.explode(_shingle_expr(n)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def jaccard_pairs(
    sets: DataFrame,
    id_col: str,
    item_col: str,
    threshold: float,
    max_item_freq: int | None = None,
    hash_items: bool = True,
) -> DataFrame:
    """Exact pairwise Jaccard >= threshold via inverted-index
    self-join on the item (shingle/word). Returns (id_1, id_2,
    jaccard) with id_1 < id_2.

    ``max_item_freq`` drops items appearing in more than that many
    sets before the join — the skew guard for web-scale corpora.

    ``hash_items`` replaces the item string with xxhash64 before the
    join: the shuffle and join keys become 8-byte longs instead of
    arbitrary-length text (collision odds ~n^2/2^64 — immaterial),
    cutting shuffle bytes and comparison cost. Jaccard values are
    unchanged (hashing preserves set distinctness).

    Takes the EXPLODED (id, item) relation; when the caller holds the
    per-set array form, :func:`jaccard_pairs_arrays` is strictly
    cheaper (narrow set sizes, no sizes shuffle or joins).
    """
    if hash_items:
        sets = sets.withColumn(item_col, F.xxhash64(F.col(item_col)))
    # Build the inverted index (posting list per item) with ONE
    # shuffle of the set relation, then derive BOTH the pair counts
    # and the per-set sizes from it — set sizes re-explode the index
    # (cheap: hashed longs, post-aggregation cardinality) instead of
    # rescanning + re-tokenizing the input, and the two consumers
    # share the shuffle via ReusedExchange. The old a><b self-join
    # recomputed and shuffled the set relation three times.
    if max_item_freq is None:
        grouped = sets.groupBy(item_col).agg(F.collect_list(id_col).alias("__ids"))
        sizes = (
            grouped.select(F.explode("__ids").alias(id_col))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__size"))
        )
        buckets = grouped
    else:
        # Capped path: pre-filter hot items with a plain count BEFORE
        # collecting ids, so no aggregation buffer ever holds a
        # web-scale posting list. Sizes must still count the FULL set
        # (the cap only prunes candidate generation, not the Jaccard
        # denominator), so they come from the unfiltered relation.
        sizes = sets.groupBy(id_col).agg(F.count(F.lit(1)).alias("__size"))
        freq = sets.groupBy(item_col).agg(F.count(F.lit(1)).alias("__freq"))
        kept = sets.join(
            freq.filter(F.col("__freq") <= max_item_freq).select(item_col), item_col
        )
        buckets = kept.groupBy(item_col).agg(F.collect_list(id_col).alias("__ids"))
    # Emit each bucket's id pairs from the collected array — narrow,
    # no join. Per-bucket work is quadratic in posting-list length,
    # which max_item_freq bounds.
    ids = F.array_sort(F.col("__ids"))
    pair_array = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_1"), y.alias("id_2")),
            ),
        )
    )
    inter = (
        buckets.select(F.explode(pair_array).alias("__p"))
        .select("__p.id_1", "__p.id_2")
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("id_1"), F.col("__size").alias("__n1"))
    s2 = sizes.select(F.col(id_col).alias("id_2"), F.col("__size").alias("__n2"))
    return (
        inter.join(s1, "id_1")
        .join(s2, "id_2")
        .select(
            "id_1",
            "id_2",
            F.round(
                F.col("__inter")
                / (F.col("__n1") + F.col("__n2") - F.col("__inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_arrays(
    arrays: DataFrame,
    id_col: str,
    items_col: str,
    threshold: float,
    max_item_freq: int | None = None,
    hash_items: bool = True,
    metric: str = "jaccard",
) -> DataFrame:
    """:func:`jaccard_pairs` over the per-set ARRAY representation
    (``(id, array<item>)``, items distinct within a set) — the
    preferred entry point when the caller builds sets itself (e.g.
    :func:`shingle_arrays`).

    The set size is ``size(array)`` — a narrow projection — and it is
    CARRIED through the explode as an 8-byte column, so the Jaccard
    denominator arrives at the pair aggregation for free. Compared to
    the exploded-input path this deletes three plan nodes that all
    scale with corpus size: the per-id sizes shuffle and the two
    pair->size joins.

    Shuffle budget with the cap on: the exploded relation is
    explicitly ``repartition(__item)``-ed ONCE and that exchange is
    shared (ReusedExchange) by both consumers — the hot-item
    detection aggregate and the posting-list build — so the
    shingle+hash pass runs once and the occurrence rows cross the
    wire once. The hot set (items with freq > cap) is removed with a
    broadcast LEFT ANTI join: its size is bounded by
    total_occurrences / cap and Zipfian shingle frequency makes it a
    handful of stopword shingles in practice, so the broadcast is
    always tiny. (The previous shape — inner join against the
    freq<=cap item list — planned the frequency aggregate and the
    join as two independent subtrees, re-running the shingle pass
    twice: measured +0.45 s at sf0.1, and at 100 TB a second full
    corpus scan.) Critically, the carried size is computed BEFORE the
    hot-item cap filter, so capping prunes candidate generation but
    never the denominator (same semantics as `jaccard_pairs`).

    ``metric``: ``"jaccard"`` (default) scores |A∩B| / |A∪B|;
    ``"containment"`` scores |A∩B| / min(|A|, |B|) — the asymmetric
    signal that catches a short document fully CONTAINED in a long
    one (quotes, excerpts, boilerplate wrappers), where Jaccard is
    diluted by the length gap. Identical single-scan plan either
    way; only the final per-pair expression changes.
    """
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric: {metric!r}")
    items = F.col(items_col)
    # Hash INSIDE the explode and size the RAW array: a shared
    # transformed-array reference from both size() and explode()
    # defeats the Generate pipeline's one-eval-per-input-row shape
    # (measured 5x at sf0.1). transform preserves length, so
    # size(raw) == size(hashed).
    exploded = F.transform(items, lambda x: F.xxhash64(x)) if hash_items else items
    sets = arrays.select(
        F.col(id_col).alias("__id"),
        F.size(items).alias("__n"),
        F.explode(exploded).alias("__item"),
    )
    if max_item_freq is not None:
        # item frequency as a WINDOW count over partitionBy(__item),
        # not a groupBy+join-back: the join formulation plans the
        # frequency aggregate and the join as two independent
        # subtrees, and column pruning narrows them differently, so
        # ReusedExchange never fires and the shingle+hash pass runs
        # twice (measured +0.45 s at sf0.1; at 100 TB a second full
        # corpus scan). The window shares the ONE hash(__item)
        # exchange with the bucket groupBy that follows — one scan,
        # one big shuffle, plus an in-partition sort on an 8-byte
        # hashed item key. Capped rows are filtered before any
        # posting list is collected, so a mega-hot shingle never
        # materializes a bucket.
        w = Window.partitionBy("__item")
        sets = (
            sets.withColumn("__freq", F.count(F.lit(1)).over(w))
            .filter(F.col("__freq") <= max_item_freq)
            .drop("__freq")
        )
    buckets = sets.groupBy("__item").agg(
        F.collect_list(F.struct(F.col("__id").alias("id"), F.col("__n").alias("n"))).alias(
            "__mem"
        )
    )
    # struct sort orders by first field (the id) — ids are unique per
    # bucket, so this is a total order and pair emission yields
    # id_1 < id_2 exactly as the exploded path does.
    mem = F.array_sort(F.col("__mem"))
    pair_array = F.flatten(
        F.transform(
            mem,
            lambda x, i: F.transform(
                F.slice(mem, i + 2, F.size(mem)),
                lambda y: F.struct(
                    x["id"].alias("id_1"),
                    x["n"].alias("__n1"),
                    y["id"].alias("id_2"),
                    y["n"].alias("__n2"),
                ),
            ),
        )
    )
    inter = (
        buckets.select(F.explode(pair_array).alias("__p"))
        .select("__p.id_1", "__p.__n1", "__p.id_2", "__p.__n2")
        .groupBy("id_1", "id_2", "__n1", "__n2")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    if metric == "containment":
        score = F.round(
            F.col("__inter") / F.least(F.col("__n1"), F.col("__n2")), 6
        )
    else:
        score = F.round(
            F.col("__inter")
            / (F.col("__n1") + F.col("__n2") - F.col("__inter")),
            6,
        )
    return inter.select("id_1", "id_2", score.alias(metric)).filter(
        F.col(metric) >= threshold
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _permutations(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31)) for _ in range(k)
    ]


def minhash_items(
    docs: DataFrame,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The set representation MinHash runs on: n-gram shingles by
    default (ngram>=2), plain words for ngram=1. Shingles, not words:
    with a small vocabulary every document contains nearly every
    word, so word-set similarity degenerates to ~1 for all pairs and
    LSH buckets collapse into one giant candidate clique (measured:
    45 s / quadratic candidates at 5k docs word-level vs sparse
    candidates shingle-level on the same corpus)."""
    if ngram <= 1:
        return doc_words(docs, id_col, text_col).withColumnRenamed("word", "item")
    return shingles(docs, ngram, id_col, text_col).withColumnRenamed(
        "shingle", "item"
    )


def minhash_signatures(
    docs: DataFrame,
    k: int = 32,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """k-permutation MinHash signature per document: one groupBy over
    the exploded shingle set with k min-aggregates; all hashing is
    xxhash64 + modular arithmetic in the JVM (fits signed-64:
    operands < 2^31, products < 2^62)."""
    dw = minhash_items(docs, ngram, id_col, text_col)
    w = F.pmod(F.xxhash64("item"), F.lit(MERSENNE31))
    sigs = [
        F.min(F.pmod(w * F.lit(a) + F.lit(b), F.lit(MERSENNE31))).alias(f"sig_{i}")
        for i, (a, b) in enumerate(_permutations(k, seed))
    ]
    return dw.groupBy(id_col).agg(*sigs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature (rows = k/bands) and bucket-join: documents
    sharing any band bucket become candidate pairs (id_1 < id_2).

    ``max_bucket_size`` drops buckets larger than the cap before the
    self-join — the quadratic-blowup guard for corpora with huge
    exact-duplicate clusters (those are caught upstream by exact
    hash dedup; near-dup LSH should not re-enumerate them). The cap
    is a window count over (band, bucket), so it rides the same
    exchange the self-join needs — no second aggregate + join-back
    pass over the banded rows."""
    sig_cols = [c for c in signatures.columns if c.startswith("sig_")]
    rows = len(sig_cols) // bands
    banded = signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col(f"sig_{bi * rows + r}") for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        banded = (
            banded.withColumn(
                "__bsz",
                F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
            )
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = banded.select(F.col(id_col).alias("id_1"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 32,
    bands: int = 16,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify: str = "signature",
    max_bucket_size: int | None = 10_000,
    ngram: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded
    candidates -> Jaccard >= threshold on the candidates.

    Default banding is 16 bands x 2 rows (k=32): P(candidate) =
    1-(1-j^2)^16, so recall at j=0.8 is 1 - 0.36^16 ~ 1 - 8e-8 —
    boundary pairs just above a 0.8 threshold are no longer a
    realistic miss (the old 8x4 banding left ~1.5% per-pair miss
    probability there). The price is a coarser per-band key (2 rows)
    -> more false-positive candidates; the exact/signature verify
    stage filters them, and the bucket cap still bounds any single
    bucket's quadratic fan-out.

    verify='signature' (default, the scale path): Jaccard is the
    unbiased MinHash estimate — the fraction of agreeing signature
    components. Cost is linear in the candidate count; nothing ever
    touches the raw token sets again.

    verify='exact': candidate-restricted exact Jaccard via the word
    sets — exact values, but re-joins the token sets per candidate
    pair, so reserve it for corpora where candidates are sparse.
    (Never compute all-pairs exact Jaccard as verification: with a
    small vocabulary the word-level inverted index explodes
    quadratically — measured OOM at 5k docs/32 cores.)

    Output: (id_1, id_2, jaccard).
    """
    sigs = minhash_signatures(docs, k, seed, id_col, text_col, ngram)
    if verify == "exact":
        cands = lsh_candidate_pairs(sigs, bands, id_col, max_bucket_size)
        # set sizes are CARRIED on the item rows via a window count
        # over doc_id instead of a separate groupBy aggregate joined
        # back twice: the w1/w2 verify branches below share one
        # identical subtree up to the window's exchange, so Spark
        # computes the shingle set + size once (ReusedExchange) and
        # the old sizes/s1/s2 three-exchange tail disappears —
        # tests/test_plans.py pins both properties
        dw = minhash_items(docs, ngram, id_col, text_col).withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy(id_col))
        )
        w1 = dw.select(
            F.col(id_col).alias("id_1"), F.col("item"), F.col("__n").alias("__n1")
        )
        w2 = dw.select(
            F.col(id_col).alias("id_2"), F.col("item"), F.col("__n").alias("__n2")
        )
        scored = (
            cands.join(w1, "id_1")
            .join(w2, ["id_2", "item"])
            .groupBy("id_1", "id_2", "__n1", "__n2")
            .agg(F.count(F.lit(1)).alias("__inter"))
            .select(
                "id_1",
                "id_2",
                F.round(
                    F.col("__inter") / (F.col("__n1") + F.col("__n2") - F.col("__inter")),
                    6,
                ).alias("jaccard"),
            )
        )
    elif verify == "signature":
        # Fused path: carry the packed signature through the band
        # explode and score agreement INLINE at the bucket join. The
        # unfused formulation (candidates -> re-join signatures on
        # id_1 -> re-join on id_2) recomputes the shingle+signature
        # build three times and shuffles it by three different keys;
        # here it is built once, shuffled once by (band, bucket) —
        # an exchange all consumers reuse — at the price of
        # bands * k longs per doc of shuffle payload (k=32: ~2 KB/doc,
        # immaterial next to the token sets it replaces).
        sig_cols = [c for c in sigs.columns if c.startswith("sig_")]
        rows = len(sig_cols) // bands
        packed = sigs.select(
            id_col, F.array(*[F.col(c) for c in sig_cols]).alias("__sig")
        )
        banded = packed.select(
            id_col,
            "__sig",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.xxhash64(
                                F.slice("__sig", bi * rows + 1, rows)
                            ).alias("bucket"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(id_col, "__sig", "bb.band", "bb.bucket")
        if max_bucket_size is not None:
            # window count over the SAME keys the self-join below
            # shuffles on: the cap shares that one exchange instead
            # of adding a groupBy aggregate + join-back (which cost
            # two more exchanges of the banded rows)
            banded = (
                banded.withColumn(
                    "__bsz",
                    F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
                )
                .filter(F.col("__bsz") <= max_bucket_size)
                .drop("__bsz")
            )
        a = banded.select(
            F.col(id_col).alias("id_1"), F.col("__sig").alias("__sig1"), "band", "bucket"
        )
        b = banded.select(
            F.col(id_col).alias("id_2"), F.col("__sig").alias("__sig2"), "band", "bucket"
        )
        agree = F.aggregate(
            F.zip_with(
                "__sig1", "__sig2", lambda x, y: F.when(x == y, 1).otherwise(0)
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        scored = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("id_1") < F.col("id_2"))
            .select(
                "id_1",
                "id_2",
                F.round(agree / F.lit(float(len(sig_cols))), 6).alias("jaccard"),
            )
            # a pair can collide in several bands — dedupe AFTER
            # scoring so only 3 small columns reach this shuffle
            .groupBy("id_1", "id_2")
            .agg(F.max("jaccard").alias("jaccard"))
        )
    else:
        raise ValueError(f"unknown verify mode: {verify}")
    return scored.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document: per-word 64-bit hash, each bit
    contributes +count/-count, fingerprint bit = sign of the sum.
    Returned as a signed 64-bit ``simhash`` plus 4x16-bit blocks for
    banded Hamming search.

    ``hash_fn``: 'xxhash64' (default — cheapest, JVM-native) or
    'md5' (64 bits from the first 16 hex chars — bit-identical to
    what another engine derives from its own md5(), which is how the
    q63 DuckDB oracle replays the fingerprint)."""
    counts = (
        _ensure_parallelism(docs)
        .select(id_col, F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if hash_fn == "xxhash64":
        counts = counts.withColumn("h", F.xxhash64("word"))
    elif hash_fn == "md5":
        # two 32-bit halves (each fits a signed long after conv),
        # packed into one 64-bit value; bit extraction below is
        # sign-agnostic
        hi = F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(F.md5("word"), 9, 8), 16, 10).cast("long")
        counts = counts.withColumn("h", F.shiftleft(hi, 32).bitwiseOR(lo))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    bit_sums = counts.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
                .otherwise(-F.col("cnt"))
            ).alias(f"s_{j}")
            for j in range(64)
        ]
    )
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"s_{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp.bitwiseOR(term)
    out = bit_sums.select(id_col, fp.alias("simhash"))
    for blk in range(4):
        out = out.withColumn(
            f"block_{blk}",
            F.shiftrightunsigned(F.col("simhash"), blk * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming
    (<= 3 with 4 blocks: pigeonhole guarantees a shared block, so the
    banded join misses nothing). Output (id_1, id_2, hamming)."""
    sh = simhash(docs, id_col, text_col, hash_fn)
    blocks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("blk"), F.col(f"block_{b}").alias("val"))
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val"))
    a = blocks.select(
        F.col(id_col).alias("id_1"), F.col("simhash").alias("__h1"), "blk", "val"
    )
    b = blocks.select(
        F.col(id_col).alias("id_2"), F.col("simhash").alias("__h2"), "blk", "val"
    )
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", F.bit_count(F.col("__h1").bitwiseXOR(F.col("__h2"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs: assign every id the
    minimum id reachable through the pair graph (the cluster's
    canonical representative).

    Iterative label propagation with pointer jumping: each round,
    every node adopts the smallest label among itself and its
    neighbors, THEN shortcuts to its label's own label (path
    doubling) — reachable-label distance doubles per round, so a
    chain of diameter D converges in O(log D) rounds, not O(D).
    Each round is two joins + one aggregate over the (small) label
    relation; intermediate results are localCheckpointed to cut the
    growing lineage. Deterministic.

    The propagation loop runs over TOUCHED nodes only (endpoints of
    at least one pair): an isolated document is trivially its own
    cluster, and the dup graph is orders of magnitude smaller than
    the corpus, so carrying every id through every round (the
    pre-round-5 shape) made each iteration O(corpus) instead of
    O(dup graph). The corpus-sized relation is joined exactly once,
    at the end, to attach the computed labels.

    Raises RuntimeError if the fixpoint is not reached within
    ``max_iterations`` (a silent early exit would return split
    clusters — duplicate documents surviving dedup).

    Returns (id, cluster_id, is_canonical).
    """
    # both directions from ONE pass over pairs: a unionByName of two
    # selects re-executes the whole upstream pair pipeline (LSH,
    # verify) once per branch — the inline explode mirrors each pair
    # in the same scan
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_1").alias("a"), F.col("id_2").alias("b")
                    ),
                    F.struct(
                        F.col("id_2").alias("a"), F.col("id_1").alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        # materialize once: every round joins edges, and without this
        # the pair generation would re-execute per round. Deserialized
        # ON PURPOSE: the dup-graph edge list is bounded by real
        # duplicate structure (measured 22.5 s at 100x), unlike
        # pagerank's full co-occurrence graph, and the per-round joins
        # rescan it — serialized measured ~25% slower (8.3 vs 6.7 s at
        # sf0.1); at a genuine memory wall the storageLevel param is
        # the one-line escape (operators/graph.py precedent)
        .localCheckpoint(eager=True)
    )
    # bidirectional edges: the src set IS the touched-node set
    labels = edges.select("a").distinct().withColumn("label", F.col("a"))
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("a", "b2"), edges.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, "a", "left")
            .select(
                "a",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jumping: labels always point within the component
        # (they start as self and only ever move to component members),
        # so adopting label(label(a)) is safe and halves chain depth
        lab2 = stepped.select(
            F.col("a").alias("__la"), F.col("label").alias("__ll")
        )
        new_labels = (
            stepped.join(lab2, stepped.label == F.col("__la"), "left")
            .select(
                "a",
                F.least(
                    F.col("label"), F.coalesce(F.col("__ll"), F.col("label"))
                ).alias("label"),
                (
                    F.least(
                        F.col("label"), F.coalesce(F.col("__ll"), F.col("label"))
                    )
                    != F.col("__old")
                ).alias("__changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        # convergence check is a filter over the just-materialized
        # checkpoint — no recompute, no old-vs-new shuffle join
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.select("a", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iterations} "
            "iterations — raise max_iterations (rounds needed is "
            "~log2 of the largest cluster's diameter)"
        )
    # single corpus-scale pass: attach labels; untouched ids are their
    # own (canonical) cluster
    return (
        ids.select(F.col(id_col).alias("a"))
        .join(labels, "a", "left")
        .select(
            F.col("a").alias(id_col),
            F.coalesce("label", F.col("a")).alias("cluster_id"),
            (F.col("a") == F.coalesce("label", F.col("a"))).alias(
                "is_canonical"
            ),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: find corpus documents that share at
    least one word n-gram with an eval/benchmark set (the GPT-3-style
    13-gram overlap filter, parameterized). Returns
    ``(id, n_shared_shingles)`` — one row per contaminated document;
    anti-join the result against the corpus to get the clean keep-set.

    Scale design: the benchmark side is an eval suite — thousands of
    documents, not billions — so its distinct shingle set is
    broadcast. The corpus is scanned exactly once and never shuffled
    on text; the only shuffle is the final per-document count, which
    is map-side combined on the id after the broadcast join has
    already discarded every non-matching shingle."""
    bench_sh = (
        shingles(benchmark, n=n, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
    )
    corp_sh = shingles(corpus, n=n, id_col=id_col, text_col=text_col)
    return (
        corp_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )
