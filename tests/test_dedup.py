"""Cross-validation of the approximate dedup operators against exact
ground truth, on a corpus with planted near-duplicates."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.sources.readers import load_table

from citybikedatawarehouse_spark.operators.dedup_ops import (
    doc_words,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    shingles,
    simhash,
    simhash_neardup_pairs,
)

VOCAB = [f"w{i}" for i in range(500)]


@pytest.fixture(scope="module")
def corpus(spark):
    """60 base docs + planted near-dups: 10 docs with one word
    changed (high shingle jaccard: 37/39), 5 exact copies."""
    rng = random.Random(99)
    rows = []
    base_texts = []
    for i in range(60):
        ws = rng.sample(VOCAB, 40)
        base_texts.append(ws)
        rows.append((i, " ".join(ws)))
    for j in range(10):  # near-dup of doc j: swap one word
        ws = list(base_texts[j])
        ws[0] = "unique_replacement_%d" % j
        rows.append((100 + j, " ".join(ws)))
    for j in range(5):  # exact dup of doc 20+j
        rows.append((200 + j, " ".join(base_texts[20 + j])))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_jaccard_finds_planted_pairs(corpus):
    pairs = jaccard_pairs(doc_words(corpus), "doc_id", "word", threshold=0.8)
    got = {(r["id_1"], r["id_2"]) for r in pairs.collect()}
    for j in range(10):
        assert (j, 100 + j) in got  # 39/41 ≈ 0.95 jaccard
    for j in range(5):
        assert (20 + j, 200 + j) in got  # jaccard 1.0


def test_minhash_lsh_exact_verify_recall_and_precision(corpus):
    """verify='exact': LSH(32,8x4) at j>=0.8 — candidate prob >=
    98.5% per true pair; verification yields exact jaccard, so no
    false positives vs ground truth."""
    got = {
        (r["id_1"], r["id_2"]): r["jaccard"]
        for r in minhash_lsh_dedup(corpus, threshold=0.8, verify="exact").collect()
    }
    exact = {
        (r["id_1"], r["id_2"]): r["jaccard"]
        for r in jaccard_pairs(shingles(corpus, 3), "doc_id", "shingle", 0.8).collect()
    }
    assert set(got) <= set(exact)  # verification: no false positives
    recall = len(got) / len(exact)
    assert recall >= 0.9
    for pair, j in got.items():
        assert j == exact[pair]  # same exact-jaccard values


def test_minhash_lsh_signature_estimate(corpus):
    """verify='signature' (the scale path): the MinHash estimate is
    unbiased — planted pairs surface and estimates track exact
    jaccard within sketch noise (k=32 -> sd ~ sqrt(j(1-j)/32))."""
    got = {
        (r["id_1"], r["id_2"]): r["jaccard"]
        for r in minhash_lsh_dedup(corpus, threshold=0.7).collect()
    }
    exact = {
        (r["id_1"], r["id_2"]): r["jaccard"]
        for r in jaccard_pairs(shingles(corpus, 3), "doc_id", "shingle", 0.0).collect()
    }
    for j in range(5):  # exact copies: estimate must be exactly 1.0
        assert got[(20 + j, 200 + j)] == 1.0
    for j in range(10):  # one-word swaps: high estimate
        assert got[(j, 100 + j)] >= 0.7
    for pair, est in got.items():
        assert abs(est - exact[pair]) <= 0.25  # 3+ sd of k=32 sketch


def test_minhash_signature_deterministic(corpus):
    s1 = minhash_signatures(corpus).orderBy("doc_id").collect()
    s2 = minhash_signatures(corpus).orderBy("doc_id").collect()
    assert s1 == s2


def test_exact_copies_have_identical_signatures(corpus):
    sigs = {r["doc_id"]: tuple(r[c] for c in r.asDict() if c != "doc_id")
            for r in minhash_signatures(corpus).collect()}
    for j in range(5):
        assert sigs[20 + j] == sigs[200 + j]
    sh = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    for j in range(5):
        assert sh[20 + j] == sh[200 + j]


def test_simhash_neardup_pairs(corpus):
    """Exact copies are at Hamming 0; one-word-swapped docs are near;
    banded join must surface all Hamming<=3 pairs (pigeonhole)."""
    got = {(r["id_1"], r["id_2"]): r["hamming"] for r in
           simhash_neardup_pairs(corpus, max_hamming=3).collect()}
    for j in range(5):
        assert got.get((20 + j, 200 + j)) == 0
    # completeness: brute-force hamming vs banded result
    rows = simhash(corpus).select("doc_id", "simhash").collect()
    brute = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            h = bin(a["simhash"] ^ b["simhash"]).count("1")
            if h <= 3:
                p = (min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"]))
                brute.add(p)
    assert set(got) == brute


def test_shingles_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d"), (3, "")], "doc_id long, text string"
    )
    got = shingles(df, n=3).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in got}
    assert 1 not in counts and 3 not in counts  # too short -> no shingles
    assert counts[2] == 2  # 'a b c', 'b c d'


def test_lsh_candidates_superset_of_high_jaccard(corpus):
    cands = {
        (r["id_1"], r["id_2"])
        for r in lsh_candidate_pairs(minhash_signatures(corpus)).collect()
    }
    for j in range(5):
        assert (20 + j, 200 + j) in cands  # identical docs always collide


def test_dedup_clusters_chain_and_clique(spark):
    """A chain a-b-c and a separate pair must collapse to min-id
    clusters; singletons stay canonical."""
    from citybikedatawarehouse_spark.operators.dedup_ops import dedup_clusters

    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 8, 99]], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_1 long, id_2 long"
    )
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_clusters(ids, pairs).collect()}
    assert got[1] == (1, True) and got[2] == (1, False) and got[3] == (1, False)
    assert got[7] == (7, True) and got[8] == (7, False)
    assert got[99] == (99, True)


def test_dedup_clusters_on_corpus(corpus):
    """Exact copies must land in their base doc's cluster with the
    base doc canonical."""
    from citybikedatawarehouse_spark.operators.dedup_ops import (
        dedup_clusters,
        minhash_lsh_dedup,
    )

    pairs = minhash_lsh_dedup(corpus, threshold=0.8)
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_clusters(corpus.select("doc_id"), pairs).collect()}
    for j in range(5):
        assert got[200 + j][0] == 20 + j and not got[200 + j][1]
        assert got[20 + j] == (20 + j, True)
    # one canonical per cluster
    from collections import defaultdict
    clusters = defaultdict(list)
    for doc, (cid, canon) in got.items():
        clusters[cid].append((doc, canon))
    for cid, members in clusters.items():
        assert sum(1 for _, c in members if c) == 1
        assert min(d for d, _ in members) == cid


def test_jaccard_hot_item_cap_bounds_skew(spark):
    """Skew stress: one stop-phrase shingle shared by 50% of docs.
    Uncapped, that bucket alone generates (N/2)^2/2 candidate pairs
    in a single task. With max_item_freq below the hot frequency the
    hot shingle is pruned from candidate generation, planted
    high-jaccard pairs are still found with their EXACT jaccard (the
    denominator always counts the full set), and pairs glued only by
    the stop-phrase are gone — the documented downward bias."""
    rng = random.Random(7)
    rows = []
    for i in range(200):
        ws = rng.sample(VOCAB, 30)
        if i < 100:  # half the corpus shares one hot 3-shingle
            ws[10:13] = ["the", "quick", "fox"]
        rows.append((i, " ".join(ws)))
    # planted near-dup of doc 0 (also carries the hot shingle)
    dup = rows[0][1].split()
    dup[0] = "changed"
    rows.append((500, " ".join(dup)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(docs, n=3)

    capped = jaccard_pairs(sh, "doc_id", "shingle", threshold=0.5, max_item_freq=50)
    got = {(r["id_1"], r["id_2"]): r["jaccard"] for r in capped.collect()}
    assert (0, 500) in got
    uncapped = jaccard_pairs(sh, "doc_id", "shingle", threshold=0.5)
    full = {(r["id_1"], r["id_2"]): r["jaccard"] for r in uncapped.collect()}
    # pruned hot shingles leave the intersection count, never the
    # denominator -> capped jaccard is biased DOWN, never up, and
    # capped pairs are a subset of uncapped pairs (no fabrications)
    for k, v in got.items():
        assert v <= full[k]
    assert got[(0, 500)] < full[(0, 500)]  # pair shares the hot shingle
    # the cap is lossless here above the hot frequency
    relaxed = jaccard_pairs(sh, "doc_id", "shingle", threshold=0.5, max_item_freq=1000)
    got_relaxed = {(r["id_1"], r["id_2"]): r["jaccard"] for r in relaxed.collect()}
    assert got_relaxed == full


def test_dedup_clusters_long_chain_pointer_jumping(spark):
    """A 300-link chain converges well within 20 rounds only because
    of path doubling (plain neighbor-min would need ~300 rounds), and
    an insufficient iteration budget raises instead of silently
    returning split clusters."""
    from citybikedatawarehouse_spark.operators.dedup_ops import dedup_clusters

    n = 300
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_1 long, id_2 long"
    )
    out = dedup_clusters(ids, pairs, max_iterations=12).collect()
    assert all(r["cluster_id"] == 0 for r in out)
    assert sum(r["is_canonical"] for r in out) == 1

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(ids, pairs, max_iterations=2).collect()


def test_decontaminate_synthetic(spark):
    """Known-overlap corpus: doc 100 shares a 5-gram with the
    benchmark, doc 101 shares only 4 consecutive words (no 5-gram),
    doc 102 is disjoint. Only doc 100 is flagged, with the exact
    shared-shingle count."""
    from citybikedatawarehouse_spark.operators.dedup_ops import decontaminate

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (100, "xx quick brown fox jumps over yy"),
            (101, "quick brown fox jumps zz aa bb cc dd"),
            (102, "completely different words entirely here now friend"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in decontaminate(corpus, bench, n=5).collect()
    }
    assert got == {100: 1}


def test_decontaminate_testdata(spark, sf_dir):
    """Real corpus: flagged docs are never benchmark docs, counts are
    positive, and the planted near-dup of a benchmark doc is caught
    (doc_id 1000+i duplicates doc i for i < 20 at every SF)."""
    from citybikedatawarehouse_spark.operators.dedup_ops import decontaminate

    d = load_table(spark, sf_dir, "documents")
    flagged = decontaminate(
        d.filter(F.col("doc_id") >= 20), d.filter(F.col("doc_id") < 20), n=5
    ).collect()
    ids = {r["doc_id"] for r in flagged}
    assert all(i >= 20 for i in ids)
    assert all(r["n_shared_shingles"] >= 1 for r in flagged)
    assert len(ids) >= 1


# ---------------------------------------------------------- q150 model test
def test_cross_source_overlap_planted(spark, tmp_path):
    """q150 on a synthetic corpus with PLANTED cross-source overlap:
    exact duplicate texts across srcA/srcB (exercising the exact-text
    join the shipped fixtures never hit — round-5 ADVICE) and a
    shared 6-word passage across srcA/srcC (shingle-level only)."""
    import duckdb
    from citybikedatawarehouse_spark.plans.catalog import ORACLES, QUERIES

    passage = "the quick brown fox jumps high"
    rows = [
        # two byte-identical docs in different sources (5-gram count:
        # a k-word text has k-4 shingles; this one has 3)
        (0, "alpha beta gamma delta epsilon zeta eta", "en", "srcA", 1),
        (1, "alpha beta gamma delta epsilon zeta eta", "en", "srcB", 1),
        # same 6-word passage embedded in different surroundings
        (2, f"intro {passage} outro one", "en", "srcA", 1),
        (3, f"prefix words here {passage} tail", "en", "srcC", 1),
        # noise docs with no overlap
        (4, "u v w x y z zz yy xx ww", "en", "srcB", 1),
        (5, "m n o p q r s t uu vv", "en", "srcC", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["source_1"], r["source_2"]): (
            r["n_shared_shingles"],
            r["n_shared_texts"],
        )
        for r in QUERIES["q150_cross_source_overlap"](
            spark, str(tmp_path)
        ).collect()
    }
    # srcA/srcB share the exact doc: 3 shingles + 1 text
    assert got[("srcA", "srcB")] == (3, 1)
    # srcA/srcC share only the 6-word passage -> 2 five-gram shingles
    assert got[("srcA", "srcC")] == (2, 0)
    assert ("srcB", "srcC") not in got
    # oracle agrees on the planted corpus
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.sql(ORACLES["q150_cross_source_overlap"]).fetchall()
    }
    con.close()
    assert got == want


def test_cluster_safe_split_no_leakage(spark, sf_dir):
    """q161's whole point, asserted: (a) every member of a dup
    cluster carries the same split; (b) no >=0.8-Jaccard near-dup
    pair straddles a split boundary; (c) the split is the 90/5/5
    md5 rule on the cluster canonical (replayed in Python)."""
    import hashlib

    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rows = QUERIES["q161_cluster_safe_split"](spark, sf_dir).collect()
    split_of = {r["doc_id"]: r["split"] for r in rows}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    pairs = QUERIES["q62_minhash_lsh"](spark, sf_dir).collect()
    assert all(split_of[p["id_1"]] == split_of[p["id_2"]] for p in pairs)
    for r in rows:
        tick = (
            int(
                hashlib.md5(
                    f"csplit:{r['cluster_id']}".encode()
                ).hexdigest()[:8],
                16,
            )
            % 100
        )
        want = "train" if tick < 90 else ("valid" if tick < 95 else "test")
        assert r["split"] == want


def test_cdc_chunk_dedup_shift_robust(spark, tmp_path):
    """The property CDC buys over fixed-size chunking: a long shared
    passage is detected even when it sits at DIFFERENT word offsets
    in the two documents, because boundaries depend only on local
    content. Build a passage long enough to contain interior cut
    words, embed it at offset 0 in doc A and offset 7 in doc B, and
    assert at least one shared chunk digest spans both docs — then
    verify against the oracle."""
    import hashlib

    import duckdb

    from citybikedatawarehouse_spark.plans.catalog import ORACLES, QUERIES

    def is_cut(word: str) -> bool:
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % 16 == 0

    # find words that cut (1/16 of hash space — scan a small range)
    cuts = [f"w{i}" for i in range(400) if is_cut(f"w{i}")]
    plain = [f"w{i}" for i in range(400) if not is_cut(f"w{i}")][:40]
    assert len(cuts) >= 3
    # passage: plain run | cut | plain run | cut | plain run — the
    # middle chunk (between the two cuts) is fully content-defined
    passage = (
        plain[0:5] + [cuts[0]] + plain[5:12] + [cuts[1]] + plain[12:17]
    )
    prefix_b = [w for w in plain[20:27]]  # 7-word offset, no cuts needed
    doc_a = " ".join(passage + plain[30:34])
    doc_b = " ".join(prefix_b + passage + plain[34:38])
    rows = [
        (0, doc_a, "en", "srcA", len(doc_a)),
        (1, doc_b, "en", "srcB", len(doc_b)),
        (2, " ".join(plain[17:20]), "en", "srcC", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = QUERIES["q163_cdc_chunk_dedup"](spark, str(tmp_path)).collect()
    shared = [r for r in got if r["n_docs"] == 2]
    assert shared, "shifted shared passage must yield a shared chunk"
    # exact chunk set (incl. the passage's interior cut-to-cut span)
    # is checked digest-for-digest against the oracle
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], r[3], r[4])
        for r in con.sql(ORACLES["q163_cdc_chunk_dedup"]).fetchall()
    )
    con.close()
    assert sorted(tuple(r) for r in got) == want


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully contained in a long one: containment == 1.0
    while Jaccard is far below any useful threshold."""
    from citybikedatawarehouse_spark.operators.dedup_ops import (
        jaccard_pairs_arrays,
        shingle_arrays,
    )
    from pyspark.sql import functions as F

    snippet = " ".join(f"w{i}" for i in range(12))
    page = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, snippet), (2, page)], "doc_id long, text string"
    )
    arrs = shingle_arrays(df, n=3)
    cont = jaccard_pairs_arrays(
        arrs, "doc_id", "shingle_arr", threshold=0.6, metric="containment"
    ).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = jaccard_pairs_arrays(
        arrs, "doc_id", "shingle_arr", threshold=0.6
    ).collect()
    assert jac == []


def test_quality_canonicals_keep_one_longest_per_cluster(spark, sf_dir):
    """Exactly one keeper per cluster, and it is a maximal-n_chars
    member; singleton docs keep themselves."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rows = QUERIES["q194_quality_canonicals"](spark, sf_dir).collect()
    from collections import defaultdict

    by_cl = defaultdict(list)
    for r in rows:
        by_cl[r["cluster_id"]].append(r)
    for cl, members in by_cl.items():
        kept = [m for m in members if m["is_kept"]]
        assert len(kept) == 1
        assert kept[0]["n_chars"] == max(m["n_chars"] for m in members)


def test_cluster_census_conserves_docs(spark, sf_dir):
    """Σ size·count == n_docs (every doc in exactly one cluster) and
    pct_of_docs sums to 1."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES
    from citybikedatawarehouse_spark.sources.readers import load_table

    rows = QUERIES["q201_dup_cluster_census"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["cluster_size"] * r["n_clusters"] for r in rows) == n_docs
    assert abs(sum(r["pct_of_docs"] for r in rows) - 1.0) < 1e-4


def test_bloom_screen_has_no_false_negatives(spark, sf_dir):
    """Structural Bloom law: every exact q69-style overlap doc is
    flagged (flagged ⊇ truth), re-derived doc-by-doc in Python, and
    BOTH the true-overlap and false-positive counts are non-zero —
    the audit never runs vacuously."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES
    from citybikedatawarehouse_spark.sources.readers import load_table

    r = QUERIES["q245_bloom_screen"](spark, sf_dir).collect()[0]
    assert r.n_true_overlaps > 0
    assert r.n_false_pos > 0
    assert r.n_flagged == r.n_true_overlaps + r.n_false_pos

    import hashlib

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()

    def sh5(text):
        ws = text.strip().split()
        return {" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)}

    bench = set()
    for d in docs:
        if d.doc_id < 20:
            bench |= sh5(d.text)
    m, k = 32768, 2
    bits = {
        (j, int(hashlib.md5(f"bloom{j}:{s}".encode()).hexdigest()[:8], 16) % m)
        for s in bench
        for j in range(k)
    }
    flagged, truth = set(), set()
    for d in docs:
        if d.doc_id < 20:
            continue
        shs = sh5(d.text)
        if shs & bench:
            truth.add(d.doc_id)
        for s in shs:
            if all(
                (j, int(hashlib.md5(f"bloom{j}:{s}".encode()).hexdigest()[:8], 16) % m)
                in bits
                for j in range(k)
            ):
                flagged.add(d.doc_id)
                break
    assert truth <= flagged
    assert len(flagged) == r.n_flagged
    assert len(truth) == r.n_true_overlaps
