"""Model-based invariants for the round-5 retrieval/curation
operators (q111-q116 chunking/BM25/sampling/novelty/negatives/audit,
plus q122 entropy and q125 curriculum buckets): cross-engine value
equality is proven by test_oracle_parity; these pin the semantic
laws a matching oracle cannot see — coverage/conservation for
chunking, pure-Python BM25 and entropy re-derivations,
weighted-sampling bias direction, novelty boundary conditions, and
curriculum-phase partition laws."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.sources.readers import load_table


def _toks(t):
    return re.split(r"\s+", t.strip())


def test_chunks_cover_every_token_with_expected_overlap(spark, sf_dir):
    """Chunking (window 64, stride 32) is a covering: per doc, chunk
    token counts sum to dl + overlap, where overlap = the tokens
    [33..dl] of every non-final chunk counted twice — equivalently
    sum(n_tokens) = dl + sum over non-final chunks of (chunk_len-32).
    Also: chunk ids are dense from 0 and every chunk is non-empty."""
    m = QUERIES["q112_doc_chunks"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: len(_toks(r["text"]))
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    per_doc = {}
    for r in m:
        per_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["n_tokens"]
    assert set(per_doc) == set(docs)
    for doc_id, chunks in per_doc.items():
        dl = docs[doc_id]
        ids = sorted(chunks)
        assert ids == list(range(len(ids)))
        assert all(1 <= chunks[c] <= 64 for c in ids)
        # python model: chunk c covers tokens [c*32+1 .. min(c*32+64, dl)]
        for c in ids:
            assert chunks[c] == min(64, dl - c * 32)
        assert len(ids) == (dl - 1) // 32 + 1


def test_bm25_matches_python_model(spark, sf_dir):
    """Re-derive every returned BM25 score from raw text in Python
    (tf/df/dl/avgdl, k1=1.2, b=0.75, +1-floored idf) and compare to 6
    decimals — catches silent drift in the Spark-side formula that a
    matching-oracle gate would reproduce on both sides."""
    rows = QUERIES["q111_bm25_topk"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: _toks(r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    terms = ("spark", "table", "hash")
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    for r in rows:
        w = docs[r["doc_id"]]
        dl = len(w)
        score = 0.0
        for t in terms:
            tf = w.count(t)
            if tf:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
                score += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        assert abs(r["score"] - round(score, 6)) < 2e-6, r


def test_weighted_sample_prefers_token_mass(spark, sf_dir):
    """Efraimidis-Spirakis with weight=tokens: the sampled docs'
    MEAN token count must exceed the corpus mean (token-weighted
    selection is biased toward long docs by construction), and the
    sample is exactly 100 distinct docs."""
    s = QUERIES["q113_weighted_sample"](spark, sf_dir).collect()
    assert len(s) == 100 and len({r["doc_id"] for r in s}) == 100
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .select(F.avg(F.size(F.split(F.trim("text"), r"\s+"))).alias("m"))
        .first()["m"]
    )
    sample_mean = sum(r["tok"] for r in s) / len(s)
    assert sample_mean > corpus_mean


def test_ngram_novelty_bounds_and_first_doc(spark, sf_dir):
    """Novelty is in (0, 1]; the corpus's lowest doc_id that has
    trigrams is 100% novel by construction (nothing earlier exists);
    and n_novel <= n_shingles everywhere."""
    rows = QUERIES["q114_ngram_novelty"](spark, sf_dir).collect()
    assert rows
    by_id = {r["doc_id"]: r for r in rows}
    first = by_id[min(by_id)]
    assert first["novelty"] == 1.0
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert 0 <= r["n_novel"] <= r["n_shingles"]


def test_hard_negatives_exclude_own_label(spark, sf_dir):
    """No returned negative shares the query's label, every query
    with enough wrong-label candidates gets exactly 5, ranks are
    dense, and cos_sim is non-increasing in rank."""
    rows = QUERIES["q115_hard_negatives"](spark, sf_dir).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    by_q = {}
    for r in rows:
        assert labels[r["neighbor_id"]] != labels[r["query_id"]]
        assert r["neg_label"] == labels[r["neighbor_id"]]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_dedup_rate_consistent_with_exact_dedup(spark, sf_dir):
    """The audit's corpus-wide unique count must equal what exact
    dedup would keep per (source, lang): sum(n_unique) == number of
    distinct (source, lang, digest) triples, and rates are in
    [0, 1)."""
    rows = QUERIES["q116_dedup_rate_by_source"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    expected = (
        docs.select("source", "lang", F.md5("text").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r["n_unique"] for r in rows) == expected
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["n_unique"] <= r["n_docs"]


def test_word_entropy_matches_python_model(spark, sf_dir):
    """Re-derive every doc's entropy from raw text in Python
    (-sum p ln p over word counts) and compare to 6 decimals."""
    rows = QUERIES["q122_word_entropy"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: [w for w in _toks(r["text"]) if w]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert {r["doc_id"] for r in rows} == {
        d for d, w in docs.items() if w
    }
    for r in rows:
        w = docs[r["doc_id"]]
        counts = {}
        for t in w:
            counts[t] = counts.get(t, 0) + 1
        n = len(w)
        ent = -sum((c / n) * math.log(c / n) for c in counts.values())
        assert r["n_words"] == n
        assert r["n_distinct"] == len(counts)
        assert abs(r["entropy"] - round(ent, 6)) < 2e-6, r


def test_curriculum_buckets_partition_the_corpus(spark, sf_dir):
    """Phases 1-4 cover every entropy-scored doc exactly once, phase
    sizes are quartile-balanced within rounding, and entropy ranges
    are disjoint and ordered."""
    rows = sorted(
        QUERIES["q125_curriculum_buckets"](spark, sf_dir).collect(),
        key=lambda r: r["phase"],
    )
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    total = sum(r["n_docs"] for r in rows)
    scored = QUERIES["q122_word_entropy"](spark, sf_dir).count()
    assert total == scored
    for r in rows:
        assert abs(r["n_docs"] - total / 4) <= total * 0.26  # quartile-ish
    for a, b in zip(rows, rows[1:]):
        assert a["max_entropy"] <= b["min_entropy"]


def test_bpe_merges_match_python_model(spark, sf_dir):
    """Pure-Python replay of the 3-round BPE trainer: word-type
    frequencies, pair counts, (count desc, l, r) tie-break, greedy
    left-to-right merge application."""
    docs = load_table(spark, sf_dir, "documents").collect()
    from collections import Counter

    wt = Counter()
    for r in docs:
        t = r["text"].strip()
        if t:
            wt.update(re.split(r"\s+", t))
    syms = {w: list(w) for w in wt}
    expect = []
    for rank in range(1, 4):
        pc = Counter()
        for w, ss in syms.items():
            for a, b in zip(ss, ss[1:]):
                pc[(a, b)] += wt[w]
        (l, r_), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((rank, l, r_, cnt))
        for w, ss in syms.items():
            out = []
            for s in ss:
                if out and out[-1] == l and s == r_:
                    out[-1] = l + r_
                else:
                    out.append(s)
            syms[w] = out
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in QUERIES["q143_bpe_merges"](spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expect
    # the encode side (q159) must agree with the same Python replay:
    # per-doc token count = sum over words of the post-merge symbol
    # count, words = count of word occurrences
    expect_enc = {}
    for r in docs:
        t = r["text"].strip()
        if not t:
            continue
        ws = re.split(r"\s+", t)
        expect_enc[r["doc_id"]] = (len(ws), sum(len(syms[w]) for w in ws))
    got_enc = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in QUERIES["q159_bpe_encode"](spark, sf_dir).collect()
    }
    assert got_enc == expect_enc
    # merges only ever SHRINK the token stream: n_tokens <= chars,
    # >= n_words
    for r in QUERIES["q159_bpe_encode"](spark, sf_dir).collect():
        assert r["n_words"] <= r["n_tokens"]


def test_bigram_logprob_model(spark, sf_dir):
    """Pure-Python replay of the add-0.5-smoothed bigram scorer, and
    the fluency law: shuffling word order must not RAISE a doc's
    score under the corpus LM (checked corpus-wide on average)."""
    from collections import Counter

    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip())
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["text"].strip()
    }
    uni = Counter()
    bic = Counter()
    for ws in docs.values():
        uni.update(ws)
        bic.update(zip(ws, ws[1:]))
    V = len(uni)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in QUERIES["q158_bigram_logprob"](spark, sf_dir).collect()
    }
    for doc_id, ws in docs.items():
        if len(ws) < 2:
            assert doc_id not in got
            continue
        pairs = list(zip(ws, ws[1:]))
        lp = sum(
            math.log((bic[p] + 0.5) / (uni[p[0]] + 0.5 * V)) for p in pairs
        ) / len(pairs)
        n, g = got[doc_id]
        assert n == len(pairs)
        assert abs(g - round(lp, 6)) < 1e-6


def test_lexical_diversity_flags_template_farm(spark, tmp_path):
    """q166's point: a source of 50 near-identical template docs must
    show drastically lower trigram diversity and higher top-gram
    share than a source of 50 distinct docs of the same size."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rows = []
    did = 0
    for k in range(50):  # template farm: same 10 words, one slot varies
        rows.append(
            (did, f"the quick brown fox jumps over the lazy dog v{k}",
             "en", "farm", 50)
        )
        did += 1
    for k in range(50):  # diverse source
        ws = " ".join(f"u{k}w{j}" for j in range(10))
        rows.append((did, ws, "en", "varied", 50))
        did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r
        for r in QUERIES["q166_lexical_diversity"](spark, str(tmp_path)).collect()
    }
    # farm: 7 shared trigrams + 1 unique (the varying slot) per doc
    # over 400 total = 0.1425
    assert got["farm"]["trigram_diversity"] < 0.2
    assert got["varied"]["trigram_diversity"] == 1.0
    assert got["farm"]["top_gram_share"] > 0.1
    assert got["varied"]["top_gram_share"] < 0.01
    assert got["farm"]["type_token_ratio"] < got["varied"]["type_token_ratio"]


def test_jsd_bounds_and_planted_extremes(spark, sf_dir):
    """JSD is within [0,1] bit on real data; identical corpora give
    0, disjoint-vocabulary corpora give exactly 1 bit."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    for r in QUERIES["q188_source_jsd"](spark, sf_dir).collect():
        assert 0.0 <= r["jsd_bits"] <= 1.0

    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        rows = (
            [(i, "a b c d", "x", "s1") for i in range(20)]
            + [(100 + i, "a b c d", "x", "s2") for i in range(20)]
            + [(200 + i, "p q r s", "x", "s3") for i in range(20)]
        )
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            src = os.path.join("/root/testdata/sf0.001", f"{t}.parquet")
            dst = os.path.join(tmp, f"{t}.parquet")
            os.symlink(src, dst)
        df.withColumn("n_chars", F.length("text")).write.parquet(
            os.path.join(tmp, "documents.parquet")
        )
        got = {
            (r["source_a"], r["source_b"]): r["jsd_bits"]
            for r in QUERIES["q188_source_jsd"](spark, tmp).collect()
        }
        assert got[("s1", "s2")] == 0.0
        assert got[("s1", "s3")] == 1.0
        assert got[("s2", "s3")] == 1.0


def test_phrase_search_requires_adjacency(spark, sf_dir):
    """Every reported doc truly contains the adjacent phrase (string
    containment check), and a doc with both words NON-adjacent is
    not reported."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.plans.catalog import QUERIES
    from citybikedatawarehouse_spark.sources.readers import load_table

    hits = {
        r["doc_id"]: r["n_occurrences"]
        for r in QUERIES["q195_phrase_search"](spark, sf_dir).collect()
    }
    assert hits, "phrase must occur at this SF"
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("text").contains("spark") & F.col("text").contains("table"))
        .collect()
    }
    import re

    for doc_id, text in docs.items():
        n = len(re.findall(r"(?=\bspark table\b)", " ".join(text.split())))
        if n:
            assert hits.get(doc_id) == n, doc_id
        else:
            assert doc_id not in hits, doc_id


def test_collocations_pmi_pure_python_replay(spark, sf_dir):
    """Recompute window-pair counts, unigram counts and PMI in pure
    Python on the raw text and compare the top rows."""
    import math
    from collections import Counter

    from citybikedatawarehouse_spark.plans.catalog import QUERIES
    from citybikedatawarehouse_spark.sources.readers import load_table

    got = QUERIES["q196_collocations"](spark, sf_dir).collect()
    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    uni, pairs = Counter(), Counter()
    n_tokens = 0
    for t in texts:
        ws = t.split()
        n_tokens += len(ws)
        uni.update(ws)
        for i, a in enumerate(ws):
            for b in ws[i + 1 : i + 5]:
                pairs[(a, b)] += 1
    for r in got:
        cp = pairs[(r["w1"], r["w2"])]
        assert cp == r["pair_count"] and cp >= 20
        pmi = math.log2(cp * n_tokens / 4.0 / (uni[r["w1"]] * uni[r["w2"]]))
        assert abs(r["pmi"] - round(pmi, 6)) <= 1e-6


def test_bm25_snippets_contain_their_term(spark, sf_dir):
    """Every snippet must actually CONTAIN its matched term at the
    reported relative offset; ranks are 1..10 aligned with q111's
    ordering; the picked term is the earliest occurrence among the
    query terms."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rows = QUERIES["q226_bm25_snippets"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert sorted(r["rank"] for r in rows) == list(range(1, 11))
    top = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            QUERIES["q111_bm25_topk"](spark, sf_dir).limit(10).collect()
        )
    }
    for r in rows:
        assert top[r["doc_id"]] == r["rank"]
        assert r["term"] in r["snippet"]
        start = max(1, r["pos"] - 30)
        assert r["snippet"].startswith(
            ""
        ) and len(r["snippet"]) <= 60
        # term sits at pos - start within the snippet
        rel = r["pos"] - start
        assert r["snippet"][rel : rel + len(r["term"])] == r["term"]


def test_ndcg_replay_and_bounds(spark, sf_dir):
    """DCG/IDCG re-derived in Python from the BM25 top-10 and the
    tf-graded corpus; ndcg = dcg/idcg <= 1."""
    import math

    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.plans.catalog import QUERIES
    from citybikedatawarehouse_spark.plans.text import _BM25_TERMS, bm25_scores
    from citybikedatawarehouse_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    grades = {}
    for r in d.select("doc_id", "text").collect():
        ws = r.text.strip().split()
        grades[r.doc_id] = min(sum(ws.count(t) for t in _BM25_TERMS), 7)
    top = (
        bm25_scores(d.select("doc_id", "text"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .collect()
    )
    w = [1.0 / math.log2(r + 2) for r in range(10)]
    dcg = round(
        sum((2 ** grades[t.doc_id] - 1) * w[i] for i, t in enumerate(top)), 6
    )
    ideal = sorted(grades.values(), reverse=True)[:10]
    idcg = round(sum((2 ** g - 1) * w[i] for i, g in enumerate(ideal)), 6)
    got = QUERIES["q253_ndcg_at_10"](spark, sf_dir).collect()[0]
    assert got.dcg == dcg
    assert got.idcg == idcg
    assert 0 < got.ndcg_at_10 <= 1.0
    assert got.ndcg_at_10 == round(dcg / idcg, 6)
