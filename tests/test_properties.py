"""Property-based tests (hypothesis) for the invariants most likely
to break on adversarial inputs: the Z-order key's overflow branch,
packing conservation under arbitrary corpora, and the quantization
error bound under arbitrary vectors. Each example builds a tiny
DataFrame, so example counts are kept small and deadlines off (Spark
job latency, not algorithm cost, dominates)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.layout import zorder_key

I64 = st.integers(min_value=-(2**62), max_value=2**62 - 1)
PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@PROP
@given(st.lists(I64, min_size=2, max_size=12, unique=True))
def test_zorder_single_col_is_order_preserving(spark, vals):
    """One column: the z-key is the range code itself, which must be
    monotone non-decreasing in the value — including ranges wide
    enough to hit the divide-before-subtract overflow branch."""
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = zorder_key(df, ["v"], bits=16).select("v", "z_key").collect()
    by_val = sorted((r["v"], r["z_key"]) for r in rows)
    keys = [k for _, k in by_val]
    assert keys == sorted(keys)
    assert all(0 <= k < (1 << 16) for k in keys)


@PROP
@given(
    st.lists(st.tuples(I64, I64), min_size=2, max_size=10, unique=True)
)
def test_zorder_two_cols_codomain_and_equality(spark, pairs):
    """Two columns: key stays in [0, 2^(2*bits)), and equal rows get
    equal keys (the key is a pure function of the row + bounds)."""
    data = pairs + [pairs[0]]  # plant one duplicate row
    df = spark.createDataFrame(data, "a long, b long")
    rows = zorder_key(df, ["a", "b"], bits=8).collect()
    keys = {}
    for r in rows:
        keys.setdefault((r["a"], r["b"]), set()).add(r["z_key"])
        assert 0 <= r["z_key"] < (1 << 16)
    assert all(len(ks) == 1 for ks in keys.values())


def _toks(t):
    """Whitespace-split token count, matching functions.textfns.words
    (split of the trimmed text on \\s+ — empty text still yields [''],
    i.e. one token, which is what word_count counts)."""
    import re

    return len(re.split(r"\s+", t.strip()))


@PROP
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab "), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=8,
    )
)
def test_pack_assignments_conserve_any_corpus(spark, texts):
    """Packing partitions ANY corpus: every doc appears exactly once,
    token totals conserved, and every doc's bin equals the Python
    model's bin — (cumsum - tok) div budget over (ord_key, id) order
    within the shard. Bins are NOT dense when a doc overruns the
    budget (a 10-token doc under budget=7 swallows a whole window);
    the dense/exact-fill invariant belongs to pack_segments, tested
    below."""
    from citybikedatawarehouse_spark.plans.curation import pack_assignments

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    budget = 7
    out = pack_assignments(docs, budget=budget, n_shards=2).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(texts)))
    assert sum(r["tok"] for r in out) == sum(_toks(t) for t in texts)
    for shard in {r["shard"] for r in out}:
        rows = sorted(
            (r for r in out if r["shard"] == shard),
            key=lambda r: (r["ord_key"], r["doc_id"]),
        )
        cum = 0
        prev_bin = None
        for r in rows:
            assert r["tok"] == _toks(texts[r["doc_id"]])
            expect_bin = cum // budget  # bin of the doc's first token
            cum += r["tok"]
            assert r["cum"] == cum
            assert r["bin_id"] == expect_bin
            # non-decreasing; a gap of g>=2 only after an over-budget doc
            if prev_bin is not None:
                g = r["bin_id"] - prev_bin[0]
                assert g >= 0
                if g >= 2:
                    assert prev_bin[1] > (g - 1) * budget
            prev_bin = (r["bin_id"], r["tok"])
        assert rows[0]["bin_id"] == 0


@PROP
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab "), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=8,
    )
)
def test_pack_segments_dense_exact_fill_any_corpus(spark, texts):
    """Segment packing (pack-then-split) holds the invariants
    pack_assignments deliberately lacks: per shard, bin ids dense
    from 0, every non-final bin holds exactly budget tokens, token
    totals conserved, and a doc appears once per budget window it
    overlaps (ceil-bounded fan-out)."""
    from citybikedatawarehouse_spark.plans.curation import pack_segments

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    budget = 7
    out = pack_segments(docs, budget=budget, n_shards=2).collect()
    assert sum(r["seg_tok"] for r in out) == sum(_toks(t) for t in texts)
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(per_doc) == list(range(len(texts)))
    for doc_id, segs in per_doc.items():
        tok = _toks(texts[doc_id])
        assert sum(r["seg_tok"] for r in segs) == tok
        assert len(segs) <= -(-tok // budget) + 1  # spans at most ceil+1 windows
        bins = sorted(r["bin_id"] for r in segs)
        assert bins == list(range(bins[0], bins[-1] + 1))  # contiguous
    for shard in {r["shard"] for r in out}:
        fill = {}
        for r in out:
            if r["shard"] == shard:
                fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["seg_tok"]
        bins = sorted(fill)
        assert bins == list(range(len(bins)))  # dense from 0
        for b in bins[:-1]:
            assert fill[b] == budget  # exact fill except the last
        assert 1 <= fill[bins[-1]] <= budget


@PROP
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100,
                max_value=100,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=8,
        ).filter(lambda v: any(abs(x) > 1e-3 for x in v)),
        min_size=1,
        max_size=6,
    )
)
def test_quantization_bound_any_vectors(spark, vecs):
    """Half-step reconstruction bound holds for arbitrary non-zero
    float32 vectors (any sign, any magnitude in range)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(list(enumerate(vecs)), schema)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mx = F.aggregate(dbl, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    q = F.transform(dbl, lambda x: F.round(x * 127 / mx))
    err = F.aggregate(
        F.zip_with(dbl, q, lambda v, qi: F.abs(v - qi * mx / 127)),
        F.lit(0.0),
        lambda a, x: F.greatest(a, x),
    )
    bad = (
        df.select(mx.alias("mx"), err.alias("err"))
        .filter(F.col("err") > F.col("mx") / 254 + 1e-12)
        .count()
    )
    assert bad == 0


@PROP
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab "), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=6,
    )
)
def test_chunk_manifest_covering_any_corpus(spark, texts):
    """Chunking is a covering for ANY corpus: with window=5, stride=3
    every doc yields exactly (dl-1)//3 + 1 chunks, chunk c holds
    min(5, dl - 3c) tokens (so every token is covered and adjacent
    chunks overlap by 2), and identical chunk token-slices hash to
    identical fingerprints."""
    from citybikedatawarehouse_spark.plans.text import chunk_manifest

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    window, stride = 5, 3
    out = chunk_manifest(docs, window=window, stride=stride).collect()
    import hashlib
    import re

    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    assert sorted(per_doc) == list(range(len(texts)))
    for doc_id, chunks in per_doc.items():
        w = re.split(r"\s+", texts[doc_id].strip())
        dl = len(w)
        ids = sorted(chunks)
        assert ids == list(range((dl - 1) // stride + 1))
        for c in ids:
            r = chunks[c]
            assert r["n_tokens"] == min(window, dl - c * stride)
            expect_fp = hashlib.md5(
                " ".join(w[c * stride : c * stride + window]).encode()
            ).hexdigest()
            assert r["chunk_fp"] == expect_fp


# --------------------------------------------------------------- SCD2 merge

_SCD_KEYS = st.integers(min_value=0, max_value=4)
_SCD_VALS = st.integers(min_value=0, max_value=2)


@PROP
@given(
    init=st.dictionaries(_SCD_KEYS, _SCD_VALS, min_size=1, max_size=5),
    batches=st.lists(
        st.dictionaries(_SCD_KEYS, _SCD_VALS, min_size=0, max_size=5),
        min_size=1,
        max_size=3,
    ),
)
def test_scd2_merge_matches_python_model(spark, init, batches):
    """The single-pass full-outer+explode merge must behave exactly
    like the obvious sequential SCD2 model under arbitrary update
    sequences: per key, version history = the deduplicated change
    sequence; exactly one open row per ever-seen key; closed rows
    chain (valid_to == next valid_from); unchanged updates are
    no-ops (idempotence)."""
    from citybikedatawarehouse_spark.operators.scd import (
        OPEN_END,
        scd2_init,
        scd2_merge,
    )

    t0 = "2000-01-01 00:00:00"
    snap = spark.createDataFrame(
        [(k, v, t0) for k, v in sorted(init.items())],
        "id int, attr int, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp_ntz"))
    dim = scd2_init(snap, key="id", effective_ts="eff")

    # python model: per-key list of (value, valid_from)
    model = {k: [(v, t0)] for k, v in init.items()}
    for i, batch in enumerate(batches):
        ts = f"2000-01-0{i + 2} 00:00:00"
        up = spark.createDataFrame(
            [(k, v, ts) for k, v in sorted(batch.items())] or [(None, None, None)],
            "id int, attr int, eff string",
        ).filter(F.col("id").isNotNull()).withColumn(
            "eff", F.col("eff").cast("timestamp_ntz")
        )
        dim = scd2_merge(dim, up, key="id", attrs=["attr"], effective_ts="eff")
        for k, v in batch.items():
            if k not in model:
                model[k] = [(v, ts)]
            elif model[k][-1][0] != v:
                model[k].append((v, ts))

    rows = dim.collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], []).append(r)
    assert set(got) == set(model)
    for k, versions in model.items():
        g = sorted(got[k], key=lambda r: str(r["valid_from"]))
        assert len(g) == len(versions)
        # values and starts match the model sequence
        for gr, (v, ts) in zip(g, versions):
            assert gr["attr"] == v
            assert str(gr["valid_from"]).startswith(ts[:10])
        # exactly one open row, and it is the last version
        opens = [r for r in g if r["is_current"]]
        assert len(opens) == 1 and opens[0] is g[-1]
        assert str(g[-1]["valid_to"]).startswith(OPEN_END[:10])
        # closed versions chain tightly
        for a, b in zip(g, g[1:]):
            assert a["valid_to"] == b["valid_from"]


# ---------------------------------------------------------------- pagerank

@PROP
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=12,
    )
)
def test_pagerank_random_graphs_match_numpy(spark, pairs):
    """PageRank over arbitrary small undirected graphs equals the
    numpy replay of the same recurrence, and total mass is 1."""
    import numpy as np

    from citybikedatawarehouse_spark.operators.graph import pagerank

    bi = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    e = spark.createDataFrame(bi, "src int, dst int")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, damping=0.85, n_iter=3).collect()
    }
    nodes = sorted({x for p in bi for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes))
    for a, _ in bi:
        deg[idx[a]] += 1
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(3):
        nxt = np.full(len(nodes), 0.15 / len(nodes))
        for a, b in bi:
            nxt[idx[b]] += 0.85 * r[idx[a]] / deg[idx[a]]
        r = nxt
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] - r[idx[n]]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


@PROP
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=12,
    )
)
def test_pagerank_directed_with_sinks_matches_numpy(spark, pairs):
    """General DIRECTED graphs: pure-sink nodes stay in the node set
    and dangling mass is redistributed uniformly, so the numpy replay
    of the standard recurrence matches and mass stays ~1 (round-5
    ADVICE: the src-only node set silently dropped sinks)."""
    import numpy as np

    from citybikedatawarehouse_spark.operators.graph import pagerank

    ed = sorted(set(pairs))
    e = spark.createDataFrame(ed, "src int, dst int")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, damping=0.85, n_iter=3).collect()
    }
    nodes = sorted({x for p in ed for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes))
    for a, _ in ed:
        deg[idx[a]] += 1
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        dm = sum(r[i] for i in range(n) if deg[i] == 0)
        nxt = np.full(n, 0.15 / n) + 0.85 * dm / n
        for a, b in ed:
            nxt[idx[b]] += 0.85 * r[idx[a]] / deg[idx[a]]
        r = nxt
    assert set(got) == set(nodes)
    for nd in nodes:
        assert abs(got[nd] - r[idx[nd]]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_empty_edges_raises(spark):
    import pytest as _pytest

    from citybikedatawarehouse_spark.operators.graph import pagerank

    e = spark.createDataFrame([], "src int, dst int")
    with _pytest.raises(ValueError, match="empty edge list"):
        pagerank(e)


# ------------------------------------------------------------ snapshot diff

@PROP
@given(
    t1=st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=3),
        max_size=8,
    ),
    t2=st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=3),
        max_size=8,
    ),
)
def test_snapshot_diff_classification_model(spark, t1, t2):
    """The full-outer diff classification must match the dict model
    for arbitrary snapshot pairs."""
    a = spark.createDataFrame(
        [(k, v) for k, v in sorted(t1.items())] or [(None, None)],
        "k int, v int",
    ).filter(F.col("k").isNotNull())
    b = spark.createDataFrame(
        [(k, v) for k, v in sorted(t2.items())] or [(None, None)],
        "k int, v int",
    ).filter(F.col("k").isNotNull())
    d = (
        a.select("k", F.struct("v").alias("__a"))
        .join(b.select("k", F.struct("v").alias("__b")), "k", "full")
        .select(
            "k",
            F.when(F.col("__a").isNull(), F.lit("added"))
            .when(F.col("__b").isNull(), F.lit("removed"))
            .when(~F.col("__a").eqNullSafe(F.col("__b")), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change"),
        )
    )
    got = {r["k"]: r["change"] for r in d.collect()}
    want = {}
    for k in set(t1) | set(t2):
        if k not in t1:
            want[k] = "added"
        elif k not in t2:
            want[k] = "removed"
        elif t1[k] != t2[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


# ------------------------------------------------------- CDC chunking

@PROP
@given(
    words=st.lists(
        st.sampled_from([f"w{i}" for i in range(60)]), min_size=8, max_size=40
    ),
    prefix=st.lists(
        st.sampled_from([f"p{i}" for i in range(20)]), min_size=1, max_size=8
    ),
)
def test_cdc_chunks_shift_invariant_suffix(spark, words, prefix):
    """Content-defined chunking's law: prepending arbitrary words
    changes only chunks up to (and including) the first cut at or
    after the insertion point — every later chunk is byte-identical.
    Tested as: the chunk multiset of `doc` restricted to chunks that
    START after doc's first cut word is a sub-multiset of the
    prefixed doc's chunks."""
    import hashlib
    from collections import Counter

    def is_cut(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 16 == 0

    def chunks(ws):
        out, cur = [], []
        for w in ws:
            cur.append(w)
            if is_cut(w):
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    # python reference law check (fast path, no spark needed for the
    # invariance law itself)
    base = chunks(words)
    pre = chunks(prefix + words)
    cut_idx = next((i for i, w in enumerate(words) if is_cut(w)), None)
    if cut_idx is not None and len(base) > 1:
        stable = Counter(base[1:])  # chunks starting after the first cut
        prec = Counter(pre)
        assert all(prec[c] >= n for c, n in stable.items())

    # and the SPARK operator agrees with the python chunker on both
    # docs (digest-for-digest)
    from citybikedatawarehouse_spark.plans.catalog import QUERIES
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [
                (0, " ".join(words), "en", "a", 1),
                (1, " ".join(prefix + words), "en", "b", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
        got = QUERIES["q163_cdc_chunk_dedup"](spark, td).collect()
        want_shared = Counter(
            hashlib.md5(c.encode()).hexdigest()
            for c in (Counter(base) & Counter(pre)).elements()
        )
        for r in got:
            # every reported duplicated chunk must be genuinely shared
            assert r["chunk_digest"] in want_shared


NODE = st.integers(min_value=1, max_value=9)


@PROP
@given(
    st.lists(
        st.tuples(NODE, NODE).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=24,
    )
)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Any small undirected multigraph (dups, both orientations):
    per-node triangle participation equals the pure-Python brute
    force over the canonical simple graph."""
    from citybikedatawarehouse_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "p1 long, p2 long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }

    es = {(min(a, b), max(a, b)) for a, b in edges}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for a, b in es:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c once per triangle
                for n in (a, b, c):
                    want[n] = want.get(n, 0) + 1
    assert got == want


@PROP
@given(
    st.lists(
        st.tuples(NODE, NODE).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_kcore_invariants(spark, edges, k):
    """For any small graph and k: every node of the k-core keeps
    degree >= k inside the core, and the core is a fixpoint (one
    more peel changes nothing). (Peeling strictly shrinks a <=9-node
    graph to stability well within 8 rounds.)"""
    from citybikedatawarehouse_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "a long, b long"
    )
    core = k_core(df, k=k, max_rounds=8).collect()
    deg = {}
    for r in core:
        deg[r["a"]] = deg.get(r["a"], 0) + 1
        deg[r["b"]] = deg.get(r["b"], 0) + 1
    assert all(d >= k for d in deg.values())
    again = k_core(
        spark.createDataFrame([(r["a"], r["b"]) for r in core], "a long, b long")
        if core
        else spark.createDataFrame([], "a long, b long"),
        k=k,
        max_rounds=1,
    ).count()
    assert again == len(core)
