"""Similarity-search validation: brute-force correctness on a
constructed corpus + LSH ANN recall against brute force."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.operators.similarity_ops import (
    brute_force_topk,
    cosine_neardup_pairs,
    lsh_ann_topk,
    with_lsh_signatures,
)


@pytest.fixture(scope="module")
def emb(spark):
    """200 random 16-dim vectors + planted exact-direction pairs
    (vec 1000+i parallel to vec i, scaled 2x -> cosine 1.0)."""
    rng = random.Random(5)
    rows = []
    for i in range(200):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in v], i % 4))
        if i < 10:
            rows.append((1000 + i, [float(2 * x) for x in v], i % 4))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_bruteforce_finds_parallel_vectors(emb):
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=1).collect()
    top = {r["query_id"]: (r["neighbor_id"], r["cos_sim"]) for r in out}
    for i in range(10):
        assert top[i][0] == 1000 + i
        assert top[i][1] == pytest.approx(1.0, abs=1e-6)


def test_bruteforce_matches_python(emb):
    """Exact cosine vs an independent python computation for one query."""
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    q = rows[3]

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return d / (na * nb)

    want = sorted(
        ((vid, round(cos(q, v), 6)) for vid, v in rows.items() if vid != 3),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    got = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == 3), k=5)
        .orderBy("rank")
        .collect()
    )
    assert [(r["neighbor_id"], r["cos_sim"]) for r in got] == want


def test_lsh_signatures_deterministic_and_parallel_invariant(emb):
    """Signatures depend only on direction: scaled copies bucket
    together in every table; repeated runs identical."""
    s1 = {r["vec_id"]: tuple(r["lsh_sigs"]) for r in with_lsh_signatures(emb, dim=16).collect()}
    s2 = {r["vec_id"]: tuple(r["lsh_sigs"]) for r in with_lsh_signatures(emb, dim=16).collect()}
    assert s1 == s2
    for i in range(10):
        assert s1[i] == s1[1000 + i]


def test_lsh_ann_recall(emb):
    """ANN must recover the planted exact match (identical signature
    in every table) and a reasonable share of the true top-5."""
    queries = emb.filter(F.col("vec_id") < 10)
    ann = lsh_ann_topk(emb, queries, k=5, n_planes=8, n_tables=4, dim=16).collect()
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    for i in range(10):
        assert (i, 1000 + i) in ann_pairs
    brute = brute_force_topk(emb, queries, k=5).collect()
    brute_pairs = {(r["query_id"], r["neighbor_id"]) for r in brute}
    recall = len(ann_pairs & brute_pairs) / len(brute_pairs)
    assert recall >= 0.3  # approximate by design; planted pairs guaranteed above


def test_cosine_neardup_blocked(emb):
    """Planted parallel pairs share label blocks -> must be found."""
    got = {(r["id_1"], r["id_2"]) for r in
           cosine_neardup_pairs(emb, threshold=0.999, block_col="label").collect()}
    for i in range(10):
        assert (i, 1000 + i) in got


def test_ivf_ann_recall(emb):
    """IVF with 4-of-20 probed cells: the planted parallel vector
    shares the query's cell (identical direction), so it must always
    surface; overall recall vs brute force stays useful."""
    from citybikedatawarehouse_spark.operators.similarity_ops import ivf_ann_topk

    queries = emb.filter(F.col("vec_id") < 10)
    ann = ivf_ann_topk(emb, queries, k=5, n_centroids=20, n_probe=4).collect()
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    for i in range(10):
        assert (i, 1000 + i) in ann_pairs
    brute = brute_force_topk(emb, queries, k=5).collect()
    brute_pairs = {(r["query_id"], r["neighbor_id"]) for r in brute}
    recall = len(ann_pairs & brute_pairs) / len(brute_pairs)
    assert recall >= 0.3


def test_ivf_deterministic(emb):
    from citybikedatawarehouse_spark.operators.similarity_ops import ivf_ann_topk

    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(str, ivf_ann_topk(emb, queries, k=3, n_centroids=20).collect()))
    b = sorted(map(str, ivf_ann_topk(emb, queries, k=3, n_centroids=20).collect()))
    assert a == b


def test_hier_ivf_recall(emb):
    """Hierarchical IVF (L2 quantizer, 2-of-5 coarse x 2-of-4 fine
    probes): recall vs brute force on the fixture is deterministic —
    measured 0.84; the floor leaves margin for parameter tweaks but
    catches a broken probe path (which craters to ~0.1)."""
    from citybikedatawarehouse_spark.operators.clustering import hier_ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    ann = hier_ivf_topk(
        emb, queries, k=5, k_coarse=5, k_fine=4, n_iter=2,
        n_probe_coarse=2, n_probe_fine=2,
    ).collect()
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    brute = brute_force_topk(emb, queries, k=5).collect()
    brute_pairs = {(r["query_id"], r["neighbor_id"]) for r in brute}
    recall = len(ann_pairs & brute_pairs) / len(brute_pairs)
    assert recall >= 0.6


def test_semantic_decontaminate_plants_and_plan(spark, sf_dir):
    """q160: (a) a training vector planted as a near-copy of an eval
    vector must be flagged with that eval id; (b) the plan broadcasts
    the eval side and scans the embeddings parquet at most twice
    (train + eval legs), with the only hash exchange being the
    per-train argmax window."""
    import re

    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    # (a) planted near-copy on a synthetic frame via the same logic:
    # reuse the registered query by pointing it at a temp dir is
    # heavier than testing the math directly — plant through the
    # fixture-backed query instead: vec 60's flag must reflect the
    # true argmax computed in numpy
    import numpy as np

    from citybikedatawarehouse_spark.sources.readers import load_table

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    got = {
        r["vec_id"]: (r["best_eval_id"], r["max_cos"])
        for r in QUERIES["q160_semantic_decontaminate"](
            spark, sf_dir
        ).collect()
    }
    evs = {i: v for i, v in emb.items() if i < 50}
    flagged_expect = {}
    for i, v in emb.items():
        if i < 50:
            continue
        sims = {
            j: round(
                float(v @ e / (np.linalg.norm(v) * np.linalg.norm(e))), 6
            )
            for j, e in evs.items()
        }
        best = min(sorted(sims, key=lambda j: (-sims[j], j))[:1])
        if sims[best] >= 0.35:
            flagged_expect[i] = (best, sims[best])
    assert set(got) == set(flagged_expect)
    for i, (j, cs) in flagged_expect.items():
        assert got[i][0] == j
        assert abs(got[i][1] - cs) < 2e-6
    # (b) plan shape
    df = QUERIES["q160_semantic_decontaminate"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Scan parquet") <= 2, plan
    hash_ex = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(c == "vec_id" for c in hash_ex), plan


def test_ivfpq_candidates_respect_probes(spark, sf_dir):
    """q165 structural invariants: exactly <=5 ranked rows per query,
    every reported neighbor lives in one of the query's 2 probed
    cells, and a rerun is bit-identical (deterministic fit)."""
    from citybikedatawarehouse_spark.operators.clustering import (
        ivf_pq_topk,
        kmeans_assign,
        kmeans_fit,
    )
    from citybikedatawarehouse_spark.plans.catalog import QUERIES
    from citybikedatawarehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = QUERIES["q165_ivfpq_topk"](spark, sf_dir).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) <= 5 for v in per_q.values())
    for v in per_q.values():
        assert [r["rank"] for r in sorted(v, key=lambda r: r["rank"])] == list(
            range(1, len(v) + 1)
        )
    # replicate the coarse fit and check cell membership of neighbors
    assigned, cents = kmeans_fit(emb, k=8, n_iter=2)
    cell_of = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    import numpy as np

    C = {r["cluster_id"]: np.array(r["centroid"]) for r in cents.collect()}
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id") < 10).collect()
    }
    for qid, rows in per_q.items():
        d = {
            c: round(float(((vecs[qid] - v) ** 2).sum()), 6)
            for c, v in C.items()
        }
        probed = set(sorted(d, key=lambda c: (d[c], c))[:2])
        for r in rows:
            assert cell_of[r["neighbor_id"]] in probed
    again = QUERIES["q165_ivfpq_topk"](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_index_drift_detects_distribution_shift(spark, tmp_path):
    """q167 on a planted shift: 'historical' (even-id) vectors sit in
    tight clusters; 'new' (odd-id) vectors are the same clusters plus
    a large offset on half the dims — mean quantization error for the
    new slice must exceed the historical slice in every occupied
    cell (drift_ratio > 1), which is exactly the refit signal."""
    import numpy as np

    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rng = np.random.RandomState(7)
    rows = []
    centers = rng.randn(4, 64) * 2
    vid = 0
    for i in range(200):
        c = centers[i % 4]
        v = c + rng.randn(64) * 0.05
        rows.append((vid, [float(x) for x in v], int(i % 4)))  # even: hist
        vid += 1
        v2 = c + rng.randn(64) * 0.05
        v2[:32] += 3.0  # the shift
        rows.append((vid, [float(x) for x in v2], int(i % 4)))  # odd: new
        vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = QUERIES["q167_index_drift"](spark, str(tmp_path)).collect()
    occupied = [r for r in got if r["n_hist"] > 0 and r["n_new"] > 0]
    assert occupied
    assert all(r["drift_ratio"] > 1.5 for r in occupied)
    # conservation: every vector assigned exactly once
    assert sum(r["n_hist"] + r["n_new"] for r in got) == 400


def test_ann_recall_consistent_with_pipelines(spark, sf_dir):
    """q191's per-query recall must equal the overlap of q74's and
    q70's result sets computed independently, and be in (0, 1]."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rec = {
        r["query_id"]: (r["n_hits"], r["recall_at_5"])
        for r in QUERIES["q191_ann_recall"](spark, sf_dir).collect()
    }
    ann = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["q74_ivf_ann_topk"](spark, sf_dir).collect()
    }
    exact = {}
    for r in QUERIES["q70_cosine_topk"](spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, nbrs in exact.items():
        hits = sum(1 for n in nbrs if (q, n) in ann)
        assert rec[q][0] == hits
        assert rec[q][1] == round(hits / 5.0, 6)
        assert 0.0 <= rec[q][1] <= 1.0


def test_ivf_filtered_search_predicate_and_recall(emb):
    """Filtered vector search: every returned neighbor satisfies the
    metadata predicate; against the FILTERED brute-force truth the
    widened probe keeps recall useful; and the unfiltered call is
    bit-identical to passing no filter (API regression guard)."""
    from citybikedatawarehouse_spark.operators.similarity_ops import ivf_ann_topk

    queries = emb.filter(F.col("vec_id") < 10)
    pred = F.col("label") % 2 == 0
    ann = ivf_ann_topk(
        emb, queries, k=5, n_centroids=20, n_probe=8, candidate_filter=pred
    ).collect()
    keep = {r["vec_id"] for r in emb.where(pred).select("vec_id").collect()}
    assert ann and all(r["neighbor_id"] in keep for r in ann)

    brute = brute_force_topk(emb.where(pred), queries, k=5).collect()
    brute_pairs = {(r["query_id"], r["neighbor_id"]) for r in brute}
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    assert len(ann_pairs & brute_pairs) / len(brute_pairs) >= 0.3

    plain = sorted(map(str, ivf_ann_topk(emb, queries, k=3, n_centroids=20).collect()))
    none_filter = sorted(
        map(
            str,
            ivf_ann_topk(
                emb, queries, k=3, n_centroids=20, candidate_filter=None
            ).collect(),
        )
    )
    assert plain == none_filter
