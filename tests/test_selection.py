"""Model invariants for the data-selection/evaluation suite
(q234-q238). Cross-engine parity is proven by test_oracle_parity;
these pin algorithmic laws: SymSpell blocking completeness vs a
brute-force recount, MMR greedy monotonicity + pure-Python replay,
k-center radius monotonicity + numpy replay, ranking-metric
inequalities, calibration-bin arithmetic."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.sources.readers import load_table


# ---------------------------------------------------- q234 SymSpell

def _ed1(a: str, b: str) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = diff = 0
    while i < la and j < lb:
        if a[i] != b[j]:
            diff += 1
            if diff > 1:
                return False
            j += 1
        else:
            i += 1
            j += 1
    return True


def test_symspell_matches_bruteforce_recount(spark, sf_dir):
    names = [
        (r.c_custkey, r.c_name)
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .collect()
    ]
    neigh = {k: 0 for k, _ in names}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if _ed1(names[i][1], names[j][1]):
                neigh[names[i][0]] += 1
                neigh[names[j][0]] += 1
    hist: dict[int, int] = {}
    for n in neigh.values():
        hist[n] = hist.get(n, 0) + 1
    got = {
        r.n_neighbors: r.n_customers
        for r in QUERIES["q234_symspell_fuzzy_join"](spark, sf_dir).collect()
    }
    assert got == hist
    # non-vacuous: some customers do have fuzzy neighbors
    assert any(k > 0 for k in got)


# ---------------------------------------------------- q235 MMR

def test_mmr_selects_k_per_query_with_monotone_scores(spark, sf_dir):
    rows = QUERIES["q235_mmr_rerank"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(len(v) for v in by_q.values()) == {8}
    for v in by_q.values():
        v.sort(key=lambda r: r.mmr_rank)
        # greedy MMR scores are non-increasing: the feasible set only
        # shrinks and every candidate's max-sim penalty only grows
        for a, b in zip(v, v[1:]):
            assert a.score >= b.score - 1e-12
        # no duplicates within a query's selection
        assert len({r.neighbor_id for r in v}) == 8


def test_mmr_round1_is_pure_relevance_top1(spark, sf_dir):
    from citybikedatawarehouse_spark.operators.similarity_ops import (
        brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    top1 = {
        r.query_id: r.neighbor_id
        for r in brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 4), k=1
        ).collect()
    }
    got = {
        r.query_id: r.neighbor_id
        for r in QUERIES["q235_mmr_rerank"](spark, sf_dir)
        .where(F.col("mmr_rank") == 1)
        .collect()
    }
    assert got == top1


# ---------------------------------------------------- q236 k-center

def test_kcenter_matches_numpy_replay_and_radius_monotone(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    data = sorted(
        (r.vec_id, np.array(r.embedding, dtype=np.float64))
        for r in emb.collect()
    )
    ids = [d[0] for d in data]
    X = np.stack([d[1] for d in data])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    def dist_to(c_idx):
        # replicate the engines' SEQUENTIAL fold ordering closely
        # enough: values are rounded to 6 before comparisons, and the
        # tie-break below tolerates 1-ulp drift via the same rounding
        return np.round(1.0 - Xn @ Xn[c_idx], 6)

    sel = [0]  # min vec_id is first after the sort
    mind = dist_to(0)
    expect = [(1, ids[0], float(mind.max()))]
    for r in range(2, 9):
        order = np.lexsort((ids, -mind))
        nxt = int(order[0])
        sel.append(nxt)
        mind = np.minimum(mind, dist_to(nxt))
        expect.append((r, ids[nxt], float(mind.max())))
    got = [
        (r.sel_round, r.center_id, r.radius)
        for r in QUERIES["q236_kcenter_coreset"](spark, sf_dir)
        .orderBy("sel_round")
        .collect()
    ]
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[2] - e[2]) < 2e-6
    radii = [g[2] for g in got]
    assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:]))


# ---------------------------------------------------- q237 hit rate

def test_hitrate_metric_inequalities(spark, sf_dir):
    r = QUERIES["q237_hitrate_eval"](spark, sf_dir).collect()[0]
    assert r.n_customers > 0
    assert 0 <= r.n_hits_at_1 <= r.n_hits <= r.n_customers
    assert abs(r.hit_rate - round(r.n_hits / r.n_customers, 6)) < 1e-9
    # each hit contributes 1/best_rank <= 1, so MRR <= hit rate;
    # and >= n_hits/(10*N) since best_rank <= 10
    assert r.mrr <= r.hit_rate + 1e-9
    assert r.mrr >= r.n_hits / (10 * r.n_customers) - 1e-6


# ---------------------------------------------------- q238 calibration

def test_calibration_bins_are_coherent(spark, sf_dir):
    rows = QUERIES["q238_calibration_curve"](spark, sf_dir).collect()
    assert rows
    n_total = sum(r.n for r in rows)
    for r in rows:
        assert r.n > 0
        assert 0.0 <= r.actual_rate <= 1.0
        # avg predicted probability lies inside its decile bin
        assert r.bin / 10.0 - 1e-9 <= r.avg_p_hat < (r.bin + 1) / 10.0 + 1e-9
        assert r.ece_contrib >= 0.0
        # contribution never exceeds this bin's weight
        assert r.ece_contrib <= r.n / n_total + 1e-9
