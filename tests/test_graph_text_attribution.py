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
