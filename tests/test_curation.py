"""Semantic invariants for the curation suite (plans/curation.py).
Cross-engine value equality is proven by test_oracle_parity; these
pin the properties the oracle can't see — conservation laws, split
totals, quantization error bounds — plus the plan shapes that make
the operators scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.sources.readers import load_table


def test_sequence_pack_conserves_docs_and_tokens(spark, sf_dir):
    """Packing is a partition of the corpus: every doc lands in
    exactly one (shard, bin), and bin token totals sum to the corpus
    token total."""
    manifest = QUERIES["q83_sequence_pack"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    totals = manifest.agg(
        F.sum("n_docs").alias("docs"), F.sum("bin_tokens").alias("toks")
    ).first()
    n_docs = docs.count()
    n_toks = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).first()["t"]
    assert totals["docs"] == n_docs
    assert totals["toks"] == n_toks
    # first-token assignment invariant: per shard, in stream order,
    # bins are non-decreasing and start at 0; a gap of g >= 2 appears
    # only right after a doc with tok > (g-1)*budget (an over-budget
    # doc swallows whole windows, so no doc STARTS there). Dense bins
    # are pack_segments' contract, not this one's.
    from pyspark.sql.window import Window

    from citybikedatawarehouse_spark.plans.curation import pack_assignments

    a = pack_assignments(docs.select("doc_id", "text"), 512, 8)
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    gaps = a.select(
        "shard",
        "bin_id",
        "tok",
        F.lag("bin_id").over(w).alias("prev_bin"),
        F.lag("tok").over(w).alias("prev_tok"),
    )
    assert (
        gaps.filter(F.col("prev_bin").isNotNull())
        .filter(
            (F.col("bin_id") < F.col("prev_bin"))
            | (
                (F.col("bin_id") - F.col("prev_bin") >= 2)
                & (
                    F.col("prev_tok")
                    <= (F.col("bin_id") - F.col("prev_bin") - 1) * 512
                )
            )
        )
        .count()
        == 0
    )
    first = a.groupBy("shard").agg(F.min("bin_id").alias("mn")).collect()
    assert all(r["mn"] == 0 for r in first)


def test_pack_segments_manifest_dense_and_exact(spark, sf_dir):
    """q110 (pack-then-split) manifest: per shard, bins dense from 0,
    every non-final bin holds exactly 512 tokens, and segment token
    totals match the corpus total."""
    m = QUERIES["q110_pack_segments"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_toks = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).first()["t"]
    assert sum(r["bin_tokens"] for r in m) == n_toks
    shards = {}
    for r in m:
        shards.setdefault(r["shard"], {})[r["bin_id"]] = r["bin_tokens"]
    for fill in shards.values():
        bins = sorted(fill)
        assert bins == list(range(len(bins)))
        for b in bins[:-1]:
            assert fill[b] == 512
        assert 1 <= fill[bins[-1]] <= 512


def test_dataset_split_is_exhaustive_and_disjoint(spark, sf_dir):
    """The 3-way split covers every document exactly once, and the
    realized proportions are within a loose tolerance of 90/5/5."""
    m = QUERIES["q84_dataset_split"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    by_split = {
        r["split"]: r["n"]
        for r in m.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    total = docs.count()
    assert sum(by_split.values()) == total
    assert set(by_split) == {"train", "valid", "test"}
    assert by_split["train"] / total > 0.8  # 90% nominal, loose gate


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    """Symmetric int8 round-to-nearest: reconstruction error is at
    most half a quantization step (mx/127/2). Both output columns are
    rounded to 6 decimals, so the bound carries a 1e-6 slack."""
    q = QUERIES["q78_embedding_quantize"](spark, sf_dir)
    bad = q.filter(
        F.col("max_err") > F.col("abs_max") / 127 / 2 + 1e-6
    ).count()
    assert bad == 0


def test_incremental_dedup_survivors_are_fresh_and_unique(spark, sf_dir):
    """No survivor's digest exists in the retained corpus slice, and
    survivors are digest-unique within the batch."""
    s = QUERIES["q86_incremental_dedup"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("digest")
    )
    incoming_ids = {r["doc_id"] for r in s.select("doc_id").collect()}
    # survivors must be digest-unique
    dup = (
        s.groupBy("digest").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    # and disjoint from the existing side's digests
    existing = docs.filter(
        ~(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("batch:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 5
            == 0
        )
    ).select("digest")
    overlap = s.join(existing, "digest", "inner").count()
    assert overlap == 0
    assert incoming_ids  # non-degenerate: the 20% slice is non-empty


def test_repetition_filter_flags_planted_loop(spark, sf_dir):
    """A synthetic looping document (one 2-gram repeated) must be
    flagged; a normal corpus document must not dominate the gate."""
    docs = load_table(spark, sf_dir, "documents")
    flagged_frac = (
        QUERIES["q85_repetition_filter"](spark, sf_dir)
        .agg(F.avg(F.col("flagged").cast("double")).alias("f"))
        .first()["f"]
    )
    # synthetic corpus text is near-uniform random words; the gate
    # must not wipe the corpus
    assert flagged_frac < 0.5
    # planted pathological doc: "spam ham" * 50
    from citybikedatawarehouse_spark.plans import curation  # noqa: F401

    loop_df = spark.createDataFrame(
        [(999_999, "spam ham " * 50)], "doc_id long, text string"
    )
    ex = loop_df.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "word"),
    )
    from pyspark.sql.window import Window

    gram = F.concat_ws(
        " ",
        F.col("word"),
        F.lead("word").over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    gc = (
        ex.select("doc_id", gram.alias("gram"))
        .filter(F.col("gram").contains(" "))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = gc.groupBy("doc_id").agg(
        (F.max("c") / F.sum("c")).alias("top_gram_frac")
    ).first()
    assert top["top_gram_frac"] > 0.06  # would be flagged


def test_curation_plans_stay_in_codegen(spark, sf_dir):
    """The quantize plan must be UDF-free (no BatchEvalPython /
    ArrowEvalPython): all HOF work stays JVM-side."""
    plan = QUERIES["q78_embedding_quantize"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # packing: exactly one shuffle for the window + one for the agg,
    # both keyed by shard — no extra exchanges sneak in
    pack_plan = QUERIES["q83_sequence_pack"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert pack_plan.count("Exchange hashpartitioning") <= 2


def test_export_packed_corpus_layout(spark, sf_dir, tmp_path):
    """Export contract: shard-partitioned layout, partition pruning
    on read-back, rows conserved, and each shard readable as one
    sorted (bin_id, ord_key) run."""
    import os

    from citybikedatawarehouse_spark.sources.writers import export_packed_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "packed")
    export_packed_corpus(docs, out, budget=512, n_shards=8)

    shards = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert shards == [f"shard={i}" for i in range(8)]

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    # partition pruning: a shard predicate must reach PartitionFilters
    plan = (
        back.filter(F.col("shard") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(shard" in plan

    # one sorted run per shard: bin_id non-decreasing in file order
    import pyarrow.parquet as pq

    shard_dir = os.path.join(out, "shard=3")
    files = [f for f in os.listdir(shard_dir) if f.endswith(".parquet")]
    assert len(files) == 1  # one task wrote the whole shard
    bins = pq.read_table(os.path.join(shard_dir, files[0]), columns=["bin_id"])[
        "bin_id"
    ].to_pylist()
    assert bins == sorted(bins)


def test_matryoshka_retention_in_unit_range(spark, sf_dir):
    """Norm retention is a fraction of the full norm: (0, 1] (6-dec
    rounding slack on the upper edge)."""
    q = QUERIES["q79_matryoshka_truncate"](spark, sf_dir)
    bad = q.filter(
        (F.col("norm_retention") <= 0) | (F.col("norm_retention") > 1.000001)
    ).count()
    assert bad == 0


def test_unigram_logprob_positive_and_covers_corpus(spark, sf_dir):
    """-ln(p) > 0 for every word (p < 1 in any multi-word corpus) and
    every document gets a score."""
    q = QUERIES["q87_unigram_logprob"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert q.count() == docs.count()
    assert q.filter(F.col("avg_neg_logprob") <= 0).count() == 0


def test_temperature_mixture_upweights_small_sources(spark, tmp_path):
    """q162 on a SKEWED synthetic corpus (the shipped fixture is
    uniform across sources, which hides the temperature effect):
    alpha=0.5 must give the small source a larger-than-proportional
    share, quotas must match the integer-arithmetic Python replay,
    and the selection must be the md5 rank prefix."""
    import hashlib
    import math

    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rows = []
    did = 0
    for src, n in (("big", 900), ("mid", 90), ("small", 10)):
        for _ in range(n):
            rows.append((did, f"text {did}", "en", src, 10))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = QUERIES["q162_temperature_mixture"](spark, str(tmp_path)).collect()
    # python replay of the integer quota rule
    iw = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in
          (("big", 900), ("mid", 90), ("small", 10))}
    tot = sum(iw.values())
    quota = {s: (200 * w) // tot for s, w in iw.items()}
    got_quota = {}
    for r in got:
        got_quota[r["source"]] = r["quota"]
    assert got_quota == quota
    # temperature effect: small's share of the sample exceeds its
    # corpus share; big's is below
    n_by = {s: sum(1 for r in got if r["source"] == s) for s in iw}
    # a quota larger than the source (small: 14 > 10) fills to n_docs
    # — sampling is without replacement, so the cap is the source size
    assert n_by == {s: min(q, dict(big=900, mid=90, small=10)[s])
                    for s, q in quota.items()}
    assert quota["small"] / 200 > 10 / 1000
    assert quota["big"] / 200 < 900 / 1000
    # md5-rank prefix selection per source
    for src, n0, n in (("big", 0, 900), ("mid", 900, 90), ("small", 990, 10)):
        ids = list(range(n0, n0 + n))
        order = sorted(
            ids, key=lambda i: (hashlib.md5(f"tmix:{i}".encode()).hexdigest(), i)
        )
        want = set(order[: min(quota[src], n)])
        assert {r["doc_id"] for r in got if r["source"] == src} == want


def test_dsir_resample_prefers_target_like_docs(spark, tmp_path):
    """q164 on a planted corpus: candidate docs written in the
    target domain's vocabulary must outrank candidates written in an
    unrelated vocabulary — the whole point of importance
    resampling."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rows = []
    did = 0
    tgt_words = [f"t{i}" for i in range(30)]
    other_words = [f"o{i}" for i in range(30)]
    # target sample (src0): pure target vocabulary
    for _ in range(20):
        rows.append((did, " ".join(tgt_words[did % 10:(did % 10) + 12]),
                     "en", "src0", 50)); did += 1
    # candidates: 10 target-like, 10 unrelated
    target_like, unrelated = [], []
    for k in range(10):
        rows.append((did, " ".join(tgt_words[k:k + 12]), "en", "srcA", 50))
        target_like.append(did); did += 1
    for k in range(10):
        rows.append((did, " ".join(other_words[k:k + 12]), "en", "srcB", 50))
        unrelated.append(did); did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = QUERIES["q164_dsir_resample"](spark, str(tmp_path)).collect()
    rank_of = {r["doc_id"]: r["rank"] for r in got}
    # every target-like candidate ranks above every unrelated one
    assert max(rank_of[i] for i in target_like) < min(
        rank_of[i] for i in unrelated
    )
    # scores of target-like docs are positive (more likely under the
    # target LM), unrelated negative
    score_of = {r["doc_id"]: r["avg_logratio"] for r in got}
    assert all(score_of[i] > 0 for i in target_like)
    assert all(score_of[i] < 0 for i in unrelated)


def test_novelty_curve_laws(spark, sf_dir):
    """Bucket 0's shingles are ALL new by definition; new <= seen per
    bucket; the cumulative distinct count is monotone and ends at
    the corpus's global distinct shingle count; docs conserve."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.operators.dedup_ops import shingles
    from citybikedatawarehouse_spark.sources.readers import load_table

    rows = sorted(
        QUERIES["q225_novelty_curve"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert rows[0]["n_new_shingles"] == rows[0]["n_shingles"]
    assert abs(rows[0]["new_ratio"] - 1.0) < 1e-9
    for r in rows:
        assert 0 <= r["n_new_shingles"] <= r["n_shingles"]
    cums = [r["cum_distinct_shingles"] for r in rows]
    assert cums == sorted(cums)
    d = load_table(spark, sf_dir, "documents")
    total_distinct = (
        shingles(d, n=3).select("shingle").distinct().count()
    )
    assert cums[-1] == total_distinct
    assert sum(r["n_docs"] for r in rows) == d.count()


def test_ipf_hits_column_margin_exactly_and_row_margin_close(spark, sf_dir):
    """After the final column scaling, language margins match the
    uniform target to rounding; source margins are within 2% —
    and one more (row) scaling in Python moves them closer,
    confirming convergence direction."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    rows = QUERIES["q254_ipf_mixture"](spark, sf_dir).collect()
    n_src = len({r.source for r in rows})
    n_lang = len({r.lang for r in rows})
    col = {}
    row = {}
    for r in rows:
        assert r.weight > 0
        col[r.lang] = col.get(r.lang, 0.0) + r.weighted_share
        row[r.source] = row.get(r.source, 0.0) + r.weighted_share
    for v in col.values():
        assert abs(v - 1.0 / n_lang) < 1e-4
    worst = max(abs(v - 1.0 / n_src) for v in row.values())
    assert worst < 0.02
    # one more row scaling (replay) must not worsen the worst row gap
    scaled = [
        (r.source, r.weighted_share * (1.0 / n_src) / row[r.source])
        for r in rows
    ]
    row2 = {}
    for s, v in scaled:
        row2[s] = row2.get(s, 0.0) + v
    assert max(abs(v - 1.0 / n_src) for v in row2.values()) <= worst + 1e-12
