#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (no driver
collect — measures the distributed plan, not result transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_topk_revenue",
    "q05_region_volume",
    "q17_window_topk_per_group",
    "q21_cube",
    "q34_epoch_duration",
    "q35_tumbling_window",
    "q38_asof_join",
    "q60_exact_dedup",
    "q61_ngram_jaccard",
    "q62_minhash_lsh",
    "q64_dedup_clusters",
    "q70_cosine_topk",
    "q75_kmeans",
    "q76_ivf_kmeans_topk",
    "q82_frame_sample",
    "q87_unigram_logprob",
    "q88_semantic_dedup",
    "q108_scd2_merge",
    # round 5: the two heaviest new operators join the regression watch
    "q114_ngram_novelty",
    "q117_semantic_dedup_hier",
    # round 5 (late): the iterative graph + PCA paths
    "q133_copurchase_pagerank",
    "q135_pca_power_iteration",
    # round 5 (late): the BPE trainer watches the HOF-fold text path
    "q143_bpe_merges",
    # round 6: projection switched to the Arrow/BLAS path (0.26 s at
    # sf0.1 vs the HOF fold's 1.19 s) — benched to keep the swap's
    # before/after on the record and watch the mapInPandas overhead
    "q134_random_projection",
    # round 6: the two new graph kernels — the wedge self-join
    # (triangle) and the iterative mode-vote (LPA) are exactly the
    # shapes that regress first under a bad edge-materialization
    # change, so they join the watch
    "q176_triangle_participation",
    "q179_copurchase_communities",
    # round 6 (late): one representative per new family — the
    # 7-relation share rollup, the leave-last-out recommender eval
    # (heaviest new pipeline, carries the item-kNN neighborhood cap),
    # and the count-min sketch build (bounded-memory sketch path)
    "q232_market_share",
    "q237_hitrate_eval",
    "q243_countmin_heavy_hitters",
    # round 7: the quantile member of the sketch quartet
    "q261_histogram_quantiles",
    # round 8: the sampled-triangle estimator (the beyond-disk graph
    # path — watches the edge-sampling + wedge pipeline) and the
    # delta-join view refresh (3-term IVM algebra, the multi-join
    # merge shape)
    "q262_triangle_sample_estimate",
    "q264_ivm_join_view",
    # round 8 (session 2): one representative per new family — the
    # interval-merge window chain, the per-shard watermark replay
    # (16-way ordered windows over events), the xor bucket-digest
    # scan pair, the VARIANT parse/extract path, and the custom
    # Python source (watches the Arrow Python->JVM boundary cost)
    "q267_interval_islands",
    "q269_watermark_lateness",
    "q270_bucket_digest_diff",
    "q271_variant_shred",
    "q272_pysource_scan",
    # round 9: the KMV/theta sketch — watches the two bottom-k
    # TakeOrdered passes + the k-row intersect (and the exact audit
    # legs it will one day replace)
    "q275_kmv_overlap",
    # round 9 session 3: sketch-partial window merge (5 exchanges,
    # 2 explode fan-outs) and zone-map data skipping (layout write +
    # stats fold + pruned read — the end-to-end skipping round-trip)
    "q277_rolling_hll_distinct",
    "q278_zonemap_prune",
    # round 10: the unified table format (init + merge commits that
    # maintain Z-order layout + zone map, then a pruned read) and the
    # streaming manifest sink's epoch matrix (3 MERGE commits + a
    # skipped poisoned replay + a crash/retry) — the warehouse write
    # path end-to-end
    "q283_manifest_pruned_read",
    "q284_stream_manifest_sink",
    # round 10 (session 2): the file-list manifest MERGE —
    # O(touched-files) upsert with shared immutable files; watches
    # the targeting range join + the touched-slice rewrite
    "q285_filelist_merge",
    # round 10 (session 2): merge-on-read delete + re-insert + compact
    # fold — the delete-vector lifecycle
    "q286_filelist_delete_mor",
    # round 11: schema evolution (add + rename over mixed-schema
    # files), the I/U/D change feed (manifest diff + delete-delta
    # targeting + full-outer classification), and RESTORE — the rest
    # of the format's lifecycle joins the regression watch
    "q287_schema_evolution",
    "q288_fl_changes",
    "q289_fl_restore",
    "q290_fl_optimize",
    "q291_fl_constraints",
    # round 12: the streaming CDC source — drains the per-commit
    # change feed over a 4-commit history (3 fl_changes plans + the
    # lineage walk + offset pump); watches the feed's touched-files
    # diff cost end-to-end
    "q292_fl_changes_stream",
    # round 12: feed-driven table-to-table replication — the heaviest
    # lifecycle query (source history + per-commit replica commits +
    # the convergence exceptAll audit)
    "q293_fl_replicate",
    # round 12 (late): cluster-spec evolution — metadata flip + merge
    # on the new spec + compact migration + pruned read
    "q294_fl_set_zorder",
]

# Queries whose iterative driver loop (convergence counts, d-row
# collects, eager checkpoints) runs at PLAN-BUILD time: the returned
# DataFrame is already materialized, so timing only the noop write
# would measure a cached 20k-row scan (q64 recorded 0.013 s that way
# through round 4 — restated in round 5). For these, each timed run
# REBUILDS the query so the number covers fit + serve.
EAGER_BUILD = {
    "q64_dedup_clusters",
    "q133_copurchase_pagerank",
    "q135_pca_power_iteration",
    "q143_bpe_merges",
    # q179's per-round label checkpoints run at plan-build time;
    # q176 persists its oriented edge list, so a re-timed SAME
    # DataFrame would read the cache — rebuilding per run keeps the
    # number covering edge build + wedge join, not a cached scan
    "q176_triangle_participation",
    "q179_copurchase_communities",
    # q262 persists its flagged edge list (same rationale as q176)
    "q262_triangle_sample_estimate",
    # q278's layout write + stats build + prune-list collect all run
    # at plan-build time; timing only the returned 5-row aggregate
    # would measure none of the skipping round-trip
    "q278_zonemap_prune",
    # q283/q284 run their manifest commits (init, merges, crash/replay
    # epochs) at plan-build time; the returned DataFrame is a small
    # aggregate over the final table — rebuilding per run keeps the
    # number covering the whole commit + read round-trip
    "q283_manifest_pruned_read",
    "q284_stream_manifest_sink",
    "q285_filelist_merge",
    "q286_filelist_delete_mor",
    # q287-q289 likewise run their whole commit lifecycle (init,
    # merges, evolution/restore commits, feed build) at plan-build
    # time
    "q287_schema_evolution",
    "q288_fl_changes",
    "q289_fl_restore",
    "q290_fl_optimize",
    "q291_fl_constraints",
    # q292 builds its 4-commit history and drains the feed pump at
    # plan-build time; the returned DataFrame is a tiny aggregate
    "q292_fl_changes_stream",
    "q293_fl_replicate",
    "q294_fl_set_zorder",
}

# the round-1 baseline benched exactly these 13; rounds add queries
# to HEADLINE for regression visibility, so the raw total is not
# comparable across rounds — value_r1_subset is
R1_SUBSET = [
    "q01_pricing_summary", "q03_topk_revenue", "q05_region_volume",
    "q17_window_topk_per_group", "q21_cube", "q34_epoch_duration",
    "q35_tumbling_window", "q38_asof_join", "q60_exact_dedup",
    "q61_ngram_jaccard", "q62_minhash_lsh", "q70_cosine_topk",
    "q82_frame_sample",
]

# every headline name must resolve — a renamed query must fail here,
# not silently drop out of the bench (the in-loop `continue` guard
# only protects a PARTIAL registry import); and the r1 subset must
# stay inside HEADLINE, else value_r1_subset silently shrinks and
# cross-round comparability is gone
_missing = [q for q in HEADLINE if q not in QUERIES]
assert not _missing, f"HEADLINE names not in registry: {_missing}"
_drifted = [q for q in R1_SUBSET if q not in HEADLINE]
assert not _drifted, f"R1_SUBSET names not in HEADLINE: {_drifted}"
_eager_stray = [q for q in EAGER_BUILD if q not in HEADLINE]
assert not _eager_stray, f"EAGER_BUILD names not in HEADLINE: {_eager_stray}"


def _calibrate() -> float:
    """Fixed single-core CPU workload (~0.1 s on the round-1 host),
    reported as ``calib_sec`` so cross-round totals can be normalized
    for host drift. Round 4's A/B proved the need: the round-2 tip
    re-benched on the round-4 host ran 8.8-9.9 s vs its recorded
    6.14 s — a 45-60% host slowdown that per-query min-of-3 cannot
    see. Compare value/calib_sec across rounds, not raw seconds."""
    import hashlib

    buf = b"x" * 65536
    t0 = time.perf_counter()
    for _ in range(2000):
        buf = hashlib.sha256(buf).digest() + buf[: 65536 - 32]
    return round(time.perf_counter() - t0, 4)


def _calibrate_parallel(n_threads: int = 16) -> float:
    """sha256 over a 4 MiB buffer x32 per thread, fanned across
    ``n_threads`` OS threads — hashing a large buffer releases the
    GIL for essentially the whole iteration, so this measures CPU
    AVAILABILITY, not Python lock contention. Reported as
    ``calib_par_sec``. Round 5 found single-core calib BLIND to
    multi-core contention: four same-code full runs spanned
    6.0-10.3 s on the r1 subset while calib_sec sat at 0.10
    throughout — external load was eating the OTHER cores, which
    only a parallel probe can see. On an idle >=n_threads-core host
    this approximates the single-thread time for the same per-thread
    work; the ratio calib_par_sec / (single-thread time of one
    work()) is the effective multi-core contention factor."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    buf = b"x" * (4 * 1024 * 1024)

    def work(_=None) -> None:
        for _ in range(32):
            hashlib.sha256(buf).digest()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(work, range(n_threads)))
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="cbdw-bench")

    timings: dict[str, float] = {}
    # Interleaved contention probes (round-7 postmortem): the old
    # end-of-run calib ran AFTER all queries, so host load DURING the
    # sweep was invisible — r7's driver run recorded a phantom 3.4x
    # q176 regression that an idle-host re-run disproved, and the
    # end-of-run calib was actually FASTER than r6's. Sampling
    # calib_par between every 3rd query pins each timing to the CPU
    # availability at that moment, so a contended run is machine-
    # detectable per query without a manual re-run. query_ts_sec
    # (end offset from bench start) lets any external load log be
    # lined up against individual queries.
    calib_inline: dict[str, float] = {}
    query_ts: dict[str, float] = {}
    t_bench0 = time.perf_counter()
    calib_inline["_start"] = _calibrate_parallel()
    for i, name in enumerate(HEADLINE):
        if name not in QUERIES:
            continue
        df = QUERIES[name](spark, sf_dir)
        df.count()  # warm: plan + scan caches (file listing, footers)
        best = float("inf")
        # min-of-3: round-1 measured up to 4x run-to-run variance
        # (JIT/GC regime in a long-lived JVM); min-of-2 misgraded a
        # 2x perf gate, min-of-3 kept consecutive full runs within
        # 20% per query
        for _ in range(3):
            t0 = time.perf_counter()
            if name in EAGER_BUILD:
                df = QUERIES[name](spark, sf_dir)  # fit happens here
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        query_ts[name] = round(time.perf_counter() - t_bench0, 2)
        if i % 3 == 2:  # one ~0.1 s probe per 3 queries (~3% overhead)
            calib_inline[name] = _calibrate_parallel()

    total = round(sum(timings.values()), 4)
    summary = {
        # Key order matters: the driver records only the TAIL of this
        # line (BENCH_r09.json lost metric/value/value_r1_subset
        # because they led the object and the tail capture cut the
        # front). The per-query map goes FIRST and the scalar summary
        # keys go LAST so any tail-window capture retains the summary.
        "queries": timings,
        "metric": "headline_queries_total",
        "unit": "sec",
        "sf": sf,
        "calib_sec": min(_calibrate() for _ in range(3)),
        "calib_par_sec": min(_calibrate_parallel() for _ in range(2)),
        "value_r1_subset": round(sum(timings[q] for q in R1_SUBSET), 4),
        "value": total,
    }
    # Bulky context maps live in a SIDE FILE, not the printed line:
    # through round 12 the one-line JSON (53 queries x 3 per-query
    # maps) overflowed the driver's ~2000-char tail capture, so the
    # driver could not parse even a green bench (PERF_r11/r12
    # parsed=null). The printed line is now queries + scalars only,
    # compact separators (~1.7k chars); everything else — inline
    # calib_par samples (key = query just finished; "_start" = before
    # the first; a query whose nearest inline calib is
    # >>min(calib_inline) ran on a contended host), per-query end
    # offsets, and the EAGER_BUILD restatement list (those queries
    # REBUILD fit+serve per timed run, not comparable to pre-
    # restatement rounds) — goes to scripts/bench_last_detail.json.
    detail = {
        **summary,
        "calib_inline": calib_inline,
        "query_ts_sec": query_ts,
        "eager_build": sorted(EAGER_BUILD),
    }
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts",
            "bench_last_detail.json",
        )
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # a read-only checkout must not kill the bench
    print(json.dumps(summary, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
