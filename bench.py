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
    "q70_cosine_topk",
    "q82_frame_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="cbdw-bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
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
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
