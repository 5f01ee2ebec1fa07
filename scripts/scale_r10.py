#!/usr/bin/env python
"""Round-10 scale validation: the warehouse write path at 10x/30x/100x
(coherent orders builds from scripts/scale_r8s2.py, reused).

- q283_manifest_pruned_read — directory-version format: init z-order
  + full-rewrite MERGE + zone-map maintenance + pruned read. Expect
  ~linear in table size (every commit rewrites the table — the
  documented limit of the directory format, and the motivation for
  q285).
- q284_stream_manifest_sink — 4 epoch commits (one skipped) on a 10%
  subset; same full-rewrite shape per epoch.
- q285_filelist_merge — file-list format: the SAME fixed key-band
  update + fixed insert wave against a growing table. Expect the
  targeting to hold files_rewritten near-constant while the table
  grows, i.e. merge wall tracks the touched slice, not the table —
  the O(touched-files) claim, measured.

Usage: python scripts/scale_r10.py [mult] [dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from citybikedatawarehouse_spark.session import get_spark  # noqa: E402

QUERIES_UNDER_TEST = [
    "q283_manifest_pruned_read",
    "q284_stream_manifest_sink",
    "q285_filelist_merge",
    # r10s2: MOR delete of 10% of keys (sidecar write, zero file
    # rewrites) + re-insert merge + compaction fold (the one full
    # rewrite, by choice not by delete pattern)
    "q286_filelist_delete_mor",
]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/cbdw_r8s2_{mult}x"
    if not os.path.exists(f"{out}/orders.parquet"):
        raise SystemExit(
            f"{out}: no orders build — run scripts/scale_r8s2.py {mult} first"
        )
    spark = get_spark(app_name=f"scale_r10_{mult}x", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    for name in QUERIES_UNDER_TEST:
        spark.catalog.clearCache()
        t0 = time.time()
        df = QUERIES[name](spark, out)
        rows = df.collect()
        flags = {
            c: {r[c] for r in rows}
            for c in df.columns
            if c.startswith(("files_", "matches_", "untouched", "v1_"))
        }
        print(
            f"{name}: {time.time() - t0:.1f}s rows={len(rows)} "
            f"flags={flags} ({mult}x)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
