"""Interleaved same-session re-measurement of the round-9 solo-bench
regression suspects (VERDICT r9 item 1): q264_ivm_join_view (+81 %
per-query wall r8s2 -> r9), q88/q117 semantic dedup (+40 %), q176
triangle participation (+26 %).

Methodology (PERFORMANCE.md, q237 co_sym note): cross-run deltas on
this host routinely reach ±30-40 % from JVM warmup order and
background load, so a suspected regression must be re-measured with
the queries INTERLEAVED round-robin in ONE session — every query then
sees the same GC regime and the same host-load timeline, and a real
regression shows up as a consistent per-round gap instead of a
between-sessions offset. A calib_par probe per round pins each round
to the CPU availability at that moment.

Timing mirrors bench.py exactly: warm once (plan + scan caches), then
per rep a noop write; q176 is EAGER_BUILD (its persist happens at
plan-build), so each rep rebuilds the plan — same semantics as the
bench's numbers being compared.

Run: python scripts/ab_interleaved.py [reps]
Writes scripts/ab_interleaved.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(_HERE, "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

TARGETS = [
    "q264_ivm_join_view",
    "q88_semantic_dedup",
    "q117_semantic_dedup_hier",
    "q176_triangle_participation",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench.get_spark(app_name="cbdw-ab-interleaved")
    qs = bench.QUERIES

    dfs = {}
    for name in TARGETS:
        df = qs[name](spark, sf_dir)
        df.count()  # warm
        dfs[name] = df

    times: dict[str, list[float]] = {n: [] for n in TARGETS}
    calib: list[float] = [bench._calibrate_parallel()]
    for r in range(reps):
        for name in TARGETS:
            df = dfs[name]
            t0 = time.perf_counter()
            if name in bench.EAGER_BUILD:
                df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 4))
        calib.append(bench._calibrate_parallel())

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "times": times,
        "min": {n: min(v) for n, v in times.items()},
        "median": {n: sorted(v)[len(v) // 2] for n, v in times.items()},
        "calib_par_per_round": [round(c, 4) for c in calib],
        "r8s2_min_reference": {
            "q264_ivm_join_view": 0.4759,
            "q88_semantic_dedup": 2.5303,
            "q117_semantic_dedup_hier": 1.6244,
            "q176_triangle_participation": 5.9113,
        },
        "r9_min_reference": {
            "q264_ivm_join_view": 0.5956,
            "q88_semantic_dedup": 3.5145,
            "q117_semantic_dedup_hier": 2.2469,
            "q176_triangle_participation": 8.1288,
        },
    }
    with open(os.path.join(_HERE, "scripts", "ab_interleaved.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["min"]))
    print(json.dumps(out["median"]))
    spark.stop()


if __name__ == "__main__":
    main()
