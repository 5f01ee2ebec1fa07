"""Driver-style FULL correctness sweep: every registered query vs its
DuckDB oracle at sf0.01 (row count + schema + order-insensitive value
hash via tests/oracle_harness.compare), tolerant — failures are
recorded, not fatal — so one run proves the whole catalog green the
same way CORRECTNESS_r{N}.json does for its 50-slot head.

Run: python scripts/full_sweep.py [sf_dir] [name ...]
Writes scripts/full_sweep.json: {name: {"ok": bool, "err": str|None,
"s": sec}}.
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
    "__spark_entry__", os.path.join(_HERE, "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_harness import compare  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("full_sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = mod.queries(), mod.oracle_sql()
    todo = names or list(qs)
    results: dict[str, dict] = {}
    n_bad = 0
    t_all = time.monotonic()
    for i, name in enumerate(todo):
        t0 = time.monotonic()
        err = None
        try:
            if name in oracles:
                compare(spark, name, qs[name], oracles[name], sf_dir)
            else:
                n = qs[name](spark, sf_dir).count()
                assert n >= 0
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}"[:300]
            n_bad += 1
        dt = time.monotonic() - t0
        results[name] = {"ok": err is None, "err": err, "s": round(dt, 2)}
        print(
            f"[{i + 1}/{len(todo)}] {name}: "
            + ("OK" if err is None else f"FAIL {err}")
            + f" ({dt:.1f}s)",
            flush=True,
        )
        # keep CacheManager small across 260+ queries that persist
        # internal relations (same canonicalized-plan pileup the
        # plan-shape tests clear)
        spark.catalog.clearCache()

    total = time.monotonic() - t_all
    print(f"\nSWEEP {'PASS' if n_bad == 0 else f'{n_bad} FAILURES'} "
          f"({len(todo)} queries, {total:.0f}s)")
    # a SUBSET run must not clobber the committed full-sweep record
    # (round-11 incident: a one-query check shrank it to one entry)
    record = "full_sweep.json" if not names else "full_sweep_partial.json"
    with open(os.path.join(_HERE, "scripts", record), "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "total_s": round(total, 1), "queries": results},
            f,
            indent=1,
        )
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
