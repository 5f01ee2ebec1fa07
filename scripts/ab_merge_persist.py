"""Interleaved A/B: does fl_merge_upsert's persist() of the updates
batch pay for itself on a NON-TRIVIAL updates plan? (round-10 VERDICT
item 2's acceptance check.)

The merge runs 4-5 actions over the updates lineage (count/dup
audit, zone targeting, matched count, the commit write, the
delete-set fold when present); without persist each action re-executes
the source plan. A = shipped code (persist on entry); B = persist
monkeypatched to a no-op. Updates plan: a 20M-row scan aggregated to
200k keys — the CDC-batch shape (expensive lineage, small result).
Fresh table per rep, A/B interleaved in one JVM, min-of-3 reported.

Run: python scripts/ab_merge_persist.py
Writes scripts/ab_merge_persist.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from citybikedatawarehouse_spark.operators import table_format as tf  # noqa: E402

N_TABLE = 5_000_000
N_SRC = 20_000_000
N_KEYS = 200_000
REPS = 3


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="cbdw_ab_persist_")

    def updates_plan() -> DataFrame:
        src = spark.range(0, N_SRC).select(
            (F.col("id") % N_KEYS).alias("k"), F.col("id").alias("x")
        )
        return src.groupBy("k").agg(F.sum("x").alias("v"))

    def one_rep(tag: str, disable_persist: bool) -> float:
        root = os.path.join(base, tag)
        df = spark.range(0, N_TABLE).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        tf.fl_init(spark, root, df, key="k", zorder_by=("k",),
                   layout_files=32)
        real_persist = DataFrame.persist
        real_unpersist = DataFrame.unpersist
        if disable_persist:
            DataFrame.persist = lambda self, *a, **kw: self
            DataFrame.unpersist = lambda self, *a, **kw: self
        try:
            t0 = time.monotonic()
            tf.fl_merge_upsert(spark, root, updates_plan(), key="k")
            wall = time.monotonic() - t0
        finally:
            DataFrame.persist = real_persist
            DataFrame.unpersist = real_unpersist
        shutil.rmtree(root, ignore_errors=True)
        return wall

    out = {"a_persist": [], "b_no_persist": []}
    for rep in range(REPS):  # interleaved: A, B, A, B, ...
        out["a_persist"].append(round(one_rep(f"a{rep}", False), 2))
        out["b_no_persist"].append(round(one_rep(f"b{rep}", True), 2))
        print(rep, out, flush=True)
    out["a_min"] = min(out["a_persist"])
    out["b_min"] = min(out["b_no_persist"])
    out["speedup_b_over_a"] = round(out["b_min"] / out["a_min"], 2)
    with open(os.path.join(_HERE, "scripts", "ab_merge_persist.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE", out)


if __name__ == "__main__":
    main()
