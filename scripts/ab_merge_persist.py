"""Interleaved A/B: does fl_merge_upsert's persist() of the updates
batch pay for itself on a NON-TRIVIAL updates plan? (round-10 VERDICT
item 2's acceptance check.)

The merge runs 4-5 actions over the updates lineage (count/dup
audit, zone targeting, matched count, the commit write, the
delete-set fold when present); without persist each action
re-executes the source plan. A = shipped code (persist on entry);
B = persist monkeypatched to a no-op. Two plan shapes, because they
answer differently:

- ``agg``: 20M rows aggregated to 200k keys. Spark's SHUFFLE-FILE
  REUSE already amortizes everything below the exchange across the
  merge's actions, so persist is ~neutral here — the honest negative.
- ``narrow``: 20M-row md5 projection + filter, NO exchange anywhere
  — every action re-executes the scan from scratch without persist.
  This is where the persist pays (raw CDC file drops, external
  sources).

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

    def agg_plan() -> DataFrame:
        # shuffle-boundary shape: Spark's shuffle-file reuse already
        # amortizes the expensive scan across the merge's actions
        # even without persist — expect persist ~neutral here
        src = spark.range(0, N_SRC).select(
            (F.col("id") % N_KEYS).alias("k"), F.col("id").alias("x")
        )
        return src.groupBy("k").agg(F.sum("x").alias("v"))

    def narrow_plan() -> DataFrame:
        # NO exchange anywhere: every action re-executes the 20M-row
        # projection from scratch — the shape where persist pays
        return (
            spark.range(0, N_SRC)
            .select(
                F.col("id").alias("k"),
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                       16, 10).cast("long").alias("v"),
            )
            .where(F.col("k") % (N_SRC // N_KEYS) == 0)
        )

    def one_rep(tag: str, plan, disable_persist: bool) -> float:
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
            tf.fl_merge_upsert(spark, root, plan(), key="k")
            wall = time.monotonic() - t0
        finally:
            DataFrame.persist = real_persist
            DataFrame.unpersist = real_unpersist
        shutil.rmtree(root, ignore_errors=True)
        return wall

    out = {}
    for shape, plan in (("agg", agg_plan), ("narrow", narrow_plan)):
        a, b = [], []
        for rep in range(REPS):  # interleaved: A, B, A, B, ...
            a.append(round(one_rep(f"{shape}_a{rep}", plan, False), 2))
            b.append(round(one_rep(f"{shape}_b{rep}", plan, True), 2))
            print(shape, rep, a, b, flush=True)
        out[shape] = {
            "a_persist": a, "b_no_persist": b,
            "a_min": min(a), "b_min": min(b),
            "speedup_b_over_a": round(min(b) / min(a), 2),
        }
    with open(os.path.join(_HERE, "scripts", "ab_merge_persist.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE", out)


if __name__ == "__main__":
    main()
