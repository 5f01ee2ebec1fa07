"""Scale check: CDC replication cost tracks the CHANGES, not the
table (round-12 claim in streaming/changes_feed.replicate_changes).

Setup per size N: a source file-list table of N rows clustered by
key across 64 files, cloned to a replica (initial snapshot), then 3
incremental commits each touching ~0.5 % of keys, in TWO change
shapes:

- ``banded`` — update/delete/insert all KEY-LOCAL (adjacent bands):
  the feed and the replica commits touch O(1) of the 64 files — the
  shape zone clustering exists for;
- ``scattered`` — the delete samples uniformly across the whole key
  range: every file is touched, the honest worst case where
  O(touched files) == O(table files) and only the row volume is
  still bounded by the change fraction.

Measured per shape:
- ``incremental_s`` — replicate_changes draining exactly those 3
  commits onto the warm replica (what a 100 TB sync pays per cycle);
- ``full_copy_s`` — the naive alternative: re-clone the whole source
  MOR state into a fresh table.

Measured shape (honest): incremental is ~FLAT across N (its cost is
~25 fixed-latency local Spark jobs across the 3 diffs and the
replica's own transactional commits — table-size-independent), while
at these page-cache sizes the streaming full copy is still cheaper
in absolute wall. The crossover is a cost-model argument the
flatness makes concrete: the copy is O(table) real I/O once the
table dwarfs cache (hours at 100 TB), the incremental cycle stays
the same fixed seconds plus O(changed rows).

Run: python scripts/scale_replicate.py
Writes scripts/scale_replicate.json.
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

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from citybikedatawarehouse_spark.operators.table_format import (  # noqa: E402
    fl_delete,
    fl_init,
    fl_lineage,
    fl_merge_upsert,
    fl_read_mor,
)
from citybikedatawarehouse_spark.streaming.changes_feed import (  # noqa: E402
    replicate_changes,
)

SIZES = (5_000_000, 10_000_000, 20_000_000)
CHANGE_FRACTION = 0.005


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
    base = tempfile.mkdtemp(prefix="cbdw_scale_repl_")
    out = {}
    for shape in ("banded", "scattered"):
      for n in SIZES:
        src = os.path.join(base, f"src_{shape}_{n}")
        dst = os.path.join(base, f"dst_{shape}_{n}")
        full = os.path.join(base, f"full_{shape}_{n}")
        ckpt = os.path.join(base, f"ckpt_{shape}_{n}")
        df = spark.range(0, n).select(
            F.col("id").alias("k"),
            (F.col("id") * 3).alias("v"),
            F.md5(F.col("id").cast("string")).alias("pay"),
        )
        fl_init(spark, src, df, key="k", zorder_by=("k",), layout_files=64)

        # replica warm: initial snapshot applied, offset at v1
        replicate_changes(spark, src, dst, checkpoint_dir=ckpt)

        band = int(n * CHANGE_FRACTION)
        if shape == "banded":
            # key-local: update band, ADJACENT delete band, tail insert
            fl_merge_upsert(
                spark,
                src,
                df.where(F.col("k") < band).withColumn("v", F.col("v") + 1),
                key="k",
            )
            fl_delete(
                spark,
                src,
                spark.range(band, 2 * band).select(F.col("id").alias("k")),
            )
        else:
            fl_merge_upsert(
                spark,
                src,
                df.where(F.col("k") < band).withColumn("v", F.col("v") + 1),
                key="k",
            )
            step = int(1 / CHANGE_FRACTION)
            fl_delete(
                spark,
                src,
                spark.range(0, n, step).select(F.col("id").alias("k")),
            )
        fl_merge_upsert(
            spark,
            src,
            spark.range(n, n + band).select(
                F.col("id").alias("k"),
                (F.col("id") * 3).alias("v"),
                F.md5(F.col("id").cast("string")).alias("pay"),
            ),
            key="k",
        )

        t0 = time.monotonic()
        applied = replicate_changes(spark, src, dst, checkpoint_dir=ckpt)
        incremental_s = time.monotonic() - t0

        t0 = time.monotonic()
        fl_init(
            spark, full, fl_read_mor(spark, src), key="k",
            zorder_by=("k",), layout_files=64,
        )
        full_copy_s = time.monotonic() - t0

        row = {
            "rows": n,
            "shape": shape,
            "commits_applied": applied,
            "changed_rows_per_commit": band,
            "incremental_s": round(incremental_s, 2),
            "full_copy_s": round(full_copy_s, 2),
            "full_over_incremental": round(full_copy_s / incremental_s, 2),
            "replica_commits": len(fl_lineage(dst)),
        }
        out[f"{shape}_{n}"] = row
        print(row, flush=True)
        for d in (src, dst, full, ckpt):
            shutil.rmtree(d, ignore_errors=True)
    with open(os.path.join(_HERE, "scripts", "scale_replicate.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    main()
