"""Scale point for the round-11 change feed: on a 60M-row file-list
table, a narrow merge (0.1% key band) + a 1%-key scattered delete,
then the incremental ``fl_changes`` feed vs the O(table) alternative
(cdc_extract over two full snapshot reads). The feed must scan only
the changed files + delete-delta-targeted files; the snapshot diff
re-reads and shuffles the whole table twice.

Run: python scripts/scale_changes.py
Writes scripts/scale_changes.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from citybikedatawarehouse_spark.operators.maintenance import (  # noqa: E402
    cdc_extract,
)
from citybikedatawarehouse_spark.operators.table_format import (  # noqa: E402
    fl_changes,
    fl_current_version,
    fl_delete,
    fl_init,
    fl_merge_upsert,
    fl_read,
    fl_read_mor,
)

N_ROWS = 60_000_000


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
    base = tempfile.mkdtemp(prefix="cbdw_scale_ch_")

    def scenario(tag: str, dels_df) -> dict:
        root = os.path.join(base, tag)
        df = spark.range(0, N_ROWS).select(
            F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
        )
        fl_init(spark, root, df, key="k", zorder_by=("k",), layout_files=64)
        v1 = fl_current_version(root)

        # 0.1% band update + appended inserts
        band_hi = N_ROWS // 1000
        ups = spark.range(0, band_hi).select(
            F.col("id").alias("k"), (F.col("id") + 1).alias("v")
        )
        ins = spark.range(N_ROWS, N_ROWS + 10_000).select(
            F.col("id").alias("k"), F.lit(0).alias("v")
        )
        _, _, n_touch, n_total = fl_merge_upsert(
            spark, root, ups.unionByName(ins), key="k"
        )
        _, v3 = fl_delete(spark, root, dels_df)

        t0 = time.monotonic()
        n_feed = fl_changes(spark, root, v1, v3).count()
        t_feed = time.monotonic() - t0

        t0 = time.monotonic()
        n_diff = cdc_extract(
            fl_read(spark, root, v1),
            fl_read_mor(spark, root, v3),
            "k",
            ("v",),
        ).count()
        t_diff = time.monotonic() - t0
        assert n_feed == n_diff, (n_feed, n_diff)
        rec = {
            "files_touched_by_merge": n_touch,
            "files_total": n_total,
            "feed_rows": n_feed,
            "fl_changes_wall_s": round(t_feed, 1),
            "full_snapshot_diff_wall_s": round(t_diff, 1),
            "speedup": round(t_diff / t_feed, 1),
        }
        print(tag, rec, flush=True)
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        return rec

    out = {"n_rows": N_ROWS}
    # scattered 1% delete: the delta targets EVERY carried file —
    # worst case for the feed, still wins on join size alone
    out["scattered_delete"] = scenario(
        "sc", spark.range(0, N_ROWS, 100).select(F.col("id").alias("k"))
    )
    # key-local 1% delete: the delta hits one file corner — the
    # touched-files win compounds with the join-size win
    out["band_delete"] = scenario(
        "bd",
        spark.range(0, N_ROWS // 100).select(F.col("id").alias("k")),
    )
    with open(os.path.join(_HERE, "scripts", "scale_changes.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    main()
