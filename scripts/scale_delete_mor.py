"""Scale measurement for the executor-side merge-on-read delete set
(round-11): fl_delete of 1M/10M/30M keys against a 60M-row file-list
table, recording wall time and the PYTHON driver's RSS delta — the
process where the pre-round-11 implementation materialized the whole
key set as pandas (keys.distinct().toPandas()) and re-broadcast it on
every MOR read. The round-11 path writes delete keys as executor
parquet and applies them with an AQE-planned anti-join, so the python
RSS must stay FLAT in the delete-set size.

Run: python scripts/scale_delete_mor.py
Writes scripts/scale_delete_mor.json.
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

from citybikedatawarehouse_spark.operators.table_format import (  # noqa: E402
    fl_delete,
    fl_init,
    fl_read_mor,
    fl_table_props,
)

N_ROWS = 60_000_000
DELETE_POINTS = [1_000_000, 10_000_000, 30_000_000]


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


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
    out = {"n_rows": N_ROWS, "points": []}
    base = tempfile.mkdtemp(prefix="cbdw_scale_del_")
    for n_del in DELETE_POINTS:
        root = os.path.join(base, f"t{n_del}")
        df = spark.range(0, N_ROWS).select(
            F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
        )
        fl_init(spark, root, df, key="k", zorder_by=("k",), layout_files=64)
        # scattered keys: every (N_ROWS // n_del)-th — touches every file
        step = N_ROWS // n_del
        keys = spark.range(0, N_ROWS, step).select(F.col("id").alias("k"))
        rss0 = rss_mb()
        t0 = time.monotonic()
        n_keys, _ = fl_delete(spark, root, keys)
        t_del = time.monotonic() - t0
        rss1 = rss_mb()
        t0 = time.monotonic()
        n_mor = fl_read_mor(spark, root).count()
        t_read = time.monotonic() - t0
        rss2 = rss_mb()
        assert n_keys == n_del and n_mor == N_ROWS - n_del, (
            n_keys, n_mor
        )
        rec = {
            "delete_keys": n_del,
            "delete_wall_s": round(t_del, 1),
            "mor_count_wall_s": round(t_read, 1),
            "py_rss_before_mb": round(rss0, 1),
            "py_rss_after_delete_mb": round(rss1, 1),
            "py_rss_after_read_mb": round(rss2, 1),
            "delete_dirs": len(fl_table_props(root)["delete_dirs"]),
        }
        out["points"].append(rec)
        print(rec, flush=True)
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    with open(os.path.join(_HERE, "scripts", "scale_delete_mor.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    main()
