"""Capture .explain('formatted') for named catalog queries into
plans/$SPARK_GRAFT_PLAN_DIR/<query>_<tag>.txt (default r13) — the
before/after evidence the optimization round commits alongside code
changes.

Run: python scripts/capture_plans.py <before|after> name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
     SPARK_GRAFT_PLAN_DIR (default r13)
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import SparkSession  # noqa: E402

from citybikedatawarehouse_spark.plans.catalog import QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        _HERE, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("capture_plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        p = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(plan)
        print(f"wrote {p} ({len(plan)} chars)", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
