"""Verify the driver contract exactly as the external driver does:
plain SparkSession, entry() smoke, a sample of queries vs their
DuckDB oracles (always incl. one events/nanos query + one join).
Usage: python scripts/verify_driver.py [query ...]  (default sample)
"""

from __future__ import annotations

import importlib.util
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(_HERE, "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_harness import compare  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DEFAULT_SAMPLE = [
    "q01_pricing_summary",
    "q05_region_volume",      # join query (broadcast-audit target)
    "q35_tumbling_window",    # events-based: nanos self-healing path
    "q38_asof_join",          # events-based join
    "q61_ngram_jaccard",
    "q74_ivf_ann_topk",       # rows-only: just runs + row count
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_SAMPLE
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = mod.entry(spark).collect()
    assert len(rows) > 0, "entry() returned 0 rows"
    print(f"entry() smoke: {len(rows)} rows OK", flush=True)

    qs, oracles = mod.queries(), mod.oracle_sql()
    for name in names:
        if name in oracles:
            compare(spark, name, qs[name], oracles[name], SF_DIR)
            print(f"{name}: oracle match OK", flush=True)
        else:
            n = qs[name](spark, SF_DIR).count()
            print(f"{name}: rows-only, {n} rows", flush=True)
    print("VERIFY PASS")
    spark.stop()


if __name__ == "__main__":
    main()
