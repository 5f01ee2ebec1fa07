"""Range-partitioned global ranking — the scale escape hatch the
q206/q218 docstrings promise for their single-partition
``Window.orderBy`` steps.

A global ``row_number() OVER (ORDER BY ...)`` funnels every row
through ONE task — fine on the O(10-row) post-aggregate relations
where the catalog uses it, fatal on an O(customers) relation at
extreme cardinality. The standard distributed alternative is the
two-phase rank:

  1. ``repartitionByRange`` on the order keys (each partition owns a
     contiguous key range; partition ids ascend with the sort order)
     and sort within partitions;
  2. assign LOCAL 1-based indexes per partition with a streaming
     counter (an Arrow-batched ``mapInPandas`` — a window partitioned
     by ``spark_partition_id`` would re-shuffle on the pid hash and
     defeat the range layout);
  3. compute each partition's row count (a #partitions-row
     aggregate), prefix-sum it into per-partition OFFSETS on that
     tiny relation, broadcast-join the offsets back:
     global rank = local index + offset.

Every stage is O(rows/partitions) per task; nothing funnels.

The order keys must define a TOTAL order (add a unique tiebreak
column) — same determinism rule as every windowed catalog query.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rn",
    n_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_by)`` without a global
    single-partition funnel. Returns ``df``'s columns plus
    ``out_col`` (1-based, bigint). ``order_by`` must be a total
    order for the result to be deterministic."""
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
    )

    out_fields = list(parted.schema.fields) + [
        StructField("__lrn", LongType(), False)
    ]
    out_schema = StructType(out_fields)

    def _local_index(batches):
        base = 0
        for pdf in batches:  # one partition per call, batches in order
            k = len(pdf)
            pdf = pdf.assign(__lrn=range(base + 1, base + k + 1))
            base += k
            yield pdf

    local = parted.mapInPandas(_local_index, out_schema).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # #partitions-row relation: counts -> exclusive prefix-sum offsets
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    wcum = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(wcum), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__lrn") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )
