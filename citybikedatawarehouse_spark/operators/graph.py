"""Distributed graph analytics over relation-derived edge lists.

The reference warehouse has no graph surface (its 806 lines are
pandas ETL); this module is part of the SURVEY.md §2.4 north-star
extensions: graphs that ARISE from warehouse relations (co-purchase
graphs from fact tables, near-duplicate graphs from dedup pairs) and
the iterative algorithms a training-data / analytics pipeline runs
on them. The connected-components sibling lives in
``operators.dedup_ops.dedup_clusters``; this module adds PageRank.

Scale shape: every iteration is one join (ranks ⋈ edges, both
pre-partitioned on the source id) + one map-side-combinable
aggregate (contributions by destination). The edge list and the
per-node degree relation are materialized ONCE (localCheckpoint) —
without that, iteration k would re-execute the whole upstream
edge-generation pipeline k times. Ranks are O(|V|) rows; edges are
O(|E|) — nothing driver-side ever holds more than the iteration
count. At 100 TB the same plan holds with edges bucketed by ``src``
so the per-iteration join is shuffle-free on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a DIRECTED edge list (pass both directions for
    an undirected graph) with a fixed iteration count.

    The node set is the distinct endpoints of ``edges``; because
    every node therefore has out-degree >= 1 when the graph is
    undirected, there is no dangling-mass redistribution term — the
    caller restricts to the reachable subgraph (documented in the
    q133 plan). Deterministic: fixed iterations, no RNG, pure
    fixpoint arithmetic — the DuckDB oracle replays the identical
    recurrence as a CTE chain.

    Returns (node, rank) with rank summing to ~1 over the node set.
    """
    from pyspark.sql import Window as W

    # Partition the edge list by src ONCE and let everything ride
    # that exchange: degree is a window count (no groupBy+join pair),
    # and localCheckpoint preserves the physical partitioning, so the
    # per-iteration ranks join needs no new edge-side shuffle — the
    # bucketed-by-src layout a 100 TB graph would use at rest.
    # one exchange serves all three steps: HashPartitioning(src)
    # satisfies the (src, dst) dedup's clustering requirement (equal
    # pairs share a src), and the degree window partitions by src too
    e_deg = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn("deg", F.count(F.lit(1)).over(W.partitionBy("src")))
        .localCheckpoint(eager=True)
    )
    # with bidirectional edges the src set IS the node set, and it is
    # already src-partitioned — the distinct is a partition-local dedup
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(n_iter):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        # nodes is node(=src)-partitioned and contrib is dst-partitioned
        # out of its aggregate — the join aligns without new exchanges;
        # per iteration the ONLY corpus-scale shuffle is the groupBy(dst)
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            # cut the per-iteration lineage growth (same rationale as
            # dedup_clusters): without this the final plan re-executes
            # every earlier iteration per action
            .localCheckpoint(eager=True)
        )
    return ranks
