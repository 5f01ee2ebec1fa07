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


def _edge_prep(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_partitioned_by_src: bool = False,
) -> DataFrame:
    """The (dedup + degree) edge preparation, exposed pre-checkpoint
    so plan tests can pin its exchange count. With
    ``assume_partitioned_by_src`` the explicit repartition is skipped
    — the caller guarantees a src-clustered layout (a bucketed-by-src
    table), and HashPartitioning(src) from the bucketed scan
    satisfies both the (src, dst) dedup's clustering requirement and
    the degree window, so the whole prep runs with ZERO edge-side
    exchanges (tests/test_skew_and_bucketing.py asserts this against
    a saveAsTable-bucketed edge list)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_partitioned_by_src:
        e = e.repartition("src")
    from pyspark.sql import Window as W

    return e.dropDuplicates(["src", "dst"]).withColumn(
        "deg", F.count(F.lit(1)).over(W.partitionBy("src"))
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_partitioned_by_src: bool = False,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """PageRank over a DIRECTED edge list (pass both directions for
    an undirected graph) with a fixed iteration count.

    The node set is the distinct UNION of src and dst endpoints, so
    pure-sink nodes (dst-only) keep their rank and their inflow. The
    rank mass of dangling nodes (out-degree 0) is redistributed
    uniformly each iteration — the standard formulation — so ranks
    sum to ~1 for arbitrary directed input. When the input is
    bidirectional (the q133 co-purchase graph) the dangling set is
    empty and the recurrence reduces exactly to the no-dangling form
    the DuckDB oracle replays: the dangling term is detected ONCE at
    fit time and skipped entirely, keeping the per-iteration plan
    identical (and float results bit-identical) for such graphs.
    Deterministic: fixed iterations, no RNG, pure fixpoint
    arithmetic. Raises ValueError on an empty edge list (PageRank of
    an empty graph is undefined — previously a ZeroDivisionError).

    Returns (node, rank) with rank summing to ~1 over the node set.
    """
    # Partition the edge list by src ONCE (or ride a bucketed-by-src
    # at-rest layout with assume_partitioned_by_src — zero edge-side
    # exchanges) and let everything ride it: degree is a window count
    # (no groupBy+join pair), and localCheckpoint preserves the
    # physical partitioning, so the per-iteration ranks join needs no
    # new edge-side shuffle. One exchange at most serves all three
    # steps: HashPartitioning(src) satisfies the (src, dst) dedup's
    # clustering requirement (equal pairs share a src), and the
    # degree window partitions by src too.
    # the O(E) relation is checkpointed SERIALIZED: default local
    # checkpoints hold deserialized row blocks, and at 100x (180 M
    # edges, ~10-20 GB of rows) that squeezed execution memory into
    # UNABLE_TO_ACQUIRE_MEMORY in the contribution aggregate; the
    # serialized level keeps the lineage cut and the src
    # partitioning while storing the compact columnar form
    from pyspark import StorageLevel

    e_deg = _edge_prep(
        edges, src_col, dst_col, assume_partitioned_by_src
    ).localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    # node set = src ∪ dst endpoints: with bidirectional edges the
    # src set already IS the node set (the union dedups partition-
    # locally after one exchange); with general directed input this
    # is what keeps pure-sink nodes in the output
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge list (no nodes)")
    base = (1.0 - damping) / n_nodes

    # dangling nodes (out-degree 0) detected ONCE: their mass is
    # redistributed uniformly each iteration. For bidirectional
    # graphs the set is empty and the term is skipped, so the
    # per-iteration plan (and the floats) match the no-dangling
    # recurrence the q133 oracle replays.
    dangling = nodes.join(
        e_deg.select(F.col("src").alias("node")).distinct(),
        "node",
        "left_anti",
    ).localCheckpoint(eager=True)
    has_dangling = dangling.limit(1).count() > 0

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(n_iter):
        # ranks are O(|V|) — dim-sized for relation-derived graphs —
        # while e_deg is the O(|E|) corpus-scale relation. WITHOUT the
        # hint the planner broadcasts by size estimate, and a
        # localCheckpoint's stats made it broadcast E_DEG (the O(E)
        # side!) every iteration at sf0.1 — n_iter full driver
        # collects of the edge list. Broadcasting the RANKS side keeps
        # the edge relation cache-local all run: per iteration the
        # only corpus-scale work is one streamed pass over e_deg plus
        # the map-side-combinable groupBy(dst) exchange of O(|V|)
        # partials. The hint is hard (overrides the size threshold),
        # so the LIBRARY default stays False — callers with dim-sized
        # node sets opt in (q133 does); web-scale node sets keep the
        # planner's broadcast protection.
        rank_rel = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            e_deg.join(rank_rel, e_deg.src == rank_rel.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        # nodes is node-partitioned and contrib is dst-partitioned
        # out of its aggregate — the join aligns without new exchanges;
        # per iteration the ONLY corpus-scale shuffle is the groupBy(dst)
        new_ranks = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if has_dangling:
            # 1-row aggregate of the dangling nodes' current rank,
            # broadcast into every partition — O(|dangling|) rows
            # summed, never a corpus shuffle
            dm = ranks.join(dangling, "node").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
            new_ranks = new_ranks.crossJoin(F.broadcast(dm)).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        else:
            new_ranks = new_ranks.select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        # cut the per-iteration lineage growth (same rationale as
        # dedup_clusters): without this the final plan re-executes
        # every earlier iteration per action
        ranks = new_ranks.localCheckpoint(eager=True)
    return ranks


def triangle_counts(
    pairs: DataFrame,
    a_col: str = "p1",
    b_col: str = "p2",
    broadcast_degrees: bool = False,
) -> DataFrame:
    """Per-node triangle participation over an undirected edge set,
    via degree-ordered edge orientation (the standard distributed
    formulation — e.g. Suri & Vassilvitskii's MR triangle counting).

    Each undirected edge is oriented from its lower-(degree, id)
    endpoint to the higher one; wedges are generated by a self-join
    of the oriented list on ``src`` (both out-neighbors ordered by
    the same (deg, id) total order, so each triangle closes through
    exactly ONE oriented edge x→y and is counted exactly once).

    Scale shape: orientation bounds every out-degree at O(√E), so
    the wedge self-join emits ≤ E^1.5 rows total regardless of hub
    skew — the reason this beats the naive "join edges to edges to
    edges" which is quadratic in the max degree. Three shuffles
    (degree agg, wedge self-join on src, closing join on (x, y)),
    all map-side combinable or key-partitioned; no per-row arrays,
    no driver state. Returns (node, n_triangles), one row per node
    that participates in ≥ 1 triangle.
    """
    from pyspark import StorageLevel

    canon = (
        pairs.select(
            F.least(a_col, b_col).alias("a"),
            F.greatest(a_col, b_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        # canon feeds FIVE subtrees before ``oriented`` materializes:
        # the degree union's two branches (per degree attachment,
        # da AND db are separate relations) and the edge join itself —
        # unpersisted, the CALLER'S edge-generation pipeline (q176:
        # the lineitem co-purchase groupBy + pair explode + dedup)
        # executed 5x inside the one persist-building action
        # (r13 plan audit: 5 full Scan-parquet→collect_set→Generate
        # chains under InMemoryRelation(2)). Persisted, it executes
        # once; every other read is a cache scan of O(E) rows.
        # Serialized spillable level, same 100x-OOM rationale as
        # ``oriented`` below.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        # O(|V|) rows, two consumers (da and db): cache the one
        # degree aggregate instead of running it per attachment
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # deg is |V| rows — dim-sized for relation-derived graphs (the
    # co-purchase node set is the part catalog), so OPT-IN callers
    # broadcast both degree attachments instead of exchanging the
    # O(E) canon twice (measured q176 8.1 -> 6.9 s at sf0.1, which
    # passes broadcast_degrees=True). The hint is HARD — F.broadcast
    # overrides the size threshold and a web-scale |V| would OOM an
    # executor — so the LIBRARY default is False: unknown callers
    # keep the planner's size-based broadcast protection, and the
    # measured call sites opt in explicitly.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    if broadcast_degrees:
        da, db = F.broadcast(da), F.broadcast(db)
    ed = canon.join(da, "a").join(db, "b")
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        # degree of the HIGH endpoint: the sort key that keeps the
        # wedge pair (x, y) aligned with the closing edge's x→y
        # orientation
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dd"),
    )
    # oriented feeds THREE consumers (both wedge sides + the closing
    # join); without materialization the whole upstream — edge
    # canonicalization, degree agg, two degree joins, and the
    # caller's edge-generation pipeline — replicates into each branch
    # (measured: 15 parquet scans in the q176 plan). Serialized
    # spill-to-disk persist, NOT localCheckpoint: the edge relation
    # is O(E) and at 100× scale a deserialized on-heap checkpoint
    # OOMed an 8 GiB driver (measured), while serialized columnar
    # batches spill; lineage-cutting isn't needed here (no
    # iteration), only reuse.
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = (
        o1.join(o2, "src")
        .where(
            (F.col("o1.dd") < F.col("o2.dd"))
            | (
                (F.col("o1.dd") == F.col("o2.dd"))
                & (F.col("o1.dst") < F.col("o2.dst"))
            )
        )
        .select(
            F.col("src").alias("w0"),
            F.col("o1.dst").alias("x"),
            F.col("o2.dst").alias("y"),
        )
    )
    closing = oriented.select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"])
    corners = tri.select(F.explode(F.array("w0", "x", "y")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def triangle_sample_estimate(
    pairs: DataFrame,
    p_permille: int = 500,
    a_col: str = "p1",
    b_col: str = "p2",
    salt: str = "tri",
    with_exact: bool = False,
) -> DataFrame:
    """DOULION-style sampled triangle count (Tsourakakis et al., KDD
    2009): keep each undirected edge independently with probability
    p = ``p_permille``/1000, count triangles EXACTLY on the sampled
    subgraph with the same degree-ordered wedge join as
    ``triangle_counts``, and scale by 1/p^3 (each triangle survives
    with probability p^3, so the scaled count is unbiased; relative
    error concentrates as O(1/sqrt(p^3 * T))).

    Sampling is a DETERMINISTIC pure hash of the canonical edge
    (md5('<salt>:a:b') first-8-hex mod 1000 < p_permille), not
    rand(): reruns, retried tasks, and the DuckDB oracle all select
    the identical edge subset, and a different ``salt`` gives an
    independent replicate for variance estimation.

    This is the single-box validation path for triangle workloads
    whose EXACT wedge shuffle exceeds local disk (q176 at 100x
    projects ~100 GB of wedges): at p = 1/8 the wedge volume drops
    ~64x (p^2 per wedge) while a graph with millions of triangles
    keeps sub-percent expected error. Returns one row:
    (n_edges, n_sampled_edges, tri_sampled, tri_estimate).

    ``with_exact=True`` adds ``tri_exact`` and ``rel_error`` columns
    by ALSO counting triangles on the full edge set — the test-scale
    audit mode (q262). Both legs then read the SAME persisted
    canonical edge relation, so the caller's edge-generation pipeline
    (e.g. the co-purchase lineitem self-join) executes once, not once
    per leg — measured 12.8 s -> 11.0 s for q262 at sf0.1 (the
    per-leg degree/orientation work is inherently separate, so the
    saving is the edge-gen pipeline only). At 100 TB you run
    ``with_exact=False``: sampled leg only.
    """
    canon = (
        pairs.select(
            F.least(a_col, b_col).alias("a"),
            F.greatest(a_col, b_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    h = F.md5(
        F.concat_ws(
            ":",
            F.lit(salt),
            F.col("a").cast("string"),
            F.col("b").cast("string"),
        )
    )
    keep = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000
    ) < F.lit(p_permille)
    flagged = canon.select("a", "b", keep.alias("keep"))
    from pyspark import StorageLevel

    flagged = flagged.persist(StorageLevel.MEMORY_AND_DISK)
    sampled = flagged.where("keep").select(
        F.col("a").alias("p1"), F.col("b").alias("p2")
    )
    tri_nodes = triangle_counts(sampled)
    # total triangles = sum of per-node participation / 3
    counts = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum(F.col("keep").cast("bigint"))
        .cast("bigint")
        .alias("n_sampled_edges"),
    )
    tri = tri_nodes.agg(
        (F.coalesce(F.sum("n_triangles"), F.lit(0)) / 3)
        .cast("bigint")
        .alias("tri_sampled")
    )
    p = p_permille / 1000.0
    base = counts.crossJoin(tri).select(
        "n_edges",
        "n_sampled_edges",
        "tri_sampled",
        F.round(F.col("tri_sampled") / F.lit(p**3))
        .cast("bigint")
        .alias("tri_estimate"),
    )
    if not with_exact:
        return base
    # audit leg: exact count over ALL edges, read from the same
    # persisted relation the sampled leg used (re-canonicalizing a
    # distinct canonical edge list is a no-op shuffle on O(E) persisted
    # rows — far cheaper than replaying the caller's edge generation)
    exact = triangle_counts(
        flagged.select(F.col("a").alias("p1"), F.col("b").alias("p2"))
    ).agg(
        (F.coalesce(F.sum("n_triangles"), F.lit(0)) / 3)
        .cast("bigint")
        .alias("tri_exact")
    )
    return base.crossJoin(exact).select(
        "n_edges",
        "n_sampled_edges",
        "tri_exact",
        "tri_sampled",
        "tri_estimate",
        F.round(
            F.abs(F.col("tri_estimate") - F.col("tri_exact"))
            / F.nullif(F.col("tri_exact"), F.lit(0)),
            6,
        ).alias("rel_error"),
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_labels: bool = False,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan
    et al. 2007, made deterministic): every node starts labeled with
    its own id; each iteration relabels every node with the most
    frequent label among its in-neighbors PLUS its own current label
    (the self-vote damps the 2-cycle oscillation synchronous LPA is
    prone to), ties broken to the smallest label. Fixed ``n_iter``
    rounds — no RNG, no convergence check — so the full run replays
    as a SQL CTE chain.

    Distinct from pointer-jumping connected components
    (operators/dedup_ops.dedup_clusters): the MODE vote splits dense
    regions joined by thin bridges instead of flooding the whole
    component with one min-label.

    Expects a DIRECTED edge list; pass both directions for an
    undirected graph (the q179 co-purchase use). Returns
    (node, community).

    Scale shape: edges are materialized once; per iteration ONE
    src-keyed join (labels ⋈ edges), one map-side-combinable
    (node, label) count and one node-keyed window — all O(E) rows,
    nothing driver-side; labels are localCheckpointed per round so
    the plan never re-executes earlier iterations."""
    from pyspark import StorageLevel

    # static relation reused every round: serialized spillable
    # persist (same 100×-OOM rationale as triangle_counts); the
    # per-round labels DO need localCheckpoint — it's the lineage
    # cut, and they're only O(V)
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .dropDuplicates(["src", "dst"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # seed from the UNION of endpoints (as pagerank does): on a
    # genuinely directed edge list a dst-only node must still cast
    # its round-1 self-vote; on the documented bidirectional input
    # src-nodes == all nodes, so this is identity there
    labels = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window as W

    for _ in range(n_iter):
        # labels are O(V) — dim-sized for relation-derived graphs —
        # while the persisted edge list is O(E): broadcasting the
        # labels removes the per-round edge-side exchange (n_iter x
        # O(E) shuffles -> 0). Measured NEUTRAL at sf0.1 (the mode
        # groupBy dominates there); the win is structural at scale,
        # where re-shuffling E per round is the bottleneck. The hint
        # is hard (overrides the size threshold), so the LIBRARY
        # default is False — callers with dim-sized node sets opt in
        # (q179 does); web-scale node sets keep planner protection.
        lbl_rel = labels.select(F.col("node").alias("src"), "lbl")
        if broadcast_labels:
            lbl_rel = F.broadcast(lbl_rel)
        votes = e.join(lbl_rel, "src").select(
            F.col("dst").alias("node"), "lbl"
        ).unionAll(labels)
        cnt = votes.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
        new = (
            cnt.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("node").orderBy(F.desc("c"), "lbl")
                ),
            )
            .where(F.col("rn") == 1)
            .select("node", "lbl")
        )
        labels = new.localCheckpoint(eager=True)
    return labels.select("node", F.col("lbl").alias("community"))


def k_core(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 8,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """The k-core of an undirected canonical edge set (a < b): the
    maximal subgraph where every node keeps degree >= k, found by
    iterative peeling — drop all nodes below k, restrict the edges,
    repeat. Peeling is run for at most ``max_rounds`` SYNCHRONOUS
    rounds with early exit once the edge set is stable; because a
    stable round is a no-op, a fixed-round replay (the DuckDB
    oracle) produces the identical result whenever convergence
    happens within the budget — the same fixed-iteration parity
    convention as the k-means/PageRank fits. Callers that need a
    guarantee assert stability (see tests).

    Returns the core's canonical edge list.

    Scale shape: per round one degree aggregate (map-side
    combinable) + two semi-joins against the >= k node set; the edge
    relation only ever SHRINKS. Each round's edges are
    localCheckpointed at the serialized-spillable level — the
    checkpoint CUTS THE LINEAGE, which a bare persist does not:
    round n's logical plan re-embeds round n-1's through BOTH
    semi-join branches, so an uncut peel renders a 2^rounds plan
    tree and a graph that peels for the full round budget OOMs the
    driver in plan-STRING generation before any data moves (found
    by hypothesis on a 14-edge graph). Never more than two edge
    generations live; nothing driver-side except the per-round
    stability count."""
    from pyspark import StorageLevel

    e = (
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = e.count()
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        nxt = (
            e.join(keep.select(F.col("node").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        )
        n_next = nxt.count()
        e.unpersist()
        e = nxt
        if n_next == n_edges:
            break
        n_edges = n_next
    return e


def bfs_hops(
    edges: DataFrame,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Breadth-first hop distances from a DETERMINISTIC seed — the
    max-degree node (ties to the low id) — over a directed edge list,
    bounded at ``max_hops`` synchronous frontier expansions. Returns
    (node, hop) for every node reachable within the budget; the seed
    itself carries hop 0. The traversal kernel the centrality/
    community kernels here don't cover: "what can I reach in k steps"
    (neighborhood sampling for graph features, blast-radius
    estimation, degrees-of-separation reports).

    Fixed frontier count + min-hop merge makes the result exactly
    replayable as a DuckDB CTE chain (the q215 oracle), the same
    fixed-iteration parity convention as pagerank/k_core.

    Scale shape: per round ONE join of the CURRENT FRONTIER (not the
    whole visited set) against edges pre-partitioned on src, then a
    min-hop aggregate over O(visited) rows; the visited relation is
    localCheckpointed each round (O(V) rows, lineage cut — the
    iterative-loop rule). Nothing is collected driver-side."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    seed = (
        deg.orderBy(F.desc("deg"), "src")
        .limit(1)
        .select(F.col("src").alias("node"), F.lit(0).alias("hop"))
    )
    dist = seed.localCheckpoint(eager=True)
    for h in range(1, max_hops + 1):
        dist = _bfs_expand(dist, e, h).localCheckpoint(eager=True)
    return dist


def _bfs_expand(dist: DataFrame, e: DataFrame, h: int) -> DataFrame:
    """One synchronous frontier expansion + min-hop merge (the plan
    tests pin this step's shape — bfs_hops checkpoints it eagerly,
    so the round's join never appears in the caller's final plan).

    The frontier is BROADCAST: each expansion is then ONE
    broadcast-hash pass over the (cached) edge relation — no
    per-round shuffle or sort of O(E). Without the hint Spark
    sort-merge-joins and re-exchanges the full 239M-edge set every
    round (measured 175 s -> 120 s end-to-end at 100x,
    sf10-equivalent, of which 54 s is the one-off edge build). The
    frontier is O(component nodes) = dimension-sized here; for
    graphs whose frontier outgrows a broadcast, pre-bucket edges by
    src instead (pagerank's assume_partitioned_by_src story above)."""
    frontier = F.broadcast(dist.where(F.col("hop") == h - 1))
    nxt = frontier.join(e, frontier.node == e.src).select(
        F.col("dst").alias("node"), F.lit(h).alias("hop")
    )
    return (
        dist.unionAll(nxt)
        .groupBy("node")
        .agg(F.min("hop").alias("hop"))
    )
