"""Network analysis — GNM (Geographic Network Model) analog.

Re-answers GNMGenericNetwork's Dijkstra shortest-path query
(gnm/gnmgraph.cpp DijkstraShortestPathTree) with the distributed
formulation: Bellman–Ford edge-relaxation rounds over a (src, dst, w)
edge table.  Each round is one equi-join of the frontier distances
against the edge list plus a min-aggregation — the standard Pregel
shape; rounds are bounded by the maximum hop count of any optimal path
(NOT graph size), and the loop raises loudly on non-convergence instead
of returning a partially-relaxed tree.

Scale shape: the distance table is node-count-sized and shuffles on the
node key; the (usually much larger) edge table is the static join side
and never aggregates.  Every round ends in an EAGER localCheckpoint —
the self-referencing join lineage otherwise grows per round until
Catalyst analysis hangs (see the polygonize/sieve/dedup_clusters note
in CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame, source: int, max_rounds: int = 30
) -> DataFrame:
    """(node_id, dist) of every node reachable from ``source``.

    ``edges``: (src, dst, w) directed weighted edges (emit both
    directions for an undirected network), integer weights.  Exact —
    all arithmetic stays in longs."""
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(source, 0)], "node_id long, dist long"
    ).localCheckpoint(eager=True)
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("w").cast("long").alias("w"),
    )
    for _ in range(max_rounds):
        relax = (
            dist.join(e, dist.node_id == e.src)
            .select(F.col("dst").alias("node_id"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        new = (
            dist.unionByName(relax)
            .groupBy("node_id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(dist.alias("o"), "node_id", "left")
            .filter(
                F.col("o.dist").isNull() | (F.col("n.dist") != F.col("o.dist"))
            )
            .count()
        )
        dist = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"shortest_paths: Bellman-Ford did not converge in "
            f"{max_rounds} rounds — an optimal path has more hops than "
            "expected; raise max_rounds"
        )
    return dist


def shortest_path_tree(
    edges: DataFrame, source: int, max_rounds: int = 30, pred_bits: int = 8
) -> DataFrame:
    """(node_id, dist, pred) — the full Dijkstra shortest-path TREE
    (gnm/gnmgraph.cpp DijkstraShortestPathTree), from which any route is
    a predecessor walk.

    Tie-break: among equal-distance predecessors the SMALLEST node id
    wins (the reference's tree depends on heap traversal order — an
    implementation detail; the min rule is the deterministic,
    shuffle-order-proof canonicalization, documented divergence).
    Implemented by relaxing a PACKED key dist·2^pred_bits + pred, so the
    lexicographic (dist, pred) minimum is a plain integer MIN — exact,
    aggregation-order-free.  Caller guarantees node ids < 2^pred_bits
    and dist·2^pred_bits within int64."""
    spark = edges.sparkSession
    scale = 1 << pred_bits
    dist = spark.createDataFrame(
        [(source, source)], "node_id long, pack long"
    ).selectExpr("node_id", f"CAST(pack AS LONG) AS pack").localCheckpoint(
        eager=True
    )
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("w").cast("long").alias("w"),
    )
    for _ in range(max_rounds):
        relax = dist.join(e, dist.node_id == e.src).select(
            F.col("dst").alias("node_id"),
            (
                (F.expr(f"pack div {scale}") + F.col("w")) * scale
                + F.col("src")
            ).alias("pack"),
        )
        new = (
            dist.unionByName(relax)
            .groupBy("node_id")
            .agg(F.min("pack").alias("pack"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(dist.alias("o"), "node_id", "left")
            .filter(
                F.col("o.pack").isNull() | (F.col("n.pack") != F.col("o.pack"))
            )
            .count()
        )
        dist = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"shortest_path_tree: did not converge in {max_rounds} rounds"
        )
    return dist.selectExpr(
        "node_id",
        f"pack div {scale} AS dist",
        f"pack % {scale} AS pred",
    )


def min_label_components(edges: DataFrame, max_rounds: int = 30) -> DataFrame:
    """(node_id, component) — connected components of the network, the
    GNM connectivity query (gnm/gnmgraph.cpp ConnectComponents analog):
    every node takes the minimum node id reachable from it.

    Same relaxation shape as :func:`shortest_paths` with weight 0 and
    identity init; nodes are whatever appears as an edge endpoint
    (isolated nodes are the caller's concern).  Converges in
    O(component diameter) rounds, eager lineage truncation per round,
    loud failure beyond ``max_rounds``."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    lab = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .withColumn("component", F.col("node_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        relax = lab.join(e, lab.node_id == e.src).select(
            F.col("dst").alias("node_id"), F.col("component")
        )
        new = (
            lab.unionByName(relax)
            .groupBy("node_id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(lab.alias("o"), "node_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        lab = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"min_label_components: label propagation did not converge "
            f"in {max_rounds} rounds; raise max_rounds"
        )
    return lab


def pagerank_integer(
    edges: DataFrame,
    rounds: int = 10,
    scale: int = 10**10,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """K power-iteration rounds of PageRank in EXACT integer fixed-point.

    Classic float PageRank sums partition-ordered doubles — not
    reproducible across cluster sizes.  This variant keeps every rank in
    integer units of ``1/scale``: the per-edge contribution is the exact
    floor division (rank·d) // (den·deg) and the teleport term
    (den−d)·scale // den, so every aggregate is an integer SUM —
    associative, hence bit-identical at any parallelism.  The floor
    leaks ≤ deg ulps of mass per node per round (deterministic).

    ``edges``: (src, dst) directed; every node must have out-degree ≥ 1
    (no dangling handling — the caller's graph is strongly connected).
    Each round ends in an eager localCheckpoint (the repo's iterative-
    lineage rule)."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src")
    teleport = ((damp_den - damp_num) * scale) // damp_den
    r = (
        deg.select(F.col("src").alias("node_id"))
        .withColumn("rank", F.lit(scale).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        contrib = r.join(ed, r.node_id == ed.src).select(
            F.col("dst").alias("node_id"),
            F.expr(
                f"CAST((rank * {damp_num}"
                f" - ((rank * {damp_num}) % ({damp_den} * deg)))"
                f" / ({damp_den} * deg) AS LONG)"
            ).alias("c"),
        )
        r = (
            contrib.groupBy("node_id")
            .agg((F.lit(teleport) + F.sum("c")).cast("long").alias("rank"))
            .localCheckpoint(eager=True)
        )
    return r


def k_core(edges: DataFrame, k: int, max_rounds: int = 30) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node has
    degree >= k, by iterative peeling (Seidman 1983; the standard
    distributed formulation — each round drops nodes whose CURRENT
    degree < k, which lowers neighbors' degrees, until fixpoint).

    ``edges``: (src, dst) directed, both directions present for an
    undirected graph.  Exact integer degrees; each round is one
    semi-join + one map-side-combined degree reduce, ended by an eager
    localCheckpoint (the iterative-lineage rule).  Raises if the
    fixpoint needs more than ``max_rounds`` (peeling removes >= 1 node
    per non-final round, so rounds are bounded by |V|)."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        new_e = (
            e.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        if new_e.count() == e.count():
            surv = new_e.groupBy("src").agg(
                F.count("*").cast("long").alias("core_deg")
            )
            return surv.selectExpr("src AS node_id", "core_deg")
        e = new_e
    raise RuntimeError(f"k_core: no fixpoint within {max_rounds} rounds")
