"""Graph capacity probes — round-5 verdict task: run the GNM workloads
(integer PageRank, degree-ordered triangles, k-core, components) at
10-50 M edges on a SKEWED (Zipf-ish) synthetic graph and record
edges/sec + the wedge-bound evidence in BASELINE.md.

Graph: E directed edges over N nodes; src = i % N (so every node has
out-degree E/N >= 1 — pagerank's no-dangling contract), dst drawn
log-uniformly (dst = floor(N^u), u = hash-uniform) which yields a
Zipf-like in-degree tail: node j receives ~ E / (j ln N) edges, so the
top hub carries ~E/ln(N) edges — real skew, not a uniform grid.

Usage:
    python jobs/graph_capacity.py [edges_millions] [cpus]

Prints one JSON line per probe: {job, edges, seconds, edges_per_sec,
rounds?, max_oriented_outdeg?, wedge_bound?}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def build_edges(spark, n_edges: int, n_nodes: int):
    """Deterministic skewed edge list, fully JVM-side."""
    e = spark.range(n_edges).selectExpr(
        f"id % {n_nodes} AS src",
        # log-uniform target: floor(N^u) in [1, N), u from xxhash64
        f"CAST(floor(exp(ln({n_nodes}.0e0) * "
        f"(CAST(pmod(xxhash64(id), 1000000) AS DOUBLE) / 1.0e6))) "
        f"AS BIGINT) % {n_nodes} AS dst",
    ).filter("src <> dst")
    return e


def probe_pagerank(spark, e, rounds=5):
    from gdal_spark.operators.graph import pagerank_integer

    t0 = time.time()
    out = pagerank_integer(e, rounds=rounds)
    n = out.count()
    total = out.agg(F.sum("rank")).collect()[0][0]
    return time.time() - t0, {"nodes": n, "rank_mass": int(total),
                              "rounds": rounds}


def probe_triangles(spark, e):
    """Degree-ordered triangle counting (Suri & Vassilvitskii 2011) on
    the undirected closure; returns the wedge-bound evidence: the max
    ORIENTED out-degree must be <= sqrt(2m)."""
    und = (
        e.selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = und.count()
    t0 = time.time()
    deg = (
        und.selectExpr("u AS node").unionAll(und.selectExpr("v AS node"))
        .groupBy("node").agg(F.count("*").alias("deg"))
    )
    # orient each edge from lower (deg, node) to higher
    du = deg.selectExpr("node AS u", "deg AS du")
    dv = deg.selectExpr("node AS v", "deg AS dv")
    oriented = (
        und.join(du, "u").join(dv, "v")
        .selectExpr(
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a",
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b",
        )
        .localCheckpoint(eager=True)
    )
    max_out = oriented.groupBy("a").count().agg(F.max("count")).collect()[0][0]
    # wedges: two oriented edges out of the same node; close against the
    # oriented edge set
    w1 = oriented.selectExpr("a", "b AS x")
    w2 = oriented.selectExpr("a", "b AS y")
    wedges = w1.join(w2, "a").filter("x < y")
    closing = oriented.selectExpr("a AS x", "b AS y")
    tri = wedges.join(closing, ["x", "y"]).count()
    dt = time.time() - t0
    bound = (2 * m) ** 0.5
    return dt, {
        "m_undirected": m,
        "triangles": int(tri),
        "max_oriented_outdeg": int(max_out),
        "wedge_bound_sqrt_2m": round(bound, 1),
        "bound_holds": bool(max_out <= bound),
    }


def probe_kcore(spark, e, k=30):
    from gdal_spark.operators.graph import k_core

    und = e.selectExpr("src", "dst").unionAll(
        e.selectExpr("dst AS src", "src AS dst")
    )
    t0 = time.time()
    core = k_core(und, k=k, max_rounds=60)
    n = core.count()
    return time.time() - t0, {"k": k, "core_nodes": n}


def probe_components(spark, e):
    from gdal_spark.operators.graph import min_label_components

    und = e.selectExpr("src", "dst").unionAll(
        e.selectExpr("dst AS src", "src AS dst")
    )
    t0 = time.time()
    comp = min_label_components(und, max_rounds=40)
    n = comp.select("component").distinct().count()
    return time.time() - t0, {"components": n}


def main():
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_edges = int(millions * 1e6)
    n_nodes = max(1000, n_edges // 20)

    from gdal_spark.session import get_spark

    spark = get_spark(
        app_name="graph-capacity", cpus=cpus, shuffle_partitions=cpus
    )
    e = build_edges(spark, n_edges, n_nodes).localCheckpoint(eager=True)
    real_e = e.count()

    for name, fn in (
        ("pagerank", probe_pagerank),
        ("triangles", probe_triangles),
        ("kcore", probe_kcore),
        ("components", probe_components),
    ):
        dt, extra = fn(spark, e)
        print(json.dumps({
            "job": name,
            "edges": real_e,
            "nodes": n_nodes,
            "seconds": round(dt, 2),
            "edges_per_sec": int(real_e / dt),
            **extra,
        }), flush=True)


if __name__ == "__main__":
    main()
