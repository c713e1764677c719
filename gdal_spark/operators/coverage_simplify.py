"""Coverage simplification (gdal vector simplify-coverage).

The reference exposes this only as a pass-through to GEOS >= 3.12
(apps/gdalalg_vector_simplify_coverage.cpp:46-47 version gate,
GEOSCoverageSimplifyVW): simplify a polygonal COVERAGE so that shared
boundaries remain shared — no gaps or overlaps appear — by simplifying
every topological arc exactly once and letting both owners reuse it.

Spark-first decomposition (no GEOS in this engine):

1. ring edges (one mapInPandas parse pass, per-feature);
2. undirected edge ownership: one groupBy on the canonical edge key —
   an edge owned by two features is interior, by one is outer boundary
   (>2 owners = not a coverage, surfaced loudly);
3. junction vertices: a vertex is a node of the arc graph iff its
   edge valence != 2 or its two edges have different owner sets;
4. arcs: connected components of edges linked through non-junction
   vertices — min-label propagation over the (string) edge keys with
   eager lineage truncation per round (the repo's polygonize/GNM loop
   shape; arcs are paths/cycles so rounds = max arc length, bounded by
   per-feature vertex counts, never by corpus size);
5. per-arc Visvalingam-Whyatt: smallest effective triangle area
   removed while strictly below the area tolerance, ties broken by
   smallest chain index, arc endpoints pinned (closed-loop arcs pin
   the lexicographic-min vertex as anchor); arcs wholly on the outer
   boundary are skipped when ``preserve_boundary``;
6. reassembly is a JOIN, not a walk: a ring vertex survives iff it is
   a junction or its (arc, vertex) survived step 5 — both owners of a
   shared arc therefore emit bit-identical boundary chains by
   construction.

Documented divergences from the GEOS implementation the reference
defers to: classic VW scoring (GEOS adds corner-intersection repair),
area tolerance passed directly (GEOS squares a distance tolerance),
and the closed-loop anchor rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.geometry.wkt import parse_wkt, polygon_wkt


def vw_simplify(pts: np.ndarray, area_tol: float, closed: bool) -> np.ndarray:
    """Visvalingam-Whyatt on an open chain (endpoints fixed) or a
    closed loop (pts[0] is the anchor; pts has no duplicate closing
    vertex).  Returns a boolean keep-mask over ``pts``.

    Rescan formulation: after every removal the neighbours' effective
    areas are recomputed from the live chain (the pytest twin uses a
    linked-list formulation instead).
    """
    n = len(pts)
    alive = np.ones(n, dtype=bool)
    if n <= (3 if closed else 2):
        return alive

    def area(i: int) -> float:
        live = np.flatnonzero(alive)
        k = np.searchsorted(live, i)
        if closed:
            p = live[(k - 1) % len(live)]
            q = live[(k + 1) % len(live)]
        else:
            p, q = live[k - 1], live[k + 1]
        d1 = pts[p] - pts[i]
        d2 = pts[q] - pts[i]
        return abs(d1[0] * d2[1] - d1[1] * d2[0]) / 2.0

    while True:
        live = np.flatnonzero(alive)
        if len(live) <= (3 if closed else 2):
            break
        interior = live if closed else live[1:-1]
        if closed:
            interior = interior[interior != 0]  # anchor pinned
        if len(interior) == 0:
            break
        areas = np.array([area(i) for i in interior])
        k = int(np.argmin(areas))  # first minimum = smallest index
        if areas[k] < area_tol:
            alive[interior[k]] = False
        else:
            break
    return alive


def _edges_from_features(feats: DataFrame) -> DataFrame:
    """(fid, ring, pos, ax, ay, bx, by) directed ring edges."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for fid, wkt in zip(pdf["fid"], pdf["geom_wkt"]):
                typ, rings = parse_wkt(wkt)
                if typ != "POLYGON":
                    raise ValueError(f"coverage features must be POLYGON: {typ}")
                for ri, ring in enumerate(rings):
                    v = np.asarray(ring, dtype=np.float64)
                    if np.array_equal(v[0], v[-1]):
                        v = v[:-1]
                    nxt = np.roll(v, -1, axis=0)
                    rows.append(
                        pd.DataFrame(
                            {
                                "fid": int(fid),
                                "ring": ri,
                                "pos": np.arange(len(v)),
                                "ax": v[:, 0],
                                "ay": v[:, 1],
                                "bx": nxt[:, 0],
                                "by": nxt[:, 1],
                            }
                        )
                    )
            yield pd.concat(rows) if rows else pd.DataFrame(
                columns=["fid", "ring", "pos", "ax", "ay", "bx", "by"]
            )

    return feats.mapInPandas(
        parse, "fid int, ring int, pos int, ax double, ay double, bx double, by double"
    )


def _arc_components(pairs: DataFrame, nodes: DataFrame, max_rounds: int) -> DataFrame:
    """Min-label CC over string node ids: (ekey, arc_id)."""
    e = pairs.select("e1", "e2").unionByName(
        pairs.select(F.col("e2").alias("e1"), F.col("e1").alias("e2"))
    )
    lab = nodes.select(
        F.col("ekey"), F.col("ekey").alias("arc_id")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        relax = lab.join(e, lab.ekey == e.e1).select(
            F.col("e2").alias("ekey"), F.col("arc_id")
        )
        new = (
            lab.unionByName(relax)
            .groupBy("ekey")
            .agg(F.min("arc_id").alias("arc_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(lab.alias("o"), "ekey")
            .filter(F.col("n.arc_id") != F.col("o.arc_id"))
            .count()
        )
        lab = new
        if changed == 0:
            return lab
    raise RuntimeError(
        f"simplify_coverage: arc labeling did not converge in {max_rounds} rounds"
    )


def simplify_coverage(
    feats: DataFrame,
    area_tolerance: float,
    preserve_boundary: bool = False,
    max_rounds: int = 40,
) -> DataFrame:
    """Simplify a polygon coverage; returns (fid, wkt).

    ``feats``: (fid int, geom_wkt string) POLYGON features forming a
    valid coverage (interior edges owned by exactly two features).
    """
    de = _edges_from_features(feats)
    swap = (F.col("ax") > F.col("bx")) | (
        (F.col("ax") == F.col("bx")) & (F.col("ay") > F.col("by"))
    )
    de = (
        de.withColumn(
            "ekey",
            F.when(
                swap,
                F.concat_ws("|", "bx", "by", "ax", "ay"),
            ).otherwise(F.concat_ws("|", "ax", "ay", "bx", "by")),
        )
        .withColumn("uax", F.when(swap, F.col("bx")).otherwise(F.col("ax")))
        .withColumn("uay", F.when(swap, F.col("by")).otherwise(F.col("ay")))
        .withColumn("ubx", F.when(swap, F.col("ax")).otherwise(F.col("bx")))
        .withColumn("uby", F.when(swap, F.col("ay")).otherwise(F.col("by")))
        .localCheckpoint(eager=True)
    )

    owners = de.groupBy("ekey").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("fid"))).alias("owners_str"),
        F.countDistinct("fid").alias("n_owners"),
        F.count("*").alias("n_dir"),
        F.first("uax").alias("uax"),
        F.first("uay").alias("uay"),
        F.first("ubx").alias("ubx"),
        F.first("uby").alias("uby"),
    )
    bad = owners.filter(F.col("n_dir") > 2).count()
    if bad:
        raise ValueError(
            f"simplify_coverage: {bad} edges owned by >2 rings — not a coverage"
        )
    owners = owners.localCheckpoint(eager=True)

    # junction vertices: valence != 2 or differing owner sets
    ends = owners.select(
        F.col("uax").alias("vx"), F.col("uay").alias("vy"), "ekey", "owners_str"
    ).unionByName(
        owners.select(
            F.col("ubx").alias("vx"), F.col("uby").alias("vy"), "ekey", "owners_str"
        )
    )
    vtx = ends.groupBy("vx", "vy").agg(
        F.countDistinct("ekey").alias("n_edges"),
        F.countDistinct("owners_str").alias("n_profiles"),
        F.sort_array(F.collect_set("ekey")).alias("eks"),
    )
    vtx = vtx.withColumn(
        "junction", (F.col("n_edges") != 2) | (F.col("n_profiles") > 1)
    ).localCheckpoint(eager=True)

    pairs = vtx.filter(~F.col("junction")).select(
        F.element_at("eks", 1).alias("e1"), F.element_at("eks", 2).alias("e2")
    )
    lab = _arc_components(pairs, owners.select("ekey"), max_rounds)

    # per-arc VW over the chained vertices
    arc_edges = owners.join(lab, "ekey").join(
        vtx.select("vx", "vy", "junction").alias("ja"),
        (F.col("uax") == F.col("ja.vx")) & (F.col("uay") == F.col("ja.vy")),
    ).select(
        "arc_id", "ekey", "n_owners", "uax", "uay", "ubx", "uby",
        F.col("ja.junction").alias("a_junction"),
    )
    arc_edges = arc_edges.join(
        vtx.select("vx", "vy", "junction").alias("jb"),
        (F.col("ubx") == F.col("jb.vx")) & (F.col("uby") == F.col("jb.vy")),
    ).select(
        "arc_id", "ekey", "n_owners", "uax", "uay", "ubx", "uby",
        "a_junction", F.col("jb.junction").alias("b_junction"),
    )

    tol = float(area_tolerance)
    preserve = bool(preserve_boundary)

    def arc_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for arc_id, g in pdf.groupby("arc_id"):
            if preserve and int(g["n_owners"].max()) == 1:
                # outer-boundary arc: every interior vertex survives
                survivors = set()
                for _, r in g.iterrows():
                    if not r["a_junction"]:
                        survivors.add((r["uax"], r["uay"]))
                    if not r["b_junction"]:
                        survivors.add((r["ubx"], r["uby"]))
                out.extend((arc_id, x, y) for x, y in survivors)
                continue
            # chain the arc: adjacency over vertices
            adj: dict[tuple, list[tuple]] = {}
            junc: dict[tuple, bool] = {}
            for _, r in g.iterrows():
                a = (r["uax"], r["uay"])
                b = (r["ubx"], r["uby"])
                adj.setdefault(a, []).append(b)
                adj.setdefault(b, []).append(a)
                junc[a] = bool(r["a_junction"])
                junc[b] = bool(r["b_junction"])
            endpoints = sorted(v for v, nb in adj.items() if len(nb) == 1)
            closed = not endpoints
            start = min(adj) if closed else endpoints[0]
            chain = [start]
            prev = None
            cur = start
            while True:
                nbrs = [v for v in adj[cur] if v != prev]
                if not nbrs:
                    break
                # at the start of a loop both neighbours qualify: pick
                # deterministically (smaller vertex)
                nxt = min(nbrs)
                if nxt == start and closed:
                    break
                chain.append(nxt)
                prev, cur = cur, nxt
                if not closed and len(adj[cur]) == 1:
                    break
            pts = np.asarray(chain, dtype=np.float64)
            keep = vw_simplify(pts, tol, closed)
            lo = 0 if closed else 1
            hi = len(pts) if closed else len(pts) - 1
            for i in range(lo, hi):
                if keep[i]:
                    out.append((arc_id, pts[i, 0], pts[i, 1]))
        return pd.DataFrame(out, columns=["arc_id", "sx", "sy"])

    survivors = (
        arc_edges.groupBy("arc_id")
        .applyInPandas(arc_kernel, "arc_id string, sx double, sy double")
        .localCheckpoint(eager=True)
    )

    # reassembly: a ring position survives iff junction or (arc, vertex)
    # survived — pure joins, both owners of an arc see the same set
    pos = de.select("fid", "ring", "pos", "ax", "ay", "ekey")
    pos = pos.join(lab, "ekey").withColumnRenamed("arc_id", "arc_cur")
    pos = pos.join(
        vtx.select("vx", "vy", "junction"),
        (F.col("ax") == F.col("vx")) & (F.col("ay") == F.col("vy")),
    ).drop("vx", "vy")
    pos = pos.join(
        survivors,
        (F.col("arc_cur") == F.col("arc_id"))
        & (F.col("ax") == F.col("sx"))
        & (F.col("ay") == F.col("sy")),
        "left",
    )
    kept = pos.filter(F.col("junction") | F.col("sx").isNotNull()).select(
        "fid", "ring", "pos", "ax", "ay"
    )

    def emit_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for fid, g in pdf.groupby("fid"):
            rings = []
            for _, rg in sorted(g.groupby("ring"), key=lambda kv: kv[0]):
                rg = rg.sort_values("pos")
                v = rg[["ax", "ay"]].to_numpy()
                # canonical emit: rotate to lexicographic-min start,
                # shell CCW (no collinear collapse — simplification
                # already decided which vertices live)
                i0 = np.lexsort((v[:, 1], v[:, 0]))[0]
                v = np.roll(v, -i0, axis=0)
                closed_ring = np.vstack([v, v[:1]])
                x, y = closed_ring[:, 0], closed_ring[:, 1]
                area2 = np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
                want_ccw = len(rings) == 0
                if (area2 > 0) != want_ccw:
                    closed_ring = np.vstack([closed_ring[0:1], closed_ring[-2::-1]])
                rings.append(closed_ring)
            out.append((int(fid), polygon_wkt(rings)))
        return pd.DataFrame(out, columns=["fid", "wkt"])

    return kept.groupBy("fid").applyInPandas(emit_kernel, "fid int, wkt string")
