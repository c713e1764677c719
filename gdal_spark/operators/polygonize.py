"""Polygonize — connected components of equal-valued pixels, distributed.

Re-answers GDALPolygonize (alg/polygonize.cpp:500: two-pass connected-
component labeling over equal-valued pixels, 4-connectivity, then ring
extraction). This was the survey's "hard; defer" item — the cross-tile
merge is a distributed connected-components problem. Spark-first shape:

  1. **tile-local CC** — one applyInPandas per 64x64 grid tile: union-
     find label pass (pure numpy two-pass), label = the component's min
     global pixel id within the tile;
  2. **boundary edges** — tiles emit their east/south border pixels;
     a self-join on (pixel, neighbor-pixel) coordinates with equal
     values yields cross-tile (labelA, labelB) edges — no halo
     duplication, just two narrow border tables;
  3. **global merge** — iterative min-label propagation over the edge
     graph (driver loop, converges in O(diameter of the component
     adjacency graph) rounds; each round one join + groupBy over the
     SMALL label table, not the pixel table);
  4. result: every pixel mapped to its component's global min pixel id;
     ``polygonize`` aggregates per-component value / pixel count /
     envelope (the ring extraction proper is v2 — for the axis-aligned
     regions the engine's fixtures exercise, envelope == polygon).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TILE = 64


def _local_cc(
    val: np.ndarray, have: np.ndarray, gx0: int, gy0: int, width: int,
    connect8: bool = False,
):
    """Vectorized CC on one dense tile (4- or 8-connectivity per the
    GDALPolygonize CONNECTED option, equal values, absent cells
    excluded).  Pure numpy: iterative min-neighbor relaxation with
    pointer jumping (label <- label[label]), so convergence is O(log n)
    rounds even for serpentine components.
    Returns label grid of global min pixel ids (py*width+px)."""
    h, w = val.shape
    lab = np.arange(h * w, dtype=np.int64).reshape(h, w)  # local indices
    eq_r = (val[:, 1:] == val[:, :-1]) & have[:, 1:] & have[:, :-1]
    eq_d = (val[1:, :] == val[:-1, :]) & have[1:, :] & have[:-1, :]
    if connect8:
        # down-right and down-left diagonals
        eq_dr = (val[1:, 1:] == val[:-1, :-1]) & have[1:, 1:] & have[:-1, :-1]
        eq_dl = (val[1:, :-1] == val[:-1, 1:]) & have[1:, :-1] & have[:-1, 1:]
    while True:
        new = lab.copy()
        new[:, 1:] = np.minimum(new[:, 1:], np.where(eq_r, lab[:, :-1], new[:, 1:]))
        new[:, :-1] = np.minimum(new[:, :-1], np.where(eq_r, lab[:, 1:], new[:, :-1]))
        new[1:, :] = np.minimum(new[1:, :], np.where(eq_d, lab[:-1, :], new[1:, :]))
        new[:-1, :] = np.minimum(new[:-1, :], np.where(eq_d, lab[1:, :], new[:-1, :]))
        if connect8:
            new[1:, 1:] = np.minimum(new[1:, 1:], np.where(eq_dr, lab[:-1, :-1], new[1:, 1:]))
            new[:-1, :-1] = np.minimum(new[:-1, :-1], np.where(eq_dr, lab[1:, 1:], new[:-1, :-1]))
            new[1:, :-1] = np.minimum(new[1:, :-1], np.where(eq_dl, lab[:-1, 1:], new[1:, :-1]))
            new[:-1, 1:] = np.minimum(new[:-1, 1:], np.where(eq_dl, lab[1:, :-1], new[:-1, 1:]))
        f = new.ravel()
        f = f[f]  # pointer jump: a label's label is in the same component
        f = f[f]
        new = f.reshape(h, w)
        if np.array_equal(new, lab):
            break
        lab = new
    # local flat index order == global pixel id order within the tile, so
    # the component's min local index maps directly to its min gid
    ys, xs = np.divmod(np.arange(h * w, dtype=np.int64), w)
    gids = (gy0 + ys) * width + (gx0 + xs)
    return gids[lab.ravel()].reshape(h, w), gids.reshape(h, w)


_PX_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("value", LongType()),
        StructField("label", LongType()),
        StructField("east_border", IntegerType()),
        StructField("south_border", IntegerType()),
    ]
)


def _tile_labels(
    pixels: DataFrame, width: int, height: int, connect8: bool = False
) -> DataFrame:
    """Tile-local labels + border flags."""

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gtx, gty = int(key[0]), int(key[1])
        gx0, gy0 = gtx * TILE, gty * TILE
        w = min(TILE, width - gx0)
        h = min(TILE, height - gy0)
        val = np.zeros((h, w), dtype=np.int64)
        have = np.zeros((h, w), dtype=bool)
        lx = pdf["px"].to_numpy(np.int64) - gx0
        ly = pdf["py"].to_numpy(np.int64) - gy0
        val[ly, lx] = pdf["value"].to_numpy(np.int64)
        have[ly, lx] = True  # absent cells never union, never emit
        labels, _ = _local_cc(val, have, gx0, gy0, width, connect8=connect8)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        keep = have.ravel()
        return pd.DataFrame(
            {
                "px": (gx0 + xs).ravel().astype(np.int32)[keep],
                "py": (gy0 + ys).ravel().astype(np.int32)[keep],
                "value": val.ravel()[keep],
                "label": labels.ravel()[keep],
                "east_border": (xs == w - 1).ravel().astype(np.int32)[keep],
                "south_border": (ys == h - 1).ravel().astype(np.int32)[keep],
            }
        )

    tiled = pixels.withColumn("gtx", F.shiftright("px", 6)).withColumn(
        "gty", F.shiftright("py", 6)
    )
    return tiled.groupBy("gtx", "gty").applyInPandas(kernel, _PX_SCHEMA)


def pixel_components(
    pixels: DataFrame, width: int, height: int, max_rounds: int = 30,
    connect8: bool = False,
) -> DataFrame:
    """(px, py, value, label) with globally-merged component labels.
    ``connect8`` adds diagonal adjacency (GDALPolygonize CONNECTED=8)."""
    lab = _tile_labels(pixels, width, height, connect8=connect8).cache()
    # cross-tile equal-value adjacencies from border pixels only
    east = lab.filter("east_border = 1").select(
        (F.col("px") + 1).alias("npx"), F.col("py").alias("npy"),
        F.col("value").alias("v"), F.col("label").alias("la"),
    )
    south = lab.filter("south_border = 1").select(
        F.col("px").alias("npx"), (F.col("py") + 1).alias("npy"),
        F.col("value").alias("v"), F.col("label").alias("la"),
    )
    cands = [east, south]
    if connect8:
        # every cross-tile diagonal pair has its generator pixel on the
        # earlier tile's east or south border: east -> (px+1, py±1),
        # south -> (px±1, py+1) (the corner pair appears from both
        # sides; dedup below)
        e = lab.filter("east_border = 1")
        s = lab.filter("south_border = 1")
        for dy in (-1, 1):
            cands.append(
                e.select(
                    (F.col("px") + 1).alias("npx"), (F.col("py") + dy).alias("npy"),
                    F.col("value").alias("v"), F.col("label").alias("la"),
                )
            )
        for dx in (-1, 1):
            cands.append(
                s.select(
                    (F.col("px") + dx).alias("npx"), (F.col("py") + 1).alias("npy"),
                    F.col("value").alias("v"), F.col("label").alias("la"),
                )
            )
    west_side = lab.select(
        F.col("px").alias("npx"), F.col("py").alias("npy"),
        F.col("value").alias("v"), F.col("label").alias("lb"),
    )
    cand = cands[0]
    for c in cands[1:]:
        cand = cand.unionByName(c)
    edges = (
        cand.join(west_side, ["npx", "npy", "v"])
        .select("la", "lb")
        .filter(F.col("la") != F.col("lb"))
        .distinct()
        .cache()
    )
    # iterative min-label propagation on the (small) label graph
    spark = pixels.sparkSession
    mapping = (
        edges.select(F.col("la").alias("node"))
        .unionByName(edges.select(F.col("lb").alias("node")))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    sym = edges.unionByName(
        edges.select(F.col("lb").alias("la"), F.col("la").alias("lb"))
    ).distinct()
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(mapping, sym.lb == mapping.node)
            .groupBy("la")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = mapping.join(nbr_min, mapping.node == nbr_min.la, "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
        )
        # pointer jump (lbl <- lbl(lbl)): a label is itself a node of the
        # same component, so chasing one hop per round doubles the
        # propagation distance — convergence in O(log diameter) rounds,
        # not O(diameter) (the hash-to-min trick)
        # localCheckpoint (eager) TRUNCATES THE LOGICAL PLAN — the
        # iterative self-referencing joins otherwise nest the previous
        # round's plan ~6x per round and Catalyst analysis goes
        # exponential (observed: driver-side planning hang)
        stepped = stepped.localCheckpoint(eager=True)
        hop = stepped.select(F.col("node").alias("jnode"), F.col("lbl").alias("jlbl"))
        new_mapping = (
            stepped.join(hop, stepped.lbl == hop.jnode, "left")
            .select("node", F.coalesce("jlbl", "lbl").alias("lbl"))
        ).localCheckpoint(eager=True)
        changed = (
            new_mapping.alias("n")
            .join(mapping.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        mapping = new_mapping
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"pixel_components: label propagation did not converge in "
            f"{max_rounds} rounds ({changed} labels still moving) — "
            "component graph deeper than expected; raise max_rounds"
        )
    out = (
        lab.join(mapping, lab.label == mapping.node, "left")
        .select(
            "px", "py", "value",
            F.coalesce("lbl", "label").alias("label"),
        )
    )
    return out


def _chain_rings(segs: np.ndarray) -> list[np.ndarray]:
    """Chain directed unit boundary segments (E, 4: x1 y1 x2 y2) into
    closed rings.  Interior is on the LEFT of every segment (screen
    coords, y down), so at degree-2 vertices (two diagonal same-label
    pixels meeting at a corner) the walk prefers the turn TOWARD the
    interior — rings never cross (Moore-style tracing, the same rule
    GDALPolygonize's arc collector applies)."""
    out_edges: dict[tuple[int, int], list[int]] = {}
    for i, (x1, y1, _, _) in enumerate(segs):
        out_edges.setdefault((int(x1), int(y1)), []).append(i)
    used = np.zeros(len(segs), dtype=bool)
    rings = []
    for start in range(len(segs)):
        if used[start]:
            continue
        ring = [segs[start, :2].copy()]
        cur = start
        while True:
            used[cur] = True
            x1, y1, x2, y2 = (int(v) for v in segs[cur])
            ring.append(np.array([x2, y2]))
            dx, dy = x2 - x1, y2 - y1
            cands = [i for i in out_edges.get((x2, y2), ()) if not used[i]]
            if not cands:
                break
            # preference: toward-interior turn, straight, away turn
            pri = {(-dy, dx): 0, (dx, dy): 1, (dy, -dx): 2, (-dx, -dy): 3}
            cur = min(
                cands,
                key=lambda i: pri[
                    (int(segs[i, 2] - segs[i, 0]), int(segs[i, 3] - segs[i, 1]))
                ],
            )
        arr = np.array(ring)
        # drop collinear midpoints (consecutive equal directions)
        d = np.diff(arr, axis=0)
        keep = np.r_[True, (d[1:] != d[:-1]).any(axis=1), True]
        arr = arr[keep]
        # canonical start: min (y, x) vertex first (scan order)
        body = arr[:-1]
        k = np.lexsort((body[:, 0], body[:, 1]))[0]
        body = np.roll(body, -k, axis=0)
        rings.append(np.vstack([body, body[:1]]))
    return rings


_RING_SCHEMA = StructType(
    [
        StructField("label", LongType()),
        StructField("ring_wkt", StringType()),
    ]
)


def component_rings(
    pixels: DataFrame, width: int, height: int, min_ring_area: float = 0.0
) -> DataFrame:
    """(label, ring_wkt): exact boundary polygon per component — the ring
    extraction GDALPolygonize performs (alg/polygonize.cpp:500 arc
    collection + RPolygonizer), distributed:

      1. labels from :func:`pixel_components`;
      2. per-tile halo kernel emits each pixel's boundary edges (unit
         segments where the 4-neighbor label differs / is outside) —
         map-side, perimeter-sized output;
      3. one groupBy(label) chains segments into rings (outer ring
         first, holes after; perimeter-scale work per component).
    """
    from gdal_spark.operators.focal import GRID_TILE, _with_halo_tiles

    comp = pixel_components(pixels, width, height)
    lab = comp.select("px", "py", F.col("label").alias("value"))  # halo op reads 'value'

    edge_schema = StructType(
        [
            StructField("label", LongType()),
            StructField("x1", IntegerType()),
            StructField("y1", IntegerType()),
            StructField("x2", IntegerType()),
            StructField("y2", IntegerType()),
        ]
    )

    def edge_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gtx, gty = int(key[0]), int(key[1])
        x0 = gtx * GRID_TILE - 1
        y0 = gty * GRID_TILE - 1
        w = GRID_TILE + 2
        win = np.full((w, w), -1, dtype=np.int64)
        spx = pdf["px"].to_numpy(np.int64)
        spy = pdf["py"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.int64)
        sel = (spx >= x0) & (spx < x0 + w) & (spy >= y0) & (spy < y0 + w)
        win[spy[sel] - y0, spx[sel] - x0] = val[sel]
        # pixels OWNED by this tile (not halo)
        oy = slice(1, 1 + GRID_TILE)
        ox = slice(1, 1 + GRID_TILE)
        own = win[oy, ox]
        have = own >= 0
        ys, xs = np.nonzero(have)
        gx = xs + gtx * GRID_TILE
        gy = ys + gty * GRID_TILE
        lbl = own[ys, xs]
        rows = {"label": [], "x1": [], "y1": [], "x2": [], "y2": []}

        def emit(mask, x1, y1, x2, y2):
            rows["label"].append(lbl[mask])
            rows["x1"].append(x1[mask])
            rows["y1"].append(y1[mask])
            rows["x2"].append(x2[mask])
            rows["y2"].append(y2[mask])

        north = win[oy.start - 1 + ys, ox.start + xs] != lbl
        south = win[oy.start + 1 + ys, ox.start + xs] != lbl
        west = win[oy.start + ys, ox.start - 1 + xs] != lbl
        east = win[oy.start + ys, ox.start + 1 + xs] != lbl
        emit(north, gx, gy, gx + 1, gy)  # interior below = left of (1,0)
        emit(east, gx + 1, gy, gx + 1, gy + 1)
        emit(south, gx + 1, gy + 1, gx, gy + 1)
        emit(west, gx, gy + 1, gx, gy)
        return pd.DataFrame(
            {
                k: np.concatenate(v).astype(np.int64 if k == "label" else np.int32)
                for k, v in rows.items()
            }
        )

    edges = (
        _with_halo_tiles(lab)
        .groupBy("gtx", "gty")
        .applyInPandas(edge_kernel, edge_schema)
    )

    def ring_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        segs = pdf[["x1", "y1", "x2", "y2"]].to_numpy(np.int64)
        rings = _chain_rings(segs)
        # outer ring = max |area|; holes follow in traced order
        from gdal_spark.geometry.clip import shoelace_area

        areas = [abs(shoelace_area(r.astype(np.float64))) for r in rings]
        # -min_ring_area (apps/gdal_footprint_lib.cpp): drop interior
        # rings below the area threshold; the outer ring always survives.
        # Holes are ordered by their canonical start vertex (y, x) — the
        # chase order depends on shuffle arrival and would otherwise make
        # multi-hole WKT nondeterministic.
        outer = int(np.argmax(areas))
        holes = [
            i for i in range(len(rings)) if i != outer and areas[i] >= min_ring_area
        ]
        holes.sort(key=lambda i: (int(rings[i][0, 1]), int(rings[i][0, 0])))
        order = [outer] + holes
        parts = []
        for i in order:
            coords = ",".join(f"{int(x)} {int(y)}" for x, y in rings[i])
            parts.append(f"({coords})")
        return pd.DataFrame(
            {"label": [key[0]], "ring_wkt": ["POLYGON (" + ",".join(parts) + ")"]}
        )

    return edges.groupBy("label").applyInPandas(ring_kernel, _RING_SCHEMA)


def sieve(
    pixels: DataFrame,
    width: int,
    height: int,
    threshold: int,
    max_rounds: int = 5,
    connect8: bool = False,
) -> DataFrame:
    """Sieve filter (alg/gdalsievefilter.cpp:178): components smaller
    than ``threshold`` pixels merge into their LARGEST neighbour
    component (reference's merge rule; ties broken to the smallest
    label for determinism), repeated until nothing is below threshold.

    ``connect8`` = gdal_sieve -8: diagonal adjacency for BOTH the
    component detection and the neighbour-merge graph.

    All merge decisions happen on the SMALL label/adjacency tables —
    the pixel table is only relabeled once at the end."""
    comp = pixel_components(pixels, width, height, connect8=connect8)
    comp = comp.localCheckpoint(eager=True)
    labval = comp.select("label", "value").dropDuplicates(["label"])
    lab = comp.select("px", "py", "label")
    # cross-label adjacency (label_a, label_b), symmetric — built once;
    # merge rounds only update the label -> label mapping
    east = lab.select((F.col("px") + 1).alias("npx"), F.col("py").alias("npy"), F.col("label").alias("la"))
    south = lab.select(F.col("px").alias("npx"), (F.col("py") + 1).alias("npy"), F.col("label").alias("la"))
    shifts = east.unionByName(south)
    if connect8:
        se = lab.select(
            (F.col("px") + 1).alias("npx"),
            (F.col("py") + 1).alias("npy"),
            F.col("label").alias("la"),
        )
        sw = lab.select(
            (F.col("px") - 1).alias("npx"),
            (F.col("py") + 1).alias("npy"),
            F.col("label").alias("la"),
        )
        shifts = shifts.unionByName(se).unionByName(sw)
    other = lab.select(F.col("px").alias("npx"), F.col("py").alias("npy"), F.col("label").alias("lb"))
    adj = (
        shifts.join(other, ["npx", "npy"])
        .filter(F.col("la") != F.col("lb"))
        .select("la", "lb")
        .distinct()
    )
    adj = (
        adj.unionByName(adj.select(F.col("lb").alias("la"), F.col("la").alias("lb")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # mapping: original label -> current merged label
    mapping = labval.select(F.col("label").alias("node"), F.col("label").alias("cur"))
    for _ in range(max_rounds):
        cur_sizes = (
            comp.join(mapping, comp.label == mapping.node)
            .groupBy("cur")
            .agg(F.count("*").alias("sz"))
        ).localCheckpoint(eager=True)
        small = cur_sizes.filter(F.col("sz") < threshold)
        if small.isEmpty():
            break
        # current-label adjacency via the original adjacency + mapping
    # (adjacency of merged components = mapped original adjacency)
        m1 = mapping.select(F.col("node").alias("la"), F.col("cur").alias("ca"))
        m2 = mapping.select(F.col("node").alias("lb"), F.col("cur").alias("cb"))
        cadj = (
            adj.join(m1, "la").join(m2, "lb")
            .filter(F.col("ca") != F.col("cb"))
            .select("ca", "cb")
            .distinct()
        )
        nb = (
            cadj.join(small.withColumnsRenamed({"cur": "ca", "sz": "sza"}), "ca")
            .join(cur_sizes.withColumnsRenamed({"cur": "cb", "sz": "szb"}), "cb")
        )
        # largest neighbour, ties to smallest label
        target = (
            nb.groupBy("ca")
            .agg(F.max(F.struct(F.col("szb"), (-F.col("cb")).alias("neg"))).alias("m"))
            .select(F.col("ca"), (-F.col("m.neg")).alias("tgt"))
        )
        mapping = (
            mapping.join(target, mapping.cur == target.ca, "left")
            .select("node", F.coalesce("tgt", "cur").alias("cur"))
            .localCheckpoint(eager=True)
        )
    out = (
        comp.join(mapping, comp.label == mapping.node)
        .select("px", "py", F.col("cur").alias("label"))
        .join(labval.withColumnsRenamed({"label": "cur2"}), F.col("label") == F.col("cur2"))
        .select("px", "py", F.col("label"), F.col("value"))
    )
    return out


def polygonize(
    pixels: DataFrame, width: int, height: int, connect8: bool = False
) -> DataFrame:
    """Per-component summary: (label, value, n_pixels, envelope px coords).
    Ring extraction beyond the envelope is v2 (alg/polygonize.cpp emits
    full rings); for axis-aligned regions envelope == polygon.
    ``connect8`` = GDALPolygonize's CONNECTED=8 option
    (alg/polygonize.cpp nConnectedness): diagonal pixels of equal value
    join the same component."""
    comp = pixel_components(pixels, width, height, connect8=connect8)
    return comp.groupBy("label", "value").agg(
        F.count("*").alias("n_pixels"),
        F.min("px").alias("pxmin"),
        F.min("py").alias("pymin"),
        F.max("px").alias("pxmax"),
        F.max("py").alias("pymax"),
    )


def footprint(
    mask: DataFrame, width: int, height: int, min_ring_area: float = 0.0
) -> DataFrame:
    """gdal_footprint analog (apps/gdal_footprint_lib.cpp): the polygon
    footprint of the mask (non-nodata) pixels in pixel coordinates —
    connected components of the mask, exact boundary rings per component
    (outer ring first, holes after), interior rings smaller than
    ``min_ring_area`` dropped (the tool's -min_ring_area option,
    apps/gdal_footprint_lib.cpp min ring area filter).

    ``mask`` is the (px, py) table of footprint-member pixels; absent
    pixels are outside.  Distributed shape is component_rings': tile-
    local union-find + min-label merge, perimeter-sized edge output,
    one groupBy(label) ring chase."""
    m = mask.select("px", "py", F.lit(1).cast("long").alias("value"))
    return component_rings(m, width, height, min_ring_area=min_ring_area)
