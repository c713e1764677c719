"""Spatial join with a per-executor STR-tree candidate stage.

The alternative candidate generator to pip_join's cell join: instead of
keying both sides on grid cells and letting Catalyst broadcast-hash-join
them, the method layer's envelopes are bulk-loaded into a packed STR
R-tree (geometry/strtree.py) once per executor, and every corpus Arrow
batch queries the tree directly inside ONE mapInPandas — zero shuffle,
zero join operator, no cell-cover fan-out of the zone side.  This is
the reference's in-memory spatial-index shape (GEOS STRtree behind
OGRLayer::SetSpatialFilter / Intersection) lifted to the executor.

When to prefer which at 100 TB:
  * cell join — method layer too big to broadcast, or reused across
    many queries (the cell cover amortizes);
  * STR-tree — dim-sized method layer with wildly mixed feature sizes,
    where a single zoom's cell cover either fans out huge features
    into thousands of cells or makes hot cells with many candidates;
    the R-tree adapts to feature size with no zoom knob.

Zone-layer contract: dim-sized (driver-materialized + rebroadcast, the
same documented contract as the kNN target table; the carried-WKT cell
join remains the beyond-driver-memory path).  Exactness: candidates are
envelope hits; every candidate goes through the SAME per-unique-zone
vectorized ray-cast as pip_join's refine, so results are bit-identical
to the cell-join twin (pinned in tests/test_strtree_join.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from gdal_spark.geometry.envelope import wkt_envelope
from gdal_spark.geometry.pip import points_in_polygon
from gdal_spark.geometry.strtree import STRTree
from gdal_spark.geometry.wkt import parse_wkt

# one tree per broadcast payload per executor process, keyed by an
# explicit token SHIPPED IN the broadcast value — id(bc) would be the
# executor-side unpickled object's address, which CPython reuses across
# different broadcasts (stale-tree hazard) and differs across tasks for
# the same broadcast (useless cache)
_TREE_CACHE: dict[str, tuple] = {}
_KEY_SEQ = [0]

# dim-layer contract, ENFORCED: the method layer is driver-materialized
# (toPandas) then broadcast, so a corpus-sized layer here would OOM the
# driver silently.  The guard counts at most MAX_DIM_ROWS+1 rows (a
# bounded limit().count(), never a full scan) and fails loudly with a
# pointer to the cell-join twin that handles the beyond-driver case.
MAX_DIM_ROWS = 1_000_000


def _dim_guard(df: DataFrame, what: str, twin: str, limit: int) -> None:
    n = df.limit(limit + 1).count()
    if n > limit:
        raise ValueError(
            f"strtree_join: {what} has more than {limit:,} rows — it no "
            f"longer fits the driver-materialized dim-layer contract. "
            f"Use the {twin} twin, which never collects the method layer."
        )


def _tree_of(bc) -> tuple:
    key, ids, wkts = bc.value
    got = _TREE_CACHE.get(key)
    if got is None:
        boxes = np.asarray([wkt_envelope(w) for w in wkts], dtype=np.float64)
        polys = []
        for w in wkts:
            typ, payload = parse_wkt(w)
            polys.append(payload if typ == "MULTIPOLYGON" else [payload])
        _TREE_CACHE.clear()  # one live method layer per process is plenty
        got = (STRTree(boxes), np.asarray(ids, dtype=np.int64), polys)
        _TREE_CACHE[key] = got
    return got


def pip_join_strtree(
    points: DataFrame,
    zones: DataFrame,
    zone_id_col: str = "zone_id",
    wkt_col: str = "geom_wkt",
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_dim_rows: int = MAX_DIM_ROWS,
) -> DataFrame:
    """(doc_id, zone_id) pairs where the point lies inside the zone
    polygon (pip_join's exact containment semantics — same ray-cast
    kernel, same half-open rule)."""
    sc = points.sparkSession.sparkContext
    zsel = zones.select(zone_id_col, wkt_col)
    _dim_guard(zsel, "zone layer", "pip_join (cell join)", max_dim_rows)
    zpdf = zsel.toPandas()
    _KEY_SEQ[0] += 1
    # driver-unique token: applicationId x per-process sequence number
    key = f"{sc.applicationId}/{_KEY_SEQ[0]}"
    bc = sc.broadcast(
        (key, zpdf[zone_id_col].to_numpy().tolist(), zpdf[wkt_col].tolist())
    )

    out_schema = StructType(
        [StructField(id_col, LongType()), StructField(zone_id_col, LongType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tree, ids, polys = _tree_of(bc)
        for pdf in batches:
            xs = pdf[lon_col].to_numpy(dtype=np.float64)
            ys = pdf[lat_col].to_numpy(dtype=np.float64)
            qi, zi = tree.query_points(xs, ys)
            keep = np.zeros(len(qi), dtype=bool)
            # refine vectorized per candidate zone (dim-sized loop)
            for z in np.unique(zi):
                m = zi == z
                hit = np.zeros(int(m.sum()), dtype=bool)
                for rings in polys[z]:
                    hit |= points_in_polygon(xs[qi[m]], ys[qi[m]], rings)
                keep[m] = hit
            qi, zi = qi[keep], zi[keep]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[qi],
                    zone_id_col: ids[zi],
                }
            )

    return points.select(id_col, lon_col, lat_col).mapInPandas(
        kernel, out_schema
    )


def _clip_tree_of(bc) -> tuple:
    """Envelope-only tree for the clip candidate stage (no ring parse —
    zone classification goes through overlay._classify_zone's own
    executor cache at refine time)."""
    key, ids, wkts = bc.value
    got = _TREE_CACHE.get(key)
    if got is None:
        boxes = np.asarray([wkt_envelope(w) for w in wkts], dtype=np.float64)
        _TREE_CACHE.clear()  # one live method layer per process is plenty
        got = (STRTree(boxes), np.asarray(ids, dtype=np.int64), list(wkts))
        _TREE_CACHE[key] = got
    return got


def clip_join_strtree(
    polydocs: DataFrame,
    zones: DataFrame,
    zone_id_col: str = "zone_id",
    wkt_col: str = "geom_wkt",
    id_col: str = "doc_id",
    max_dim_rows: int = MAX_DIM_ROWS,
) -> DataFrame:
    """Exact intersection pieces (doc_id, zone_id, piece_area) with the
    STR-tree candidate stage — the north-star "STR-tree per partition
    for tile clipping" (the raster↔vector mapping role GEOS STRtree
    plays behind OGRLayer::Intersection / Clip).

    Same dim-layer contract as :func:`pip_join_strtree`; the corpus
    side's envelopes query the tree in ONE mapInPandas (zero shuffle,
    zero join operator, no zone-side cell fan-out).  Candidates resolve
    through the SAME classified-zone kernels as overlay._clip_kernel —
    rectangle zones via the identical IEEE min/max math, general
    concave/holed/multipart zones via the fan-triangle
    rects_polys_intersection_area — and the same AREA_EPS drop rule, so
    output is BIT-IDENTICAL to intersection_join(emit_wkt=False)
    (pinned in tests/test_strtree_join.py; same DuckDB oracle as
    clip_general in the registry)."""
    sc = polydocs.sparkSession.sparkContext
    zsel = zones.select(zone_id_col, wkt_col)
    _dim_guard(
        zsel, "zone layer", "intersection_join (cell join)", max_dim_rows
    )
    zpdf = zsel.toPandas()
    _KEY_SEQ[0] += 1
    key = f"{sc.applicationId}/{_KEY_SEQ[0]}/clip"
    bc = sc.broadcast(
        (key, zpdf[zone_id_col].to_numpy().tolist(), zpdf[wkt_col].tolist())
    )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(zone_id_col, LongType()),
            StructField("piece_area", DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.geometry.boolean import rects_polys_intersection_area
        from gdal_spark.operators.overlay import AREA_EPS, _classify_zone

        tree, ids, wkts = _clip_tree_of(bc)
        for pdf in batches:
            x0 = pdf["xmin"].to_numpy(np.float64)
            y0 = pdf["ymin"].to_numpy(np.float64)
            x1 = pdf["xmax"].to_numpy(np.float64)
            y1 = pdf["ymax"].to_numpy(np.float64)
            qi, zi = tree.query_boxes(np.column_stack([x0, y0, x1, y1]))
            areas = np.zeros(len(qi), dtype=np.float64)
            for z in np.unique(zi):
                m = zi == z
                info = _classify_zone(wkts[z])
                if info[0] == "rect":
                    zx0, zy0, zx1, zy1 = info[1]
                    ix0 = np.maximum(x0[qi[m]], zx0)
                    iy0 = np.maximum(y0[qi[m]], zy0)
                    ix1 = np.minimum(x1[qi[m]], zx1)
                    iy1 = np.minimum(y1[qi[m]], zy1)
                    nonempty = (ix0 < ix1) & (iy0 < iy1)
                    areas[m] = np.where(
                        nonempty, (ix1 - ix0) * (iy1 - iy0), 0.0
                    )
                else:
                    tris, w = info[1]
                    rects = np.c_[x0[qi[m]], y0[qi[m]], x1[qi[m]], y1[qi[m]]]
                    areas[m] = rects_polys_intersection_area(rects, tris, w)
            keep = areas > AREA_EPS
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[qi[keep]],
                    zone_id_col: ids[zi[keep]],
                    "piece_area": areas[keep],
                }
            )

    return polydocs.select(id_col, "xmin", "ymin", "xmax", "ymax").mapInPandas(
        kernel, out_schema
    )


def _knn_tree_of(bc) -> tuple:
    key, ids, tlon, tlat = bc.value
    got = _TREE_CACHE.get(key)
    if got is None:
        tlon_a = np.asarray(tlon, dtype=np.float64)
        tlat_a = np.asarray(tlat, dtype=np.float64)
        boxes = np.column_stack([tlon_a, tlat_a, tlon_a, tlat_a])
        _TREE_CACHE.clear()
        got = (STRTree(boxes), np.asarray(ids, dtype=np.int64), tlon_a, tlat_a)
        _TREE_CACHE[key] = got
    return got


# a box radius covering the whole lon/lat extent: the candidate set is
# provably complete at this radius, so the doubling loop must terminate
_KNN_WORLD_R = 512.0


def knn_join_strtree(
    docs: DataFrame,
    targets: DataFrame,
    k: int = 5,
    r0: float = 4.0,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_dim_rows: int = MAX_DIM_ROWS,
) -> DataFrame:
    """kNN twin backed by the per-executor STR tree (same dim-layer
    contract and the same exact semantics as knn_join: squared
    euclidean in degrees, ties by min target_id, rnk 1..k).

    Radius-doubling candidate stage: each still-active query point asks
    the tree for targets inside the closed box ±r; a point settles when
    its k-th best candidate distance satisfies d2 <= r² — any target
    OUTSIDE the box has |dx| > r or |dy| > r, hence d2 strictly > r²,
    so the top-k is provably final (the tree analog of the cell-ring
    stop rule in knn.py:107-118).  Bit-identical to knn_join (pinned in
    tests/test_strtree_join.py; same DuckDB brute-force oracle)."""
    sc = docs.sparkSession.sparkContext
    tsel = targets.select("target_id", "tlon", "tlat")
    _dim_guard(
        tsel, "target layer", "knn_join (cell-ring join)", max_dim_rows
    )
    tpd = tsel.toPandas()
    _KEY_SEQ[0] += 1
    key = f"{sc.applicationId}/{_KEY_SEQ[0]}/knn"
    bc = sc.broadcast(
        (
            key,
            tpd["target_id"].to_numpy().tolist(),
            tpd["tlon"].to_numpy().tolist(),
            tpd["tlat"].to_numpy().tolist(),
        )
    )

    from pyspark.sql.types import DoubleType, IntegerType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("target_id", LongType()),
            StructField("rnk", IntegerType()),
            StructField("d2", DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tree, tid, tlon, tlat = _knn_tree_of(bc)
        kk = min(k, len(tid))
        if kk == 0:
            return
        for pdf in batches:
            qx = pdf[lon_col].to_numpy(np.float64)
            qy = pdf[lat_col].to_numpy(np.float64)
            did = pdf[id_col].to_numpy(np.int64)
            m = len(qx)
            out_id = np.full((m, kk), -1, dtype=np.int64)
            out_d2 = np.full((m, kk), np.inf)
            active = np.arange(m, dtype=np.int64)
            r = float(r0)
            while active.size:
                ax, ay = qx[active], qy[active]
                qi, ti = tree.query_boxes(
                    np.column_stack([ax - r, ay - r, ax + r, ay + r])
                )
                dx = ax[qi] - tlon[ti]
                dy = ay[qi] - tlat[ti]
                d2 = dx * dx + dy * dy
                # per-query top-k by (d2, target_id): one lexsort over
                # the candidate pairs, rank-within-group by cumcount
                order = np.lexsort((tid[ti], d2, qi))
                qi_s, ti_s, d2_s = qi[order], ti[order], d2[order]
                starts = np.flatnonzero(np.r_[True, qi_s[1:] != qi_s[:-1]])
                counts = np.diff(np.r_[starts, len(qi_s)])
                ranks = np.arange(len(qi_s)) - np.repeat(starts, counts)
                grp_of = np.repeat(np.arange(len(starts)), counts)
                # settled: k candidates exist AND the kth is inside the
                # provably-complete radius (or the box already covers
                # the world extent)
                kth_d2 = np.full(len(starts), np.inf)
                has_k = counts >= kk
                kth_idx = starts[has_k] + kk - 1
                kth_d2[has_k] = d2_s[kth_idx]
                settled_g = has_k & ((kth_d2 <= r * r) | (r >= _KNN_WORLD_R))
                take = settled_g[grp_of] & (ranks < kk)
                rows = active[qi_s[take]]
                cols = ranks[take]
                out_id[rows, cols] = ti_s[take]
                out_d2[rows, cols] = d2_s[take]
                done = np.zeros(active.size, dtype=bool)
                done[qi_s[starts[settled_g]]] = True
                active = active[~done]
                r *= 2.0
            valid = out_id >= 0
            rows = np.broadcast_to(np.arange(m)[:, None], (m, kk))[valid]
            rnks = np.broadcast_to(np.arange(1, kk + 1), (m, kk))[valid]
            yield pd.DataFrame(
                {
                    id_col: did[rows],
                    "target_id": tid[out_id[valid]],
                    "rnk": rnks.astype(np.int32),
                    "d2": out_d2[valid],
                }
            )

    return docs.select(id_col, lon_col, lat_col).mapInPandas(kernel, out_schema)
