"""Concave hull of a point set — OGRGeometry::ConcaveHull analog
(ogrgeometry.cpp:4307; GEOS ConcaveHull).

Same public algorithm family GEOS uses: start from the Delaunay
triangulation (geometry/delaunay.py) and peel boundary triangles whose
exposed boundary edge exceeds a length threshold, longest edge first
(the "chi-shape" construction, Duckham et al. 2008).  Peeling stops
when every boundary edge is short; the surviving triangle set IS the
concave hull region (its outer boundary is the hull polygon).

Driver-side constructor over a dim-side point set — the same contract
as the reference's single-node GEOS call.
"""

from __future__ import annotations

import heapq
import math
from collections import defaultdict

import numpy as np

from gdal_spark.geometry.delaunay import delaunay


def concave_hull_tris(
    px: np.ndarray, py: np.ndarray, edge_threshold: float
) -> np.ndarray:
    """Surviving (ntri, 3) sorted-vertex triangles of the chi-shape at
    the given boundary-edge length threshold."""
    tris = delaunay(px, py)
    ntri = tris.shape[0]
    alive = np.ones(ntri, dtype=bool)
    edge_tris: dict[tuple[int, int], list[int]] = defaultdict(list)
    for ti in range(ntri):
        a, b, c = (int(v) for v in tris[ti])
        for e in ((a, b), (b, c), (a, c)):
            edge_tris[e].append(ti)

    def _elen(e: tuple[int, int]) -> float:
        return math.hypot(px[e[0]] - px[e[1]], py[e[0]] - py[e[1]])

    heap: list[tuple[float, tuple[int, int]]] = []

    def _maybe_push(e: tuple[int, int]) -> None:
        live = [t for t in edge_tris[e] if alive[t]]
        if len(live) == 1 and _elen(e) > edge_threshold:
            heapq.heappush(heap, (-_elen(e), e))

    for e in edge_tris:
        _maybe_push(e)
    while heap:
        _, e = heapq.heappop(heap)
        live = [t for t in edge_tris[e] if alive[t]]
        if len(live) != 1:
            continue  # stale entry
        t = live[0]
        a, b, c = (int(v) for v in tris[t])
        tedges = [(a, b), (b, c), (a, c)]
        n_boundary = sum(
            1
            for te in tedges
            if len([x for x in edge_tris[te] if alive[x]]) == 1
        )
        if n_boundary == 3:
            continue  # isolated triangle — removing it would delete a component
        alive[t] = False
        for te in tedges:
            _maybe_push(te)
    return tris[alive]
