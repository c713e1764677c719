"""Pure-numpy Delaunay triangulation (Bowyer-Watson incremental insert).

The reference's linear gridding mode (GDALGridLinear, alg/gdalgrid.cpp
GGA_Linear) triangulates the full scattered point set once — via qhull
(alg/delaunay.c GDALTriangulationCreateDelaunay) — then barycentric-
interpolates per output node.  This module is the sandbox-stand-in for
the triangulation step (no scipy/qhull available): classic Bowyer-Watson
over a super-triangle, O(n) insertions with vectorized bad-triangle
detection per insert (per-unique-point loop over the DIM-side table,
same contract as the reference's single-node qhull call; the grid-node
interpolation stays fully distributed).

Assumes points in general position (no exact incircle/collinear ties) —
true for the jittered fixtures and measure-zero otherwise.
"""

from __future__ import annotations

import numpy as np


def delaunay(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Return (ntri, 3) int32 vertex indices of the Delaunay
    triangulation of the (px, py) point set; each row sorted ascending
    (canonical vertex order for downstream bit-exact interpolation)."""
    n = px.size
    if n < 3:
        return np.empty((0, 3), dtype=np.int32)
    # super-triangle comfortably containing everything
    cx, cy = px.mean(), py.mean()
    m = max(px.max() - px.min(), py.max() - py.min(), 1.0) * 64.0
    spx = np.concatenate([px, [cx - m, cx + m, cx]])
    spy = np.concatenate([py, [cy - m, cy - m, cy + m]])
    s0, s1, s2 = n, n + 1, n + 2

    tris: list[tuple[int, int, int]] = [(s0, s1, s2)]
    # cached circumcircle centers / radii^2, maintained parallel to tris
    ccx: list[float] = []
    ccy: list[float] = []
    cr2: list[float] = []

    def _circum(a: int, b: int, c: int) -> tuple[float, float, float]:
        ax, ay = spx[a], spy[a]
        bx, by = spx[b], spy[b]
        cx_, cy_ = spx[c], spy[c]
        d = 2.0 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        c2 = cx_ * cx_ + cy_ * cy_
        ux = (a2 * (by - cy_) + b2 * (cy_ - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cx_ - bx) + b2 * (ax - cx_) + c2 * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        return ux, uy, r2

    ccx_, ccy_, cr2_ = _circum(s0, s1, s2)
    ccx.append(ccx_)
    ccy.append(ccy_)
    cr2.append(cr2_)

    for p in range(n):
        x, y = spx[p], spy[p]
        acx = np.asarray(ccx)
        acy = np.asarray(ccy)
        ar2 = np.asarray(cr2)
        bad = np.nonzero((x - acx) ** 2 + (y - acy) ** 2 < ar2)[0]
        # boundary polygon = edges of bad triangles not shared by two
        edges: dict[tuple[int, int], int] = {}
        for ti in bad:
            a, b, c = tris[ti]
            for e in ((a, b), (b, c), (c, a)):
                key = (e[0], e[1]) if e[0] < e[1] else (e[1], e[0])
                edges[key] = edges.get(key, 0) + 1
        for ti in sorted(bad, reverse=True):
            tris.pop(ti)
            ccx.pop(ti)
            ccy.pop(ti)
            cr2.pop(ti)
        for (a, b), cnt in edges.items():
            if cnt != 1:
                continue
            tris.append((a, b, p))
            x0, y0, r2 = _circum(a, b, p)
            ccx.append(x0)
            ccy.append(y0)
            cr2.append(r2)

    out = [
        t for t in tris if t[0] < n and t[1] < n and t[2] < n
    ]
    arr = np.array(out, dtype=np.int32).reshape(-1, 3)
    arr.sort(axis=1)
    return arr[np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))]
