"""Exact boolean ops on RECTILINEAR polygons, emitting geometry.

The scalar half of the reference's set-op surface — ST_Intersection /
ST_Difference / ST_Union / ST_SymDifference as functions RETURNING a
geometry (ogrsqlitesqlfunctions.cpp:1208-1214 REGISTER_ST_op
Intersection/Difference/Union/SymDifference; GEOS-backed
OGRGeometry::Intersection ogr/ogrgeometry.cpp:4895, Union :5014,
SymDifference :5229).  The layer operators compute piece AREAS with the
signed-fan kernel (geometry/boolean.py); this module produces the piece
GEOMETRY for the axis-parallel class, where the result is exact:

  1. coordinate-compress both inputs (sorted unique xs / ys of all
     vertices) — every input edge lies on a grid line, so membership is
     constant per grid cell;
  2. classify each cell midpoint against A and B (even/odd PIP — holes
     handled by the ring-XOR rule) and combine with the requested op;
  3. 4-connected component labeling of the result mask (vectorized
     min-relaxation), then per component: directed boundary edges with
     interior-on-the-left, chained into closed rings by the SAME walker
     GDALPolygonize-style ring extraction uses
     (operators/polygonize._chain_rings);
  4. map vertex indices back to real coordinates and canonicalize:
     consecutive-duplicate / collinear collapse, shell CCW + holes CW,
     every ring started at its lexicographically smallest vertex,
     holes and polygons ordered by that start vertex.

All arithmetic on the compressed grid is integer index math — no
floating-point construction anywhere, so outputs are bit-exact closed
forms (the oracle writes the expected WKT literally).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry.clip import shoelace_area
from gdal_spark.geometry.pip import points_in_polygon

__all__ = ["rect_bool_op", "canonical_polys"]

_OPS = {
    "intersection": lambda a, b: a & b,
    "difference": lambda a, b: a & ~b,
    "union": lambda a, b: a | b,
    "symdifference": lambda a, b: a ^ b,
}


def _inside_grid(cx: np.ndarray, cy: np.ndarray, polys: list) -> np.ndarray:
    """(ny, nx) bool: cell midpoint in any polygon of the multipolygon."""
    flat_x = np.broadcast_to(cx[None, :], (cy.size, cx.size)).ravel()
    flat_y = np.broadcast_to(cy[:, None], (cy.size, cx.size)).ravel()
    out = np.zeros(flat_x.size, dtype=bool)
    for rings in polys:
        out |= points_in_polygon(flat_x, flat_y, rings)
    return out.reshape(cy.size, cx.size)


def _components(mask: np.ndarray) -> np.ndarray:
    """4-connected labels over a small grid — iterative vectorized
    min-relaxation (grid is O(vertex-count²) of the PAIR, not a raster)."""
    lab = np.where(mask, np.arange(mask.size).reshape(mask.shape), -1)
    while True:
        new = lab.copy()
        new[1:, :] = np.where(
            mask[1:, :] & mask[:-1, :], np.minimum(new[1:, :], lab[:-1, :]), new[1:, :]
        )
        new[:-1, :] = np.where(
            mask[:-1, :] & mask[1:, :], np.minimum(new[:-1, :], lab[1:, :]), new[:-1, :]
        )
        new[:, 1:] = np.where(
            mask[:, 1:] & mask[:, :-1], np.minimum(new[:, 1:], lab[:, :-1]), new[:, 1:]
        )
        new[:, :-1] = np.where(
            mask[:, :-1] & mask[:, 1:], np.minimum(new[:, :-1], lab[:, 1:]), new[:, :-1]
        )
        if np.array_equal(new, lab):
            return lab
        lab = new


def _mask_rings(mask: np.ndarray) -> list[np.ndarray]:
    """Boundary rings (index space) of a single connected cell mask,
    interior-left directed edges chained by the polygonize walker."""
    from gdal_spark.operators.polygonize import _chain_rings

    p = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=bool)
    p[1:-1, 1:-1] = mask
    ys, xs = np.nonzero(mask)
    segs = []
    north = ~p[ys, xs + 1]
    south = ~p[ys + 2, xs + 1]
    west = ~p[ys + 1, xs]
    east = ~p[ys + 1, xs + 2]
    # same interior-left convention as component_rings' edge_kernel
    segs.append(np.column_stack([xs[north], ys[north], xs[north] + 1, ys[north]]))
    segs.append(
        np.column_stack([xs[east] + 1, ys[east], xs[east] + 1, ys[east] + 1])
    )
    segs.append(
        np.column_stack([xs[south] + 1, ys[south] + 1, xs[south], ys[south] + 1])
    )
    segs.append(np.column_stack([xs[west], ys[west] + 1, xs[west], ys[west]]))
    return _chain_rings(np.concatenate(segs).astype(np.int64))


def canonical_polys(polys: list) -> list:
    """Canonical form of a list of [shell, holes...] ring lists:
    consecutive duplicates dropped, collinear midpoints collapsed,
    shell CCW / holes CW, rings rotated to start at the lexicographic
    min vertex, holes and polygons sorted by that start."""
    out = []
    for rings in polys:
        canon_rings = []
        for k, r in enumerate(rings):
            v = np.asarray(r, dtype=np.float64)
            if np.array_equal(v[0], v[-1]):
                v = v[:-1]
            keep = np.r_[True, (np.abs(np.diff(v, axis=0)).sum(axis=1) > 0)]
            v = v[keep]
            d1 = v - np.roll(v, 1, axis=0)
            d2 = np.roll(v, -1, axis=0) - v
            cross = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
            v = v[np.abs(cross) > 1e-12]
            i0 = np.lexsort((v[:, 1], v[:, 0]))[0]
            v = np.roll(v, -i0, axis=0)
            closed = np.vstack([v, v[:1]])
            want_ccw = k == 0
            if (shoelace_area(closed) > 0) != want_ccw:
                closed = np.vstack([closed[0:1], closed[-2::-1]])
            canon_rings.append(closed)
        shell = canon_rings[0]
        holes = sorted(canon_rings[1:], key=lambda r: (r[0, 0], r[0, 1]))
        out.append([shell] + holes)
    return sorted(out, key=lambda rs: (rs[0][0, 0], rs[0][0, 1]))


def rect_bool_op(polys_a: list, polys_b: list, op: str) -> list:
    """Boolean op of two rectilinear multipolygons -> canonical list of
    [shell, holes...] ring lists (empty list for an empty result)."""
    fn = _OPS[op]
    allv = np.vstack(
        [r for polys in (polys_a, polys_b) for rings in polys for r in rings]
    )
    xs = np.unique(allv[:, 0])
    ys = np.unique(allv[:, 1])
    if xs.size < 2 or ys.size < 2:
        return []
    cx = (xs[:-1] + xs[1:]) / 2.0
    cy = (ys[:-1] + ys[1:]) / 2.0
    mask = fn(_inside_grid(cx, cy, polys_a), _inside_grid(cx, cy, polys_b))
    if not mask.any():
        return []
    lab = _components(mask)
    polys = []
    for lid in np.unique(lab[lab >= 0]):
        rings_idx = _mask_rings(lab == lid)
        # index space -> real coords; pick the max-|area| ring as shell
        rings = [
            np.column_stack([xs[r[:, 0]], ys[r[:, 1]]]) for r in rings_idx
        ]
        areas = [abs(shoelace_area(r)) for r in rings]
        s = int(np.argmax(areas))
        polys.append([rings[s]] + [r for i, r in enumerate(rings) if i != s])
    return canonical_polys(polys)
