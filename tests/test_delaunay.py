"""Bowyer-Watson Delaunay kernel (geometry/delaunay.py): the two
defining properties — empty circumcircles and exact convex-hull
coverage — on random point sets."""

import numpy as np

from gdal_spark.geometry.delaunay import delaunay


def _hull_area(px, py):
    pts = np.column_stack([px, py])
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(pp):
        h = []
        for q in pp:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], q - h[-2]) <= 0:
                h.pop()
            h.append(q)
        return h

    hull = np.array(half(pts)[:-1] + half(pts[::-1])[:-1])
    n = len(hull)
    return abs(
        sum(
            hull[i, 0] * hull[(i + 1) % n, 1] - hull[(i + 1) % n, 0] * hull[i, 1]
            for i in range(n)
        )
    ) / 2.0


def test_delaunay_properties_random():
    rng = np.random.default_rng(7)
    for _ in range(3):
        px = rng.uniform(0, 100, 120)
        py = rng.uniform(0, 100, 120)
        tris = delaunay(px, py)
        assert (np.diff(tris, axis=1) > 0).all()  # canonical sorted rows
        area = 0.0
        for a, b, c in tris:
            ax, ay, bx, by, cx, cy = px[a], py[a], px[b], py[b], px[c], py[c]
            d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
            a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
            ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
            uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
            r2 = (ax - ux) ** 2 + (ay - uy) ** 2
            others = np.ones(px.size, dtype=bool)
            others[[a, b, c]] = False
            assert not (
                ((px[others] - ux) ** 2 + (py[others] - uy) ** 2) < r2 - 1e-9
            ).any(), "circumcircle not empty"
            area += abs(
                (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
            ) / 2.0
        assert abs(area - _hull_area(px, py)) < 1e-6


def test_delaunay_jittered_grid_is_per_cell_diagonals():
    """The grid_linear fixture assumption: jitter 0.32 of spacing 4.0
    keeps every Delaunay edge within one grid cell (4 edges + 1
    diagonal per cell, 2 * 19 * 19 triangles for a 20x20 grid)."""
    tg = np.arange(20)
    gx, gy = np.meshgrid(tg, tg, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    px = gx * 4 + (((gx * 7 + gy * 13) % 9) - 4) * 8.0e-2
    py = gy * 4 + (((gx * 11 + gy * 5) % 9) - 4) * 8.0e-2
    tris = delaunay(px.astype(float), py.astype(float))
    tx, ty = gx[tris], gy[tris]
    in_cell = (tx.max(axis=1) - tx.min(axis=1) <= 1) & (
        ty.max(axis=1) - ty.min(axis=1) <= 1
    )
    # exactly 2 triangles per cell fit within a cell; the remainder are
    # convex-hull caps whose vertices ALL lie on the outer boundary ring
    # (the reason grid_linear's oracle excludes the jitter strip)
    assert in_cell.sum() == 2 * 19 * 19
    on_ring = (
        (tx == 0) | (tx == 19) | (ty == 0) | (ty == 19)
    ).all(axis=1)
    assert (in_cell | on_ring).all()
