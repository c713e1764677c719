"""Polygon clipping + area kernels for the overlay operators.

Replaces the reference's GEOS-backed OGRGeometry::Intersection
(ogr/ogrgeometry.cpp:4895) for the engine's overlay family
(Clip/Erase/Identity — ogr/ogrsf_frmts/generic/ogrlayer.cpp:5497,5806,4730).

GEOS/shapely is unavailable in this environment, so exact pairwise
intersection geometry is implemented for the case the corpus exercises:
clipping an arbitrary simple polygon by a CONVEX polygon
(Sutherland–Hodgman).  Axis-aligned rectangle x rectangle — the form the
sf-scale oracle uses — is a special case and is bit-exact.  Non-convex
clip layers raise, by design (documented engine limitation v1).
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_convex", "clip_polygon_convex", "shoelace_area", "rect_intersection"]


def shoelace_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring (positive = CCW)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return float(0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def is_convex(ring: np.ndarray) -> bool:
    """True if the closed ring is convex (all cross products same sign)."""
    p = ring[:-1]
    a = np.roll(p, -1, axis=0) - p
    b = np.roll(p, -2, axis=0) - np.roll(p, -1, axis=0)
    cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    return bool(np.all(cross >= 0) or np.all(cross <= 0))


def clip_polygon_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` ring by convex ``clip_ring``.

    Both closed (first==last).  Returns the clipped closed ring, or an
    empty (0,2) array if the intersection is empty/degenerate.
    """
    if not is_convex(clip_ring):
        raise ValueError("clip layer polygon must be convex in v1")
    # ensure CCW clip ring so "inside" = left of each directed edge
    cr = clip_ring if shoelace_area(clip_ring) > 0 else clip_ring[::-1]
    out = subject[:-1]  # open ring
    for i in range(len(cr) - 1):
        if len(out) == 0:
            break
        ax, ay = cr[i]
        bx, by = cr[i + 1]
        px = out[:, 0]
        py = out[:, 1]
        # signed side of each subject vertex relative to clip edge a->b
        side = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        inside = side >= 0
        nxt = np.roll(np.arange(len(out)), -1)
        new_pts: list[tuple[float, float]] = []
        for j in range(len(out)):
            k = nxt[j]
            if inside[j]:
                new_pts.append((px[j], py[j]))
                if not inside[k]:
                    t = side[j] / (side[j] - side[k])
                    new_pts.append(
                        (px[j] + t * (px[k] - px[j]), py[j] + t * (py[k] - py[j]))
                    )
            elif inside[k]:
                t = side[j] / (side[j] - side[k])
                new_pts.append(
                    (px[j] + t * (px[k] - px[j]), py[j] + t * (py[k] - py[j]))
                )
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    if len(out) < 3:
        return np.empty((0, 2), dtype=np.float64)
    closed = np.vstack([out, out[:1]])
    if abs(shoelace_area(closed)) == 0.0:
        # lower-dimension result (shared edge/point) — caller decides
        # KEEP_LOWER_DIMENSION_GEOMETRIES semantics (ogrlayer.cpp:3369-3406)
        return np.empty((0, 2), dtype=np.float64)
    return closed


def rect_intersection(a, b):
    """(xmin,ymin,xmax,ymax) ∩ (xmin,ymin,xmax,ymax) -> rect or None."""
    xmin = max(a[0], b[0])
    ymin = max(a[1], b[1])
    xmax = min(a[2], b[2])
    ymax = min(a[3], b[3])
    if xmin >= xmax or ymin >= ymax:
        return None
    return (xmin, ymin, xmax, ymax)
