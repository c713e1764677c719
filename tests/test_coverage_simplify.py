"""Coverage-simplification pins (operators/coverage_simplify.py).

The VW kernel is matched against an INDEPENDENT linked-list
implementation written here; the coverage guarantee (shared
boundaries identical in both owners — no gaps or overlaps) is pinned
structurally on the registry fixture and on a donut/island pair that
exercises the closed-loop (junction-free) arc path.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geometry.wkt import parse_wkt
from gdal_spark.operators.coverage_simplify import simplify_coverage, vw_simplify


def vw_linked(pts: np.ndarray, tol: float, closed: bool) -> np.ndarray:
    """Independent VW: doubly-linked list + full rescan per step."""
    n = len(pts)
    prv = list(range(-1, n - 1))
    nxt = list(range(1, n + 1))
    if closed:
        prv[0] = n - 1
        nxt[n - 1] = 0
    alive = [True] * n

    def area(i):
        p, q = pts[prv[i]], pts[nxt[i]]
        d1, d2 = p - pts[i], q - pts[i]
        return abs(d1[0] * d2[1] - d1[1] * d2[0]) / 2.0

    def candidates():
        if closed:
            return [i for i in range(1, n) if alive[i]]
        return [i for i in range(1, n - 1) if alive[i]]

    while True:
        cand = candidates()
        if len(cand) == 0 or sum(alive) <= (3 if closed else 2):
            break
        best = min(cand, key=lambda i: (area(i), i))
        if area(best) < tol:
            alive[best] = False
            nxt[prv[best]] = nxt[best]
            prv[nxt[best]] = prv[best]
        else:
            break
    return np.array(alive)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("closed", [False, True])
def test_vw_matches_independent_linked_list(seed, closed):
    rng = np.random.default_rng(seed)
    n = rng.integers(4, 14)
    pts = rng.integers(0, 12, (n, 2)).astype(float)
    # dedup consecutive duplicates (degenerate for both implementations)
    keep = np.r_[True, (np.abs(np.diff(pts, axis=0)).sum(axis=1) > 0)]
    pts = pts[keep]
    if closed and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    if len(pts) < 4:
        pts = np.array([[0, 0], [3, 1], [6, 0], [3, 5]], dtype=float)
    tol = float(rng.uniform(0.2, 6.0))
    a = vw_simplify(pts, tol, closed)
    b = vw_linked(pts, tol, closed)
    assert np.array_equal(a, b), (pts.tolist(), tol, closed)


def _ring_edges(wkt):
    """Undirected edge multiset of a polygon's rings."""
    _, rings = parse_wkt(wkt)
    edges = set()
    for ring in rings:
        v = np.asarray(ring, dtype=float)
        if np.array_equal(v[0], v[-1]):
            v = v[:-1]
        for i in range(len(v)):
            a = tuple(v[i])
            b = tuple(v[(i + 1) % len(v)])
            edges.add((min(a, b), max(a, b)))
    return edges


FIX = [
    (1, "POLYGON ((0 0,4 0,5 1,4 2,5 3,4 4,5 5,4 6,0 6,0 0))"),
    (2, "POLYGON ((4 0,8 0,8 6,4 6,5 5,4 4,5 3,4 2,5 1,4 0))"),
    (3, "POLYGON ((0 6,4 6,8 6,8 9,5 9,4 10,3 9,0 9,0 6))"),
]


@pytest.mark.parametrize("preserve", [True, False])
def test_shared_boundaries_stay_shared(spark, preserve):
    feats = spark.createDataFrame(FIX, "fid int, geom_wkt string")
    out = {
        r["fid"]: r["wkt"]
        for r in simplify_coverage(feats, 3.5, preserve_boundary=preserve).collect()
    }
    # interior edges of the simplified coverage still appear exactly twice
    from collections import Counter

    cnt = Counter()
    for wkt in out.values():
        for e in _ring_edges(wkt):
            cnt[e] += 1
    assert set(cnt.values()) <= {1, 2}
    # A and B share the collapsed chord x=4 exactly
    assert ((4.0, 0.0), (4.0, 6.0)) in _ring_edges(out[1])
    assert ((4.0, 0.0), (4.0, 6.0)) in _ring_edges(out[2])
    # no staircase vertex survives anywhere
    for wkt in out.values():
        assert "5 1" not in wkt and "5 5" not in wkt


def test_donut_island_closed_loop_arc(spark):
    """A donut whose hole boundary (with bumps) is entirely shared with
    an island polygon: the shared arc is a closed loop with NO junction
    vertices — the anchor path.  Both owners must emit the identical
    simplified loop and stay gap-free."""
    hole = "(2 2,5 2,6 3,7 2,10 2,10 10,2 10,2 2)"  # bump at (6,3)
    donut = f"POLYGON ((0 0,12 0,12 12,0 12,0 0),{hole})"
    island = f"POLYGON ({hole})"
    feats = spark.createDataFrame(
        [(1, donut), (2, island)], "fid int, geom_wkt string"
    )
    out = {
        r["fid"]: r["wkt"]
        for r in simplify_coverage(feats, 2.0, preserve_boundary=True).collect()
    }
    # bump area = 1 < 2 -> removed from BOTH owners identically
    assert "6 3" not in out[1] and "6 3" not in out[2]
    donut_hole_edges = _ring_edges(out[1]) - _ring_edges(
        "POLYGON ((0 0,12 0,12 12,0 12,0 0))"
    )
    assert donut_hole_edges == _ring_edges(out[2])
    # outer boundary untouched under preserve=True
    assert "12 0" in out[1]


def test_non_coverage_rejected(spark):
    # three rings sharing one edge -> loud failure
    feats = spark.createDataFrame(
        [
            (1, "POLYGON ((0 0,1 0,1 1,0 1,0 0))"),
            (2, "POLYGON ((0 0,1 0,1 1,0 1,0 0))"),
            (3, "POLYGON ((0 0,1 0,1 1,0 1,0 0))"),
        ],
        "fid int, geom_wkt string",
    )
    with pytest.raises(Exception, match="not a coverage"):
        simplify_coverage(feats, 1.0).collect()
