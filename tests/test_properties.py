"""Property-based tests (hypothesis) over the pure-numpy geometry
kernels — invariants the example-based suites can't sweep:

  * ray-cast PIP agrees with the convex half-plane test on random
    convex polygons;
  * general intersection area is symmetric, bounded by both operands,
    and idempotent (A ∩ A = area A);
  * mercator forward/inverse round-trips;
  * segmentize preserves endpoints, length, and the max-segment bound,
    and is direction-invariant (the reference's canonicalization);
  * WKT round-trips through the canonical writer.

All pure numpy — the whole module runs in seconds, no SparkSession.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.geometry.boolean import polys_area, polys_pair_intersection_area
from gdal_spark.geometry.mercator import lat_lon_to_meters, meters_to_lat_lon
from gdal_spark.geometry.pip import points_in_polygon
from gdal_spark.geometry.wkt import parse_wkt, payload_to_wkt
from gdal_spark.operators.densify import _segmentize_ring

coord = st.floats(-170.0, 170.0, allow_nan=False, width=64)


def _convex_polygon(cx, cy, radii):
    """Strictly convex polygon: points at sorted angles on varying radii
    around (cx, cy) — convex because we sort angles and use the hull."""
    n = len(radii)
    angs = np.linspace(0.0, 2.0 * math.pi, n, endpoint=False)
    pts = np.column_stack(
        [cx + radii * np.cos(angs), cy + radii * np.sin(angs)]
    )
    # gift-wrap to guarantee convexity regardless of radii
    hull = _hull(pts)
    return np.vstack([hull, hull[:1]])


def _hull(pts):
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


@given(
    cx=st.floats(-50, 50),
    cy=st.floats(-40, 40),
    radii=st.lists(st.floats(1.0, 10.0), min_size=5, max_size=12),
    probes=st.lists(st.tuples(coord, coord), min_size=1, max_size=20),
)
@settings(max_examples=60, deadline=None)
def test_raycast_matches_halfplane_on_convex(cx, cy, radii, probes):
    ring = _convex_polygon(cx, cy, np.asarray(radii))
    if ring.shape[0] < 4:  # degenerate hull
        return
    xs = np.array([p[0] for p in probes])
    ys = np.array([p[1] for p in probes])
    got = points_in_polygon(xs, ys, [ring])
    # CCW hull: inside == strictly left of every edge
    a, b = ring[:-1], ring[1:]
    cross = (b[:, 0] - a[:, 0])[None, :] * (ys[:, None] - a[:, 1][None, :]) - (
        b[:, 1] - a[:, 1]
    )[None, :] * (xs[:, None] - a[:, 0][None, :])
    want = (cross > 0).all(axis=1)
    on_edge = np.isclose(cross, 0.0, atol=1e-9).any(axis=1)
    ok = ~on_edge
    assert (got[ok] == want[ok]).all()


@given(
    cx=st.floats(-30, 30),
    cy=st.floats(-30, 30),
    r1=st.lists(st.floats(1.0, 8.0), min_size=5, max_size=10),
    dx=st.floats(-6, 6),
    dy=st.floats(-6, 6),
    r2=st.lists(st.floats(1.0, 8.0), min_size=5, max_size=10),
)
@settings(max_examples=40, deadline=None)
def test_intersection_area_bounds_and_symmetry(cx, cy, r1, dx, dy, r2):
    pa = _convex_polygon(cx, cy, np.asarray(r1))
    pb = _convex_polygon(cx + dx, cy + dy, np.asarray(r2))
    if pa.shape[0] < 4 or pb.shape[0] < 4:
        return
    a, b = [[pa]], [[pb]]
    inter = polys_pair_intersection_area(a, b)
    inter_sym = polys_pair_intersection_area(b, a)
    area_a, area_b = polys_area(a), polys_area(b)
    tol = 1e-7 * max(area_a, area_b, 1.0)
    assert abs(inter - inter_sym) <= tol
    assert -tol <= inter <= min(area_a, area_b) + tol
    self_inter = polys_pair_intersection_area(a, a)
    assert abs(self_inter - area_a) <= tol


@given(lat=st.floats(-85.0, 85.0), lon=st.floats(-180.0, 180.0))
@settings(max_examples=200, deadline=None)
def test_mercator_roundtrip(lat, lon):
    mx, my = lat_lon_to_meters(lat, lon)
    lat2, lon2 = meters_to_lat_lon(mx, my)
    assert abs(lat2 - lat) < 1e-9 and abs(lon2 - lon) < 1e-9


@given(
    pts=st.lists(st.tuples(coord, coord), min_size=2, max_size=8, unique=True),
    maxlen=st.floats(0.5, 50.0),
)
@settings(max_examples=80, deadline=None)
def test_segmentize_properties(pts, maxlen):
    line = np.asarray(pts, dtype=np.float64)
    out = _segmentize_ring(line, maxlen)
    # endpoints preserved
    assert (out[0] == line[0]).all() and (out[-1] == line[-1]).all()
    # no output segment exceeds maxlen by more than the reference's
    # REL_EPSILON_ROUND slack: k = floor(r - 0.01) leaves segments up to
    # maxlen * 1.01 unsplit (r just above 1), by design
    d = np.hypot(np.diff(out[:, 0]), np.diff(out[:, 1]))
    assert (d <= maxlen * 1.01 + 1e-9).all()
    # total length preserved
    l_in = np.hypot(np.diff(line[:, 0]), np.diff(line[:, 1])).sum()
    assert abs(d.sum() - l_in) <= 1e-6 * max(l_in, 1.0)
    # direction invariance (the reference's canonicalization contract)
    rev = _segmentize_ring(line[::-1].copy(), maxlen)
    assert np.array_equal(out, rev[::-1])


@given(
    pts=st.lists(
        st.tuples(st.integers(-999, 999), st.integers(-999, 999)),
        min_size=3,
        max_size=8,
        unique=True,
    )
)
@settings(max_examples=80, deadline=None)
def test_wkt_roundtrip(pts):
    ring = list(pts) + [pts[0]]
    wkt = (
        "POLYGON (("
        + ",".join(f"{x} {y}" for x, y in ring)
        + "))"
    )
    typ, payload = parse_wkt(wkt)
    again = payload_to_wkt(typ, payload)
    typ2, payload2 = parse_wkt(again)
    assert typ2 == typ
    assert np.array_equal(payload2[0], payload[0])
    # the canonical writer is a fixed point
    assert payload_to_wkt(typ2, payload2) == again


@given(
    ax0=st.integers(-50, 50), ay0=st.integers(-50, 50),
    aw=st.integers(1, 40), ah=st.integers(1, 40),
    bx0=st.integers(-50, 50), by0=st.integers(-50, 50),
    bw=st.integers(1, 40), bh=st.integers(1, 40),
)
@settings(max_examples=80, deadline=None)
def test_three_intersection_kernels_agree_on_rects(
    ax0, ay0, aw, ah, bx0, by0, bw, bh
):
    """Cross-validation of three INDEPENDENT implementations: the
    closed-form rect overlap, the fan-triangle boolean-area kernel, and
    the rectilinear compressed-grid kernel must produce the same
    intersection area."""
    from gdal_spark.geometry.rectbool import rect_bool_op

    def rect(x0, y0, w, h):
        return np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.float64,
        )

    a = [[rect(ax0, ay0, aw, ah)]]
    b = [[rect(bx0, by0, bw, bh)]]
    closed = max(0, min(ax0 + aw, bx0 + bw) - max(ax0, bx0)) * max(
        0, min(ay0 + ah, by0 + bh) - max(ay0, by0)
    )
    tri = polys_pair_intersection_area(a, b)
    grid = polys_area(rect_bool_op(a, b, "intersection"))
    assert tri == pytest_approx(closed)
    assert grid == pytest_approx(closed)


def pytest_approx(v):
    import pytest

    return pytest.approx(v, abs=1e-9, rel=1e-12)
