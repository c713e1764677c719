"""Curve linearization (curve_to_line): geometric invariants of the
stroked arcs.  Bit-exactness vs DuckDB is covered by the auto contract
test (registry 'curve_to_line'); these tests pin the properties the
reference guarantees (ogr/ogrgeometryfactory.cpp:5439)."""

import math

import duckdb
import pytest

from gdal_spark.registry import _ARCS_SQL, _CURVE_ORACLE


@pytest.fixture(scope="module")
def rows():
    con = duckdb.connect()
    out = con.execute(_CURVE_ORACLE + " ORDER BY arc_id, seq").fetchall()
    by_arc = {}
    for arc_id, seq, x, y in out:
        by_arc.setdefault(arc_id, []).append((x, y))
    return by_arc


@pytest.fixture(scope="module")
def arcs():
    con = duckdb.connect()
    return {
        r[0]: r[1:]
        for r in con.execute(_ARCS_SQL).fetchall()  # (x0,y0,x1,y1,x2,y2)
    }


def _circle(p0, p1, p2):
    """Circumcenter + radius (independent formula, not the reference's)."""
    ax, ay = p0
    bx, by = p1
    cx, cy = p2
    d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    return ux, uy, math.hypot(ax - ux, ay - uy)


class TestCurveToLine:
    def test_endpoints_and_intermediate_exact(self, rows, arcs):
        for arc_id, pts in rows.items():
            x0, y0, x1, y1, x2, y2 = arcs[arc_id]
            assert pts[0] == (x0, y0)
            assert pts[-1] == (x2, y2)
            assert (x1, y1) in pts  # ADD_INTERMEDIATE_POINT=YES

    def test_stroked_points_on_circle(self, rows, arcs):
        """Every emitted vertex of a true arc lies on the circumcircle
        (checked against an independent circumcenter formula)."""
        for arc_id, pts in rows.items():
            x0, y0, x1, y1, x2, y2 = arcs[arc_id]
            if len(pts) <= 3 or (x0, y0) == (x2, y2):
                continue  # collinear/degenerate/full-circle handled below
            cx, cy, r = _circle((x0, y0), (x1, y1), (x2, y2))
            for x, y in pts:
                assert abs(math.hypot(x - cx, y - cy) - r) < 1e-9 * max(r, 1)

    def test_full_circle_on_circle_and_closed(self, rows, arcs):
        x0, y0, x1, y1, x2, y2 = arcs[0]
        pts = rows[0]
        assert pts[0] == pts[-1] == (x0, y0)
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        r = math.hypot(x0 - cx, y0 - cy)
        for x, y in pts:
            assert abs(math.hypot(x - cx, y - cy) - r) < 1e-9
        # 4-degree default step over 360 degrees: 91 vertices
        assert len(pts) == 91

    def test_angle_step_bounded(self, rows, arcs):
        """Consecutive vertices never subtend more than the 4-degree
        hint's true bound: nSteps = int(|span/step| + 0.5) may round
        DOWN (the reference documents the step as a hint), and with
        nSteps >= 4 the worst stretch is 4 * (n + 0.5)/n <= 4.5 deg."""
        for arc_id, pts in rows.items():
            x0, y0, x1, y1, x2, y2 = arcs[arc_id]
            if len(pts) <= 3:
                continue
            if (x0, y0) == (x2, y2):
                cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            else:
                cx, cy, _ = _circle((x0, y0), (x1, y1), (x2, y2))
            for (xa, ya), (xb, yb) in zip(pts, pts[1:]):
                va = math.atan2(ya - cy, xa - cx)
                vb = math.atan2(yb - cy, xb - cx)
                d = abs(vb - va)
                d = min(d, 2 * math.pi - d)
                assert d <= math.radians(4.0) * 1.125 + 1e-9

    def test_curve_area_vs_independent_formulas(self):
        """st_curve_area vs closed forms derived independently: full
        circle pi*R^2; lens = 2 segments of R = (s^2+(c/2)^2)/(2s) with
        theta = 2*asin((c/2)/R), plus the control-polygon rhombus."""
        from gdal_spark.registry import _CAREA_SQL

        con = duckdb.connect()
        out = dict(
            (r[0], r[1]) for r in con.execute(_CAREA_SQL).fetchall()
        )
        assert abs(out[0] - 5 * math.pi) < 1e-12
        R = (2**2 + 5**2) / (2 * 2)  # chord 10, sagitta 2
        theta = 2 * math.asin(5 / R)
        lens = 2 * (R * R / 2) * (theta - math.sin(theta))
        # reference decomposition: rhombus (area 20) + 4 sliver segments
        # equals the pure 2-segment lens formula
        assert abs(out[1] - lens) < 1e-10
        assert abs(out[2] - lens) < 1e-10

    def test_curve_area_fixtures_are_convex(self):
        """The area query hardcodes the reference's convex branch; pin
        that the stroked lens outlines really are convex (all turns one
        sign), so the branch choice is statically right."""
        from gdal_spark.registry import _CAREA_ARCS, _CURVE_TAIL

        con = duckdb.connect()
        tail = _CURVE_TAIL.format(
            k1="unnest(generate_series(1, CAST(ns1 AS BIGINT)))",
            k2="unnest(generate_series(1, CAST(ns2 AS BIGINT)))",
        )
        pts = con.execute(
            "WITH arcs AS (" + _CAREA_ARCS + "), " + tail + " ORDER BY arc_id, seq"
        ).fetchall()
        for lo, hi in [(1, 2), (3, 4)]:  # the two lenses' arc pairs
            ring = [(x, y) for aid, _, x, y in pts if lo <= aid <= hi]
            ring = [p for i, p in enumerate(ring) if i == 0 or p != ring[i - 1]]
            if ring[0] == ring[-1]:
                ring = ring[:-1]
            signs = set()
            n = len(ring)
            for i in range(n):
                ax, ay = ring[i]
                bx, by = ring[(i + 1) % n]
                cx, cy = ring[(i + 2) % n]
                cr = (bx - ax) * (cy - by) - (by - ay) * (cx - bx)
                if abs(cr) > 1e-12:
                    signs.add(cr > 0)
            assert len(signs) == 1, f"arcs {lo}-{hi} not convex"

    def test_compound_structure(self):
        """compound_to_line: joints appear exactly once, vertex counts
        decompose as sum(segment vertices) - (n_segments - 1), and the
        chain is continuous (every adjacent pair distinct, segments in
        declared order)."""
        from gdal_spark.registry import _COMPOUND_ORACLE

        con = duckdb.connect()
        rows = con.execute(
            _COMPOUND_ORACLE + " ORDER BY cmp_id, vertex"
        ).fetchall()
        by = {}
        for cid, vtx, x, y in rows:
            by.setdefault(cid, []).append((x, y))
        # compound 0 = line(2) + semicircle(47) + line(2), 2 joints deduped
        assert len(by[0]) == 2 + 47 + 2 - 2
        assert by[0][0] == (0.0, 0.0) and by[0][-1] == (25.0, 0.0)
        assert by[0].count((10.0, 0.0)) == 1 and by[0].count((20.0, 0.0)) == 1
        # compound 1 = two semicircles sharing one joint
        assert len(by[1]) == 47 + 47 - 1
        assert by[1].count((8.0, 20.0)) == 1
        for pts in by.values():  # no zero-length edges anywhere
            assert all(a != b for a, b in zip(pts, pts[1:]))

    def test_reversed_arc_is_binary_symmetric(self):
        """The reference guarantees reversed endpoints (same
        intermediate) produce the bitwise-reversed vertex list
        (ogrgeometryfactory.cpp:5446 canonical end ordering)."""
        con = duckdb.connect()
        tail = _CURVE_ORACLE.split("), ", 1)[1]
        fwd = "SELECT 0 AS arc_id, 1.0e1 AS x0, 0.0e0 AS y0, 5.0e0 AS x1, 5.0e0 AS y1, 0.0e0 AS x2, 0.0e0 AS y2"
        rev = "SELECT 0 AS arc_id, 0.0e0 AS x0, 0.0e0 AS y0, 5.0e0 AS x1, 5.0e0 AS y1, 1.0e1 AS x2, 0.0e0 AS y2"
        a = con.execute(
            "WITH arcs AS (" + fwd + "), " + tail + " ORDER BY seq"
        ).fetchall()
        b = con.execute(
            "WITH arcs AS (" + rev + "), " + tail + " ORDER BY seq"
        ).fetchall()
        assert [(x, y) for _, _, x, y in a] == [
            (x, y) for _, _, x, y in reversed(b)
        ]
