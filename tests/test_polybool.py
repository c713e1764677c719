"""General polygon boolean kernel (geometry/polybool.py): area
cross-checks against the independent fan-triangle intersection-area
kernel (geometry/boolean.py) on rotated and random concave pairs."""

import numpy as np
import pytest

from gdal_spark.geometry.boolean import polys_area, polys_pair_intersection_area
from gdal_spark.geometry.polybool import general_bool_op, general_setop_wkt
from gdal_spark.geometry.wkt import parse_wkt


def _polys(w):
    t, p = parse_wkt(w)
    return p if t == "MULTIPOLYGON" else ([] if t == "EMPTY" else [p])


def _groups_area(groups):
    total = 0.0
    for rings in groups:
        for ring in rings:
            v = np.asarray(ring)
            total += 0.5 * float(
                np.sum(v[:-1, 0] * v[1:, 1] - v[1:, 0] * v[:-1, 1])
            )  # shells CCW (+), holes CW (-)
    return total


def _op_area(pa, pb, op):
    return _groups_area(general_bool_op(pa, pb, op))


class TestRotatedLWithHole:
    """The verdict fixture: concave L with a hole x straddling rect,
    rotated by an irrational-ish angle (no axis-aligned edges)."""

    @pytest.fixture(scope="class")
    def pair(self):
        th = 0.37  # radians — nothing special about it
        c, s = np.cos(th), np.sin(th)

        def rot(w):
            t, p = parse_wkt(w)
            polys = p if t == "MULTIPOLYGON" else [p]
            return [
                [
                    np.array(
                        [(c * x - s * y, s * x + c * y) for x, y in ring]
                    )
                    for ring in rings
                ]
                for rings in polys
            ]

        pa = rot("POLYGON ((0 0,8 0,8 3,3 3,3 8,0 8,0 0),(1 1,1 2,2 2,2 1,1 1))")
        pb = rot("POLYGON ((1 -1,7 -1,7 7,1 7,1 -1))")
        return pa, pb

    def test_intersection_area_vs_fan_triangle(self, pair):
        pa, pb = pair
        want = polys_pair_intersection_area(pa, pb)
        got = _op_area(pa, pb, "intersection")
        assert got == pytest.approx(want, abs=1e-4)
        assert want > 0

    def test_boolean_identities(self, pair):
        pa, pb = pair
        a = polys_area(pa)
        b = polys_area(pb)
        i = _op_area(pa, pb, "intersection")
        assert _op_area(pa, pb, "difference") == pytest.approx(a - i, abs=1e-4)
        assert _op_area(pa, pb, "union") == pytest.approx(a + b - i, abs=1e-4)
        assert _op_area(pa, pb, "symdifference") == pytest.approx(
            a + b - 2 * i, abs=1e-4
        )

    def test_hole_survives_where_uncovered(self, pair):
        """The hole straddles B's edge: the A-B difference keeps the
        hole's uncovered sliver out of the result (area accounts for
        it), and the intersection polygon carries NO hole (the hole's
        B-covered part is excluded by construction of A)."""
        pa, pb = pair
        w = general_setop_wkt(pa, pb, "intersection")
        assert w.startswith("POLYGON") or w.startswith("MULTIPOLYGON")


class TestRandomRectilinearCrossKernel:
    """Random rectilinear shapes: the general arrangement kernel must
    emit the EXACT canonical WKT the compressed-grid kernel emits —
    string equality, all four ops (the two kernels share no code)."""

    @pytest.mark.parametrize("seed", list(range(12)))
    def test_wkt_equality(self, seed):
        from gdal_spark.geometry.rectbool import rect_bool_op
        from gdal_spark.geometry.wkt import payload_to_wkt

        rng = np.random.default_rng(100 + seed)

        def rand_shape():
            # union of 3 random rects -> a valid (possibly concave/holed
            # /multipart) rectilinear multipolygon via the grid kernel
            acc = None
            for _ in range(3):
                x0, y0 = rng.integers(0, 12, 2)
                w, h = rng.integers(2, 7, 2)
                rect = [
                    [
                        np.array(
                            [
                                [x0, y0],
                                [x0 + w, y0],
                                [x0 + w, y0 + h],
                                [x0, y0 + h],
                                [x0, y0],
                            ],
                            dtype=np.float64,
                        )
                    ]
                ]
                acc = rect if acc is None else rect_bool_op(acc, rect, "union")
            return acc

        def rect_wkt(polys):
            if not polys:
                return "POLYGON EMPTY"
            if len(polys) == 1:
                return payload_to_wkt("POLYGON", polys[0])
            return payload_to_wkt("MULTIPOLYGON", polys)

        pa, pb = rand_shape(), rand_shape()
        for op in ("intersection", "difference", "union", "symdifference"):
            want = rect_wkt(rect_bool_op(pa, pb, op))
            got = general_setop_wkt(pa, pb, op)
            assert got == want, f"seed={seed} op={op}\n got={got}\nwant={want}"


class TestRandomRotatedCrossKernel:
    """The same random rectilinear shapes ROTATED by the 3-4-5 matrix:
    the general kernel must produce the rotated grid-kernel result —
    polygon/hole counts equal and every area identical (rotation
    preserves areas; coordinates stress the fp/quantization path)."""

    @pytest.mark.parametrize("seed", list(range(6)))
    def test_rotated_equivalence(self, seed):
        from gdal_spark.geometry.rectbool import rect_bool_op

        rng = np.random.default_rng(200 + seed)
        c, s = 0.8, 0.6

        def rot(polys):
            return [
                [
                    np.array([(c * x - s * y, s * x + c * y) for x, y in r])
                    for r in rings
                ]
                for rings in polys
            ]

        def rand_shape():
            acc = None
            for _ in range(3):
                x0, y0 = rng.integers(0, 12, 2)
                w, h = rng.integers(2, 7, 2)
                rect = [
                    [
                        np.array(
                            [
                                [x0, y0],
                                [x0 + w, y0],
                                [x0 + w, y0 + h],
                                [x0, y0 + h],
                                [x0, y0],
                            ],
                            dtype=np.float64,
                        )
                    ]
                ]
                acc = rect if acc is None else rect_bool_op(acc, rect, "union")
            return acc

        pa, pb = rand_shape(), rand_shape()
        for op in ("intersection", "difference", "union", "symdifference"):
            want = rect_bool_op(pa, pb, op)
            got = general_bool_op(rot(pa), rot(pb), op)
            assert len(got) == len(want), f"seed={seed} op={op} polygon count"
            assert sorted(len(g) for g in got) == sorted(
                len(w) for w in want
            ), f"seed={seed} op={op} ring counts"
            want_area = sum(
                0.5
                * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
                for rings in want
                for r in rings
            )
            assert _groups_area(got) == pytest.approx(
                want_area, abs=1e-5
            ), f"seed={seed} op={op}"


class TestRandomConcavePairs:
    @pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_intersection_area_matches(self, seed):
        rng = np.random.default_rng(seed)

        def star(cx, cy, n):
            # jittered even spacing -> every angular gap < pi -> simple
            ang = 2 * np.pi * (np.arange(n) + rng.uniform(0.1, 0.9, n)) / n
            rad = rng.uniform(1.0, 3.0, n)
            pts = np.column_stack(
                [cx + rad * np.cos(ang), cy + rad * np.sin(ang)]
            )
            return [[np.vstack([pts, pts[:1]])]]

        pa = star(0.0, 0.0, 9)
        pb = star(1.1, 0.7, 7)
        want = polys_pair_intersection_area(pa, pb)
        got = _op_area(pa, pb, "intersection")
        assert got == pytest.approx(want, abs=2e-4)
        # identities on the same pair
        a, b = polys_area(pa), polys_area(pb)
        assert _op_area(pa, pb, "union") == pytest.approx(
            a + b - want, abs=2e-4
        )
        assert _op_area(pa, pb, "symdifference") == pytest.approx(
            a + b - 2 * want, abs=2e-4
        )
