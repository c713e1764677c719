"""Union/SymDifference coverage kernel vs numpy brute force."""

import numpy as np
import pytest

from gdal_spark.operators.coverage import rect_union_area, zone_coverage


class TestRectUnionArea:
    def test_disjoint(self):
        r = np.array([[0, 0, 1, 1], [2, 2, 3, 3]], dtype=float)
        assert rect_union_area(r) == 2.0

    def test_nested(self):
        r = np.array([[0, 0, 4, 4], [1, 1, 2, 2]], dtype=float)
        assert rect_union_area(r) == 16.0

    def test_overlapping(self):
        r = np.array([[0, 0, 2, 2], [1, 1, 3, 3]], dtype=float)
        assert rect_union_area(r) == 7.0  # 4 + 4 - 1

    def test_empty(self):
        assert rect_union_area(np.empty((0, 4))) == 0.0

    def test_against_pixel_brute_force(self):
        rng = np.random.default_rng(3)
        lo = rng.uniform(0, 8, size=(20, 2))
        wh = rng.uniform(0.5, 3, size=(20, 2))
        rects = np.hstack([lo, lo + wh])
        got = rect_union_area(rects)
        # brute force on a fine grid
        g = np.linspace(0, 12, 1201)
        xc = (g[:-1] + g[1:]) / 2
        cell = (g[1] - g[0]) ** 2
        X, Y = np.meshgrid(xc, xc, indexing="ij")
        covered = np.zeros_like(X, dtype=bool)
        for x0, y0, x1, y1 in rects:
            covered |= (X > x0) & (X < x1) & (Y > y0) & (Y < y1)
        approx = covered.sum() * cell
        assert abs(got - approx) < 0.3


class TestZoneCoverage:
    def test_union_semantics(self, spark):
        # zone (0,0)-(10,10); two overlapping pieces: union area 7
        pieces = spark.createDataFrame(
            [
                (1, 100, 0.0, 0.0, 2.0, 2.0),
                (2, 100, 1.0, 1.0, 3.0, 3.0),
            ],
            "doc_id long, zone_id long, pxmin double, pymin double, pxmax double, pymax double",
        )
        zones_df = spark.createDataFrame(
            [(100, 0.0, 0.0, 10.0, 10.0), (101, 20.0, 20.0, 22.0, 22.0)],
            "zone_id long, zxmin double, zymin double, zxmax double, zymax double",
        )
        out = {r.zone_id: (r.covered_area, r.uncovered_area) for r in zone_coverage(pieces, zones_df).collect()}
        assert out[100] == (7.0, 93.0)
        assert out[101] == (0.0, 4.0)  # untouched zone fully uncovered
