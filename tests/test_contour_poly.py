"""contour_polygons general path: exact band areas on a diagonal ramp
(rings cross tile borders and domain corners) and a donut band (hole
assignment + orientation)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.contour_poly import contour_polygons


def _rings(wkt):
    assert wkt.startswith("POLYGON (")
    body = wkt[len("POLYGON (") : -1]
    rings = []
    for m in re.finditer(r"\(([^()]*)\)", body):
        pts = []
        for pair in m.group(1).split(","):
            x, y = pair.split()
            pts.append((float(x), float(y)))
        assert pts[0] == pts[-1]
        rings.append(pts[:-1])
    return rings


def _signed_area(ring):
    s = 0.0
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _poly_area(wkt):
    # shells CCW (+), holes CW (-): the signed sum IS the net area
    return sum(_signed_area(r) for r in _rings(wkt))


def _halfplane_area(c, w, h):
    """Exact area of {x + 2y <= c} within [0, w] x [0, h] (piecewise
    linear integral of clamp(c - 2y, 0, w) over y in [0, h])."""
    ys = sorted({0.0, h, min(max(c / 2.0, 0.0), h), min(max((c - w) / 2.0, 0.0), h)})
    total = 0.0
    for y0, y1 in zip(ys, ys[1:]):
        ym = (y0 + y1) / 2.0
        v = min(max(c - 2.0 * ym, 0.0), w)  # linear on the piece -> midpoint exact
        total += v * (y1 - y0)
    return total


class TestDiagonalRamp:
    W, H = 40, 30
    LEVELS = [20.5, 50.5]

    @pytest.fixture(scope="class")
    def polys(self, spark):
        px_df = spark.range(self.W * self.H).select(
            (F.col("id") % self.W).cast("int").alias("px"),
            ((F.col("id") - (F.col("id") % self.W)) / self.W)
            .cast("int")
            .alias("py"),
        )
        px_df = px_df.withColumn("value", F.expr("CAST(px + 2 * py AS DOUBLE)"))
        return contour_polygons(px_df, self.W, self.H, self.LEVELS).collect()

    def test_band_areas_exact(self, polys):
        w, h = self.W - 1, self.H - 1
        want = {
            (None, 20.5): _halfplane_area(20.5, w, h),
            (20.5, 50.5): _halfplane_area(50.5, w, h) - _halfplane_area(20.5, w, h),
            (50.5, None): w * h - _halfplane_area(50.5, w, h),
        }
        got = {}
        for r in polys:
            key = (r.band_lo, r.band_hi)
            got[key] = got.get(key, 0.0) + _poly_area(r.wkt)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-6), k

    def test_total_area_closes(self, polys):
        total = sum(_poly_area(r.wkt) for r in polys)
        assert total == pytest.approx((self.W - 1) * (self.H - 1), abs=1e-6)


class TestRandomFieldClosure:
    """Random integer fields at .5 levels (no ties, saddles abound):
    the band polygons must partition the domain EXACTLY — areas close
    to the full rectangle and every band's area is non-negative."""

    @pytest.mark.parametrize("seed", [11, 12, 13])
    def test_partition_closure(self, spark, seed):
        import numpy as np

        w, h = 23, 17
        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 6, size=(h, w))
        rows = [
            (int(x), int(y), float(vals[y, x]))
            for y in range(h)
            for x in range(w)
        ]
        px_df = spark.createDataFrame(rows, "px int, py int, value double")
        out = contour_polygons(px_df, w, h, [1.5, 3.5]).collect()
        total = 0.0
        per_band = {}
        for r in out:
            a = _poly_area(r.wkt)
            assert a > 0, (r.band_lo, r.band_hi, r.wkt)
            per_band[(r.band_lo, r.band_hi)] = (
                per_band.get((r.band_lo, r.band_hi), 0.0) + a
            )
            total += a
        assert total == pytest.approx((w - 1) * (h - 1), abs=1e-5), per_band


class TestDonut:
    W, H = 41, 31

    def test_annulus_band_has_hole(self, spark):
        px_df = spark.range(self.W * self.H).select(
            (F.col("id") % self.W).cast("int").alias("px"),
            ((F.col("id") - (F.col("id") % self.W)) / self.W)
            .cast("int")
            .alias("py"),
        )
        px_df = px_df.withColumn(
            "value",
            F.expr("CAST((px - 20) * (px - 20) + (py - 15) * (py - 15) AS DOUBLE)"),
        )
        rows = contour_polygons(px_df, self.W, self.H, [36.5, 100.5]).collect()
        by_band = {}
        for r in rows:
            by_band.setdefault((r.band_lo, r.band_hi), []).append(r.wkt)
        # inner disc: one polygon, no hole
        (inner,) = by_band[(None, 36.5)]
        assert len(_rings(inner)) == 1
        assert _poly_area(inner) == pytest.approx(math.pi * 36.5, rel=0.04)
        # annulus: one polygon with exactly one hole
        (mid,) = by_band[(36.5, 100.5)]
        rings = _rings(mid)
        assert len(rings) == 2
        assert _signed_area(rings[0]) > 0 and _signed_area(rings[1]) < 0
        assert _poly_area(mid) == pytest.approx(
            math.pi * (100.5 - 36.5), rel=0.04
        )
        # outer band: rectangle minus disc -> one polygon, one hole
        (outer,) = by_band[(100.5, None)]
        assert len(_rings(outer)) == 2
        total = sum(_poly_area(w) for ws in by_band.values() for w in ws)
        assert total == pytest.approx((self.W - 1) * (self.H - 1), abs=1e-6)
