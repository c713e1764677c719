"""Distributed connected components: cross-tile transitive merge,
ring extraction, sieve."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.polygonize import (
    component_rings,
    pixel_components,
    polygonize,
    sieve,
)


def _grid(spark, w, h, value_expr):
    df = spark.range(w * h).select(
        (F.col("id") % w).cast("int").alias("px"),
        ((F.col("id") - (F.col("id") % w)) / w).cast("int").alias("py"),
    )
    return df.withColumn("value", F.expr(value_expr).cast("long"))


class TestCrossTileMerge:
    def test_vertical_stripes_span_tile_rows(self, spark):
        """200x200: single-pixel columns of alternating value — 200
        components, each crossing 4 tile rows (needs 3 chained merges)."""
        px = _grid(spark, 200, 200, "px % 2 + (px * 1000000)")  # unique per column
        out = polygonize(px, 200, 200).collect()
        assert len(out) == 200
        for r in out:
            assert r.n_pixels == 200
            assert r.pxmin == r.pxmax  # one column wide
            assert (r.pymin, r.pymax) == (0, 199)
            assert r.label == r.pxmin  # min pixel id = top of the column

    def test_full_constant_raster_single_component(self, spark):
        """130x130 constant value spanning a 3x3 tile grid — one
        component, label 0 (transitive closure across all 9 tiles)."""
        px = _grid(spark, 130, 130, "7")
        comp = pixel_components(px, 130, 130)
        labels = comp.select("label").distinct().collect()
        assert [r.label for r in labels] == [0]

    def test_diagonal_not_connected(self, spark):
        """Checkerboard 2x2: 4-connectivity must NOT merge diagonals."""
        px = _grid(spark, 2, 2, "(px + py) % 2")
        out = polygonize(px, 2, 2).collect()
        assert len(out) == 4  # each pixel its own component

    def test_connect8_checkerboard_two_components(self, spark):
        """CONNECTED=8: a 6x6 checkerboard collapses to one component
        per color — every same-color pair is diagonal-adjacent."""
        px = _grid(spark, 6, 6, "(px + py) % 2")
        out = polygonize(px, 6, 6, connect8=True).collect()
        assert sorted((r.value, r.n_pixels) for r in out) == [(0, 18), (1, 18)]

    def test_connect8_cross_tile_corner(self, spark):
        """Diagonal staircase crossing the (63,63)-(64,64) tile corner:
        the two halves live in different tiles and touch only at that
        corner — must merge into one component under CONNECTED=8."""
        px = _grid(spark, 70, 70, "CASE WHEN px = py THEN 1 ELSE 0 END")
        out = {r.value: r for r in polygonize(px, 70, 70, connect8=True).collect()}
        assert len(out) == 2
        diag = out[1]
        assert diag.n_pixels == 70 and diag.label == 0
        # 4-connectivity on the same input: 70 diagonal singletons
        out4 = polygonize(px, 70, 70).collect()
        assert sum(1 for r in out4 if r.value == 1) == 70


class TestRings:
    def test_l_shaped_component(self, spark):
        """10x10: value 1 on an L (columns 0-4 rows 0-9 plus rows 8-9
        full width), value 0 elsewhere — the L's exact ring."""
        expr = "CASE WHEN px < 5 OR py >= 8 THEN 1 ELSE 0 END"
        px = _grid(spark, 10, 10, expr)
        rings = {r.label: r.ring_wkt for r in component_rings(px, 10, 10).collect()}
        # L component label = gid of (0,0) = 0
        assert rings[0] == (
            "POLYGON ((0 0,5 0,5 8,10 8,10 10,0 10,0 0))"
        )
        # the notch component (x 5..9, y 0..7), label = gid of (5,0) = 5
        assert rings[5] == "POLYGON ((5 0,10 0,10 8,5 8,5 0))"

    def test_donut_component_emits_hole_ring(self, spark):
        """8x8 of value 1 with a 2x2 island of value 2 in the middle:
        outer component ring + its hole; island ring separate."""
        expr = "CASE WHEN px >= 3 AND px < 5 AND py >= 3 AND py < 5 THEN 2 ELSE 1 END"
        px = _grid(spark, 8, 8, expr)
        rings = {r.label: r.ring_wkt for r in component_rings(px, 8, 8).collect()}
        assert rings[0].startswith("POLYGON ((0 0,8 0,8 8,0 8,0 0),(")
        assert "(3 3," in rings[0]  # hole ring present
        island_label = 3 * 8 + 3
        assert rings[island_label] == "POLYGON ((3 3,5 3,5 5,3 5,3 3))"

    def test_cross_tile_ring(self, spark):
        """130-wide constant stripe spans 3 tiles — one ring, exact."""
        px = _grid(spark, 130, 3, "1")
        rings = component_rings(px, 130, 3).collect()
        assert len(rings) == 1
        assert rings[0].ring_wkt == "POLYGON ((0 0,130 0,130 3,0 3,0 0))"


class TestContour:
    def test_linear_ramp_segment_on_true_line(self, spark):
        """value = x: contour at 1.5 must be the vertical line x=1.5 —
        marching squares interpolation is exact for linear fields."""
        from gdal_spark.operators.focal import contour_segments

        px = _grid(spark, 4, 3, "px")
        segs = contour_segments(
            px.withColumn("value", F.col("value").cast("double")), 4, 3, [1.5]
        ).collect()
        assert len(segs) == 2  # two cell rows crossed
        for s in segs:
            assert s.x1 == 1.5 and s.x2 == 1.5
            assert abs(s.y2 - s.y1) == 1.0

    def test_saddle_cell_two_segments(self, spark):
        """2x2 checkerboard (0/10 diagonal) at level 5: ambiguous case
        emits two segments."""
        from gdal_spark.operators.focal import contour_segments

        px = _grid(spark, 2, 2, "CASE WHEN (px + py) % 2 = 0 THEN 10 ELSE 0 END")
        segs = contour_segments(
            px.withColumn("value", F.col("value").cast("double")), 2, 2, [5.0]
        ).collect()
        assert len(segs) == 2


class TestSieve:
    def test_small_absorbed_large_survive(self, spark):
        """20x20 of value 0 with a 2x2 island (absorbed at threshold 8)
        and a 4x4 island (survives)."""
        expr = (
            "CASE WHEN px >= 2 AND px < 4 AND py >= 2 AND py < 4 THEN 5 "
            "WHEN px >= 10 AND px < 14 AND py >= 10 AND py < 14 THEN 7 "
            "ELSE 0 END"
        )
        px = _grid(spark, 20, 20, expr)
        out = {(r.px, r.py): r.value for r in sieve(px, 20, 20, threshold=8).collect()}
        assert out[(2, 2)] == 0  # small island absorbed into surrounding
        assert out[(10, 10)] == 7  # large island survives
        assert out[(0, 0)] == 0
