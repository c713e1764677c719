"""Distributed connected components: cross-tile transitive merge."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.polygonize import pixel_components, polygonize


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
