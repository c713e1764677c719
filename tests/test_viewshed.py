"""Viewshed semantics: flat terrain sees everything, a wall casts a
shadow, observer mast height matters.  Exactness vs DuckDB is covered by
the auto contract test (registry 'viewshed')."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.viewshed import viewshed


def _dem(spark, w, h, zfn):
    df = spark.range(w * h).select(
        (F.col("id") % w).cast("int").alias("px"),
        ((F.col("id") - (F.col("id") % w)) / w).cast("int").alias("py"),
    )
    return df.withColumn("z", zfn())


class TestViewshed:
    def test_flat_everything_visible(self, spark):
        dem = _dem(spark, 60, 60, lambda: F.lit(5))
        out = viewshed(dem, 30, 30, obs_z=6, max_dist=20).toPandas()
        assert (out.visible == 1).all()
        # disc membership: all pixels within radius, none beyond
        d2 = (out.px - 30) ** 2 + (out.py - 30) ** 2
        assert (d2 <= 400).all() and len(out) == int(
            sum(
                1
                for x in range(60)
                for y in range(60)
                if (x - 30) ** 2 + (y - 30) ** 2 <= 400
            )
        )

    def test_wall_shadow(self, spark):
        # flat 0 terrain, observer z=1 at (30,30); wall z=10 at px=35
        dem = _dem(
            spark,
            60,
            60,
            lambda: F.when(F.col("px") == 35, 10).otherwise(0),
        )
        out = viewshed(dem, 30, 30, obs_z=1, max_dist=20).toPandas()
        vis = {(r.px, r.py): r.visible for r in out.itertuples()}
        # straight east behind the wall: blocked
        assert vis[(36, 30)] == 0 and vis[(45, 30)] == 0
        # the wall pixel itself: first thing the ray hits, visible
        assert vis[(35, 30)] == 1
        # west/north/south unaffected
        assert vis[(20, 30)] == 1 and vis[(30, 15)] == 1

    def test_high_mast_sees_over(self, spark):
        dem = _dem(
            spark,
            60,
            60,
            lambda: F.when(F.col("px") == 35, 10).otherwise(0),
        )
        out = viewshed(dem, 30, 30, obs_z=100, max_dist=20).toPandas()
        vis = {(r.px, r.py): r.visible for r in out.itertuples()}
        # from high above, the wall no longer shadows the far ground
        assert vis[(45, 30)] == 1

    def test_pinned_visible_count(self, spark):
        # regression pin on the registry fixture (matches the oracle run)
        from gdal_spark.registry import QUERIES

        out = QUERIES["viewshed"](spark, "unused").agg(
            F.sum("visible").alias("s"), F.count("*").alias("n")
        ).first()
        assert (out.n, out.s) == (20081, 720)
