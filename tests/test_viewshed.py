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


def _bresenham_ref(x1, y1, x2, y2):
    """Direct port of the reference balance loop (alg/los.cpp:37
    Bresenham2D): the cell sequence our closed form must reproduce."""
    cells = []
    dx, incx = (x2 - x1, 1) if x2 >= x1 else (x1 - x2, -1)
    dy, incy = (y2 - y1, 1) if y2 >= y1 else (y1 - y2, -1)
    x, y = x1, y1
    if dx >= dy:
        dy2, dx2 = dy * 2, dx * 2
        balance = dy2 - dx
        while x != x2:
            cells.append((x, y))
            if balance >= 0:
                y += incy
                balance -= dx2
            balance += dy2
            x += incx
        cells.append((x, y))
    else:
        dx2, dy2 = dx * 2, dy * 2
        balance = dx2 - dy
        while y != y2:
            cells.append((x, y))
            if balance >= 0:
                x += incx
                balance -= dy2
            balance += dx2
            y += incy
        cells.append((x, y))
    return cells


def _bresenham_closed(x1, y1, x2, y2):
    """The closed form used by los_x_sql/los_y_sql."""
    dx, dy = abs(x2 - x1), abs(y2 - y1)
    sx = 1 if x2 >= x1 else -1
    sy = 1 if y2 >= y1 else -1
    n = max(dx, dy)
    out = []
    for k in range(n + 1):
        if dx >= dy:
            x = x1 + sx * k
            y = y1 if dx == 0 else y1 + sy * int(
                np.floor((2 * dy * k + dx) / (2 * dx))
            )
        else:
            y = y1 + sy * k
            x = x1 + sx * int(np.floor((2 * dx * k + dy) / (2 * dy)))
        out.append((x, y))
    return out


class TestLineOfSight:
    def test_closed_form_matches_reference_loop(self):
        """500 random endpoint pairs: the floor closed form visits
        exactly the reference Bresenham's cells, in order."""
        rng = np.random.RandomState(7)
        for _ in range(500):
            x1, x2 = rng.randint(-40, 40, 2)
            y1, y2 = rng.randint(-40, 40, 2)
            assert _bresenham_closed(x1, y1, x2, y2) == _bresenham_ref(
                x1, y1, x2, y2
            ), (x1, y1, x2, y2)

    def test_wall_blocks_and_reports_intersection(self, spark):
        from gdal_spark.operators.viewshed import line_of_sight

        dem = _dem(
            spark, 40, 40, lambda: F.when(F.col("px") == 20, 50).otherwise(0)
        ).select("px", "py", "z")
        pairs = spark.createDataFrame(
            [
                (0, 5, 10, 3, 35, 10, 3),   # crosses the wall -> blocked at it
                (1, 5, 10, 3, 15, 10, 3),   # stops before the wall -> visible
                (2, 5, 5, 3, 5, 30, 3),     # vertical, no wall -> visible
                (3, 5, 5, 0, 12, 9, 3),     # observer AT terrain (0 > 0 false)
            ],
            "pid int, xa int, ya int, za long, xb int, yb int, zb long",
        )
        out = {r.pid: r for r in line_of_sight(dem, pairs).collect()}
        assert out[0].visible == 0 and (out[0].ix, out[0].iy) == (20, 10)
        assert out[1].visible == 1 and (out[1].ix, out[1].iy) == (-1, -1)
        assert out[2].visible == 1
        # endpoint A fails the strict test -> intersection is A itself
        assert out[3].visible == 0 and (out[3].ix, out[3].iy) == (5, 5)

    def test_sees_over_wall_with_height(self, spark):
        from gdal_spark.operators.viewshed import line_of_sight

        dem = _dem(
            spark, 40, 40, lambda: F.when(F.col("px") == 20, 50).otherwise(0)
        ).select("px", "py", "z")
        pairs = spark.createDataFrame(
            [(0, 5, 10, 120, 35, 10, 120)],
            "pid int, xa int, ya int, za long, xb int, yb int, zb long",
        )
        out = line_of_sight(dem, pairs).collect()[0]
        assert out.visible == 1
