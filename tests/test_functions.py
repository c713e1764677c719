"""ST_* scalar surface: column helpers + SQL registration."""

import pytest
from pyspark.sql import functions as F

from gdal_spark import functions as stf


@pytest.fixture(scope="module")
def geoms(spark):
    return spark.createDataFrame(
        [
            (1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
            (2, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
            (3, "POINT (7 7)"),
        ],
        "gid long, wkt string",
    )


class TestColumnHelpers:
    def test_area_with_hole(self, geoms):
        out = {r.gid: r.a for r in geoms.select("gid", stf.st_area("wkt").alias("a")).collect()}
        assert out[1] == 16.0
        assert out[2] == 96.0  # 100 - 4 hole
        assert out[3] == 0.0

    def test_centroid(self, geoms):
        out = {
            r.gid: (r.cx, r.cy)
            for r in geoms.select(
                "gid",
                stf.st_centroid_x("wkt").alias("cx"),
                stf.st_centroid_y("wkt").alias("cy"),
            ).collect()
        }
        assert out[1] == (2.0, 2.0)
        # holes subtract mass: (500-12)/(100-4) per axis
        assert out[2] == (488.0 / 96.0, 488.0 / 96.0)
        assert out[3] == (7.0, 7.0)

    def test_contains_point(self, spark, geoms):
        df = geoms.filter(F.col("gid") == 2).select(
            stf.st_contains_point("wkt", F.lit(1.0), F.lit(1.0)).alias("inside"),
            stf.st_contains_point("wkt", F.lit(3.0), F.lit(3.0)).alias("in_hole"),
        )
        row = df.first()
        assert row.inside is True and row.in_hole is False


class TestPredicates:
    def test_matrix(self, spark):
        big = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        inner = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
        overlap = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
        touch = "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"
        far = "POLYGON ((100 100, 101 100, 101 101, 100 101, 100 100))"
        df = spark.createDataFrame(
            [(big, inner), (big, overlap), (big, touch), (big, far), (big, big)],
            "a string, b string",
        )
        rows = df.select(
            stf.st_contains("a", "b").alias("c"),
            stf.st_within("b", "a").alias("w"),
            stf.st_overlaps("a", "b").alias("o"),
            stf.st_touches("a", "b").alias("t"),
            stf.st_intersects("a", "b").alias("i"),
            stf.st_equals("a", "b").alias("e"),
            stf.st_disjoint("a", "b").alias("d"),
        ).collect()
        inner_r, overlap_r, touch_r, far_r, self_r = rows
        assert (inner_r.c, inner_r.w, inner_r.o, inner_r.i) == (True, True, False, True)
        assert (overlap_r.c, overlap_r.o, overlap_r.t, overlap_r.i) == (
            False, True, False, True,
        )
        assert (touch_r.t, touch_r.o, touch_r.i, touch_r.d) == (True, False, True, False)
        assert (far_r.i, far_r.d) == (False, True)
        assert (self_r.e, self_r.c) == (True, True)

    def test_distance(self, spark):
        df = spark.createDataFrame(
            [
                ("POINT (0 0)", "POINT (3 4)"),
                ("POINT (5 5)", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
                ("POINT (2 2)", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
                (
                    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
                    "POLYGON ((4 0, 5 0, 5 1, 4 1, 4 0))",
                ),
            ],
            "a string, b string",
        )
        got = [r.d for r in df.select(stf.st_distance("a", "b").alias("d")).collect()]
        assert got[0] == pytest.approx(5.0)
        assert got[1] == pytest.approx((2 * 1.0**2) ** 0.5)  # corner (4,4) -> (5,5)
        assert got[2] == 0.0  # inside
        assert got[3] == pytest.approx(3.0)


class TestConstructors:
    def test_convexhull_closes_notch(self, spark):
        c = "POLYGON ((0 0, 10 0, 10 2, 4 2, 4 8, 10 8, 10 10, 0 10, 0 0))"
        df = spark.createDataFrame([(c,)], "wkt string")
        a = df.select(stf.st_area(stf.st_convexhull("wkt")).alias("a")).first().a
        assert a == pytest.approx(100.0)  # hull of the C = full square

    def test_simplify_drops_collinear(self, spark):
        w = "POLYGON ((0 0, 5 0, 10 0, 10 10, 0 10, 0 0))"
        df = spark.createDataFrame([(w,)], "wkt string")
        s = df.select(stf.st_simplify("wkt", 0.1).alias("s")).first().s
        assert "5 0" not in s  # collinear midpoint removed
        assert df.select(stf.st_area(stf.st_simplify("wkt", 0.1)).alias("a")).first().a == 100.0

    def test_makevalid_orients_and_dedupes(self, spark):
        w = "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
        df = spark.createDataFrame([(w,)], "wkt string")
        v = df.select(stf.st_makevalid("wkt").alias("v")).first().v
        from gdal_spark.geometry.clip import shoelace_area
        from gdal_spark.geometry.wkt import parse_wkt

        _, rings = parse_wkt(v)
        assert shoelace_area(rings[0]) > 0  # shell CCW
        assert shoelace_area(rings[1]) < 0  # hole CW
        assert len(rings[0]) == 5  # duplicate vertex dropped

    def test_buffer_point_and_convex(self, spark):
        import numpy as np

        df = spark.createDataFrame(
            [("POINT (0 0)",), ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",)],
            "wkt string",
        )
        areas = [
            r.a for r in df.select(stf.st_area(stf.st_buffer("wkt", 1.0)).alias("a")).collect()
        ]
        # 32-gon area = 0.5 * n * r^2 * sin(2pi/n)
        assert areas[0] == pytest.approx(0.5 * 32 * np.sin(2 * np.pi / 32), rel=1e-9)
        # convex polygon buffer ~ area + perimeter*r + chorded circle
        assert areas[1] == pytest.approx(16 + 16 * 1.0 + areas[0], rel=1e-9)

    def test_boundary(self, spark):
        df = spark.createDataFrame([("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",)], "wkt string")
        b = df.select(stf.st_boundary("wkt").alias("b")).first().b
        assert b.startswith("LINESTRING")


class TestSqlRegistration:
    def test_sql_callable(self, spark, geoms):
        stf.register_sql_functions(spark)
        geoms.createOrReplaceTempView("g")
        rows = spark.sql(
            "SELECT gid, st_area(wkt) AS a, st_envelope(wkt) AS env FROM g ORDER BY gid"
        ).collect()
        assert rows[0].a == 16.0
        assert rows[0].env.startswith("POLYGON")
        got = spark.sql(
            "SELECT st_intersects_bbox('POLYGON ((0 0,2 0,2 2,0 2,0 0))',"
            " 'POLYGON ((1 1,3 1,3 3,1 3,1 1))') AS x"
        ).first()
        assert got.x is True
