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
        row = geoms.filter(F.col("gid") == 1).select(
            stf.st_centroid_x("wkt").alias("cx"), stf.st_centroid_y("wkt").alias("cy")
        ).first()
        assert (row.cx, row.cy) == (2.0, 2.0)

    def test_contains_point(self, spark, geoms):
        df = geoms.filter(F.col("gid") == 2).select(
            stf.st_contains_point("wkt", F.lit(1.0), F.lit(1.0)).alias("inside"),
            stf.st_contains_point("wkt", F.lit(3.0), F.lit(3.0)).alias("in_hole"),
        )
        row = df.first()
        assert row.inside is True and row.in_hole is False


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
