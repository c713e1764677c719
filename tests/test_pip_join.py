"""PIP join correctness: DuckDB oracle on rect zones, hand goldens on
hole/concave/multipolygon zones, span-sequence invariant, strategy parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gdal_spark import corpus, zones
from gdal_spark.operators.pip_join import pip_join, zone_cell_index


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return corpus.load_docs(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def rect_zones_df(spark):
    return zones.rect_zones(spark).cache()


def oracle_pairs(sf_dir):
    con = duckdb.connect()
    sql = f"""
    WITH docs AS ({corpus.duckdb_docs_cte(f"read_parquet('{sf_dir}/documents.parquet')")}),
         zones AS ({zones.duckdb_zones_cte()})
    SELECT d.doc_id, z.zone_id
    FROM docs d JOIN zones z
      ON d.lon > z.zxmin AND d.lon < z.zxmax
     AND d.lat > z.zymin AND d.lat < z.zymax
    """
    return sorted(con.execute(sql).fetchall())


class TestPipJoinOracle:
    def test_matches_duckdb(self, spark, sf_dir, docs, rect_zones_df):
        out = pip_join(docs, rect_zones_df.drop("zxmin", "zymin", "zxmax", "zymax"))
        got = sorted(
            (r.doc_id, r.zone_id) for r in out.select("doc_id", "zone_id").collect()
        )
        expect = oracle_pairs(sf_dir)
        assert len(expect) > 0, "oracle produced no pairs — fixture broken"
        assert got == expect

    def test_shuffle_strategy_same_result(self, spark, docs, rect_zones_df):
        z = rect_zones_df.drop("zxmin", "zymin", "zxmax", "zymax")
        b = sorted(
            (r.doc_id, r.zone_id)
            for r in pip_join(docs, z, strategy="broadcast")
            .select("doc_id", "zone_id")
            .collect()
        )
        s = sorted(
            (r.doc_id, r.zone_id)
            for r in pip_join(docs, z, strategy="shuffle", salt=4)
            .select("doc_id", "zone_id")
            .collect()
        )
        assert b == s

    def test_shuffle_with_method_layer_beyond_broadcast(self, spark, docs):
        """Method layer larger than autoBroadcastJoinThreshold: the
        shuffle strategy must work with zone geometries read off the
        candidate rows — no driver-side materialization of the layer.
        20k zones (~4 MB of WKT after cell explode) > the 1 MB threshold
        set for this test."""
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1024 * 1024))
        try:
            big = zones.rect_zones(spark, n=20000).drop(
                "zxmin", "zymin", "zxmax", "zymax"
            )
            out = pip_join(docs, big, strategy="shuffle", salt=4)
            n = out.count()
            assert n > 0
            # zone ids 158..158+19999; the first-100 subset must agree with
            # the broadcast run over the same subset layer
            sub = zones.rect_zones(spark, n=100).drop(
                "zxmin", "zymin", "zxmax", "zymax"
            )
            b = pip_join(docs, sub).count()
            s = (
                out.filter(F.col("zone_id") < 158 + 100).count()
            )
            # the first-100 zones are identical in both layers -> exact
            assert s == b
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_output_schema_is_left_plus_right(self, docs, rect_zones_df):
        z = rect_zones_df.drop("zxmin", "zymin", "zxmax", "zymax")
        out = pip_join(docs, z)
        cols = set(out.columns)
        # point fields ⊕ zone fields (ogrlayer.cpp:3550-3560)
        assert {"doc_id", "spans", "lon", "lat", "zone_id", "area", "prfedea"} <= cols
        assert "cell_tx" not in cols and "env_xmin" not in cols

    def test_span_sequence_invariant(self, docs, rect_zones_df):
        z = rect_zones_df.drop("zxmin", "zymin", "zxmax", "zymax")
        out = pip_join(docs, z)
        joined = out.alias("o").join(
            docs.alias("d"), F.col("o.doc_id") == F.col("d.doc_id")
        )
        mismatches = joined.filter(F.col("o.spans") != F.col("d.spans")).count()
        assert mismatches == 0


class TestPipJoinGoldens:
    def test_fancy_polygons(self, spark):
        pts = spark.createDataFrame(
            [
                # (doc_id, lon, lat, expected zone ids)
                (1, 5.0, 5.0),     # donut body -> 9001
                (2, 10.0, 10.0),   # donut hole -> none
                (3, 32.0, 10.0),   # C spine -> 9002
                (4, 40.0, 10.0),   # C notch -> none
                (5, -35.0, -15.0), # left square -> 9003
                (6, -25.0, -15.0), # right square -> 9004
                (7, 61.0, 1.0),    # first part of multipolygon -> 9005
                (8, 71.0, 1.0),    # second part -> 9005
                (9, 65.0, 1.0),    # between parts -> none
            ],
            "doc_id long, lon double, lat double",
        )
        out = pip_join(pts, zones.fancy_zones(spark))
        got = sorted((r.doc_id, r.zone_id) for r in out.select("doc_id", "zone_id").collect())
        assert got == [(1, 9001), (3, 9002), (5, 9003), (6, 9004), (7, 9005), (8, 9005)]

    def test_cell_index_covers_envelope(self, spark):
        z = zones.fancy_zones(spark)
        cells = zone_cell_index(z, zoom=4)
        rows = cells.collect()
        assert len(rows) >= z.count()  # at least one cell per zone
        for r in rows:
            assert r.env_xmax >= r.env_xmin and r.env_ymax >= r.env_ymin


class TestRectFastPath:
    """rect_fast mirrors m_bFilterIsEnvelope (ogrlayer.cpp:2171,2287):
    rectangle zones skip the Python ray-cast.  The fast branch must be
    BIT-IDENTICAL to the ray-cast, including points exactly on edges and
    corners (half-open: left/bottom in, right/top out)."""

    def _mixed_layer(self, spark):
        rows = [
            (1, "POLYGON ((10 10, 20 10, 20 18, 10 18, 10 10))"),  # rect
            (2, "POLYGON ((30 10, 40 10, 40 20, 34 20, 34 14, 30 14, 30 10))"),  # L
            (3, "POLYGON ((12 11, 18 11, 18 17, 12 17, 12 11))"),  # rect overlap
        ]
        return spark.createDataFrame(rows, "zone_id long, geom_wkt string")

    def _boundary_points(self, spark):
        pts = [
            (0, 15.0, 14.0),   # interior of 1 and 3
            (1, 10.0, 10.0),   # corner (xmin,ymin) of 1 — IN (half-open)
            (2, 20.0, 18.0),   # corner (xmax,ymax) of 1 — OUT
            (3, 10.0, 14.0),   # left edge of 1 — IN
            (4, 20.0, 14.0),   # right edge of 1 — OUT
            (5, 15.0, 10.0),   # bottom edge of 1 — IN
            (6, 15.0, 18.0),   # top edge of 1 — OUT
            (7, 31.0, 12.0),   # inside L
            (8, 31.0, 17.0),   # in L's notch (envelope yes), outside L
            (9, 18.0, 11.0),   # corner (xmax,ymin) of 3 — OUT for 3, in 1
        ]
        return spark.createDataFrame(pts, "doc_id long, lon double, lat double")

    def _pairs(self, df):
        return sorted((r.doc_id, r.zone_id) for r in df.select("doc_id", "zone_id").collect())

    def test_bit_parity_with_raycast_on_boundary_points(self, spark):
        z = self._mixed_layer(spark)
        p = self._boundary_points(spark)
        fast = self._pairs(pip_join(p, z, rect_fast=True))
        slow = self._pairs(pip_join(p, z, rect_fast=False))
        assert fast == slow
        # spot-check the half-open semantics derived from the ray-cast
        assert (1, 1) in fast and (3, 1) in fast and (5, 1) in fast
        assert (2, 1) not in fast and (4, 1) not in fast and (6, 1) not in fast
        assert (7, 2) in fast and (8, 2) not in fast
        assert (9, 1) in fast and (9, 3) not in fast

    def test_bit_parity_shuffle_strategy(self, spark):
        z = self._mixed_layer(spark)
        p = self._boundary_points(spark)
        fast = self._pairs(pip_join(p, z, strategy="shuffle", salt=4, rect_fast=True))
        slow = self._pairs(pip_join(p, z, strategy="shuffle", salt=4, rect_fast=False))
        assert fast == slow

    def test_all_rect_layer_matches_oracle(self, spark, sf_dir, docs, rect_zones_df):
        out = pip_join(
            docs, rect_zones_df.drop("zxmin", "zymin", "zxmax", "zymax"), rect_fast=True
        )
        got = sorted(
            (r.doc_id, r.zone_id) for r in out.select("doc_id", "zone_id").collect()
        )
        assert got == oracle_pairs(sf_dir)

    def test_is_rectangle_detector(self, spark):
        from gdal_spark.geometry.envelope import wkt_is_rectangle

        assert wkt_is_rectangle("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
        assert wkt_is_rectangle("POLYGON ((0 0, 0 2, 4 2, 4 0, 0 0))")  # y-first
        assert not wkt_is_rectangle("POLYGON ((0 0, 4 0, 4 2, 1 3, 0 0))")
        assert not wkt_is_rectangle(
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
        )  # hole
        assert not wkt_is_rectangle("POLYGON ((0 0, 4 0, 4 2, 2 2, 0 2, 0 0))")  # 6 pts


class TestSkewSalting:
    def test_hot_cell_spreads_across_reducers(self, spark):
        """North-rule skew evidence: with EVERY point in one cell, the
        salted shuffle strategy must spread the hot cell's join rows
        across multiple reducers (AQE coalescing disabled so reducer
        identity is observable)."""
        import pandas as pd

        from gdal_spark.operators.pip_join import pip_join

        n = 20000
        docs = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": range(n), "lon": [10.001] * n, "lat": [20.001] * n}
            )
        )
        zone = spark.createDataFrame(
            [(1, "POLYGON ((9 19, 11 19, 11 21, 9 21, 9 19))")],
            "zone_id long, geom_wkt string",
        )
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        try:
            # the salted SHUFFLE path is the huge-method-layer plan; at
            # test scale Catalyst would auto-broadcast the zone side and
            # never shuffle, so force the shuffle join to observe it
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            out = pip_join(docs, zone, strategy="shuffle", salt=8)
            parts = (
                out.select(F.spark_partition_id().alias("p"))
                .groupBy("p")
                .count()
                .collect()
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        total = sum(r["count"] for r in parts)
        assert total == n
        # one cell, 8 salts, 8 shuffle partitions: no reducer may own
        # the whole cell, and the spread must engage several reducers
        assert len(parts) >= 4, parts
        assert max(r["count"] for r in parts) < 0.5 * total, parts
