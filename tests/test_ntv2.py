"""NTv2 grid-shift step (geometry/ntv2.py): bilinear semantics, the
positive-west longitude sign quirk, out-of-grid passthrough, and the
dim-join engine path vs the inline-formula oracle path."""

import duckdb
import pytest

from gdal_spark.geometry import ntv2


def _oracle_shift(lat, lon):
    sql = f"SELECT {lat:.17e} AS i_lat, {lon:.17e} AS i_lon"
    for col, expr in ntv2.oracle_shift_stages("i_lat", "i_lon"):
        sql = f"SELECT *, {expr} AS {col} FROM ({sql})"
    return duckdb.connect().execute(
        f"SELECT glat, glon FROM ({sql})"
    ).fetchone()


class TestSemantics:
    def test_node_exact_at_lattice_point(self):
        # at an exact node, bilinear == the node value
        g = ntv2.UK_GRID
        gi, gj = 3, 5
        lat = g.lat0 + gi * g.dlat
        lon = g.lon0 + gj * g.dlon
        dlat_sec = ((gi * 7 + gj * 13) % 11) * 0.1 + 0.5
        dlon_sec = ((gi * 5 + gj * 3) % 13) * 0.1 - 1.2
        glat, glon = _oracle_shift(lat, lon)
        assert glat == pytest.approx(lat + dlat_sec / 3600.0, abs=1e-12)
        # positive-west: shift SUBTRACTS from east-positive longitude
        assert glon == pytest.approx(lon - dlon_sec / 3600.0, abs=1e-12)

    def test_out_of_grid_passthrough(self):
        glat, glon = _oracle_shift(10.0, 100.0)
        assert (glat, glon) == (10.0, 100.0)

    def test_midcell_is_average_of_corners(self):
        g = ntv2.UK_GRID
        lat = g.lat0 + 2.5 * g.dlat
        lon = g.lon0 + 7.5 * g.dlon

        def node(gi, gj):
            return (
                ((gi * 7 + gj * 13) % 11) * 0.1 + 0.5,
                ((gi * 5 + gj * 3) % 13) * 0.1 - 1.2,
            )

        la = sum(node(i, j)[0] for i in (2, 3) for j in (7, 8)) / 4.0
        lo = sum(node(i, j)[1] for i in (2, 3) for j in (7, 8)) / 4.0
        glat, glon = _oracle_shift(lat, lon)
        assert glat == pytest.approx(lat + la / 3600.0, abs=1e-12)
        assert glon == pytest.approx(lon - lo / 3600.0, abs=1e-12)


class TestEnginePath:
    def test_dim_join_matches_oracle(self, spark):
        docs = spark.range(200).selectExpr(
            "id AS doc_id",
            "50.0e0 + CAST(id % 90 AS DOUBLE) / 10.0e0 AS lat",
            "-7.5e0 + CAST(id % 83 AS DOUBLE) / 10.0e0 AS lon",
        )
        got = {
            r["doc_id"]: (r["glat"], r["glon"])
            for r in ntv2.apply_grid_shift(
                docs, spark, "lat", "lon"
            ).collect()
        }
        for r in docs.collect():
            glat, glon = _oracle_shift(r["lat"], r["lon"])
            assert got[r["doc_id"]][0] == pytest.approx(glat, abs=1e-12)
            assert got[r["doc_id"]][1] == pytest.approx(glon, abs=1e-12)

    def test_engine_passthrough_outside(self, spark):
        docs = spark.createDataFrame(
            [(1, 10.0, 100.0), (2, 48.0, -20.0)],
            "doc_id bigint, lat double, lon double",
        )
        rows = {
            r["doc_id"]: (r["glat"], r["glon"])
            for r in ntv2.apply_grid_shift(
                docs, spark, "lat", "lon"
            ).collect()
        }
        assert rows[1] == (10.0, 100.0)
        assert rows[2] == (48.0, -20.0)
