"""EPSG dispatch (geometry/epsg.py): known-answer points, pipeline
composition, and the SQL/numpy twin agreement."""

import duckdb
import numpy as np
import pytest

from gdal_spark.geometry import epsg, geocentric, tmerc


def _run_sql(src, dst, x, y):
    sql = f"SELECT {x:.17e} AS x, {y:.17e} AS y"
    for col, expr in epsg.sql_transform_stages(src, dst):
        sql = f"SELECT *, {expr} AS {col} FROM ({sql})"
    return duckdb.connect().execute(f"SELECT ox, oy FROM ({sql})").fetchone()


class TestKnownPoints:
    def test_osgb_worked_example(self):
        """OS's published worked example (A guide to coordinate systems
        in Great Britain, annexe C): OSGB36 geographic
        52°39'27.2531"N 1°43'4.5177"E -> E 651409.903 N 313177.270."""
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        e, n = tmerc.tm_forward(lat, lon, epsg.OSGB_GRID)
        assert abs(e - 651409.903) < 1e-3
        assert abs(n - 313177.270) < 1e-3

    def test_27700_to_4326_datum_shifted(self):
        """30 St Mary Axe, London: E 533190 N 181340 is at ~51.5153°N,
        0.0819°W in WGS84 — the ~100 m OSGB36 datum shift must be
        applied (without it the longitude error alone is ~5e-3 deg)."""
        lon, lat = epsg.transform([533190.0], [181340.0], 27700, 4326)
        assert abs(lat[0] - 51.51529) < 2e-4
        assert abs(lon[0] - (-0.08191)) < 2e-4
        # and it's NOT the no-datum-shift answer
        la_raw, lo_raw = tmerc.tm_inverse(533190.0, 181340.0, epsg.OSGB_GRID)
        assert abs(la_raw - lat[0]) > 1e-4  # shift is visible

    def test_utm_zone_dispatch(self):
        e, n = epsg.transform([2.3522], [48.8566], 4326, 32631)
        assert abs(e[0] - 452482.53) < 0.5 and abs(n[0] - 5411717.18) < 0.5
        # south zone gets the 10^7 false northing
        es, ns = epsg.transform([151.2093], [-33.8688], 4326, 32756)
        assert 10000000 > ns[0] > 6000000 and ns[0] > 0

    def test_unknown_code_raises(self):
        with pytest.raises(KeyError):
            epsg.lookup(99999)

    def test_every_kind_inverts(self):
        """Round-3b: every registered kind has an inverse SQL chain, so
        arbitrary projected->projected pairs compose."""
        for src, dst in [(2154, 4326), (5070, 3857), (3413, 27700), (3031, 32631)]:
            stages = epsg.sql_transform_stages(src, dst)
            assert stages[-1][0] == "oy"


class TestSqlNumpyTwin:
    @pytest.mark.parametrize(
        "src,dst,x,y",
        [
            (4326, 32631, 2.3522, 48.8566),
            (4326, 2154, 2.3522, 48.8566),
            (4326, 5070, -96.0, 37.0),
            (4326, 3413, -45.0, 75.0),
            (4326, 3031, 70.0, -75.0),
            (4326, 3857, 2.3522, 48.8566),
            (27700, 4326, 533190.0, 181340.0),
            (27700, 32630, 533190.0, 181340.0),
            (3857, 4326, 261845.7, 6250564.3),
            (4277, 4326, -0.08, 51.51),
            # round-3b inverse kinds
            (2154, 4326, 652469.0, 6862035.3),
            (2154, 27700, 652469.0, 6862035.3),
            (5070, 4326, 100000.0, 1550756.2),
            (5070, 3857, 100000.0, 1550756.2),
            (3413, 4326, 300000.0, -1633879.5),
            (3031, 32731, 70000.0, 2000000.0),
        ],
    )
    def test_sql_matches_numpy(self, src, dst, x, y):
        ox, oy = _run_sql(src, dst, x, y)
        nx, ny = epsg.transform([x], [y], src, dst)
        scale = max(abs(ox), abs(oy), 1.0)
        assert abs(ox - nx[0]) < 1e-8 * scale
        assert abs(oy - ny[0]) < 1e-8 * scale


class TestRoundtrip:
    def test_27700_roundtrip_through_wgs84(self):
        """27700 -> 4326 -> 27700 closes to ~mm: the small-angle Helmert
        inverse (negated parameters) carries second-order r*ds terms of
        a few mm — the documented divergence in geometry/geocentric.py."""
        e0, n0 = np.array([533190.0, 400000.0]), np.array([181340.0, 100000.0])
        lon, lat = epsg.transform(e0, n0, 27700, 4326)
        # forward again: 4326 -> 27700
        e1, n1 = epsg.transform(lon, lat, 4326, 27700)
        assert np.max(np.abs(e1 - e0)) < 1e-2
        assert np.max(np.abs(n1 - n0)) < 1e-2

    def test_lat0_offset_identity(self):
        """N(lat0, lon0) == fn exactly (the m0 fold): the grid origin of
        27700 maps to (400000, -100000)."""
        e, n = tmerc.tm_forward(49.0, -2.0, epsg.OSGB_GRID)
        assert abs(e - 400000.0) < 1e-9
        assert abs(n - (-100000.0)) < 1e-9

    def test_helmert_matches_module_kernel(self):
        """epsg.transform's datum step == geocentric.osgb36_to_wgs84."""
        lat, lon, _ = geocentric.osgb36_to_wgs84(51.5, -0.1)
        lo2, la2 = epsg.transform(
            *reversed(list(epsg.transform([-0.1], [51.5], 4326, 4326))), 4326, 4326
        )  # identity sanity
        lon2, lat2 = epsg.transform([-0.1], [51.5], 4277, 4326)
        assert abs(lat2[0] - float(lat)) < 1e-12
        assert abs(lon2[0] - float(lon)) < 1e-12


class TestRound5Registry:
    def test_laea_epsg_worked_example(self):
        """EPSG Guidance Note 7-2 method 9820 worked example
        (ETRS89 / LAEA Europe, EPSG:3035): 50°N 5°E ->
        E 3962799.45 N 2999718.85."""
        from gdal_spark.geometry.laea import laea_forward, laea_inverse

        e, n = laea_forward(50.0, 5.0)
        assert abs(float(e) - 3962799.45) < 2e-2  # GRS80 vs WGS84 < 1mm
        assert abs(float(n) - 2999718.85) < 2e-2
        lat, lon = laea_inverse(e, n)
        assert abs(float(lat) - 50.0) < 1e-9
        assert abs(float(lon) - 5.0) < 1e-9

    @pytest.mark.parametrize(
        "code,lon,lat",
        [
            (3035, 14.0, 47.0),
            (3034, 14.0, 47.0),
            (3416, 14.5, 47.5),
            (32118, -73.8, 40.8),
            (26985, -76.7, 39.0),
            (32130, -71.4, 41.7),
            (26918, -74.2, 41.5),
            (3785, 14.0, 47.0),
            (900913, 14.0, 47.0),
        ],
    )
    def test_new_codes_sql_matches_numpy(self, code, lon, lat):
        """Every round-5 code: SQL stage chain == numpy twin, both
        directions, on an in-domain point."""
        e, n = epsg.transform([lon], [lat], 4326, code)
        se, sn = _run_sql(4326, code, lon, lat)
        assert abs(se - float(e[0])) < 1e-6
        assert abs(sn - float(n[0])) < 1e-6
        lo2, la2 = epsg.transform(e, n, code, 4326)
        assert abs(float(lo2[0]) - lon) < 1e-8
        assert abs(float(la2[0]) - lat) < 1e-8
        so, sa = _run_sql(code, 4326, float(e[0]), float(n[0]))
        assert abs(so - lon) < 1e-8
        assert abs(sa - lat) < 1e-8

    def test_webmerc_aliases_identical(self):
        e1, n1 = epsg.transform([31.0], [41.0], 4326, 3857)
        for alias in (3785, 900913):
            e2, n2 = epsg.transform([31.0], [41.0], 4326, alias)
            assert float(e1[0]) == float(e2[0])
            assert float(n1[0]) == float(n2[0])

    def test_registry_breadth(self):
        """>= 12 fixed codes, covering every kernel family."""
        kinds = {c.kind for c in epsg._FIXED.values()}
        assert kinds == {
            "geographic", "tmerc", "webmerc", "lcc", "albers", "ps",
            "laea",
        }
        assert len(epsg._FIXED) >= 12
