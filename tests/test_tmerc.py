"""Transverse Mercator (UTM) series — identity and independence checks
(no Spark; the Spark/DuckDB parity is covered by the utm_transform
driver-contract query)."""

import numpy as np
import pytest

from gdal_spark.geometry import tmerc


class TestForward:
    def test_central_meridian_equator(self):
        e, n = tmerc.utm_forward(0.0, tmerc.utm_zone_lon0(31), 31)
        assert float(e) == pytest.approx(500000.0, abs=1e-9)
        assert float(n) == pytest.approx(0.0, abs=1e-9)

    def test_meridian_arc_against_numerical_integration(self):
        """N on the central meridian = k0 * meridian arc length — checked
        against an INDEPENDENT high-resolution numerical integral."""
        _, n45 = tmerc.utm_forward(45.0, tmerc.utm_zone_lon0(31), 31)
        phi = np.linspace(0, np.pi / 4, 2_000_001)
        a, e2 = tmerc.A_AXIS, tmerc._E2
        arc = np.trapz(a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5, phi)
        assert float(n45) == pytest.approx(tmerc.K0 * arc, abs=1e-6)

    def test_scale_factor_at_central_meridian(self):
        e1, _ = tmerc.utm_forward(0.0, tmerc.utm_zone_lon0(31) + 1e-4, 31)
        scale = (float(e1) - 500000.0) / (1e-4 * np.pi / 180 * tmerc.A_AXIS)
        assert scale == pytest.approx(tmerc.K0, abs=1e-8)

    def test_south_false_northing(self):
        _, n = tmerc.utm_forward(-10.0, tmerc.utm_zone_lon0(33), 33, south=True)
        _, n_north = tmerc.utm_forward(-10.0, tmerc.utm_zone_lon0(33), 33)
        assert float(n) == pytest.approx(float(n_north) + 1e7)
        assert float(n) > 0


class TestRoundTrip:
    def test_inverse_recovers_forward(self):
        rng = np.random.default_rng(0)
        lat = rng.uniform(-80, 84, 500)
        lon = tmerc.utm_zone_lon0(18) + rng.uniform(-3, 3, 500)
        E, N = tmerc.utm_forward(lat, lon, 18)
        lat2, lon2 = tmerc.utm_inverse(E, N, 18)
        assert np.abs(lat2 - lat).max() < 1e-11
        assert np.abs(lon2 - lon).max() < 1e-11


class TestSqlParity:
    def test_duckdb_matches_numpy(self):
        import duckdb

        sqlE = tmerc.sql_utm_easting("lat", "lon", 31)
        sqlN = tmerc.sql_utm_northing("lat", "lon", 31)
        rows = duckdb.connect().execute(
            f"""
            WITH p AS (SELECT -80 + i * 1.64e0 AS lat,
                              1.0e0 + (i % 50) * 1.0e-1 AS lon
                       FROM range(0, 100) t(i))
            SELECT lat, lon, {sqlE} AS E, {sqlN} AS N FROM p
            """
        ).fetchall()
        lat = np.array([r[0] for r in rows])
        lon = np.array([r[1] for r in rows])
        E, N = tmerc.utm_forward(lat, lon, 31)
        assert np.abs(E - [r[2] for r in rows]).max() < 1e-6
        assert np.abs(N - [r[3] for r in rows]).max() < 1e-6

    def test_duckdb_inverse_stages_match_numpy(self):
        import duckdb

        sql = "SELECT 2.0e5 + i * 1.234e4 AS E, 4.0e6 + i * 5.1e4 AS N FROM range(0, 49) t(i)"
        for name, expr in tmerc.sql_utm_inverse_stages("E", "N", "1.5e1"):
            sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
        rows = duckdb.connect().execute(
            f"SELECT E, N, u_lat, u_lon FROM ({sql})"
        ).fetchall()
        E = np.array([r[0] for r in rows])
        N = np.array([r[1] for r in rows])
        lat, lon = tmerc.utm_inverse(E, N, 33)
        assert np.abs(lat - [r[2] for r in rows]).max() < 1e-11
        assert np.abs(lon - [r[3] for r in rows]).max() < 1e-11
