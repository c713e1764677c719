"""Conic projection kernels (pure numpy, no Spark): known-point parity
with published EPSG:2154 / EPSG:5070 coordinates, forward/inverse
roundtrip, SQL-text equivalence via DuckDB."""

import duckdb
import numpy as np

from gdal_spark.geometry import conic


class TestLambert93:
    def test_paris_known_point(self):
        # Notre-Dame: EPSG:2154 ~ (652469.02, 6862035.26)
        x, y = conic.lcc_forward(48.8566, 2.3522)
        assert abs(float(x) - 652469.02) < 0.5
        assert abs(float(y) - 6862035.26) < 0.5

    def test_roundtrip_grid(self):
        lat = np.linspace(41.0, 51.0, 40)
        lon = np.linspace(-5.0, 9.0, 40)
        la, lo = np.meshgrid(lat, lon)
        x, y = conic.lcc_forward(la, lo)
        la2, lo2 = conic.lcc_inverse(x, y)
        assert np.abs(la2 - la).max() < 1e-9
        assert np.abs(lo2 - lo).max() < 1e-9


class TestAlbersConus:
    def test_known_point(self):
        # EPSG:5070 for (40N, 100W): x ~ -338391, y ~ 1894100
        x, y = conic.albers_forward(40.0, -100.0)
        assert abs(float(x) + 338390.59) < 1.0
        assert abs(float(y) - 1894100.14) < 1.0

    def test_roundtrip_grid(self):
        lat = np.linspace(25.0, 49.0, 40)
        lon = np.linspace(-125.0, -66.0, 40)
        la, lo = np.meshgrid(lat, lon)
        x, y = conic.albers_forward(la, lo)
        la2, lo2 = conic.albers_inverse(x, y)
        assert np.abs(la2 - la).max() < 1e-9
        assert np.abs(lo2 - lo).max() < 1e-9

    def test_equal_area_property(self):
        # a 1x1-degree quad keeps its ellipsoidal area under Albers:
        # compare projected shoelace area against the authalic formula
        lats = (30.0, 31.0)
        lons = (-100.0, -99.0)
        ring_lat = [lats[0], lats[0], lats[1], lats[1]]
        ring_lon = [lons[0], lons[1], lons[1], lons[0]]
        # densify edges so the projected polygon tracks the graticule
        dense_lat, dense_lon = [], []
        for i in range(4):
            a_lat, a_lon = ring_lat[i], ring_lon[i]
            b_lat, b_lon = ring_lat[(i + 1) % 4], ring_lon[(i + 1) % 4]
            for t in np.linspace(0.0, 1.0, 50, endpoint=False):
                dense_lat.append(a_lat + t * (b_lat - a_lat))
                dense_lon.append(a_lon + t * (b_lon - a_lon))
        x, y = conic.albers_forward(np.array(dense_lat), np.array(dense_lon))
        proj_area = 0.5 * abs(
            np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        )
        # authalic area of the quad (Snyder q): a^2/2 * dlam * (q2-q1)
        import math

        q1 = conic._q(math.radians(lats[0]))
        q2 = conic._q(math.radians(lats[1]))
        true_area = (
            conic.A_AXIS**2 / 2.0 * math.radians(1.0) * (q2 - q1)
        )
        assert abs(proj_area / true_area - 1.0) < 1e-6


class TestSqlParity:
    def test_sql_text_matches_numpy(self):
        pts = [(48.8566, 2.3522), (-33.9, 18.4), (40.0, -100.0), (59.9, 10.7)]
        for lat, lon in pts:
            e = conic.sql_lcc_easting(f"{lat!r}", f"{lon!r}")
            n = conic.sql_lcc_northing(f"{lat!r}", f"{lon!r}")
            ae = conic.sql_albers_easting(f"{lat!r}", f"{lon!r}")
            an = conic.sql_albers_northing(f"{lat!r}", f"{lon!r}")
            r = duckdb.sql(f"SELECT {e}, {n}, {ae}, {an}").fetchone()
            x, y = conic.lcc_forward(lat, lon)
            x2, y2 = conic.albers_forward(lat, lon)
            for got, want in zip(r, (x, y, x2, y2)):
                assert abs(got - float(want)) < 1e-6 * max(1.0, abs(float(want)))
