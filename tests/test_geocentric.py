"""Pure-numpy tests for the geocentric / Helmert datum-shift kernel
(geometry/geocentric.py) — no Spark session."""

import math

import numpy as np

from gdal_spark.geometry import geocentric as gc


def test_ecef_known_points():
    # lat=0, lon=0, h=0 -> (a, 0, 0)
    x, y, z = gc.geodetic_to_ecef(0.0, 0.0)
    assert abs(x - gc.WGS84_A) < 1e-6 and abs(y) < 1e-6 and abs(z) < 1e-6
    # north pole -> (0, 0, b)
    b = gc.WGS84_A * (1.0 - gc.WGS84_F)
    x, y, z = gc.geodetic_to_ecef(90.0, 0.0)
    assert abs(z - b) < 1e-6 and abs(x) < 1e-3
    # lon=90 puts the mass on +Y
    x, y, z = gc.geodetic_to_ecef(0.0, 90.0)
    assert abs(y - gc.WGS84_A) < 1e-6 and abs(x) < 1e-3


def test_bowring_inverse_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-85.0, 85.0, 200)
    lon = rng.uniform(-180.0, 180.0, 200)
    x, y, z = gc.geodetic_to_ecef(lat, lon, a=gc.AIRY_A, f=gc.AIRY_F)
    lat2, lon2, h2 = gc.ecef_to_geodetic(x, y, z)
    # Bowring single-shot at h=0: sub-nano-degree
    assert np.max(np.abs(lat2 - lat)) < 1e-9
    assert np.max(np.abs(lon2 - lon)) < 1e-12
    assert np.max(np.abs(h2)) < 1e-5


def test_helmert_shift_magnitude_london():
    # WGS84 -> OSGB36 around London is the canonical ~100 m shift,
    # mostly in longitude/easting (published guidance: 50-120 m
    # horizontal anywhere in GB).
    lat, lon, _h = gc.wgs84_to_osgb36(51.5074, -0.1278)
    dlat_m = (float(lat) - 51.5074) * 111_194.9
    dlon_m = (float(lon) - -0.1278) * 111_194.9 * math.cos(math.radians(51.5))
    dist = math.hypot(dlat_m, dlon_m)
    assert 50.0 < dist < 130.0, dist


def test_helmert_forward_inverse_consistency():
    rng = np.random.default_rng(7)
    lat = rng.uniform(49.0, 61.0, 100)  # GB-ish latitudes
    lon = rng.uniform(-8.0, 2.0, 100)
    la2, lo2, _ = gc.wgs84_to_osgb36(lat, lon)
    la3, lo3, _ = gc.osgb36_to_wgs84(la2, lo2)
    # small-angle inverse: second-order error ~ r*ds, micro-degrees
    assert np.max(np.abs(la3 - lat)) < 5e-7
    assert np.max(np.abs(lo3 - lon)) < 5e-7


def test_sql_stage_matches_numpy():
    """The SQL stage text evaluated in DuckDB equals the numpy twin at
    every stage (same formula discipline as tmerc/conic)."""
    import duckdb

    con = duckdb.connect()
    lat, lon = 51.5074, -0.1278
    s1 = ", ".join(gc.sql_ecef_stage("lat", "lon"))
    s2 = ", ".join(gc.sql_helmert_stage())
    s3 = ", ".join(gc.sql_geodetic_stage())
    sql = f"""
    WITH d AS (SELECT {lat!r}::DOUBLE AS lat, {lon!r}::DOUBLE AS lon),
    a AS (SELECT {s1} FROM d), b AS (SELECT {s2} FROM a),
    c AS (SELECT {s3} FROM b)
    SELECT olat, olon FROM c
    """
    olat, olon = con.execute(sql).fetchone()
    nlat, nlon, _ = gc.wgs84_to_osgb36(lat, lon)
    assert abs(olat - float(nlat)) < 1e-12
    assert abs(olon - float(nlon)) < 1e-12
