"""Polar stereographic (geometry/polar.py): EPSG worked example,
forward/inverse roundtrip, pole behavior."""

import numpy as np

from gdal_spark.geometry.polar import (
    ANT_POLAR,
    NSIDC_NORTH,
    ps_forward,
    ps_inverse,
)


def test_epsg_guidance_example():
    # EPSG Guidance 7-2, Polar Stereographic variant B worked example
    # (Australian Antarctic, EPSG:3032): 75S 120E
    x, y = ps_forward([-75.0], [120.0], ANT_POLAR)
    assert abs(x[0] - 7255380.79) < 0.05
    assert abs(y[0] - 7053389.56) < 0.05


def test_roundtrip_north_and_south():
    lat = np.array([61.0, 75.5, 88.2, 70.0])
    lon = np.array([-120.0, 13.0, 179.0, -45.0])
    x, y = ps_forward(lat, lon, NSIDC_NORTH)
    la, lo = ps_inverse(x, y, NSIDC_NORTH)
    assert np.abs(la - lat).max() < 1e-9
    assert np.abs(lo - lon).max() < 1e-9

    slat, slon = -lat, lon
    x, y = ps_forward(slat, slon, ANT_POLAR)
    la, lo = ps_inverse(x, y, ANT_POLAR)
    assert np.abs(la - slat).max() < 1e-9
    assert np.abs(lo - slon).max() < 1e-9


def test_standard_parallel_scale():
    """At the standard parallel the point scale factor is 1: a small
    east-west step of d degrees maps to ~ d * pi/180 * a * m(lat_ts)
    meters of arc distance."""
    import math

    from gdal_spark.geometry.conic import A_AXIS, _m

    d = 1e-4
    x1, y1 = ps_forward([70.0], [0.0], NSIDC_NORTH)
    x2, y2 = ps_forward([70.0], [d], NSIDC_NORTH)
    dist = math.hypot(x2[0] - x1[0], y2[0] - y1[0])
    want = math.radians(d) * A_AXIS * _m(math.radians(70.0))
    assert abs(dist / want - 1.0) < 1e-6
