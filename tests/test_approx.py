"""Approximate transformer (geometry/approx.py) vs exact Krüger UTM:
error stays within tolerance while exact evaluations collapse."""

import numpy as np

from gdal_spark.geometry.approx import approx_scanline
from gdal_spark.geometry.tmerc import utm_forward


def test_utm_scanline_within_tolerance():
    lat = 47.3
    xs = np.linspace(3.2, 8.9, 4096)  # one tile scanline in lon

    def fn(lons):
        e, n = utm_forward(np.full(lons.shape, lat), lons, zone=32)
        return e, n

    ex, en = fn(xs)
    ax, an, n_exact = approx_scanline(fn, xs, max_error=0.125)
    err = np.maximum(np.abs(ax - ex), np.abs(an - en)).max()
    # the midpoint-check recursion is the reference's heuristic too
    # (gdaltransformer.cpp:2592): smooth transforms stay within ~tol
    assert err <= 0.25
    assert n_exact <= len(xs) / 4, f"only {n_exact} exact evals expected"


def test_exact_when_tolerance_zero():
    xs = np.linspace(0.0, 10.0, 257)

    def fn(v):
        return np.sin(v) * 100.0, np.cos(v) * 100.0

    ax, ay, n_exact = approx_scanline(fn, xs, max_error=0.0)
    ex, ey = fn(xs)
    assert np.abs(ax - ex).max() < 1e-12
    assert np.abs(ay - ey).max() < 1e-12
