"""GCP transformers: polynomial least-squares (gdal_crs.cpp) and thin
plate spline (gdal_tps.cpp).  The registry oracles pin the affine /
integer-polynomial cases; these tests pin the properties the oracles
can't express: interpolation through NON-affine GCPs and order-1 fits.
"""

import numpy as np
import pytest

from gdal_spark.operators.gcp import gcp_transform, tps_transform

# non-affine target: a quadratic bump no affine map can reproduce
_GCPS = [
    (p, ln, 10.0 + 2.0 * p + 3.0 * ln + 0.01 * p * ln, -5.0 + p - 2.0 * ln + 0.02 * p * p)
    for p in (0.0, 100.0, 200.0, 300.0, 399.0)
    for ln in (0.0, 50.0, 100.0, 150.0, 199.0)
]


def _gcp_df(spark):
    return spark.createDataFrame(_GCPS, "pixel double, line double, x double, y double")


def test_tps_interpolates_through_nonaffine_gcps(spark):
    """TPS is an interpolator: at every GCP the spline must return the
    GCP's target exactly (to solver precision)."""
    pts = spark.createDataFrame(
        [(p, ln) for p, ln, _, _ in _GCPS], "px double, py double"
    )
    out = tps_transform(pts, _gcp_df(spark), pixel_col="px", line_col="py")
    rows = {(r.px, r.py): (r.gx, r.gy) for r in out.collect()}
    for p, ln, x, y in _GCPS:
        gx, gy = rows[(p, ln)]
        assert gx == pytest.approx(x, abs=1e-6)
        assert gy == pytest.approx(y, abs=1e-6)


def test_tps_bends_between_gcps(spark):
    """Between GCPs the non-affine spline must differ from the best
    affine fit — the RBF weights actually participate."""
    pts = spark.createDataFrame([(50.0, 25.0)], "px double, py double")
    out = tps_transform(pts, _gcp_df(spark), pixel_col="px", line_col="py").collect()[0]
    affine_x = 10.0 + 2.0 * 50.0 + 3.0 * 25.0  # the p·l bump is missing
    assert abs(out.gx - affine_x) > 1e-3


def test_polynomial_order2_fits_quadratic_exactly(spark):
    """The GCP targets are order-2 polynomials, so the order-2 LSQ fit
    reproduces them at arbitrary points (not just GCPs)."""
    pts = spark.createDataFrame(
        [(37.0, 111.0), (250.0, 13.0)], "px double, py double"
    )
    out = gcp_transform(pts, _gcp_df(spark), order=2, pixel_col="px", line_col="py")
    for r in out.collect():
        x = 10.0 + 2.0 * r.px + 3.0 * r.py + 0.01 * r.px * r.py
        y = -5.0 + r.px - 2.0 * r.py + 0.02 * r.px * r.px
        assert r.gx == pytest.approx(x, abs=1e-6)
        assert r.gy == pytest.approx(y, abs=1e-6)


def test_polynomial_order1_on_affine_gcps(spark):
    affine = [
        (p, ln, 1.0 + 4.0 * p - 1.0 * ln, 2.0 - 3.0 * p + 5.0 * ln)
        for p, ln in [(0.0, 0.0), (399.0, 0.0), (0.0, 199.0), (399.0, 199.0)]
    ]
    gcps = spark.createDataFrame(affine, "pixel double, line double, x double, y double")
    pts = spark.createDataFrame([(123.0, 77.0)], "px double, py double")
    r = gcp_transform(pts, gcps, order=1, pixel_col="px", line_col="py").collect()[0]
    assert r.gx == pytest.approx(1.0 + 4.0 * 123.0 - 77.0, abs=1e-9)
    assert r.gy == pytest.approx(2.0 - 3.0 * 123.0 + 5.0 * 77.0, abs=1e-9)


def test_polynomial_rejects_underdetermined(spark):
    gcps = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 0.0), (1.0, 0.0, 1.0, 0.0), (0.0, 1.0, 0.0, 1.0)],
        "pixel double, line double, x double, y double",
    )
    pts = spark.createDataFrame([(1.0, 1.0)], "px double, py double")
    with pytest.raises(ValueError):
        gcp_transform(pts, gcps, order=2, pixel_col="px", line_col="py")


def test_homography_recovers_projective_map(spark):
    """GCPs generated from a homography with a non-trivial projective
    row must be reproduced at arbitrary points (DLT exact recovery)."""
    from gdal_spark.operators.gcp import homography_transform

    h = [10.0, 2.0, 1.0, -4.0, 0.5, 3.0, 1.0, 0.001, -0.0005]

    def apply(p, ln):
        den = h[6] + p * h[7] + ln * h[8]
        return (
            (h[0] + p * h[1] + ln * h[2]) / den,
            (h[3] + p * h[4] + ln * h[5]) / den,
        )

    gcps = spark.createDataFrame(
        [
            (float(p), float(ln), *apply(p, ln))
            for p in (0.0, 100.0, 200.0, 399.0)
            for ln in (0.0, 66.0, 199.0)
        ],
        "pixel double, line double, x double, y double",
    )
    pts = spark.createDataFrame([(37.0, 151.0), (313.0, 18.0)], "px double, py double")
    out = homography_transform(pts, gcps, pixel_col="px", line_col="py")
    for r in out.collect():
        ex, ey = apply(r.px, r.py)
        assert r.gx == pytest.approx(ex, abs=1e-8)
        assert r.gy == pytest.approx(ey, abs=1e-8)
