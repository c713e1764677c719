"""GCP polynomial transformer (alg/gdal_crs.cpp GDALCreateGCPTransformer).

The reference fits a least-squares polynomial of order 1/2 (order 3 is
documented unstable, gdal_crs.cpp:206) mapping (pixel, line) -> (x, y)
from ground control points, then evaluates it per pixel.  Order n has
(n+1)(n+2)/2 terms per axis (gdal_crs.cpp:751): order 2 uses
[1, p, l, p², p·l, l²].

Spark-first shape:

  * the GCP table is a dim table by contract (tens to hundreds of
    rows — the reference likewise holds all GCPs in the transformer
    struct); it is collected ONCE to the driver for the normal-equation
    solve (like gdal_crs.cpp's calccoef, but via numpy lstsq on a
    unit-scaled design matrix — the reference's exact Gaussian
    elimination on raw coords is numerically worse at large pixel
    ranges);
  * the fitted coefficients FOLD INTO THE PLAN as double literals, so
    the per-point evaluation is a pure whole-stage-codegen projection —
    zero Python in the hot path, scales to any point-table size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _design(p: np.ndarray, ln: np.ndarray, order: int) -> np.ndarray:
    cols = [np.ones_like(p), p, ln]
    if order >= 2:
        cols += [p * p, p * ln, ln * ln]
    return np.stack(cols, axis=1)


def fit_gcp_polynomial(
    gcps: DataFrame, order: int = 2
) -> tuple[list[float], list[float]]:
    """Solve the least-squares polynomial from a GCP dim table with
    columns (pixel, line, x, y).  Returns (x_coeffs, y_coeffs) in term
    order [1, p, l, (p², p·l, l²)].  The design matrix is scaled to the
    unit square before the solve (condition number ~10 instead of ~1e10
    at 400-pixel ranges) and coefficients are rescaled back."""
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2 (gdal_crs.cpp:206)")
    pdf = gcps.select("pixel", "line", "x", "y").toPandas()
    n_terms = (order + 1) * (order + 2) // 2
    if len(pdf) < n_terms:
        raise ValueError(f"order {order} needs >= {n_terms} GCPs")
    p = pdf["pixel"].to_numpy(np.float64)
    ln = pdf["line"].to_numpy(np.float64)
    ps = max(p.max(), 1.0)
    ls = max(ln.max(), 1.0)
    a = _design(p / ps, ln / ls, order)
    cx = np.linalg.lstsq(a, pdf["x"].to_numpy(np.float64), rcond=None)[0]
    cy = np.linalg.lstsq(a, pdf["y"].to_numpy(np.float64), rcond=None)[0]
    # undo the unit scaling term by term
    scale = [1.0, ps, ls] + ([ps * ps, ps * ls, ls * ls] if order >= 2 else [])
    return (
        [float(c) / s for c, s in zip(cx, scale)],
        [float(c) / s for c, s in zip(cy, scale)],
    )


def _poly_col(coeffs: list[float], p: Column, ln: Column) -> Column:
    terms = [F.lit(coeffs[0]), F.lit(coeffs[1]) * p, F.lit(coeffs[2]) * ln]
    if len(coeffs) == 6:
        terms += [
            F.lit(coeffs[3]) * (p * p),
            F.lit(coeffs[4]) * (p * ln),
            F.lit(coeffs[5]) * (ln * ln),
        ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def gcp_transform(
    points: DataFrame,
    gcps: DataFrame,
    order: int = 2,
    pixel_col: str = "pixel",
    line_col: str = "line",
) -> DataFrame:
    """GDALGCPTransform: append (gx, gy) = fitted polynomial of
    (pixel, line) to ``points``.  Coefficients are literals in the
    plan — the evaluation is whole-stage codegen."""
    cx, cy = fit_gcp_polynomial(gcps, order)
    p = F.col(pixel_col).cast("double")
    ln = F.col(line_col).cast("double")
    return points.withColumn("gx", _poly_col(cx, p, ln)).withColumn(
        "gy", _poly_col(cy, p, ln)
    )


# --------------------------------------------------------------------------
# Thin plate spline transformer (alg/gdal_tps.cpp / thinplatespline.cpp)
# --------------------------------------------------------------------------


def fit_tps(gcps: DataFrame):
    """Solve the TPS system for (pixel, line) -> (x, y) GCPs
    (VizGeorefSpline2D::solve): kernel U(d²) = d²·ln(d²) with U(0) = 0
    (thinplatespline.cpp:180 uses dist·log(dist) on the SQUARED
    distance), plus an affine part [1, p, l]; side conditions Σw = 0,
    Σw·p = 0, Σw·l = 0.  Returns (points, x_params, y_params) where
    params = [a0, a1, a2, w_0..w_{n-1}] over UNIT-SCALED coords and
    scales = (ps, ls).  GCPs are a dim table by contract (the reference
    holds them all in the spline struct).

    DOCUMENTED DIVERGENCE: the system is assembled on coordinates
    scaled to the unit square (raw 400-pixel ranges push the bordered
    TPS matrix towards cond ~1e10 and the recovered weights poison the
    evaluation); for non-affine GCPs the anisotropic normalization
    yields a slightly different spline than the reference's
    raw-coordinate solve."""
    pdf = gcps.select("pixel", "line", "x", "y").toPandas()
    ps = max(float(pdf["pixel"].abs().max()), 1.0)
    ls = max(float(pdf["line"].abs().max()), 1.0)
    p = pdf["pixel"].to_numpy(np.float64) / ps
    ln = pdf["line"].to_numpy(np.float64) / ls
    n = len(p)
    d2 = (p[:, None] - p[None, :]) ** 2 + (ln[:, None] - ln[None, :]) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.where(d2 > 0.0, d2 * np.log(d2), 0.0)
    a = np.zeros((n + 3, n + 3))
    a[:n, :n] = k
    a[:n, n] = 1.0
    a[:n, n + 1] = p
    a[:n, n + 2] = ln
    a[n, :n] = 1.0
    a[n + 1, :n] = p
    a[n + 2, :n] = ln
    rhs = np.zeros((n + 3, 2))
    rhs[:n, 0] = pdf["x"].to_numpy(np.float64)
    rhs[:n, 1] = pdf["y"].to_numpy(np.float64)
    sol = np.linalg.solve(a, rhs)
    px_params = [float(sol[n, 0]), float(sol[n + 1, 0]), float(sol[n + 2, 0])] + [
        float(v) for v in sol[:n, 0]
    ]
    py_params = [float(sol[n, 1]), float(sol[n + 1, 1]), float(sol[n + 2, 1])] + [
        float(v) for v in sol[:n, 1]
    ]
    return list(zip(p.tolist(), ln.tolist())), (ps, ls), px_params, py_params


def _tps_col(
    centers: list[tuple[float, float]], params: list[float], p: Column, ln: Column
) -> Column:
    out = F.lit(params[0]) + F.lit(params[1]) * p + F.lit(params[2]) * ln
    for (cx, cy), w in zip(centers, params[3:]):
        d2 = (p - F.lit(cx)) * (p - F.lit(cx)) + (ln - F.lit(cy)) * (ln - F.lit(cy))
        out = out + F.lit(w) * F.when(d2 > 0.0, d2 * F.log(d2)).otherwise(F.lit(0.0))
    return out


def tps_transform(
    points: DataFrame,
    gcps: DataFrame,
    pixel_col: str = "pixel",
    line_col: str = "line",
) -> DataFrame:
    """gdalwarp -tps: append (gx, gy) = thin-plate-spline of
    (pixel, line).  The solved weights and centers UNROLL into the plan
    as literal expression terms (one CASE-guarded kernel term per GCP),
    so evaluation is whole-stage codegen — the same unroll strategy as
    the Krüger/Vincenty series, viable for the dim-sized GCP sets the
    transformer contract allows."""
    centers, (ps, ls), cx, cy = fit_tps(gcps)
    p = F.col(pixel_col).cast("double") / F.lit(ps)
    ln = F.col(line_col).cast("double") / F.lit(ls)
    return points.withColumn("gx", _tps_col(centers, cx, p, ln)).withColumn(
        "gy", _tps_col(centers, cy, p, ln)
    )
