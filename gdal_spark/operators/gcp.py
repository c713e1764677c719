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


# --------------------------------------------------------------------------
# RPC transformer (alg/gdal_rpc.cpp, RPC00B rational polynomial model)
# --------------------------------------------------------------------------

# term basis in the reference's exact order (gdal_rpc.cpp:196-217);
# L = normalized longitude, P = normalized latitude, H = normalized height
_RPC_TERMS = [
    "1.0e0", "L", "P", "H", "(L * P)", "(L * H)", "(P * H)", "(L * L)",
    "(P * P)", "(H * H)", "(L * P * H)", "(L * L * L)", "(L * P * P)",
    "(L * H * H)", "(L * L * P)", "(P * P * P)", "(P * H * H)",
    "(L * L * H)", "(P * P * H)", "(H * H * H)",
]


def rpc_evaluate_sql(coeffs: list[float], sd) -> str:
    """Render RPCEvaluate (gdal_rpc.cpp:219-231) as SQL text: the
    reference accumulates EVEN-index and ODD-index terms in two
    separate sums and adds them at the end (an SSE2 layout artifact) —
    mirrored here so the float result is bit-identical.  ``sd`` is the
    double->E-notation literal formatter."""
    if len(coeffs) != 20:
        raise ValueError("RPC model has exactly 20 coefficients")
    s1 = " + ".join(
        f"{_RPC_TERMS[i]} * {sd(coeffs[i])}" for i in range(0, 20, 2)
    )
    s2 = " + ".join(
        f"{_RPC_TERMS[i]} * {sd(coeffs[i])}" for i in range(1, 20, 2)
    )
    return f"(({s1}) + ({s2}))"


def rpc_transform_sql(rpc: dict, sd) -> tuple[str, str, str, str, str]:
    """Shared SQL text for RPCTransformPoint (gdal_rpc.cpp:360-460):
    returns (L_def, P_def, H_def, pixel_expr, line_expr) where the defs
    normalize columns lon/lat/h and the exprs expect L/P/H in scope.
    Includes the reference's dateline unwrap of diffLong (±360 when the
    offset-relative longitude leaves ±270)."""
    diff = f"(lon - {sd(rpc['LONG_OFF'])})"
    unwrap = (
        f"(CASE WHEN {diff} < -2.7e2 THEN {diff} + 3.6e2 "
        f"WHEN {diff} > 2.7e2 THEN {diff} - 3.6e2 ELSE {diff} END)"
    )
    l_def = f"({unwrap} / {sd(rpc['LONG_SCALE'])})"
    p_def = f"((lat - {sd(rpc['LAT_OFF'])}) / {sd(rpc['LAT_SCALE'])})"
    h_def = f"((h - {sd(rpc['HEIGHT_OFF'])}) / {sd(rpc['HEIGHT_SCALE'])})"
    px = (
        f"({rpc_evaluate_sql(rpc['SAMP_NUM_COEFF'], sd)}"
        f" / {rpc_evaluate_sql(rpc['SAMP_DEN_COEFF'], sd)})"
        f" * {sd(rpc['SAMP_SCALE'])} + {sd(rpc['SAMP_OFF'])}"
    )
    ln = (
        f"({rpc_evaluate_sql(rpc['LINE_NUM_COEFF'], sd)}"
        f" / {rpc_evaluate_sql(rpc['LINE_DEN_COEFF'], sd)})"
        f" * {sd(rpc['LINE_SCALE'])} + {sd(rpc['LINE_OFF'])}"
    )
    return l_def, p_def, h_def, px, ln


# --------------------------------------------------------------------------
# Homography transformer (alg/gdal_homography.cpp)
# --------------------------------------------------------------------------


def fit_homography(gcps: DataFrame) -> list[float]:
    """Fit the 9-element homography h (gdal_homography.cpp:387-394
    parameterization: gx = (h0 + p·h1 + l·h2)/(h6 + p·h7 + l·h8),
    gy = (h3 + p·h4 + l·h5)/(same)) from >= 4 GCPs by the normalized
    DLT least squares, fixing h6 = 1.  GCP dim-table contract."""
    pdf = gcps.select("pixel", "line", "x", "y").toPandas()
    if len(pdf) < 4:
        raise ValueError("homography needs >= 4 GCPs")
    p = pdf["pixel"].to_numpy(np.float64)
    ln = pdf["line"].to_numpy(np.float64)
    x = pdf["x"].to_numpy(np.float64)
    y = pdf["y"].to_numpy(np.float64)
    ps = max(float(np.abs(p).max()), 1.0)
    ls = max(float(np.abs(ln).max()), 1.0)
    xs = max(float(np.abs(x).max()), 1.0)
    ys = max(float(np.abs(y).max()), 1.0)
    pn, lnn, xn, yn = p / ps, ln / ls, x / xs, y / ys
    n = len(pn)
    a = np.zeros((2 * n, 8))
    rhs = np.zeros(2 * n)
    one = np.ones(n)
    a[:n, 0], a[:n, 1], a[:n, 2] = one, pn, lnn
    a[:n, 6], a[:n, 7] = -xn * pn, -xn * lnn
    rhs[:n] = xn
    a[n:, 3], a[n:, 4], a[n:, 5] = one, pn, lnn
    a[n:, 6], a[n:, 7] = -yn * pn, -yn * lnn
    rhs[n:] = yn
    th = np.linalg.lstsq(a, rhs, rcond=None)[0]
    # undo the normalization: numerators rescale by the output scale,
    # denominator terms by the input scales
    return [
        float(th[0]) * xs,
        float(th[1]) * xs / ps,
        float(th[2]) * xs / ls,
        float(th[3]) * ys,
        float(th[4]) * ys / ps,
        float(th[5]) * ys / ls,
        1.0,
        float(th[6]) / ps,
        float(th[7]) / ls,
    ]


def homography_transform(
    points: DataFrame,
    gcps: DataFrame,
    pixel_col: str = "pixel",
    line_col: str = "line",
) -> DataFrame:
    """GDALHomographyTransform: append (gx, gy); the fitted 9 parameters
    fold into a pure codegen projection."""
    h = fit_homography(gcps)
    p = F.col(pixel_col).cast("double")
    ln = F.col(line_col).cast("double")
    den = F.lit(h[6]) + p * F.lit(h[7]) + ln * F.lit(h[8])
    return points.withColumn(
        "gx", (F.lit(h[0]) + p * F.lit(h[1]) + ln * F.lit(h[2])) / den
    ).withColumn("gy", (F.lit(h[3]) + p * F.lit(h[4]) + ln * F.lit(h[5])) / den)


# --------------------------------------------------------------------------
# Geolocation-array transformer (alg/gdalgeoloc.cpp)
# --------------------------------------------------------------------------


def geoloc_transform(
    pixels: DataFrame,
    geoloc: DataFrame,
    pixel_step: float,
    line_step: float,
    pixel_offset: float = 0.0,
    line_offset: float = 0.0,
) -> DataFrame:
    """Forward geolocation-array transform (GDALGeoLocTransform,
    alg/gdalgeoloc.cpp:622 + PixelLineToXY:393): raster (px, py) ->
    geoloc array coords g = (p - OFFSET)/STEP (GEOREF_CONVENTION
    TOP_LEFT, i.e. zero convention offset), anchor iX = trunc(clamp(g)),
    then the reference's NESTED bilinear
    ``(1-fy)*(V00 + fx*(V10-V00)) + fy*(V01 + fx*(V11-V01))`` — kept in
    that exact form, not the symmetric 4-term sum, so doubles match the
    reference op-for-op.  Callers must keep pixels INTERIOR to the
    geoloc grid (iX+1 < XS, iY+1 < YS); the reference's edge 1-D
    fallbacks and dateline ShiftGeoX are not implemented (documented).

    ``geoloc`` is a table (glx, gly, lon, lat) — the swath geolocation
    arrays.  Spark shape: each pixel explodes to its 4 array neighbours,
    ONE equi-join against the geoloc table (broadcast when subsampled
    arrays are dim-sized, shuffle otherwise), then a pivot back to one
    row per pixel — no value summation, so the shuffle cannot perturb
    the floats."""
    gx = (F.col("px").cast("double") - F.lit(pixel_offset)) / F.lit(pixel_step)
    gy = (F.col("py").cast("double") - F.lit(line_offset)) / F.lit(line_step)
    p = pixels.select(
        "px",
        "py",
        F.floor(gx).cast("int").alias("ix"),
        F.floor(gy).cast("int").alias("iy"),
        (gx - F.floor(gx)).alias("fx"),
        (gy - F.floor(gy)).alias("fy"),
    )
    nbrs = F.array(
        *[
            F.struct(
                (F.col("ix") + dx).alias("glx"),
                (F.col("iy") + dy).alias("gly"),
                F.lit(f"v{dx}{dy}").alias("tag"),
            )
            for dy in (0, 1)
            for dx in (0, 1)
        ]
    )
    scattered = p.select(
        "px", "py", "fx", "fy", F.explode(nbrs).alias("nb")
    ).select("px", "py", "fx", "fy", "nb.glx", "nb.gly", "nb.tag")
    j = scattered.join(geoloc, ["glx", "gly"])
    wide = j.groupBy("px", "py").agg(
        F.first("fx").alias("fx"),
        F.first("fy").alias("fy"),
        *[
            f
            for tag in ("v00", "v10", "v01", "v11")
            for f in (
                F.max(F.when(F.col("tag") == tag, F.col("lon"))).alias(f"x{tag}"),
                F.max(F.when(F.col("tag") == tag, F.col("lat"))).alias(f"y{tag}"),
            )
        ],
    )

    def nested(a00, a10, a01, a11):
        return (F.lit(1.0) - F.col("fy")) * (
            F.col(a00) + F.col("fx") * (F.col(a10) - F.col(a00))
        ) + F.col("fy") * (F.col(a01) + F.col("fx") * (F.col(a11) - F.col(a01)))

    return wide.select(
        "px",
        "py",
        nested("xv00", "xv10", "xv01", "xv11").alias("lon"),
        nested("yv00", "yv10", "yv01", "yv11").alias("lat"),
    )


def geoloc_backmap(
    geoloc: DataFrame,
    x0: float,
    dx: float,
    y0: float,
    dy: float,
    width: int,
    height: int,
    fill_maxdist: int = 3,
) -> DataFrame:
    """Inverse geolocation backmap (GDALGeoLoc generation of the
    backmap raster, alg/gdalgeoloc.cpp — which itself calls
    GDALFillNodata on the backmap holes, :1486): scatter every geoloc
    sample (glx, gly, lon, lat) into the target grid pixel containing
    (lon, lat), keep the sample NEAREST the pixel center per pixel
    (deterministic (d², gly, glx) tie-break — a documented divergence
    from the reference's weighted splat accumulation), then fill
    sampleless pixels with the engine's quadrant-IDW ``fill_nodata``,
    channel by channel.

    Output (tx, ty, bx4, by4): backmap array coords scaled by 1e4
    (floor), NULL where unfillable.  Spark shape: one scatter
    aggregation (min-struct argmin, map-side combined) + the two
    fill_nodata tile kernels — every stage shuffles on the pixel/tile
    key."""
    from gdal_spark.operators.focal import fill_nodata

    cx = F.lit(x0) + (F.col("tx") + F.lit(0.5)) * F.lit(dx)
    cy = F.lit(y0) + (F.col("ty") + F.lit(0.5)) * F.lit(dy)
    s = geoloc.select(
        "glx",
        "gly",
        # +1e-5 nudge: quarter-lattice geoloc lons land (lon-x0)/dx exactly
        # ON cell boundaries (26k of 144k samples), where the index floor
        # flips a sample into the neighboring cell on single-ulp
        # cross-engine drift; the off-boundary gap is 1/12 grid units and
        # drift <= ~1e-9, so the nudge keeps every boundary sample in its
        # true (upper) cell.  SAME text as the oracle scatter CTE.
        F.floor((F.col("lon") - F.lit(x0)) / F.lit(dx) + F.lit(1.0e-5))
        .cast("int").alias("tx"),
        F.floor((F.col("lat") - F.lit(y0)) / F.lit(dy) + F.lit(1.0e-5))
        .cast("int").alias("ty"),
        "lon",
        "lat",
    ).filter(
        (F.col("tx") >= 0) & (F.col("tx") < width)
        & (F.col("ty") >= 0) & (F.col("ty") < height)
    )
    d2 = (F.col("lon") - cx) * (F.col("lon") - cx) + (
        F.col("lat") - cy
    ) * (F.col("lat") - cy)
    best = (
        s.withColumn("d2", d2)
        .groupBy("tx", "ty")
        .agg(
            F.min(F.struct("d2", "gly", "glx")).alias("b")
        )
        .select("tx", "ty", F.col("b.glx").alias("glx"), F.col("b.gly").alias("gly"))
    )
    spark = geoloc.sparkSession
    grid = spark.range(width * height).select(
        (F.col("id") % width).cast("int").alias("tx"),
        (F.col("id") / width).cast("int").alias("ty"),
    )
    m = grid.join(best, ["tx", "ty"], "left")

    def channel(col: str) -> DataFrame:
        pix = m.select(
            F.col("tx").alias("px"), F.col("ty").alias("py"),
            F.col(col).cast("int").alias("value"),
        )
        filled = fill_nodata(pix, width, height, maxdist=fill_maxdist)
        direct = pix.filter(F.col("value").isNotNull()).select(
            "px", "py", (F.col("value").cast("bigint") * 10000).alias("v4")
        )
        return direct.unionByName(filled)

    bx = channel("glx").withColumnRenamed("v4", "bx4")
    by = channel("gly").withColumnRenamed("v4", "by4")
    return bx.join(by, ["px", "py"]).select(
        F.col("px").alias("tx"), F.col("py").alias("ty"), "bx4", "by4"
    )
