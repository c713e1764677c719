"""Viewshed — line-of-sight visibility from one observer over a DEM.

Re-answers gdal_viewshed (alg/viewshed.cpp, Wang et al. ring-sweep) with
a Spark-first decomposition.  Sampling model: discrete DDA rays — the
target at offset (dx, dy) from the observer is sampled at
n = max(|dx|, |dy|) evenly spaced steps, sample k at the nearest pixel to
the ideal segment point (floor(k*d/n + 0.5) per axis).  Because sample k
sits at exactly k/n of the target distance, the blocking test

    tan(angle_k) >= tan(angle_target)
    (z_k - z0) / (k*step) >= (z_t - z0) / (n*step)
    (z_k - z0) * n >= (z_t - z0) * k          -- distances cancel

is PURE INTEGER arithmetic: no trig, no sqrt, bit-exact in any engine
(and the basis of the DuckDB oracle).  This is the classic R3/Bresenham
LOS (the exact method GDAL's ring-interpolation approximates; see
alg/viewshed.cpp CalcHeightLine edge interpolation) — a documented
sampling divergence, not an approximation of our own output.

Distributed shape (honest at scale, no driver collect):
  * targets and DEM samples within ``max_dist`` of the observer are
    bucketed into azimuth WEDGES (atan2 JVM-side); a ray's sample cells
    deviate from the target azimuth by at most atan(0.5/r), so samples
    scatter to wedge+-1 and the near-observer disc (r <= ``core_r``,
    where the angular bound is useless) replicates to every wedge —
    bounded halo, one shuffle;
  * one applyInPandas per wedge runs the vectorized DDA for all its
    targets at once (numpy gather over a dense local window; no
    per-ray Python loop over targets).
Wedge count scales with cores; work per wedge is O(targets * max_dist),
memory O(max_dist^2) — independent of total raster size, so a
1000-executor run just gets more observers/wedges in flight.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

_OUT_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("visible", IntegerType()),
    ]
)


# curvature quantizer: heights go to 2^20 micro-units so the corrected
# blocking compare stays pure integer (the repo's quantize-before-compare
# exactness pattern; the reference's float subtraction differs by < 1
# micro-unit — documented formulation divergence, shared with the oracle)
CURV_Q = 1 << 20


def curved_z_sql(f_eff_sql: str, ox: int, oy: int, z_col: str = "z") -> str:
    """Shared engine/oracle text for the curvature-adjusted quantized
    height: z*2^20 - floor(f_eff * r2 * 2^20 + 0.5) with r2 the cell's
    squared pixel distance from the observer (gdal_viewshed -cc,
    viewshed_executor.cpp:295 ``h -= heightAdjFactor * r2``, factor =
    curveCoeff/(2*semimajor) scaled by cell area,
    viewshed_executor.cpp:150-171)."""
    r2 = f"CAST((px - {ox}) * (px - {ox}) + (py - {oy}) * (py - {oy}) AS DOUBLE)"
    return (
        f"CAST({z_col} AS BIGINT) * {CURV_Q}"
        f" - CAST(floor({f_eff_sql} * {r2} * 1.048576e6 + 5.0e-1) AS BIGINT)"
    )


def _wedge_rows(
    dem: DataFrame,
    ox: int,
    oy: int,
    obs_z: int,
    max_dist: int,
    n_wedges: int,
    core_r: int,
    curve_coeff: float,
    semimajor: float,
    cell_size: float,
):
    """Shared azimuth-wedge scatter for the viewshed kernels: returns
    (rows, obs_z') where rows = targets ∪ (wedge±1 far samples) ∪
    (every-wedge near core) and obs_z' is quantized when curvature is
    on."""
    d2 = (F.col("px") - ox) * (F.col("px") - ox) + (F.col("py") - oy) * (
        F.col("py") - oy
    )
    if curve_coeff:
        from gdal_spark.geometry import mercator

        f_eff = curve_coeff * cell_size * cell_size / (2.0 * semimajor)
        zexpr = F.expr(curved_z_sql(mercator.sql_double(f_eff), ox, oy))
        obs_z = obs_z * CURV_Q
    else:
        zexpr = F.col("z").cast("long")
    disc = dem.filter(d2 <= max_dist * max_dist).select(
        "px", "py", zexpr.alias("z")
    )
    two_pi = 2.0 * math.pi
    wedge_of = (
        F.floor(
            (F.atan2(F.col("py") - oy, F.col("px") - ox) + math.pi)
            / two_pi
            * n_wedges
        )
        .cast("int")
        % n_wedges
    )
    # targets: each to its own wedge
    targets = disc.withColumn("wedge", wedge_of).withColumn(
        "is_target", F.lit(1)
    )
    # samples: wedge +- 1 margin; the near-observer core goes everywhere
    near = (F.col("px") - ox) * (F.col("px") - ox) + (
        F.col("py") - oy
    ) * (F.col("py") - oy) <= core_r * core_r
    far_samples = (
        disc.filter(~near)
        .withColumn("w0", wedge_of)
        .withColumn("dw", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "px",
            "py",
            "z",
            ((F.col("w0") + F.col("dw") + n_wedges) % n_wedges).alias("wedge"),
            F.lit(0).alias("is_target"),
        )
    )
    core_samples = (
        disc.filter(near)
        .crossJoin(
            disc.sparkSession.range(n_wedges).select(
                F.col("id").cast("int").alias("wedge")
            )
        )
        .select("px", "py", "z", "wedge", F.lit(0).alias("is_target"))
    )
    rows = targets.select("px", "py", "z", "wedge", "is_target").unionByName(
        far_samples
    ).unionByName(core_samples)
    return rows, obs_z


def viewshed(
    dem: DataFrame,
    ox: int,
    oy: int,
    obs_z: int,
    max_dist: int = 80,
    n_wedges: int = 16,
    core_r: int = 4,
    curve_coeff: float = 0.0,
    semimajor: float = 6378137.0,
    cell_size: float = 1.0,
) -> DataFrame:
    """(px, py, visible) for every DEM pixel within ``max_dist`` of the
    observer (chebyshev-circular: (px-ox)^2+(py-oy)^2 <= max_dist^2).

    ``dem``: (px, py, z int).  ``obs_z``: observer elevation (terrain +
    mast).  A sample at angle-tangent >= the target's blocks it; the
    observer's own pixel is always visible.

    ``curve_coeff`` != 0 enables the earth-curvature correction
    (gdal_viewshed -cc, default 0.85714 = 1 - 1/7 atmospheric
    refraction): every cell's height drops by
    curve_coeff * dist² / (2 * semimajor), dist in meters via
    ``cell_size``.  Exactness is preserved by quantizing heights to
    2^20 micro-units (curved_z_sql) so the blocking comparison stays
    integer."""
    rows, obs_z = _wedge_rows(
        dem, ox, oy, obs_z, max_dist, n_wedges, core_r,
        curve_coeff, semimajor, cell_size,
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        sm = pdf[pdf["is_target"] == 0]
        tg = pdf[pdf["is_target"] == 1]
        if len(tg) == 0:
            return pd.DataFrame({"px": [], "py": [], "visible": []}).astype(
                {"px": np.int32, "py": np.int32, "visible": np.int32}
            )
        # dense local window over the wedge's sample bbox
        sx = sm["px"].to_numpy(np.int64)
        sy = sm["py"].to_numpy(np.int64)
        sz = sm["z"].to_numpy(np.int64)
        x0, y0 = int(sx.min()), int(sy.min())
        win = np.zeros((int(sy.max()) - y0 + 1, int(sx.max()) - x0 + 1), np.int64)
        have = np.zeros_like(win, dtype=bool)
        win[sy - y0, sx - x0] = sz
        have[sy - y0, sx - x0] = True
        tx = tg["px"].to_numpy(np.int64)
        ty = tg["py"].to_numpy(np.int64)
        tz = tg["z"].to_numpy(np.int64)
        dx = tx - ox
        dy = ty - oy
        n = np.maximum(np.abs(dx), np.abs(dy))
        kmax = int(n.max()) if len(n) else 0
        if kmax <= 1:
            vis = np.ones(len(tg), dtype=np.int32)  # adjacent: nothing between
        else:
            ks = np.arange(1, kmax, dtype=np.int64)[None, :]  # 1..kmax-1
            nn = np.maximum(n, 1)[:, None]
            # nearest pixel to k/n of the way (floor(x+0.5), same in SQL)
            cx = ox + np.floor(ks * dx[:, None] / nn + 0.5).astype(np.int64)
            cy = oy + np.floor(ks * dy[:, None] / nn + 0.5).astype(np.int64)
            valid = ks < n[:, None]
            cxw = np.clip(cx - x0, 0, win.shape[1] - 1)
            cyw = np.clip(cy - y0, 0, win.shape[0] - 1)
            zk = win[cyw, cxw]
            ok = have[cyw, cxw] & valid
            # blocked iff any (zk - z0) * n >= (zt - z0) * k
            lhs = (zk - obs_z) * n[:, None]
            rhs = (tz - obs_z)[:, None] * ks
            blocked = ((lhs >= rhs) & ok).any(axis=1)
            vis = (~blocked).astype(np.int32)
        return pd.DataFrame(
            {
                "px": tx.astype(np.int32),
                "py": ty.astype(np.int32),
                "visible": vis,
            }
        )

    return rows.groupBy("wedge").applyInPandas(kernel, _OUT_SCHEMA)


_HEIGHTS_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("min_vis_mu", LongType()),
        StructField("ground_mu", LongType()),
    ]
)

# height-mode quantizer: min-observable heights are rationals
# z0 + (zk-z0)*n/k; 2^20 micro-units keep every floor exact in both
# engines (floor is monotone, so max-of-floors == floor-of-max)
HQ = 1 << 20


def viewshed_heights(
    dem: DataFrame,
    ox: int,
    oy: int,
    obs_z: int,
    max_dist: int = 80,
    n_wedges: int = 16,
    core_r: int = 4,
) -> DataFrame:
    """gdal_viewshed -om DEM / -om GROUND (viewshed_executor.cpp
    setOutput :179-191 — dfZ is the minimum observable height at the
    cell; DEM mode emits it, GROUND mode emits max(0, dfZ - terrain)):

      min_vis_mu = z0*HQ + max over DDA samples of
                   floor((z_k - z0) * n * HQ / k)    (NULL if no samples)
      ground_mu  = max(0, min_vis_mu - z_t*HQ)       (0 when unconstrained)

    in 2^-20 micro-units, pure integer end-to-end (the DDA twin of the
    reference's ring-interpolated float heights — same documented
    sampling divergence as `viewshed`).  Consistency with the 0/1 mode
    is exact: visible ⇔ min_vis_mu IS NULL OR min_vis_mu < z_t*HQ
    (pinned in tests/test_viewshed_curved.py)."""
    rows, obs_z = _wedge_rows(
        dem, ox, oy, obs_z, max_dist, n_wedges, core_r, 0.0, 6378137.0, 1.0
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        sm = pdf[pdf["is_target"] == 0]
        tg = pdf[pdf["is_target"] == 1]
        if len(tg) == 0:
            return pd.DataFrame(
                {
                    "px": pd.array([], dtype="int32"),
                    "py": pd.array([], dtype="int32"),
                    "min_vis_mu": pd.array([], dtype="Int64"),
                    "ground_mu": pd.array([], dtype="int64"),
                }
            )
        sx = sm["px"].to_numpy(np.int64)
        sy = sm["py"].to_numpy(np.int64)
        sz = sm["z"].to_numpy(np.int64)
        x0, y0 = int(sx.min()), int(sy.min())
        win = np.zeros((int(sy.max()) - y0 + 1, int(sx.max()) - x0 + 1), np.int64)
        have = np.zeros_like(win, dtype=bool)
        win[sy - y0, sx - x0] = sz
        have[sy - y0, sx - x0] = True
        tx = tg["px"].to_numpy(np.int64)
        ty = tg["py"].to_numpy(np.int64)
        tz = tg["z"].to_numpy(np.int64)
        dx = tx - ox
        dy = ty - oy
        n = np.maximum(np.abs(dx), np.abs(dy))
        kmax = int(n.max()) if len(n) else 0
        mq = np.full(len(tg), np.iinfo(np.int64).min, dtype=np.int64)
        if kmax > 1:
            ks = np.arange(1, kmax, dtype=np.int64)[None, :]
            nn = np.maximum(n, 1)[:, None]
            cx = ox + np.floor(ks * dx[:, None] / nn + 0.5).astype(np.int64)
            cy = oy + np.floor(ks * dy[:, None] / nn + 0.5).astype(np.int64)
            valid = ks < n[:, None]
            cxw = np.clip(cx - x0, 0, win.shape[1] - 1)
            cyw = np.clip(cy - y0, 0, win.shape[0] - 1)
            zk = win[cyw, cxw]
            ok = have[cyw, cxw] & valid
            # same double-division + floor text as the SQL oracle; every
            # operand is exactly representable (|q| <= ~2.4e10 << 2^53)
            q = ((zk - obs_z) * n[:, None] * HQ).astype(np.float64)
            qd = np.floor(q / ks.astype(np.float64)).astype(np.int64)
            qd[~ok] = np.iinfo(np.int64).min
            has = ok.any(axis=1)
            mq[has] = qd.max(axis=1)[has]
        constrained = mq != np.iinfo(np.int64).min
        safe_mq = np.where(constrained, mq, 0)
        vals = safe_mq + obs_z * HQ
        min_vis = pd.array(vals, dtype="Int64")
        min_vis[~constrained] = pd.NA
        ground = np.where(
            constrained, np.maximum(0, vals - tz * HQ), 0
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "px": tx.astype(np.int32),
                "py": ty.astype(np.int32),
                "min_vis_mu": min_vis,
                "ground_mu": ground,
            }
        )

    return rows.groupBy("wedge").applyInPandas(kernel, _HEIGHTS_SCHEMA)


# ---------------------------------------------------------------------------
# Point-to-point line of sight — GDALIsLineOfSightVisible (alg/los.cpp:177).
#
# The reference checks both endpoints (strict z > terrain, alg/los.cpp:120
# IsAboveTerrain) and then walks Bresenham2D (alg/los.cpp:37) testing an
# interpolated z at every visited cell: linear ratio along the axis for
# vertical/horizontal lines (alg/los.cpp:303,316 GetZValueFromY/X), the
# sqrt distance ratio lerp(zA, zB, sqrt(rNum/rDenom)) otherwise
# (alg/los.cpp:332 GetZValueFromXY).  First failure wins: endpoint A,
# then endpoint B, then walk order (SetXYIntersection).
#
# Bresenham's balance loop has a closed form for the visited cells —
# for the shallow branch (dx >= dy), after k x-steps the minor axis is
#     y_k = yA + sy * floor((2*dy*k + dx) / (2*dx)),
# (verified against the reference loop in tests), symmetric when steep.
# That makes the whole walk a JVM `sequence()+explode` column program:
# no Python, every sample an integer cell, z interpolation in doubles
# with the reference's exact operation order.  The k = -2 / -1 sentinel
# samples carry the exact-z endpoint checks AND give min(k) the
# reference's failure priority for free.
#
# Scale shape: pairs are a dim table; exploded samples (|pairs| × path
# length) broadcast into an equi-join against the DEM on the cell key —
# the raster side never shuffles, the agg runs on the tiny sample set.
# ---------------------------------------------------------------------------

LOS_DERIVED_SQL = {
    "dx": "abs(xb - xa)",
    "dy": "abs(yb - ya)",
    "sx": "CASE WHEN xb >= xa THEN 1 ELSE -1 END",
    "sy": "CASE WHEN yb >= ya THEN 1 ELSE -1 END",
    "n": "greatest(abs(xb - xa), abs(yb - ya))",
}


def los_x_sql(k: str = "k") -> str:
    """Visited-cell x at walk step ``k`` (requires derived cols)."""
    return (
        f"CASE WHEN {k} = -2 THEN xa WHEN {k} = -1 THEN xb "
        f"WHEN dx >= dy THEN xa + sx * {k} "
        f"ELSE xa + sx * CAST(floor(CAST(2 * dx * {k} + dy AS DOUBLE) "
        f"/ CAST(2 * dy AS DOUBLE)) AS INT) END"
    )


def los_y_sql(k: str = "k") -> str:
    return (
        f"CASE WHEN {k} = -2 THEN ya WHEN {k} = -1 THEN yb "
        f"WHEN dx >= dy THEN CASE WHEN dx = 0 THEN ya "
        f"ELSE ya + sy * CAST(floor(CAST(2 * dy * {k} + dx AS DOUBLE) "
        f"/ CAST(2 * dx AS DOUBLE)) AS INT) END "
        f"ELSE ya + sy * {k} END"
    )


# interpolated test height at sample (x, y); the three ratio forms are
# the reference's GetZValueFromY/X/XY kept op-for-op (linear ratio on
# axis lines, sqrt of the squared-distance ratio otherwise)
LOS_Z_SQL = (
    "CASE WHEN k = -2 THEN CAST(za AS DOUBLE) "
    "WHEN k = -1 THEN CAST(zb AS DOUBLE) "
    "ELSE CAST(za AS DOUBLE) + (CASE "
    "WHEN n = 0 THEN 0.0e0 "
    "WHEN dx = 0 THEN CAST(y - ya AS DOUBLE) / CAST(yb - ya AS DOUBLE) "
    "WHEN dy = 0 THEN CAST(x - xa AS DOUBLE) / CAST(xb - xa AS DOUBLE) "
    "ELSE sqrt(CAST((x - xa) * (x - xa) + (y - ya) * (y - ya) AS DOUBLE) "
    "/ CAST((xb - xa) * (xb - xa) + (yb - ya) * (yb - ya) AS DOUBLE)) END) "
    "* CAST(zb - za AS DOUBLE) END"
)


def line_of_sight(dem: DataFrame, pairs: DataFrame) -> DataFrame:
    """(pid, visible, ix, iy) per observer→target pair.

    ``dem``: (px, py, z integer terrain).  ``pairs``: (pid, xa, ya, za,
    xb, yb, zb) with integer cells and integer heights; all path cells
    must exist in ``dem`` (the reference fails the ray when a read
    misses — out-of-raster pairs are the caller's contract).
    ``visible`` = 1 iff both endpoints and every Bresenham cell pass the
    strict above-terrain test; (ix, iy) = first blocking cell in the
    reference's priority order, (-1, -1) when visible."""
    d = pairs.selectExpr(
        "pid", "xa", "ya", "za", "xb", "yb", "zb",
        *[f"{sql} AS {name}" for name, sql in LOS_DERIVED_SQL.items()],
    )
    samples = d.select(
        "*", F.expr("explode(sequence(-2, n))").alias("k")
    ).selectExpr("*", f"{los_x_sql()} AS x", f"{los_y_sql()} AS y")
    samples = samples.selectExpr("*", f"{LOS_Z_SQL} AS zt")
    hits = F.broadcast(samples).join(
        dem.select(
            F.col("px").alias("x"), F.col("py").alias("y"),
            F.col("z").cast("long").alias("terrain"),
        ),
        ["x", "y"],
    )
    agg = hits.groupBy(
        "pid", "xa", "ya", "xb", "yb", "dx", "dy", "sx", "sy", "n"
    ).agg(
        F.expr("bool_and(zt > CAST(terrain AS DOUBLE))").alias("vis"),
        F.expr("min(CASE WHEN NOT zt > CAST(terrain AS DOUBLE) THEN k END)").alias(
            "bk"
        ),
    )
    return agg.selectExpr(
        "pid",
        "CAST(CASE WHEN vis THEN 1 ELSE 0 END AS INT) AS visible",
        f"CAST(CASE WHEN vis THEN -1 ELSE {los_x_sql('bk')} END AS INT) AS ix",
        f"CAST(CASE WHEN vis THEN -1 ELSE {los_y_sql('bk')} END AS INT) AS iy",
    )
