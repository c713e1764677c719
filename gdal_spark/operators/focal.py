"""Focal (neighborhood) raster ops via per-tile kernels + halo exchange.

The reference's DEM derivatives (apps/gdaldem_lib.cpp: slope/aspect/
hillshade via Horn's 3x3 stencil) and cleanup kernels (sieve, proximity)
are all focal ops: each output pixel needs a neighborhood of input
pixels.  Spark-first shape (SURVEY §2.5/§2.9):

  1. pixels scatter to 64x64 grid tiles PLUS a 1-pixel halo — computed
     exactly per pixel with a JVM-side ``sequence()`` explode over the
     (at most 2x2) tiles its 3x3 neighborhood touches;
  2. one applyInPandas group per tile reconstructs the local window as a
     dense numpy array and runs the stencil vectorized;
  3. global-border pixels are skipped (the reference computes edge
     pixels with mirrored values; v1 emits interior only, documented).

``dem_gradient`` emits Horn's dzdx/dzdy as INTEGERS (the 3x3 weighted
differences before the float slope conversion) so the DuckDB oracle can
reproduce them bit-exactly from the synthetic value formula.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

GRID_TILE = 64


def _with_halo_tiles(pixels: DataFrame) -> DataFrame:
    """Scatter (px, py, value) to every GRID_TILE tile whose interior
    3x3 stencils need it: tiles of px-1..px+1 x py-1..py+1."""
    lo = lambda c: F.shiftright(F.col(c) - 1, 6)  # noqa: E731
    hi = lambda c: F.shiftright(F.col(c) + 1, 6)  # noqa: E731
    out = pixels.withColumn("gtx", F.explode(F.sequence(lo("px"), hi("px"))))
    out = out.withColumn("gty", F.explode(F.sequence(lo("py"), hi("py"))))
    return out.filter((F.col("gtx") >= 0) & (F.col("gty") >= 0))


_GRAD_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("dzdx", LongType()),
        StructField("dzdy", LongType()),
    ]
)


def dem_gradient(
    pixels: DataFrame, width: int, height: int, alg: str = "horn"
) -> DataFrame:
    """3x3 gradient for interior pixels (gdaldem stencils).

    alg="horn" (default): dzdx = (ne + 2e + se) - (nw + 2w + sw),
    dzdy = (sw + 2s + se) - (nw + 2n + ne), with y growing south
    (row-major py).  alg="zt" (Zevenbergen-Thorne, gdaldem -alg
    ZevenbergenThorne; apps/gdaldem_lib.cpp Gradient<ZEVENBERGEN_
    THORNE>): dzdx = e - w, dzdy = s - n — the simple central
    differences the reference's ZT slope/aspect consume (its aspect
    uses afWin[5]-afWin[3] = e-w directly)."""

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gtx, gty = int(key[0]), int(key[1])
        spx = pdf["px"].to_numpy(np.int64)
        spy = pdf["py"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.int64)
        x0 = gtx * GRID_TILE - 1
        y0 = gty * GRID_TILE - 1
        w = GRID_TILE + 2
        win = np.zeros((w, w), dtype=np.int64)
        have = np.zeros((w, w), dtype=bool)
        sel = (spx >= x0) & (spx < x0 + w) & (spy >= y0) & (spy < y0 + w)
        win[spy[sel] - y0, spx[sel] - x0] = val[sel]
        have[spy[sel] - y0, spx[sel] - x0] = True
        # interior of this tile, excluding global borders
        pxs = np.arange(gtx * GRID_TILE, min((gtx + 1) * GRID_TILE, width))
        pys = np.arange(gty * GRID_TILE, min((gty + 1) * GRID_TILE, height))
        pxs = pxs[(pxs >= 1) & (pxs <= width - 2)]
        pys = pys[(pys >= 1) & (pys <= height - 2)]
        if pxs.size == 0 or pys.size == 0:
            return pd.DataFrame(
                {"px": [], "py": [], "dzdx": [], "dzdy": []}
            ).astype({"px": "int32", "py": "int32", "dzdx": "int64", "dzdy": "int64"})
        cx = pxs - x0
        cy = pys - y0
        C = np.ix_(cy, cx)

        def sh(dy, dx):
            return win[np.ix_(cy + dy, cx + dx)]

        if alg == "zt":
            dzdx = sh(0, 1) - sh(0, -1)
            dzdy = sh(1, 0) - sh(-1, 0)
        else:
            dzdx = (sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)) - (
                sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)
            )
            dzdy = (sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)) - (
                sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)
            )
        assert have[C].all(), "halo window incomplete"
        gx, gy = np.meshgrid(pxs, pys)
        return pd.DataFrame(
            {
                "px": gx.ravel().astype(np.int32),
                "py": gy.ravel().astype(np.int32),
                "dzdx": dzdx.ravel(),
                "dzdy": dzdy.ravel(),
            }
        )

    return _with_halo_tiles(pixels).groupBy("gtx", "gty").applyInPandas(
        kernel, _GRAD_SCHEMA
    )


_TPI_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("tri_wilson8", LongType()),
        StructField("tri_riley2", LongType()),
        StructField("tpi8", LongType()),
        StructField("rough", LongType()),
    ]
)


def dem_tpi_tri(pixels: DataFrame, width: int, height: int) -> DataFrame:
    """gdaldem TRI/TPI/roughness (apps/gdaldem_lib.cpp:2351-2417) for
    interior pixels, in integer-exact form:

      * tri_wilson8 = sum |neighbor - center| over the 8 neighbors
        (= 8x GDALTRIAlgWilson's mean-abs-difference);
      * tri_riley2  = sum (neighbor - center)^2
        (= GDALTRIAlgRiley squared — monotone in the reference value);
      * tpi8        = 8*center - sum(neighbors) (= 8x GDALTPIAlg);
      * rough       = max - min over the full 3x3 (GDALRoughnessAlg).

    Keeping the pre-float integer forms makes the DuckDB oracle bit-exact
    (the /8, sqrt are display transforms, same policy as dem_gradient)."""

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gtx, gty = int(key[0]), int(key[1])
        spx = pdf["px"].to_numpy(np.int64)
        spy = pdf["py"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.int64)
        x0 = gtx * GRID_TILE - 1
        y0 = gty * GRID_TILE - 1
        w = GRID_TILE + 2
        win = np.zeros((w, w), dtype=np.int64)
        sel = (spx >= x0) & (spx < x0 + w) & (spy >= y0) & (spy < y0 + w)
        win[spy[sel] - y0, spx[sel] - x0] = val[sel]
        pxs = np.arange(gtx * GRID_TILE, min((gtx + 1) * GRID_TILE, width))
        pys = np.arange(gty * GRID_TILE, min((gty + 1) * GRID_TILE, height))
        pxs = pxs[(pxs >= 1) & (pxs <= width - 2)]
        pys = pys[(pys >= 1) & (pys <= height - 2)]
        empty = {
            "px": "int32", "py": "int32", "tri_wilson8": "int64",
            "tri_riley2": "int64", "tpi8": "int64", "rough": "int64",
        }
        if pxs.size == 0 or pys.size == 0:
            return pd.DataFrame({k: [] for k in empty}).astype(empty)
        cx = pxs - x0
        cy = pys - y0
        center = win[np.ix_(cy, cx)]
        tri_w = np.zeros_like(center)
        tri_r = np.zeros_like(center)
        nsum = np.zeros_like(center)
        nmax = center.copy()
        nmin = center.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nb = win[np.ix_(cy + dy, cx + dx)]
                d = nb - center
                tri_w += np.abs(d)
                tri_r += d * d
                nsum += nb
                np.maximum(nmax, nb, out=nmax)
                np.minimum(nmin, nb, out=nmin)
        gx, gy = np.meshgrid(pxs, pys)
        return pd.DataFrame(
            {
                "px": gx.ravel().astype(np.int32),
                "py": gy.ravel().astype(np.int32),
                "tri_wilson8": tri_w.ravel(),
                "tri_riley2": tri_r.ravel(),
                "tpi8": (8 * center - nsum).ravel(),
                "rough": (nmax - nmin).ravel(),
            }
        )

    return _with_halo_tiles(pixels).groupBy("gtx", "gty").applyInPandas(
        kernel, _TPI_SCHEMA
    )


_CONTOUR_SCHEMA = StructType(
    [
        StructField("level", DoubleType()),
        StructField("cx", IntegerType()),
        StructField("cy", IntegerType()),
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
        StructField("x2", DoubleType()),
        StructField("y2", DoubleType()),
    ]
)


def contour_segments(
    pixels: DataFrame, width: int, height: int, levels: list[float]
) -> DataFrame:
    """Marching-squares contour segments (alg/contour.cpp analog):
    per 2x2 pixel-center cell, the interpolated level-crossing segment(s)
    at each requested level, in pixel-center coordinates.

    Distributed shape: the same 1-px halo scatter the focal stencils use;
    each tile emits segments for the cells whose top-left pixel it owns
    — map-side after one scatter, no driver state.  Ambiguous saddle
    cells (cases 5/10) split deterministically into two segments
    (the non-connected choice; the reference resolves saddles by the
    cell-center average — documented divergence)."""

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gtx, gty = int(key[0]), int(key[1])
        x0 = gtx * GRID_TILE - 1
        y0 = gty * GRID_TILE - 1
        w = GRID_TILE + 2
        win = np.full((w, w), np.nan)
        spx = pdf["px"].to_numpy(np.int64)
        spy = pdf["py"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.float64)
        sel = (spx >= x0) & (spx < x0 + w) & (spy >= y0) & (spy < y0 + w)
        win[spy[sel] - y0, spx[sel] - x0] = val[sel]
        # cells owned by this tile: top-left pixel inside the tile proper
        cxs = np.arange(gtx * GRID_TILE, min((gtx + 1) * GRID_TILE, width - 1))
        cys = np.arange(gty * GRID_TILE, min((gty + 1) * GRID_TILE, height - 1))
        if cxs.size == 0 or cys.size == 0:
            return pd.DataFrame(
                {k: [] for k in ("level", "cx", "cy", "x1", "y1", "x2", "y2")}
            ).astype({"cx": "int32", "cy": "int32"})
        lx = cxs - x0
        ly = cys - y0
        v00 = win[np.ix_(ly, lx)]
        v10 = win[np.ix_(ly, lx + 1)]
        v01 = win[np.ix_(ly + 1, lx)]
        v11 = win[np.ix_(ly + 1, lx + 1)]
        gx, gy = np.meshgrid(cxs.astype(np.float64), cys.astype(np.float64))
        out = {k: [] for k in ("level", "cx", "cy", "x1", "y1", "x2", "y2")}
        for lev in levels:
            b00 = v00 > lev
            b10 = v10 > lev
            b01 = v01 > lev
            b11 = v11 > lev
            case = (
                b00.astype(np.int8)
                + 2 * b10.astype(np.int8)
                + 4 * b11.astype(np.int8)
                + 8 * b01.astype(np.int8)
            )
            crossing = (case > 0) & (case < 15) & ~np.isnan(v00 + v10 + v01 + v11)
            if not crossing.any():
                continue

            def interp(va, vb):  # crossing point parameter along an edge
                return (lev - va) / (vb - va)

            # edge midpoints (pixel-center coords): top t, right r,
            # bottom b, left l of the cell square [gx,gx+1]x[gy,gy+1]
            tx_ = gx + interp(v00, v10)
            ty_ = gy
            rx_ = gx + 1.0
            ry_ = gy + interp(v10, v11)
            bx_ = gx + interp(v01, v11)
            by_ = gy + 1.0
            lx_ = gx
            ly_ = gy + interp(v00, v01)
            # case -> list of (edge_a, edge_b) segments
            E = {"t": (tx_, ty_), "r": (rx_, ry_), "b": (bx_, by_), "l": (lx_, ly_)}
            table = {
                1: [("l", "t")], 2: [("t", "r")], 3: [("l", "r")],
                4: [("r", "b")], 5: [("l", "t"), ("r", "b")], 6: [("t", "b")],
                7: [("l", "b")], 8: [("b", "l")], 9: [("b", "t")],
                10: [("t", "r"), ("b", "l")], 11: [("b", "r")],
                12: [("r", "l")], 13: [("r", "t")], 14: [("t", "l")],
            }
            for c, segs in table.items():
                mask = crossing & (case == c)
                if not mask.any():
                    continue
                for ea, eb in segs:
                    (ax, ay), (bx2, by2) = E[ea], E[eb]
                    out["level"].append(np.full(int(mask.sum()), lev))
                    out["cx"].append(gx[mask].astype(np.int32))
                    out["cy"].append(gy[mask].astype(np.int32))
                    out["x1"].append(ax[mask])
                    out["y1"].append(ay[mask])
                    out["x2"].append(bx2[mask])
                    out["y2"].append(by2[mask])
        if not out["level"]:
            return pd.DataFrame(
                {k: [] for k in ("level", "cx", "cy", "x1", "y1", "x2", "y2")}
            ).astype({"cx": "int32", "cy": "int32"})
        return pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})

    return _with_halo_tiles(pixels).groupBy("gtx", "gty").applyInPandas(
        kernel, _CONTOUR_SCHEMA
    )


_PROX_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("prox2", LongType()),
    ]
)


def proximity(
    pixels: DataFrame,
    target_value: int | list[int] | tuple[int, ...] = 0,
    maxdist: int = 16,
) -> DataFrame:
    """Proximity raster (alg/gdalproximity.cpp): per pixel, the SQUARED
    euclidean distance to the nearest target-valued pixel, capped at
    maxdist² (the reference's MAXDIST option; squared keeps every value
    integer → bit-exact oracle, the sqrt is a display transform).
    ``target_value`` may be a list — the reference's VALUES option
    (gdalproximity.cpp panTargetValues: a pixel is a target when its
    value is IN the list).

    Distributed shape: targets scatter to every GRID_TILE whose pixels
    could be within ``maxdist`` (a box-halo explode, duplication
    ~(1 + 2·maxdist/64)²); one applyInPandas per tile does the
    vectorized pixel x target distance min.  A target outside a tile's
    box-halo is farther than maxdist from all its pixels, so the cap
    makes the tile-local min globally exact."""
    if isinstance(target_value, (list, tuple)):
        tfilter = F.col("value").isin(*target_value)
    else:
        tfilter = F.col("value") == target_value
    targets = pixels.filter(tfilter).select(
        F.col("px").alias("tpx"), F.col("py").alias("tpy")
    )
    t = (
        targets.withColumn(
            "gtx",
            F.explode(
                F.sequence(
                    F.shiftright(F.col("tpx") - maxdist, 6),
                    F.shiftright(F.col("tpx") + maxdist, 6),
                )
            ),
        )
        .withColumn(
            "gty",
            F.explode(
                F.sequence(
                    F.shiftright(F.col("tpy") - maxdist, 6),
                    F.shiftright(F.col("tpy") + maxdist, 6),
                )
            ),
        )
        .filter((F.col("gtx") >= 0) & (F.col("gty") >= 0))
        .select("gtx", "gty", F.col("tpx").alias("px"), F.col("tpy").alias("py"),
                F.lit(1).alias("kind"))
    )
    base = pixels.select(
        F.shiftright("px", 6).alias("gtx"),
        F.shiftright("py", 6).alias("gty"),
        "px",
        "py",
        F.lit(0).alias("kind"),
    )
    cap2 = maxdist * maxdist

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        kindv = pdf["kind"].to_numpy()
        bx = pdf["px"].to_numpy(np.int64)[kindv == 0]
        by = pdf["py"].to_numpy(np.int64)[kindv == 0]
        tx = pdf["px"].to_numpy(np.int64)[kindv == 1]
        ty = pdf["py"].to_numpy(np.int64)[kindv == 1]
        if tx.size:
            d2 = (bx[:, None] - tx[None, :]) ** 2 + (by[:, None] - ty[None, :]) ** 2
            prox = np.minimum(d2.min(axis=1), cap2)
        else:
            prox = np.full(bx.size, cap2, dtype=np.int64)
        return pd.DataFrame(
            {"px": bx.astype(np.int32), "py": by.astype(np.int32), "prox2": prox}
        )

    return base.unionByName(t).groupBy("gtx", "gty").applyInPandas(
        kernel, _PROX_SCHEMA
    )


# --------------------------------------------------------------------------
# Fill nodata (alg/rasterfill.cpp GDALFillNodata)
# --------------------------------------------------------------------------

_FILL_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("v4", LongType()),  # floor(filled * 1e4); NULL = unfilled
    ]
)


def fill_nodata(
    pixels: DataFrame, width: int, height: int, maxdist: int = 8
) -> DataFrame:
    """GDALFillNodata (alg/rasterfill.cpp:348): interpolate every nodata
    pixel from the NEAREST valid pixel in each of the four quadrants
    (top-left, bottom-left, top-right, bottom-right — the reference's
    QUAD_CHECK order), inverse-distance weighted (w = 1/dist), searching
    at most ``maxdist`` pixels (euclidean); pixels with no valid
    neighbour in range stay nodata (NULL).

    DOCUMENTED DIVERGENCE: the reference approximates "nearest in
    quadrant" with scanline-propagated chains whose result can depend on
    scan order; this engine computes the exact quadrant-nearest with a
    deterministic tie-break (min distance, then min (vy, vx)).  Zero
    smoothing iterations (gdal_fillnodata.py's -si default).

    Input ``pixels``: (px, py, value) where value IS NULL marks the
    pixels to interpolate.  Output: one row per nodata pixel with
    v4 = floor(filled * 1e4) (NULL when unfilled).

    Distributed shape (same as ``proximity``): nodata pixels stay in
    their own GRID_TILE; VALID pixels box-halo-scatter to every tile
    within ``maxdist``; one applyInPandas per tile runs the vectorized
    quadrant argmin.  A valid pixel outside a tile's box halo is farther
    than maxdist from all its nodata pixels, so the tile-local answer is
    globally exact.  Quadrant sums accumulate in a FIXED order so the
    float result is shuffle-invariant.
    """
    nod = pixels.filter(F.col("value").isNull()).select(
        F.shiftright("px", 6).alias("gtx"),
        F.shiftright("py", 6).alias("gty"),
        "px",
        "py",
        F.lit(None).cast("int").alias("value"),
        F.lit(0).alias("kind"),
    )
    val = pixels.filter(F.col("value").isNotNull())
    v = (
        val.withColumn(
            "gtx",
            F.explode(
                F.sequence(
                    F.greatest(F.shiftright(F.col("px") - maxdist, 6), F.lit(0)),
                    F.shiftright(F.col("px") + maxdist, 6),
                )
            ),
        )
        .withColumn(
            "gty",
            F.explode(
                F.sequence(
                    F.greatest(F.shiftright(F.col("py") - maxdist, 6), F.lit(0)),
                    F.shiftright(F.col("py") + maxdist, 6),
                )
            ),
        )
        .select("gtx", "gty", "px", "py", "value", F.lit(1).alias("kind"))
    )
    r2 = maxdist * maxdist

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        kindv = pdf["kind"].to_numpy()
        npx = pdf["px"].to_numpy(np.int64)[kindv == 0]
        npy = pdf["py"].to_numpy(np.int64)[kindv == 0]
        if npx.size == 0:
            return pd.DataFrame({"px": [], "py": [], "v4": []}).astype(
                {"px": np.int32, "py": np.int32, "v4": "Int64"}
            )
        vx = pdf["px"].to_numpy(np.int64)[kindv == 1]
        vy = pdf["py"].to_numpy(np.int64)[kindv == 1]
        vv = pdf["value"].to_numpy()[kindv == 1].astype(np.float64)
        n = npx.size
        numer = np.zeros(n)
        denom = np.zeros(n)
        if vx.size:
            dx = vx[None, :] - npx[:, None]
            dy = vy[None, :] - npy[:, None]
            d2 = dx * dx + dy * dy
            ok = d2 <= r2
            left = dx <= 0
            top = dy <= 0
            # lexicographic argmin key: (d2, vy, vx)
            lex = (d2 * height + vy[None, :]) * width + vx[None, :]
            big = np.iinfo(np.int64).max
            rows = np.arange(n)
            # reference QUAD_CHECK order: TL, BL, TR, BR
            for quad in (left & top, left & ~top, ~left & top, ~left & ~top):
                k = np.where(ok & quad, lex, big)
                j = np.argmin(k, axis=1)
                found = k[rows, j] < big
                d = np.sqrt(d2[rows, j].astype(np.float64))
                w = np.where(found, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
                numer = numer + w * np.where(found, vv[j], 0.0)
                denom = denom + w
        filled = denom > 0.0
        # +1e-6 nudge: single-quadrant fills of integer values land the
        # exact value of (numer/denom)*1e4 ON an integer, where floor()
        # flips on single-ulp cross-engine drift; the achievable-value gap
        # off those integers is >= 2e-4 and drift <= ~4e-9, so the nudge
        # floors drifted exact-integers to their true value and leaves all
        # other rows unchanged.  SAME text as the oracle SQL.
        v4 = pd.array(
            np.where(filled, np.floor(np.divide(
                numer, np.where(filled, denom, 1.0)) * 1e4 + 1.0e-6), 0)
            .astype(np.int64),
            dtype="Int64",
        )
        v4[~filled] = pd.NA
        return pd.DataFrame(
            {"px": npx.astype(np.int32), "py": npy.astype(np.int32), "v4": v4}
        )

    return nod.unionByName(v).groupBy("gtx", "gty").applyInPandas(
        kernel, _FILL_SCHEMA
    )


_KF_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("is_nd", IntegerType()),
        StructField("num", LongType()),
        StructField("den", LongType()),
    ]
)

# VRT kernel filter coefficients (3x3, row-major like m_adfKernelCoefs):
# integer 1-2-1 Gaussian-ish taps keep num/den exact integers, so the
# normalized result is ONE double division — aggregation-order-proof
KF_COEFS = (1, 2, 1, 2, 4, 2, 1, 2, 1)


def kernel_filter(
    pixels: DataFrame, width: int, height: int, nodata: int
) -> DataFrame:
    """VRTKernelFilteredSource (frmts/vrt/vrtfilters.cpp:470-600,
    normalized non-separable case): per interior pixel, if the CENTER
    sample is nodata the output is nodata (:530-534); otherwise sum
    coef*value over the 3x3 taps SKIPPING nodata taps while also
    dropping their coefficients from the kernel sum (:543-551), then
    divide (:560-566; zero kernel sum -> 0).  Emits the exact integer
    (num, den) pair plus the center-nodata flag; the caller renders the
    division with shared SQL text.  Same halo-tile shape as the DEM
    stencils; global border pixels are interior-only like the rest of
    the focal family."""

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gtx, gty = int(key[0]), int(key[1])
        spx = pdf["px"].to_numpy(np.int64)
        spy = pdf["py"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.int64)
        x0 = gtx * GRID_TILE - 1
        y0 = gty * GRID_TILE - 1
        w = GRID_TILE + 2
        win = np.zeros((w, w), dtype=np.int64)
        sel = (spx >= x0) & (spx < x0 + w) & (spy >= y0) & (spy < y0 + w)
        win[spy[sel] - y0, spx[sel] - x0] = val[sel]
        pxs = np.arange(gtx * GRID_TILE, min((gtx + 1) * GRID_TILE, width))
        pys = np.arange(gty * GRID_TILE, min((gty + 1) * GRID_TILE, height))
        pxs = pxs[(pxs >= 1) & (pxs <= width - 2)]
        pys = pys[(pys >= 1) & (pys <= height - 2)]
        if pxs.size == 0 or pys.size == 0:
            return pd.DataFrame(
                {"px": [], "py": [], "is_nd": [], "num": [], "den": []}
            ).astype(
                {
                    "px": "int32",
                    "py": "int32",
                    "is_nd": "int32",
                    "num": "int64",
                    "den": "int64",
                }
            )
        cx = pxs - x0
        cy = pys - y0
        num = np.zeros((pys.size, pxs.size), dtype=np.int64)
        den = np.zeros_like(num)
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                tap = win[np.ix_(cy + dy, cx + dx)]
                ok = tap != nodata
                num += KF_COEFS[k] * tap * ok
                den += KF_COEFS[k] * ok
                k += 1
        center = win[np.ix_(cy, cx)]
        is_nd = (center == nodata).astype(np.int32)
        yy, xx = np.meshgrid(pys, pxs, indexing="ij")
        return pd.DataFrame(
            {
                "px": xx.ravel().astype("int32"),
                "py": yy.ravel().astype("int32"),
                "is_nd": is_nd.ravel(),
                "num": num.ravel(),
                "den": den.ravel(),
            }
        )

    return _with_halo_tiles(pixels).groupBy("gtx", "gty").applyInPandas(
        kernel, _KF_SCHEMA
    )


def fill_nodata_smooth(
    pixels: DataFrame,
    width: int,
    height: int,
    maxdist: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """GDALFillNodata smoothing passes (gdal_fillnodata.py -si N;
    alg/rasterfill.cpp GDALMultiFilter → GDALFilterLine): after the
    quadrant-IDW fill, ``iterations`` passes of a 3x3 masked average —
    only FILLED pixels update, every valid pixel (original or filled)
    contributes including the center, window clipped at the raster
    edge.  Values iterate in 1e-4 quantized units with floor(sum/count)
    per pass — the engine's exactness-preserving formulation of the
    reference's float32 line buffers (documented divergence, formula
    shared with the oracle).

    Distributed shape: per pass, valid pixels explode to their 9
    neighbor slots (Generate, stays in codegen) and ONE map-side-
    combined aggregation per pixel collects (sum, count); the update
    joins back on the pixel key.  Output: (px, py, v4) per originally-
    nodata pixel (NULL = unfilled, never smoothed)."""
    filled = fill_nodata(pixels, width, height, maxdist=maxdist)
    base = pixels.filter(F.col("value").isNotNull()).select(
        "px",
        "py",
        (F.col("value").cast("long") * 10000).alias("vmu"),
        F.lit(False).alias("filled"),
    )
    st = base.unionByName(
        filled.select(
            "px", "py", F.col("v4").alias("vmu"), F.lit(True).alias("filled")
        )
    )
    for _ in range(iterations):
        contrib = (
            st.filter(F.col("vmu").isNotNull())
            .select(
                "px", "py", "vmu",
                F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
            )
            .select(
                "px", "py", "vmu", "dx",
                F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
            )
            .select(
                (F.col("px") + F.col("dx")).alias("px"),
                (F.col("py") + F.col("dy")).alias("py"),
                "vmu",
            )
        )
        agg = contrib.groupBy("px", "py").agg(
            F.sum("vmu").alias("s"), F.count("vmu").alias("c")
        )
        st = st.join(agg, ["px", "py"], "left").select(
            "px",
            "py",
            F.when(
                F.col("filled") & F.col("vmu").isNotNull(),
                F.expr(
                    "CAST(floor(CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) AS BIGINT)"
                ),
            )
            .otherwise(F.col("vmu"))
            .alias("vmu"),
            "filled",
        )
    return st.filter(F.col("filled")).select(
        "px", "py", F.col("vmu").alias("v4")
    )
