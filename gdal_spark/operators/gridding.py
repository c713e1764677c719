"""Linear (Delaunay) grid interpolation — GDALGridLinear analog.

Reference lifecycle (alg/gdalgrid.cpp GGA_Linear + alg/delaunay.c):
triangulate the full scattered point set once (qhull, single-node), then
per output node find the containing triangle and interpolate from its
barycentric coordinates.  Spark-first shape:

  * the POINT SET is the dim-side table (same contract as the kNN/ANN
    target tables and the reference's in-memory qhull call): collected
    once, triangulated with the pure-numpy Bowyer-Watson kernel
    (geometry/delaunay.py);
  * the OUTPUT NODES stream through ``mapInPandas`` — per-triangle
    bbox-masked vectorized barycentric evaluation, zero shuffle;
  * nodes outside the convex hull emit nothing (the reference's
    radius=0 → nodata behavior).

Barycentric formulas are written with the exact operation order of the
shared SQL oracle text (registry._GRID_LINEAR_*), making every output
double bit-identical across engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from gdal_spark.geometry.delaunay import delaunay

_OUT_SCHEMA = StructType(
    [
        StructField("i", IntegerType()),
        StructField("j", IntegerType()),
        StructField("v6", LongType()),
    ]
)


def grid_linear(nodes: DataFrame, targets: DataFrame) -> DataFrame:
    """nodes(i, j, x, y) x targets(pid, x, y, z) -> (i, j, v6) where v6 =
    floor(interpolated_z * 1e6) for nodes strictly inside a Delaunay
    triangle of the target set."""
    tpd = targets.select("pid", "x", "y", "z").toPandas().sort_values("pid")
    px = tpd["x"].to_numpy(np.float64)
    py = tpd["y"].to_numpy(np.float64)
    pz = tpd["z"].to_numpy(np.float64)
    tris = delaunay(px, py)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-triangle vertex scalars (canonical ascending-pid order)
        x1, y1, z1 = px[tris[:, 0]], py[tris[:, 0]], pz[tris[:, 0]]
        x2, y2, z2 = px[tris[:, 1]], py[tris[:, 1]], pz[tris[:, 1]]
        x3, y3, z3 = px[tris[:, 2]], py[tris[:, 2]], pz[tris[:, 2]]
        bxmin = np.minimum(np.minimum(x1, x2), x3)
        bxmax = np.maximum(np.maximum(x1, x2), x3)
        bymin = np.minimum(np.minimum(y1, y2), y3)
        bymax = np.maximum(np.maximum(y1, y2), y3)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = pdf["x"].to_numpy(np.float64)
            y = pdf["y"].to_numpy(np.float64)
            ii = pdf["i"].to_numpy(np.int32)
            jj = pdf["j"].to_numpy(np.int32)
            out_i, out_j, out_v = [], [], []
            for t in range(tris.shape[0]):
                m = (
                    (x >= bxmin[t]) & (x <= bxmax[t])
                    & (y >= bymin[t]) & (y <= bymax[t])
                )
                if not m.any():
                    continue
                xs, ys = x[m], y[m]
                # SAME op order as the SQL oracle text
                d = (y2[t] - y3[t]) * (x1[t] - x3[t]) + (x3[t] - x2[t]) * (
                    y1[t] - y3[t]
                )
                l1 = ((y2[t] - y3[t]) * (xs - x3[t]) + (x3[t] - x2[t]) * (ys - y3[t])) / d
                l2 = ((y3[t] - y1[t]) * (xs - x3[t]) + (x1[t] - x3[t]) * (ys - y3[t])) / d
                l3 = (1.0 - l1) - l2
                inside = (l1 > 0) & (l2 > 0) & (l3 > 0)
                if not inside.any():
                    continue
                v = ((z1[t] * l1[inside]) + (z2[t] * l2[inside])) + (
                    z3[t] * l3[inside]
                )
                sel = np.nonzero(m)[0][inside]
                out_i.append(ii[sel])
                out_j.append(jj[sel])
                # +1e-5 nudge: flat/planar triangle patches make the exact
                # value of v*1e6 land ON integers (47 exact + 348 within-ulp
                # rows at sf0.001), where floor() flips on any single-ulp
                # cross-engine drift.  The achievable-value gap off those
                # integers is >= 3.8e-4 and drift is <= ~6e-8, so +1e-5
                # floors every drifted exact-integer to its true value and
                # leaves every other row unchanged.  SAME text as the oracle.
                out_v.append(np.floor(v * 1.0e6 + 1.0e-5).astype(np.int64))
            if not out_i:
                continue
            yield pd.DataFrame(
                {
                    "i": np.concatenate(out_i),
                    "j": np.concatenate(out_j),
                    "v6": np.concatenate(out_v),
                }
            )

    return nodes.mapInPandas(kernel, _OUT_SCHEMA)
