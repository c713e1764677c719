"""Zone coverage — union-of-geometries area per zone.

Completes the overlay family (SURVEY §2.3): OGR's Union / SymDifference
(ogrlayer.cpp:3763, 4300) need ``area(union of A-pieces)`` per method
feature, which pairwise sums overcount when the A layer self-overlaps
(doc rectangles do).  For axis-aligned pieces the union area is computed
EXACTLY per zone with coordinate compression: sort the distinct xs/ys of
all pieces, mark covered grid cells, sum cell areas — O(n² log n) per
zone on n pieces, vectorized numpy, one applyInPandas group per zone
(the zone is the natural shuffle key; piece counts per zone are bounded
by zone size, not corpus size).

Outputs per zone: covered_area (A ∩ zone, deduplicated) and
uncovered_area (zone − A) — together the B-side terms of Union and
SymDifference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def rect_union_area(rects: np.ndarray) -> float:
    """Exact union area of axis-aligned rects (N,4: xmin,ymin,xmax,ymax)."""
    if len(rects) == 0:
        return 0.0
    xs = np.unique(np.concatenate([rects[:, 0], rects[:, 2]]))
    ys = np.unique(np.concatenate([rects[:, 1], rects[:, 3]]))
    if len(xs) < 2 or len(ys) < 2:
        return 0.0
    # cell (i,j) covered iff some rect spans it; vectorize over rects
    x0 = np.searchsorted(xs, rects[:, 0])
    x1 = np.searchsorted(xs, rects[:, 2])
    y0 = np.searchsorted(ys, rects[:, 1])
    y1 = np.searchsorted(ys, rects[:, 3])
    covered = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
    for k in range(len(rects)):
        covered[x0[k] : x1[k], y0[k] : y1[k]] = True
    wx = np.diff(xs)
    wy = np.diff(ys)
    return float((covered * wx[:, None] * wy[None, :]).sum())


def zone_coverage(pieces: DataFrame, zones: DataFrame) -> DataFrame:
    """From intersection pieces (doc_id, zone_id, piece env cols) compute
    per-zone covered/uncovered areas.

    ``pieces`` must carry piece envelope columns pxmin/pymin/pxmax/pymax;
    ``zones`` must carry zone_id + zxmin/zymin/zxmax/zymax.
    """
    schema = StructType(
        [
            StructField("zone_id", LongType()),
            StructField("covered_area", DoubleType()),
        ]
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        rects = pdf[["pxmin", "pymin", "pxmax", "pymax"]].to_numpy(np.float64)
        return pd.DataFrame(
            {"zone_id": [key[0]], "covered_area": [rect_union_area(rects)]}
        )

    cov = pieces.groupBy("zone_id").applyInPandas(kernel, schema)
    z = zones.select(
        "zone_id",
        (
            (F.col("zxmax") - F.col("zxmin")) * (F.col("zymax") - F.col("zymin"))
        ).alias("zone_area"),
    )
    out = z.join(cov, "zone_id", "left").fillna({"covered_area": 0.0})
    return out.select(
        "zone_id",
        "covered_area",
        (F.col("zone_area") - F.col("covered_area")).alias("uncovered_area"),
    )
