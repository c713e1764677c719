"""Segmentize / densify (ogr2ogr -segmentize; OGRSimpleCurve::segmentize,
ogr/ogrlinestring.cpp — "So as to make sure that the same line followed
in both directions result in the same segmentized line").

Reference semantics, ported op-for-op so the SQL oracle can share the
formula text:

  * direction canonicalization: if (x0 < xN) or (x0 == xN and y0 < yN)
    the curve is processed reversed and the output reversed back
    (closed rings never reverse: first == last);
  * per segment with d² = dx²+dy²: split iff d² − m² > 1e-5·m²
    (REL_EPSILON_LENGTH_SQUARE); intermediate count
    k = floor(sqrt(d²/m²) − 1e-2) (REL_EPSILON_ROUND);
  * intermediates at P_i + j·(d/(k+1)) for j = 1..k — NOT at exact
    fractions of the segment, the ratio division happens first.

The kernel is Arrow-batched and vectorized per ring (np.repeat/cumsum
emit — no per-vertex Python), one output row per densified vertex.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from gdal_spark.geometry.wkt import parse_wkt

_SEG_SCHEMA = StructType(
    [
        StructField("zone_id", LongType()),
        StructField("ring", IntegerType()),
        StructField("seq", IntegerType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
    ]
)


def _segmentize_ring(pts: np.ndarray, max_length: float) -> np.ndarray:
    """Densify one point sequence (n x 2).  Mirrors the two-pass loop of
    OGRSimpleCurve::segmentize as a single vectorized pass."""
    n = pts.shape[0]
    if n < 2:
        return pts
    reverse = pts[0, 0] < pts[-1, 0] or (
        pts[0, 0] == pts[-1, 0] and pts[0, 1] < pts[-1, 1]
    )
    if reverse:
        pts = pts[::-1]
    m2 = max_length * max_length
    dx = pts[1:, 0] - pts[:-1, 0]
    dy = pts[1:, 1] - pts[:-1, 1]
    d2 = dx * dx + dy * dy
    split = (d2 - m2) > 1e-5 * m2
    k = np.where(split, np.floor(np.sqrt(d2 / m2) - 1e-2), 0.0).astype(np.int64)
    counts = 1 + k  # the segment's start vertex plus its intermediates
    total = int(counts.sum()) + 1
    seg = np.repeat(np.arange(n - 1), counts)
    start = np.concatenate(([0], np.cumsum(counts)))[:-1]
    j = (np.arange(total - 1) - np.repeat(start, counts)).astype(np.float64)
    ratio_x = dx / (k + 1.0)
    ratio_y = dy / (k + 1.0)
    out = np.empty((total, 2), dtype=np.float64)
    out[:-1, 0] = pts[seg, 0] + j * ratio_x[seg]
    out[:-1, 1] = pts[seg, 1] + j * ratio_y[seg]
    out[-1] = pts[-1]
    if reverse:
        out = out[::-1]
    return out


def segmentize(
    zones: DataFrame,
    max_length: float,
    wkt_col: str = "geom_wkt",
    zone_id_col: str = "zone_id",
) -> DataFrame:
    """Densify every ring of every (MULTI)POLYGON so no segment exceeds
    ``max_length``; one row per output vertex:
    (zone_id, ring, seq, x, y).  ``ring`` indexes shell=0, holes=1..;
    for multipolygons ring numbering continues across parts."""

    def kernel(it):
        for pdf in it:
            zid_out, ring_out, seq_out, xs, ys = [], [], [], [], []
            for zid, wkt in zip(pdf[zone_id_col], pdf[wkt_col]):
                typ, payload = parse_wkt(wkt)
                polys = payload if typ == "MULTIPOLYGON" else [payload]
                ridx = 0
                for rings in polys:
                    for ring in rings:
                        out = _segmentize_ring(
                            np.asarray(ring, dtype=np.float64), max_length
                        )
                        cnt = out.shape[0]
                        zid_out.append(np.full(cnt, zid, dtype=np.int64))
                        ring_out.append(np.full(cnt, ridx, dtype=np.int32))
                        seq_out.append(np.arange(cnt, dtype=np.int32))
                        xs.append(out[:, 0])
                        ys.append(out[:, 1])
                        ridx += 1
            if not zid_out:
                yield pd.DataFrame(
                    {"zone_id": [], "ring": [], "seq": [], "x": [], "y": []}
                ).astype(
                    {"zone_id": np.int64, "ring": np.int32, "seq": np.int32}
                )
                continue
            yield pd.DataFrame(
                {
                    "zone_id": np.concatenate(zid_out),
                    "ring": np.concatenate(ring_out),
                    "seq": np.concatenate(seq_out),
                    "x": np.concatenate(xs),
                    "y": np.concatenate(ys),
                }
            )

    return zones.select(zone_id_col, wkt_col).mapInPandas(kernel, _SEG_SCHEMA)
