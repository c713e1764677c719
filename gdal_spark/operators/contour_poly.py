"""Contour POLYGON assembly — gdal_contour -p (alg/contour.cpp,
``GDALContourGenerateEx`` with POLYGONIZE=YES).

The reference stitches interpolated iso-crossings into band polygons
serially across the whole raster.  The distributed decomposition here
observes that a band's final boundary consists of exactly two kinds of
edges, each of which can be emitted locally:

  1. **Iso segments** (marching squares at the band's lo and hi levels,
     the same case table as :func:`focal.contour_segments`) — each
     segment lives in exactly one 2x2 cell, so one halo-tile pass emits
     every segment exactly once per band, ORIENTED with the band
     interior on the left (bilinear midpoint probe).
  2. **Domain-boundary portions** — the sub-intervals of the outermost
     pixel-center square edges where the (linear along the edge) value
     lies in the band, walked CCW around the domain.

Interior cell edges never appear (both sides belong to the same band),
so there is NO cancellation shuffle: the tile pass emits the boundary
only — O(perimeter) rows, not O(area) — and ONE groupBy(band) chains
the directed edge soup into rings (interior-left walking makes shells
CCW and holes CW), assigns holes to shells by containment, and emits
canonical POLYGON WKT.  Per-band group size is the band's boundary
length, not its area, so the final assembly stays bounded at raster
scale.

Shared-formula discipline: every crossing coordinate uses the case
table's interpolation ``(lev - va) / (vb - va)`` with the table's fixed
operand order, so segment endpoints and boundary-portion endpoints are
bit-identical doubles; endpoints are then quantized to a 2^-20 grid for
exact chaining keys.

Documented divergences from the reference (same ones as
``contour_segments``): saddle cells split by the fixed non-connected
choice (the reference disambiguates by cell-center average), and output
coordinates are pixel-center (not georeferenced) with 2^-20 coordinate
quantization.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gdal_spark.geometry.ringchain import (
    chain_rings,
    fmt_q,
    group_shells_holes,
    quantize,
)
from gdal_spark.operators.focal import GRID_TILE, _with_halo_tiles

_EDGE_SCHEMA = StructType(
    [
        StructField("band", IntegerType()),
        StructField("ax", LongType()),
        StructField("ay", LongType()),
        StructField("bx", LongType()),
        StructField("by", LongType()),
    ]
)

_POLY_SCHEMA = StructType(
    [
        StructField("band_lo", DoubleType()),
        StructField("band_hi", DoubleType()),
        StructField("wkt", StringType()),
    ]
)

# marching-squares case table (same as focal.contour_segments)
_MS_TABLE = {
    1: [("l", "t")], 2: [("t", "r")], 3: [("l", "r")],
    4: [("r", "b")], 5: [("l", "t"), ("r", "b")], 6: [("t", "b")],
    7: [("l", "b")], 8: [("b", "l")], 9: [("b", "t")],
    10: [("t", "r"), ("b", "l")], 11: [("b", "r")],
    12: [("r", "l")], 13: [("r", "t")], 14: [("t", "l")],
}






# probe corner per segment: edges sharing a corner cut exactly that
# corner off; opposite-edge segments separate two corner pairs, any
# corner works — the corner's (dx, dy) offset from (gx, gy) plus its
# index into (v00, v10, v01, v11)
_SEG_PROBE = {
    ("l", "t"): (0, 0, 0), ("t", "l"): (0, 0, 0),
    ("t", "r"): (1, 0, 1), ("r", "t"): (1, 0, 1),
    ("r", "b"): (1, 1, 3), ("b", "r"): (1, 1, 3),
    ("b", "l"): (0, 1, 2), ("l", "b"): (0, 1, 2),
    ("t", "b"): (1, 0, 1), ("b", "t"): (1, 0, 1),
    ("l", "r"): (0, 0, 0), ("r", "l"): (0, 0, 0),
}


def _segments_for_cell(gx, gy, v00, v10, v01, v11, lev):
    """Case-table segments of one cell at ``lev`` in table operand
    order; returns [((x1,y1),(x2,y2), probe), ...] (pixel-center
    coords; ``probe`` = the _SEG_PROBE entry for orientation)."""
    b = (
        (1 if v00 > lev else 0)
        + 2 * (1 if v10 > lev else 0)
        + 4 * (1 if v11 > lev else 0)
        + 8 * (1 if v01 > lev else 0)
    )
    if b == 0 or b == 15:
        return []

    def interp(va, vb):
        return (lev - va) / (vb - va)

    def pt(edge):
        # computed only for edges the case actually crosses (va != vb
        # there by construction, so the interp denominator is nonzero)
        if edge == "t":
            return (gx + interp(v00, v10), float(gy))
        if edge == "r":
            return (gx + 1.0, gy + interp(v10, v11))
        if edge == "b":
            return (gx + interp(v01, v11), gy + 1.0)
        return (float(gx), gy + interp(v00, v01))

    return [
        (pt(ea), pt(eb), _SEG_PROBE[(ea, eb)]) for ea, eb in _MS_TABLE[b]
    ]


def _orient_above_left(p1, p2, probe, gx, gy, v00, v10, v01, v11, lev):
    """Return (a, b) such that walking a->b keeps the v>lev side on the
    LEFT.  Orientation is decided EXACTLY from the case structure: each
    segment's probe corner (_SEG_PROBE) lies strictly off the segment's
    supporting line and on a known side of the iso line, so the cross
    product's sign against the corner's above/below boolean fixes the
    direction — no epsilon probe, correct in ambiguous saddle cells
    where the fixed split contradicts the bilinear center."""
    dx, dy, vidx = probe
    cx, cy = gx + dx, gy + dy
    cross = (p2[0] - p1[0]) * (cy - p1[1]) - (p2[1] - p1[1]) * (cx - p1[0])
    above = (v00, v10, v01, v11)[vidx] > lev
    # corner LEFT of p1->p2 (cross > 0) and above => orientation correct
    if (cross > 0) == above:
        return p1, p2
    return p2, p1


def _band_edges(
    pixels: DataFrame, width: int, height: int, levels: list[float]
) -> DataFrame:
    """Directed boundary edges per band over halo tiles (see module doc).
    Band k = { v : levels[k-1] < v <= levels[k] } with open ends."""
    levels = list(levels)
    n_bands = len(levels) + 1

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
        cxs = np.arange(gtx * GRID_TILE, min((gtx + 1) * GRID_TILE, width - 1))
        cys = np.arange(gty * GRID_TILE, min((gty + 1) * GRID_TILE, height - 1))
        rows: list[tuple[int, int, int, int, int]] = []
        if cxs.size == 0 or cys.size == 0:
            return pd.DataFrame(rows, columns=_EDGE_SCHEMA.names)

        def cellv(cx, cy):
            lx, ly = cx - x0, cy - y0
            return (
                win[ly, lx],
                win[ly, lx + 1],
                win[ly + 1, lx],
                win[ly + 1, lx + 1],
            )

        def emit(band, a, b):
            qa = (quantize(a[0]), quantize(a[1]))
            qb = (quantize(b[0]), quantize(b[1]))
            if qa != qb:
                rows.append((band, qa[0], qa[1], qb[0], qb[1]))

        # ---- iso segments: crossing cells only (O(perimeter))
        lx = cxs - x0
        ly = cys - y0
        v00g = win[np.ix_(ly, lx)]
        v10g = win[np.ix_(ly, lx + 1)]
        v01g = win[np.ix_(ly + 1, lx)]
        v11g = win[np.ix_(ly + 1, lx + 1)]
        ok = ~np.isnan(v00g + v10g + v01g + v11g)
        for li, lev in enumerate(levels):
            b00 = v00g > lev
            b10 = v10g > lev
            b01 = v01g > lev
            b11 = v11g > lev
            case = (
                b00.astype(np.int8)
                + 2 * b10.astype(np.int8)
                + 4 * b11.astype(np.int8)
                + 8 * b01.astype(np.int8)
            )
            cyi, cxi = np.nonzero(ok & (case > 0) & (case < 15))
            for k in range(len(cxi)):
                cx = int(cxs[cxi[k]])
                cy = int(cys[cyi[k]])
                v00, v10, v01, v11 = cellv(cx, cy)
                for p1, p2, probe in _segments_for_cell(
                    cx, cy, v00, v10, v01, v11, lev
                ):
                    a, b = _orient_above_left(
                        p1, p2, probe, cx, cy, v00, v10, v01, v11, lev
                    )
                    emit(li + 1, a, b)  # band above lev: v>lev on the left
                    emit(li, b, a)  # band below: v<=lev on the left

        # ---- domain-boundary portions for owned boundary cell edges,
        # walked CCW (bottom +x, right +y, top -x, left -y); crossing
        # parameters use the case table's operand order so endpoints are
        # bit-identical with the iso segments.
        def boundary_portions(pa, va, pb, vb, ccw_forward):
            """Edge pa->pb in TABLE operand order with values va, vb;
            ``ccw_forward`` True when the CCW walk runs pa->pb."""
            for band in range(n_bands):
                lo = levels[band - 1] if band > 0 else None
                hi = levels[band] if band < len(levels) else None
                # membership: v > lo and v <= hi; find s-interval on [0,1]
                s0, s1 = 0.0, 1.0
                if va == vb:
                    if (lo is not None and not va > lo) or (
                        hi is not None and not va <= hi
                    ):
                        continue
                else:
                    for bound, keep_above in ((lo, True), (hi, False)):
                        if bound is None:
                            continue
                        t = (bound - va) / (vb - va)
                        if vb > va:
                            if keep_above:
                                s0 = max(s0, t)
                            else:
                                s1 = min(s1, t)
                        else:
                            if keep_above:
                                s1 = min(s1, t)
                            else:
                                s0 = max(s0, t)
                    if s0 >= s1:
                        continue
                p_of = lambda s: (  # noqa: E731
                    pa[0] + s * (pb[0] - pa[0]),
                    pa[1] + s * (pb[1] - pa[1]),
                )
                a, b = p_of(s0), p_of(s1)
                if ccw_forward:
                    emit(band, a, b)
                else:
                    emit(band, b, a)

        for k in range(len(cxs)):
            for j in range(len(cys)):
                cx, cy = int(cxs[k]), int(cys[j])
                v00, v10, v01, v11 = cellv(cx, cy)
                if np.isnan(v00 + v10 + v01 + v11):
                    continue
                if cy == 0:  # top edge of cell == domain bottom; CCW +x
                    boundary_portions(
                        (float(cx), 0.0), v00, (float(cx + 1), 0.0), v10, True
                    )
                if cy == height - 2:  # cell bottom == domain top; CCW -x
                    boundary_portions(
                        (float(cx), float(height - 1)),
                        v01,
                        (float(cx + 1), float(height - 1)),
                        v11,
                        False,
                    )
                if cx == 0:  # cell left == domain left; CCW -y
                    boundary_portions(
                        (0.0, float(cy)), v00, (0.0, float(cy + 1)), v01, False
                    )
                if cx == width - 2:  # cell right == domain right; CCW +y
                    boundary_portions(
                        (float(width - 1), float(cy)),
                        v10,
                        (float(width - 1), float(cy + 1)),
                        v11,
                        True,
                    )
        return pd.DataFrame(rows, columns=_EDGE_SCHEMA.names)

    return (
        _with_halo_tiles(pixels)
        .groupBy("gtx", "gty")
        .applyInPandas(kernel, _EDGE_SCHEMA)
    )








def _ring_wkt(ring) -> str:
    # canonical start: lexicographically smallest vertex
    i0 = min(range(len(ring)), key=lambda i: ring[i])
    r = ring[i0:] + ring[:i0]
    pts = ", ".join(f"{fmt_q(x)} {fmt_q(y)}" for x, y in r + [r[0]])
    return f"({pts})"




def contour_polygons(
    pixels: DataFrame, width: int, height: int, levels: list[float]
) -> DataFrame:
    """Band polygons (gdal_contour -p): one row per polygon with its
    band bounds (NULL = open end) and canonical WKT (shell CCW, holes
    CW, canonical ring starts, collinear vertices collapsed)."""
    levels = [float(v) for v in levels]

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(key[0])
        lo = levels[band - 1] if band > 0 else None
        hi = levels[band] if band < len(levels) else None
        edges = [
            ((int(r.ax), int(r.ay)), (int(r.bx), int(r.by)))
            for r in pdf.itertuples()
        ]
        groups = group_shells_holes(chain_rings(edges))
        rows = []
        for rings_ in groups:
            shell, hs = rings_[0], sorted(rings_[1:], key=min)
            wkt = "POLYGON (" + ", ".join(_ring_wkt(r) for r in [shell] + hs) + ")"
            rows.append((lo, hi, wkt))
        return pd.DataFrame(rows, columns=_POLY_SCHEMA.names)

    edges = _band_edges(pixels, width, height, levels)
    return edges.groupBy("band").applyInPandas(assemble, _POLY_SCHEMA)
