"""Median-cut palette computation + nearest-color assignment
(alg/gdalmediancut.cpp GDALComputeMedianCutPCT + alg/gdaldither.cpp's
nearest-color path; the rgb2pct.py workflow).

Spark-first decomposition:

  1. the color HISTOGRAM is distributed — one groupBy over (r, g, b)
     with map-side partial counts (the reference's in-memory 5-bit
     histogram, built as an aggregation instead of a scan);
  2. the median-cut box splitting runs driver-side on the histogram
     (dim-sized by construction: <= 2^15 bins at the reference's 5-bit
     quantization — same memory contract as the reference);
  3. the palette broadcasts back and every pixel takes its nearest
     entry (squared RGB distance, ties -> lowest palette index) in an
     Arrow-batched vectorized kernel.

DOCUMENTED DIVERGENCE from gdalmediancut.cpp's box selection: boxes are
chosen by largest pixel count and split on the longest tight axis at
the count median (classic Heckbert) with deterministic tie-breaks
(lowest r, then g, then b bound); the reference's scan-order-dependent
tie handling is not reproduced.  Floyd-Steinberg dithering
(gdaldither.cpp) is NOT implemented: its error diffusion makes every
pixel depend on the full scanline prefix — an inherently serial
recurrence that does not distribute; the nearest-color (no-dither)
assignment is the parallel path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def median_cut_palette(hist: pd.DataFrame, n_colors: int = 256) -> np.ndarray:
    """Heckbert median cut over a (r, g, b, cnt) histogram; returns an
    (n, 3) int palette of count-weighted box means."""
    cols = hist[["r", "g", "b"]].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    boxes = [np.arange(len(cols))]
    while len(boxes) < n_colors:
        # largest-count box that still has more than one distinct color
        best, best_n = -1, -1
        for bi, idx in enumerate(boxes):
            if len(idx) > 1 and cnt[idx].sum() > best_n:
                best, best_n = bi, cnt[idx].sum()
        if best < 0:
            break
        idx = boxes.pop(best)
        spans = cols[idx].max(axis=0) - cols[idx].min(axis=0)
        axis = int(np.argmax(spans))  # ties -> lowest channel index
        order = idx[np.lexsort((cols[idx, 2], cols[idx, 1], cols[idx, 0],
                                cols[idx, axis]))]
        csum = np.cumsum(cnt[order])
        half = csum[-1] / 2.0
        cut = int(np.searchsorted(csum, half)) + 1
        cut = min(max(cut, 1), len(order) - 1)
        boxes.append(order[:cut])
        boxes.append(order[cut:])
    pal = np.zeros((len(boxes), 3), dtype=np.int64)
    for bi, idx in enumerate(boxes):
        w = cnt[idx].astype(np.float64)
        pal[bi] = np.floor((cols[idx] * w[:, None]).sum(axis=0) / w.sum() + 0.5)
    # deterministic palette order (the box list order is split-history
    # dependent); callers match on COLOR, not index
    return pal[np.lexsort((pal[:, 2], pal[:, 1], pal[:, 0]))]


_PCT_SCHEMA = StructType(
    [
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("pr", IntegerType()),
        StructField("pg", IntegerType()),
        StructField("pb", IntegerType()),
    ]
)


def rgb_to_palette(
    pixels: DataFrame, n_colors: int = 256, bits: int = 5
) -> DataFrame:
    """rgb2pct: compute the median-cut palette of (px, py, r, g, b) and
    map every pixel to its nearest palette COLOR (pr, pg, pb).

    ``bits`` is the histogram quantization (the reference's 5-bit
    CMC_BITS keeps the collected histogram <= 2^15 rows regardless of
    image size; bits=8 histograms exact colors and is only safe when
    the color count is known small).  The histogram aggregation is the
    only shuffle; the palette is a plan-time broadcast (<= n_colors
    rows) and the assignment is map-side."""
    shift = 8 - bits
    q = lambda c: F.shiftright(F.col(c), shift) if shift else F.col(c)  # noqa: E731
    hist = (
        pixels.groupBy(
            q("r").alias("r"), q("g").alias("g"), q("b").alias("b")
        )
        .agg(F.count("*").alias("cnt"))
        .toPandas()
    )
    pal = median_cut_palette(hist, n_colors)
    if shift:
        # scale quantized palette entries back to 8-bit bin centers
        pal = (pal << shift) | (1 << (shift - 1))

    def assign(it):
        for pdf in it:
            rgb = pdf[["r", "g", "b"]].to_numpy(np.int64)
            d = ((rgb[:, None, :] - pal[None, :, :]) ** 2).sum(axis=2)
            j = np.argmin(d, axis=1)  # ties -> lowest palette index
            yield pd.DataFrame(
                {
                    "px": pdf["px"].astype(np.int32),
                    "py": pdf["py"].astype(np.int32),
                    "pr": pal[j, 0].astype(np.int32),
                    "pg": pal[j, 1].astype(np.int32),
                    "pb": pal[j, 2].astype(np.int32),
                }
            )

    return pixels.mapInPandas(assign, _PCT_SCHEMA)
