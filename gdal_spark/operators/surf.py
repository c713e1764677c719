"""SimpleSURF feature detection + matching (the GDAL correlator).

Port of ``alg/gdal_octave.cpp`` (GDALIntegralImage, GDALOctaveLayer,
GDALOctaveMap) + ``alg/gdal_simplesurf.cpp`` (GDALSimpleSURF) +
``alg/gdalmatching.cpp`` (GDALComputeMatchingPoints) at the reference's
default configuration: OCTAVE_START = OCTAVE_END = 2, INTERVALS = 4,
SURF_THRESHOLD = 0.001, MATCHING_THRESHOLD = 0.015.

EXACT-INTEGER STRENGTHENING (documented divergence, the repo's
established float->int pattern): the reference computes luminosity
``(0.21 r + 0.72 g + 0.07 b) / 255`` as doubles and accumulates the
integral image in floating point (gdal_simplesurf.cpp:180-182,
gdal_octave.cpp:50-68).  This engine keeps luminosity in EXACT integer
units ``L = 21 r + 72 g + 7 b`` (= lum * 25500), so the integral image,
every rectangle sum (gdal_octave.cpp:82-119 — boundary clamps ported
verbatim), every Haar wavelet, every descriptor entry, and every
squared descriptor distance are exact BIGINT arithmetic —
associativity-proof at any parallelism, zero float knife-edges.  The
only floating-point appears where the reference's thresholds live:
``dxx = (rect - 3 rect) / (fs^2 * 25500)`` (one exactly-determined IEEE
division back to reference units) and ``det = dxx*dyy - 0.9*0.9*
dxy*dxy`` — deterministic IEEE products with no libm, so engine and
oracle agree bitwise.  Scale invariances make the match decisions
IDENTICAL to continuous math: the descriptor unit cancels in the
0.8 nearest/2nd-nearest ratio (compared as ``25 d^2 < 16 d2^2``) and
in the normalized-distance gate (``40000 d^2 <= 9 max^2`` for the
0.015 threshold), both exact integer comparisons.

Hessian filter formulas (gdal_octave.cpp:184-206) are ported
byte-for-byte, including the asymmetric quirks (`c - lobe - 1` in the
outer dyy box, `c - (lobe - 1) / 2` center column of dxx): the quirks
ARE the reference semantics.

Matching (gdal_simplesurf.cpp:360-480) is the reference's sequential
greedy scan: the smaller collection drives (ties pick the SECOND
image), candidates in keypoint index order, `alreadyMatched`
exclusion, and the quirky 2nd-nearest tracker (best2 can only
decrease from the first candidate's distance, so a point whose
nearest neighbour is scanned FIRST is rejected with ratio 1) —
ported as-is; tests pin it against an order-free reformulation on
the fixture.

Distribution contract: feature extraction is per-image (one
applyInPandas group per image_id — images fan across executors, the
dither/curve_detect shape); matching is per image-pair (one group per
pair).  At 100 TB the corpus is millions of bounded-size image pairs.
Inside a group everything is numpy-vectorized except the greedy match
loop (O(n1*n2) over a few dozen keypoints).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

INTERVALS = 4  # gdal_simplesurf.h:403
OCTAVE = 2  # gdalmatching.cpp:180-182 defaults (start == end == 2)
SURF_THRESHOLD = 0.001
# MATCHING_THRESHOLD 0.015 = 3/200: dist/max <= 3/200  <=>
# 40000 dist^2 <= 9 max^2 exactly.
MATCH_NUM2, MATCH_DEN2 = 9, 40000
# ratio 0.8 = 4/5: dist/dist2 < 4/5  <=>  25 dist^2 < 16 dist2^2.
RATIO_NUM2, RATIO_DEN2 = 16, 25

_FEAT_SCHEMA = (
    "image_id int, kp int, x int, y int, scale int, radius int, sign int, "
    "quad int, dx long, dy long, adx long, ady long"
)
_MATCH_SCHEMA = (
    "pair_id int, match_idx int, x1 int, y1 int, x2 int, y2 int, "
    "scale1 int, scale2 int, sign int, dist2 long"
)


def integral_image(lum: np.ndarray) -> np.ndarray:
    """Summed-area table of exact-integer luminosity, padded so that
    P[r+1, c+1] == GDALIntegralImage::GetValue(r, c) and indices <= 0
    read the zero border (gdal_octave.cpp:50-79)."""
    h, w = lum.shape
    p = np.zeros((h + 1, w + 1), dtype=np.int64)
    p[1:, 1:] = lum.astype(np.int64).cumsum(axis=0).cumsum(axis=1)
    return p


def _get_value(p, r, c):
    """Vectorized GetValue: 0 outside [0, H) x [0, W)."""
    h, w = p.shape[0] - 1, p.shape[1] - 1
    r = np.asarray(r)
    c = np.asarray(c)
    ok = (r >= 0) & (r < h) & (c >= 0) & (c < w)
    rr = np.clip(r, -1, h - 1) + 1
    cc = np.clip(c, -1, w - 1) + 1
    return np.where(ok, p[rr, cc], 0)


def rect_sum(p, row, col, width, height):
    """GetRectangleSum (gdal_octave.cpp:82-119), boundary clamps
    verbatim; exact int64."""
    h, w = p.shape[0] - 1, p.shape[1] - 1
    row = np.asarray(row)
    col = np.asarray(col)
    lt_row = np.where(row <= h, row - 1, -1)
    lt_col = np.where(col <= w, col - 1, -1)
    rb_row = np.minimum(row + height - 1, h - 1)
    rb_col = np.minimum(col + width - 1, w - 1)
    a = _get_value(p, lt_row, lt_col)
    b = _get_value(p, lt_row, rb_col)
    c = _get_value(p, rb_row, rb_col)
    d = _get_value(p, rb_row, lt_col)
    return np.maximum(a + c - b - d, 0)


def haar_x(p, row, col, size):
    """HaarWavelet_X (gdal_octave.cpp:121-125), exact int64."""
    return rect_sum(p, row, col + size // 2, size // 2, size) - rect_sum(
        p, row, col, size // 2, size
    )


def haar_y(p, row, col, size):
    """HaarWavelet_Y (gdal_octave.cpp:127-131), exact int64."""
    return rect_sum(p, row + size // 2, col, size, size // 2) - rect_sum(
        p, row, col, size, size // 2
    )


def compute_layer(p, octave, interval):
    """GDALOctaveLayer::ComputeLayer (gdal_octave.cpp:156-208).

    Returns (det, sign, radius): det float64 (H, W) valid only inside
    [radius, size-radius] (exactly the region the reference fills),
    NaN elsewhere so an accidental out-of-region read fails loudly.
    """
    h, w = p.shape[0] - 1, p.shape[1] - 1
    fs = 3 * (2**octave) * interval + 1
    radius = (fs - 1) // 2
    lobe = fs // 3
    long_part = 2 * lobe - 1
    norm = fs * fs
    det = np.full((h, w), np.nan)
    sign = np.zeros((h, w), dtype=np.int64)
    if h - radius < radius or w - radius < radius:
        return det, sign, radius
    r = np.arange(radius, h - radius + 1)[:, None]
    c = np.arange(radius, w - radius + 1)[None, :]
    ixx = rect_sum(p, r - lobe + 1, c - radius, fs, long_part) - 3 * rect_sum(
        p, r - lobe + 1, c - (lobe - 1) // 2, lobe, long_part
    )
    iyy = rect_sum(p, r - radius, c - lobe - 1, long_part, fs) - 3 * rect_sum(
        p, r - lobe + 1, c - lobe + 1, long_part, lobe
    )
    ixy = (
        rect_sum(p, r - lobe, c - lobe, lobe, lobe)
        + rect_sum(p, r + 1, c + 1, lobe, lobe)
        - rect_sum(p, r - lobe, c + 1, lobe, lobe)
        - rect_sum(p, r + 1, c - lobe, lobe, lobe)
    )
    # back to reference units in ONE division each (lum = L / 25500,
    # then / normalization) — exact ints until here, IEEE after
    scale = float(norm * 25500)
    dxx = ixx / scale
    dyy = iyy / scale
    dxy = ixy / scale
    sl = (slice(radius, h - radius + 1), slice(radius, w - radius + 1))
    det[sl] = dxx * dyy - 0.9 * 0.9 * dxy * dxy
    sign[sl] = np.where(dxx + dyy >= 0, 1, -1)
    return det, sign, radius


def extract_features(p, threshold=SURF_THRESHOLD, octave=OCTAVE):
    """ExtractFeaturePoints (gdal_simplesurf.cpp:242-278): 3x3x3
    extremum scan over interval triples, keypoints in the reference's
    (interval, row, col) emission order."""
    h, w = p.shape[0] - 1, p.shape[1] - 1
    layers = [compute_layer(p, octave, i) for i in range(1, INTERVALS + 1)]
    scale = 2**octave
    kps = []  # (x, y, scale, radius, sign)
    for k in range(INTERVALS - 2):
        (bd, _, _), (md, ms, mrad), (td, _, trad) = (
            layers[k],
            layers[k + 1],
            layers[k + 2],
        )
        # PointIsExtremum guard (gdal_octave.cpp:247-252): strictly
        # inside the TOP layer's radius
        r0, r1 = trad + 1, h - trad - 1  # inclusive candidate rows
        c0, c1 = trad + 1, w - trad - 1
        if r1 < r0 or c1 < c0:
            continue
        cur = md[r0 : r1 + 1, c0 : c1 + 1]
        ok = cur >= threshold
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                tt = td[r0 + di : r1 + 1 + di, c0 + dj : c1 + 1 + dj]
                bb = bd[r0 + di : r1 + 1 + di, c0 + dj : c1 + 1 + dj]
                ok &= (tt < cur) & (bb < cur)
                if di != 0 or dj != 0:
                    mm = md[r0 + di : r1 + 1 + di, c0 + dj : c1 + 1 + dj]
                    ok &= mm < cur
        for i, j in zip(*np.nonzero(ok)):  # row-major == reference order
            rr, cc = r0 + i, c0 + j
            kps.append((cc, rr, scale, mrad, int(ms[rr, cc])))
    return kps


def set_descriptor(p, x, y, scale):
    """SetDescriptor (gdal_simplesurf.cpp:301-358): 4x4 quadrants of
    5x5 Haar samples; returns (16, 4) int64 [dx, dy, |dx|, |dy|] —
    exact integer sums in L units."""
    haar_filter = 2 * scale
    desc_side = 20 * scale
    quad_step = desc_side // 4
    sub_step = quad_step // 5
    lt_r = y - desc_side // 2
    lt_c = x - desc_side // 2
    out = np.zeros((16, 4), dtype=np.int64)
    q = 0
    for r in range(lt_r, lt_r + desc_side, quad_step):
        for c in range(lt_c, lt_c + desc_side, quad_step):
            sub_r = np.arange(r, r + quad_step, sub_step)[:, None]
            sub_c = np.arange(c, c + quad_step, sub_step)[None, :]
            cur_r = sub_r + sub_step // 2 - haar_filter // 2
            cur_c = sub_c + sub_step // 2 - haar_filter // 2
            hx = haar_x(p, cur_r, cur_c, haar_filter)
            hy = haar_y(p, cur_r, cur_c, haar_filter)
            out[q] = (
                hx.sum(),
                hy.sum(),
                np.abs(hx).sum(),
                np.abs(hy).sum(),
            )
            q += 1
    return out


def match_feature_points(feats1, feats2):
    """MatchFeaturePoints (gdal_simplesurf.cpp:364-480), greedy scan
    ported as-is (see module docstring).  feats* = list of
    (x, y, scale, sign, desc(16,4) int64).  Returns list of
    (i1, i2, dist2) index pairs into (feats1, feats2) with exact
    squared distances, post both pruning gates."""
    len_1, len_2 = len(feats1), len(feats2)
    if min(len_1, len_2) == len_2:
        p_1, p_2, swap = feats2, feats1, True
        len_1, len_2 = len_2, len_1
    else:
        p_1, p_2, swap = feats1, feats2, False
    matched = [False] * len_2
    pairs = []  # (i, bestIndex, dist2)
    for i in range(len_1):
        best = -1
        best_idx = -1
        best2 = -1
        for j in range(len_2):
            if matched[j] or p_1[i][3] != p_2[j][3]:
                continue
            d = int(((p_1[i][4] - p_2[j][4]) ** 2).sum())
            if best == -1 or d < best:
                best, best_idx = d, j
            if best2 < 0:
                best2 = d
            elif d > best and d < best2:
                best2 = d
        if best2 > 0 and best >= 0 and RATIO_DEN2 * best < RATIO_NUM2 * best2:
            pairs.append((i, best_idx, best))
            matched[best_idx] = True
    max2 = max((d for _, _, d in pairs), default=0)
    out = []
    for i, j, d in pairs:
        if MATCH_DEN2 * d <= MATCH_NUM2 * max2:
            out.append((j, i, d) if swap else (i, j, d))
    return out


def _image_features(lum: np.ndarray):
    """Keypoints + descriptors for one luminosity image (L units)."""
    p = integral_image(lum)
    kps = extract_features(p)
    return [
        (x, y, scale, sgn, set_descriptor(p, x, y, scale), radius)
        for (x, y, scale, radius, sgn) in kps
    ]


def surf_features(pix: DataFrame) -> DataFrame:
    """(image_id, px, py, lum) -> long-format keypoint descriptors:
    one row per (keypoint, quadrant); one applyInPandas group per
    image."""

    def _feat(pdf: pd.DataFrame) -> pd.DataFrame:
        img = int(pdf["image_id"].iloc[0])
        w = int(pdf["px"].max()) + 1
        h = int(pdf["py"].max()) + 1
        lum = np.zeros((h, w), dtype=np.int64)
        lum[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf[
            "lum"
        ].to_numpy()
        rows = []
        for kp, (x, y, scale, sgn, desc, radius) in enumerate(
            _image_features(lum)
        ):
            for q in range(16):
                rows.append(
                    (img, kp, x, y, scale, radius, sgn, q, *desc[q])
                )
        return pd.DataFrame(
            rows,
            columns=[
                "image_id",
                "kp",
                "x",
                "y",
                "scale",
                "radius",
                "sign",
                "quad",
                "dx",
                "dy",
                "adx",
                "ady",
            ],
        )

    return pix.groupBy("image_id").applyInPandas(_feat, _FEAT_SCHEMA)


def surf_match(pix: DataFrame) -> DataFrame:
    """(pair_id, image_id in {1, 2}, px, py, lum) -> matched GCP pairs
    per image pair (GDALComputeMatchingPoints semantics; pixel coords
    are the raw keypoint ints — the reference's +0.5 GCP shift is
    presentational).  One applyInPandas group per pair."""

    def _match(pdf: pd.DataFrame) -> pd.DataFrame:
        pair = int(pdf["pair_id"].iloc[0])
        feats = {}
        for img in (1, 2):
            sub = pdf[pdf["image_id"] == img]
            w = int(sub["px"].max()) + 1
            h = int(sub["py"].max()) + 1
            lum = np.zeros((h, w), dtype=np.int64)
            lum[sub["py"].to_numpy(), sub["px"].to_numpy()] = sub[
                "lum"
            ].to_numpy()
            feats[img] = _image_features(lum)
        rows = []
        for m, (i1, i2, d2) in enumerate(
            match_feature_points(feats[1], feats[2])
        ):
            f1, f2 = feats[1][i1], feats[2][i2]
            rows.append(
                (pair, m, f1[0], f1[1], f2[0], f2[1], f1[2], f2[2], f1[3], d2)
            )
        return pd.DataFrame(
            rows,
            columns=[
                "pair_id",
                "match_idx",
                "x1",
                "y1",
                "x2",
                "y2",
                "scale1",
                "scale2",
                "sign",
                "dist2",
            ],
        )

    return pix.groupBy("pair_id").applyInPandas(_match, _MATCH_SCHEMA)
