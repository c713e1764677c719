"""SimpleSURF kernel pins (operators/surf.py).

Pure-python tests: rectangle-sum semantics vs brute force (including
the reference's boundary-clamp quirks), Hessian layer values vs a
direct box-filter evaluation, descriptor translation-exactness, the
greedy matcher's planted fixture outcomes, and greedy == order-free —
the assumption the SQL oracle's exclusion-free matcher rests on.
"""

import numpy as np
import pytest

from gdal_spark.operators.surf import (
    MATCH_DEN2,
    MATCH_NUM2,
    RATIO_DEN2,
    RATIO_NUM2,
    _image_features,
    compute_layer,
    extract_features,
    integral_image,
    match_feature_points,
    rect_sum,
    set_descriptor,
)

W, H = 208, 144


def render(blobs, w=W, h=H):
    py, px = np.mgrid[0:h, 0:w]
    v = np.zeros((h, w), dtype=np.int64)
    for bx, by, amp, coef in blobs:
        v += np.maximum(0, amp - coef * ((px - bx) ** 2 + (py - by) ** 2))
    return 100 * np.minimum(v, 255)


# The frozen registry fixture (registry.py _SURF_BLOBS): image-1-only
# blob at (185,40); image 2 = blobs 2-5 shifted (5,3), last amp 220->218
BLOBS1 = [
    (185, 40, 240, 3),
    (55, 50, 240, 3),
    (55, 75, 200, 2),
    (55, 100, 180, 3),
    (120, 70, 220, 5),
]
BLOBS2 = [
    (bx + 5, by + 3, amp if i != 4 else 218, coef)
    for i, (bx, by, amp, coef) in enumerate(BLOBS1)
    if i != 0
]


class TestRectSum:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 1000, size=(12, 17)).astype(np.int64)
        p = integral_image(img)
        for row, col, w_, h_ in [
            (0, 0, 5, 4),
            (3, 2, 17, 12),
            (-3, -4, 6, 6),  # clipped top-left
            (10, 15, 6, 6),  # clipped bottom-right
            (5, 5, 1, 1),
            (-10, -10, 3, 3),  # fully outside -> lt=-1, rb<0 -> 0
        ]:
            got = int(rect_sum(p, row, col, w_, h_))
            r0, r1 = max(row, 0), min(row + h_, 12)
            c0, c1 = max(col, 0), min(col + w_, 17)
            want = int(img[r0:r1, c0:c1].sum()) if r1 > r0 and c1 > c0 else 0
            assert got == want, (row, col, w_, h_)

    def test_far_right_quirk(self):
        # col > W: the reference clamps lt_col to -1 and rb to W-1, so
        # the "rectangle" silently becomes cols [0, W) — ported as-is
        # (gdal_octave.cpp:93-96)
        img = np.arange(12, dtype=np.int64).reshape(3, 4)
        p = integral_image(img)
        got = int(rect_sum(p, 1, 5, 2, 1))  # col=5 > W=4
        assert got == int(img[1, :].sum())


class TestLayers:
    def test_hessian_against_direct_boxes(self):
        lum = render(BLOBS1)
        p = integral_image(lum)
        det, sign, radius = compute_layer(p, 2, 1)  # fs=13
        fs, lobe = 13, 4
        long_part = 2 * lobe - 1
        r, c = 40, 60
        dxx = int(
            rect_sum(p, r - lobe + 1, c - radius, fs, long_part)
        ) - 3 * int(
            rect_sum(p, r - lobe + 1, c - (lobe - 1) // 2, lobe, long_part)
        )
        dyy = int(
            rect_sum(p, r - radius, c - lobe - 1, long_part, fs)
        ) - 3 * int(rect_sum(p, r - lobe + 1, c - lobe + 1, long_part, lobe))
        dxy = (
            int(rect_sum(p, r - lobe, c - lobe, lobe, lobe))
            + int(rect_sum(p, r + 1, c + 1, lobe, lobe))
            - int(rect_sum(p, r - lobe, c + 1, lobe, lobe))
            - int(rect_sum(p, r + 1, c - lobe, lobe, lobe))
        )
        s = float(fs * fs * 25500)
        want = (dxx / s) * (dyy / s) - 0.9 * 0.9 * (dxy / s) * (dxy / s)
        assert det[r, c] == want

    def test_uncomputed_region_is_nan(self):
        p = integral_image(render(BLOBS1))
        det, _, radius = compute_layer(p, 2, 4)  # fs=49, radius=24
        assert np.isnan(det[0, 0]) and np.isnan(det[radius - 1, radius])
        assert np.isfinite(det[radius, radius])


class TestFixtureOutcomes:
    @pytest.fixture(scope="class")
    def feats(self):
        return (
            _image_features(render(BLOBS1)),
            _image_features(render(BLOBS2)),
        )

    def test_keypoint_counts_and_swap_orientation(self, feats):
        f1, f2 = feats
        # image 2 must be the smaller collection (exercises the swap)
        assert len(f2) < len(f1)
        # the image-1-only blob yields the FIRST keypoint (smallest y)
        # of sign -1 — the best2 anchor the oracle equivalence needs
        assert f1[0][:2] == (184, 42) and f1[0][3] == -1

    def test_translation_exact_descriptors(self, feats):
        f1, f2 = feats
        # every image-2 keypoint is an exact (+5,+3) translate of an
        # image-1 keypoint except the amplitude-modified blob
        by_pos1 = {(x, y): d for x, y, s, g, d, _ in f1}
        exact = 0
        for x, y, s, g, d, _ in f2:
            src = by_pos1.get((x - 5, y - 3))
            assert src is not None
            if (src == d).all():
                exact += 1
        assert exact == len(f2) - 1  # all but the modified blob

    def test_planted_match_outcomes(self, feats):
        f1, f2 = feats
        m = match_feature_points(f1, f2)
        got = sorted((f1[a][:2], f2[b][:2], d) for a, b, d in m)
        assert got == [
            ((54, 52), (59, 55), 0),
            ((54, 77), (59, 80), 0),
            ((54, 103), (59, 106), 0),
            ((67, 65), (72, 68), 0),
            ((67, 91), (72, 94), 0),
        ]
        # the first-scanned saddle pair self-rejects (best2 quirk) and
        # the modified pair fails the 0.015 gate: both absent
        matched1 = {f1[a][:2] for a, _, _ in m}
        assert (63, 63) not in matched1  # quirk rejection
        assert (119, 73) not in matched1  # gate rejection
        assert (184, 42) not in matched1  # image-1-only blob

    def test_greedy_equals_order_free(self, feats):
        # The SQL oracle omits alreadyMatched (sequential state); pin
        # that on this fixture the greedy scan and the exclusion-free
        # scan produce identical pairs.
        f1, f2 = feats
        if min(len(f1), len(f2)) == len(f2):
            p1, p2, swap = f2, f1, True
        else:
            p1, p2, swap = f1, f2, False
        pre = []
        for i in range(len(p1)):
            best = -1
            bi = -1
            best2 = -1
            for j in range(len(p2)):
                if p1[i][3] != p2[j][3]:
                    continue
                d = int(((p1[i][4] - p2[j][4]) ** 2).sum())
                if best == -1 or d < best:
                    best, bi = d, j
                if best2 < 0:
                    best2 = d
                elif d > best and d < best2:
                    best2 = d
            if (
                best2 > 0
                and best >= 0
                and RATIO_DEN2 * best < RATIO_NUM2 * best2
            ):
                pre.append((i, bi, best))
        mx = max((d for *_, d in pre), default=0)
        order_free = [
            ((j, i, d) if swap else (i, j, d))
            for i, j, d in pre
            if MATCH_DEN2 * d <= MATCH_NUM2 * mx
        ]
        assert match_feature_points(f1, f2) == order_free

    def test_descriptor_shape_and_units(self, feats):
        f1, _ = feats
        x, y, scale, sgn, desc, radius = f1[1]
        assert desc.shape == (16, 4) and desc.dtype == np.int64
        # |dx| <= abs_dx, |dy| <= abs_dy always
        assert (np.abs(desc[:, 0]) <= desc[:, 2]).all()
        assert (np.abs(desc[:, 1]) <= desc[:, 3]).all()
        # spot-check one quadrant against a direct recomputation
        p = integral_image(render(BLOBS1))
        assert (set_descriptor(p, x, y, scale) == desc).all()


class TestExtraction:
    def test_flat_image_no_keypoints(self):
        p = integral_image(np.zeros((96, 96), dtype=np.int64))
        assert extract_features(p) == []

    def test_threshold_gates_detection(self):
        lum = render([(48, 48, 30, 3)], w=96, h=96)  # faint blob
        p = integral_image(lum)
        strong = extract_features(p, threshold=1e-9)
        weak = extract_features(p, threshold=1e6)
        assert weak == [] and len(strong) >= len(weak)
