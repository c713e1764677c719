"""Floyd-Steinberg dither kernel pins (operators/dither.py).

The kernel is matched against an INDEPENDENT scatter-style
implementation written here: 2-D error-accumulation array instead of
the reference's rolling (W+2)*3 buffer, python min(key) nearest-color
instead of np.argmin, no cube cache — same semantics, different
structure (the registry oracle is a third implementation, a DuckDB
recursive CTE).
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.dither import dither_image

PAL = [
    (0, 0, 0),
    (255, 0, 0),
    (0, 255, 0),
    (0, 0, 255),
    (255, 255, 0),
    (255, 0, 255),
    (0, 255, 255),
    (255, 255, 255),
    (128, 128, 128),
    (64, 192, 96),
]


def _nearest_center(pal, r, g, b):
    cr = ((r >> 3) * 255) // 31
    cg = ((g >> 3) * 255) // 31
    cb = ((b >> 3) * 255) // 31
    dists = [
        (abs(cr - p[0]) + abs(cg - p[1]) + abs(cb - p[2]), j)
        for j, p in enumerate(pal)
    ]
    return min(dists)[1]


def _trunc6(e: int) -> int:
    return int(e / 6)  # float division + int() truncates toward zero


def fs_scatter(r, g, b, pal, sixth=_trunc6):
    """Scatter-style FS dither: errors pushed into a (H+1, W+2, 3)
    accumulation array addressed by absolute (row, col)."""
    h, w = r.shape
    acc = np.zeros((h + 1, w + 2, 3), dtype=np.int64)  # col offset +1
    out = np.zeros((h, w), dtype=np.int64)
    for row in range(h):
        last = [0, 0, 0]
        for i in range(w):
            vals = []
            for ch, plane in enumerate((r, g, b)):
                base = min(255, max(0, int(plane[row, i]) + int(acc[row, i + 1, ch])))
                vals.append(min(255, max(0, base + last[ch])))
            idx = _nearest_center(pal, *vals)
            out[row, i] = idx
            for ch in range(3):
                e = vals[ch] - pal[idx][ch]
                s = sixth(e)
                acc[row + 1, i, ch] += s  # down-left
                acc[row + 1, i + 1, ch] += e - 5 * s  # down
                acc[row + 1, i + 2, ch] += s  # down-right
                last[ch] = 2 * s
    return out


def _rand_image(rng, h, w):
    r = rng.integers(0, 256, (h, w))
    g = rng.integers(0, 256, (h, w))
    b = rng.integers(0, 256, (h, w))
    # plant extremes so both clamp branches and negative errors run
    r[0, 0] = g[0, 0] = b[0, 0] = 255
    r[-1, -1] = g[-1, -1] = b[-1, -1] = 0
    return r, g, b


@pytest.mark.parametrize("seed", range(6))
def test_kernel_matches_independent_scatter(seed):
    rng = np.random.default_rng(seed)
    h, w = 9, 7
    r, g, b = _rand_image(rng, h, w)
    a = dither_image(r, g, b, PAL)
    e = fs_scatter(r, g, b, PAL)
    assert np.array_equal(a, e)


def test_truncation_toward_zero_is_load_bearing():
    """A floor-division mutant must diverge on data with negative
    errors — proves the C trunc semantics are actually exercised."""
    rng = np.random.default_rng(99)
    diverged = False
    for _ in range(8):
        r, g, b = _rand_image(rng, 9, 7)
        a = fs_scatter(r, g, b, PAL)
        m = fs_scatter(r, g, b, PAL, sixth=lambda e: e // 6)
        if not np.array_equal(a, m):
            diverged = True
            break
    assert diverged


def test_tie_first_palette_entry_wins():
    # cube cell center for value 64..71 is (64>>3)*255//31 = 65;
    # palette entries at 63 and 67 are both L1 distance 2 -> first wins
    pal = [(63, 0, 0), (67, 0, 0)]
    img = np.full((1, 1), 64, dtype=np.int64)
    zeros = np.zeros((1, 1), dtype=np.int64)
    out = dither_image(img, zeros, zeros, pal)
    assert out[0, 0] == 0


def test_error_diffusion_changes_output_vs_no_dither():
    """On a flat mid-gray image with a black/white palette, plain
    nearest-color is constant; FS dithering must mix both entries in
    roughly the gray's proportion (the whole point of dithering)."""
    pal = [(0, 0, 0), (255, 255, 255)]
    h, w = 16, 16
    img = np.full((h, w), 100, dtype=np.int64)
    out = dither_image(img, img.copy(), img.copy(), pal)
    frac_white = out.mean()
    assert 0 < frac_white < 1
    # 100/255 = 0.392; dithering approximates the mean value
    assert abs(frac_white - 100 / 255) < 0.08


def test_clamp_branches():
    # saturated planes with an out-of-gamut palette force both clamps
    pal = [(200, 200, 200)]
    hi = np.full((3, 5), 255, dtype=np.int64)
    lo = np.zeros((3, 5), dtype=np.int64)
    assert (dither_image(hi, hi.copy(), hi.copy(), pal) == 0).all()
    assert (dither_image(lo, lo.copy(), lo.copy(), pal) == 0).all()
    a = fs_scatter(hi, hi.copy(), hi.copy(), pal)
    assert (a == 0).all()
