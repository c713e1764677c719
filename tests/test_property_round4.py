"""Hypothesis pins for the round-4 closed-form math: the block-aligned
refresh window and the retile candidate-interval derivation (pure
Python — no Spark session)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.operators.raster import refresh_window


@settings(max_examples=300, deadline=None)
@given(
    x0=st.floats(0, 500, allow_nan=False),
    w=st.floats(0.5, 300, allow_nan=False),
    y0=st.floats(0, 300, allow_nan=False),
    h=st.floats(0.5, 200, allow_nan=False),
    block=st.sampled_from([4, 8, 16, 32]),
)
def test_refresh_window_covers_and_aligns(x0, w, y0, h, block):
    bx0, bx1, by0, by1 = refresh_window(x0, y0, x0 + w, y0 + h, block)
    # block-aligned
    assert all(v % block == 0 for v in (bx0, bx1, by0, by1))
    # covers the raw overview window
    ox0, ox1 = math.floor(x0 / 2), math.ceil((x0 + w) / 2)
    oy0, oy1 = math.floor(y0 / 2), math.ceil((y0 + h) / 2)
    assert bx0 <= ox0 and bx1 >= ox1 and by0 <= oy0 and by1 >= oy1
    # minimal: shrinking any side by one block loses coverage
    assert bx0 + block > ox0 and bx1 - block < ox1
    assert by0 + block > oy0 and by1 - block < oy1


def _brute_tiles(px, size, tile, stride, count):
    out = []
    for xi in range(1, count + 1):
        off = (xi - 1) * stride
        width = min(tile, size - off)
        if off <= px < off + width:
            out.append(xi)
    return out


@settings(max_examples=300, deadline=None)
@given(
    size=st.integers(10, 600),
    tile=st.integers(2, 200),
    ov=st.integers(0, 150),
    data=st.data(),
)
def test_retile_candidate_interval(size, tile, ov, data):
    if ov >= tile:
        ov = tile - 1
    stride = tile - ov
    count = 1 + (
        -(-(size - tile) // stride) if size > tile else 0
    )
    px = data.draw(st.integers(0, size - 1))
    # the registry's closed-form candidate interval
    lo = max(1, math.floor((px - tile) / float(stride)) + 2)
    hi = min(count, math.floor(px / float(stride)) + 1)
    got = list(range(lo, hi + 1))
    assert got == _brute_tiles(px, size, tile, stride, count)
