"""Segmentize kernel properties the ring oracle can't express: the
reference's direction canonicalization makes an open line and its
reverse densify to the same point sequence (ogrlinestring.cpp:
'same line followed in both directions')."""

import numpy as np

from gdal_spark.operators.densify import _segmentize_ring


def test_reverse_invariance():
    line = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 7.0]])
    fwd = _segmentize_ring(line, 3.0)
    rev = _segmentize_ring(line[::-1], 3.0)
    assert np.array_equal(fwd, rev[::-1])


def test_split_counts_and_spacing():
    line = np.array([[10.0, 7.0], [10.0, 0.0], [0.0, 0.0]])
    out = _segmentize_ring(line, 3.0)
    # 7-long edge: k = floor(7/3 - 0.01) = 2; 10-long: k = 3
    assert out.shape[0] == 3 + 2 + 3
    # intermediates sit at j*(d/(k+1)) from the segment start
    assert np.allclose(out[1], [10.0, 7.0 - 7.0 / 3.0])
    assert np.allclose(out[4], [10.0 - 10.0 / 4.0, 0.0])


def test_short_segments_untouched():
    line = np.array([[5.0, 5.0], [4.0, 5.0], [4.0, 4.0]])
    out = _segmentize_ring(line, 2.5)
    assert np.array_equal(out, line)


def test_exact_maxlen_not_split():
    # d2 == m2 fails the epsilon-guarded strict test, like the reference
    line = np.array([[3.0, 0.0], [0.0, 0.0]])
    out = _segmentize_ring(line, 3.0)
    assert out.shape[0] == 2
