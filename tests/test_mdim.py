"""Multidim surface pins (operators/mdim.py).

GetView adopts NumPy basic-slicing semantics verbatim
(gdalmultidim.cpp:5684-5686 cites the NumPy docs), so numpy itself is
the ground truth: the view machinery is pinned against real numpy
indexing on randomized slice expressions.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.mdim import (
    MDim,
    _normalize_slice,
    linearize,
    mdim_stats,
    mdim_transpose,
    mdim_unscale,
    mdim_view,
    parse_view,
)


def _np_indices(start, stop, step, n):
    """Ground truth: the indices numpy selects for slice(start,stop,step)."""
    return list(range(*slice(start, stop, step).indices(n)))


@pytest.mark.parametrize("n", [1, 2, 5, 10])
def test_normalize_matches_numpy(n):
    vals = [None, 0, 1, 2, n - 1, n, n + 3, -1, -2, -n, -n - 3]
    steps = [1, 2, 3, -1, -2, n]
    for start in vals:
        for stop in vals:
            for step in steps:
                s, e, st, size = _normalize_slice(start, stop, step, n)
                want = _np_indices(start, stop, step, n)
                got = list(range(s, e, st))
                assert got == want, (start, stop, step, n)
                assert size == len(want)


def test_parse_view_ellipsis_and_newaxis():
    dims = [MDim("a", 4), MDim("b", 5), MDim("c", 6)]
    ops = parse_view("[1,...,newaxis,2]", dims)
    assert ops == [
        ("int", 1),
        ("slice", None, None, 1),
        ("newaxis",),
        ("int", 2),
    ]
    with pytest.raises(ValueError):
        parse_view("[...,...]", dims)
    with pytest.raises(ValueError):
        parse_view("[1,2,3,4]", dims)
    with pytest.raises(ValueError):
        parse_view("[::0]", dims)


def _collect(df, dims):
    """Materialize a tabular MDArray back into a dense numpy array."""
    shape = tuple(d.size for d in dims)
    arr = np.full(shape, -1, dtype=np.int64)
    for row in df.collect():
        key = tuple(row[d.name] for d in dims)
        arr[key] = row["value"]
    assert (arr >= 0).all()  # every output cell materialized exactly once
    return arr


def _mk(spark, shape):
    import pandas as pd

    idx = np.indices(shape).reshape(len(shape), -1)
    names = ["d%d" % i for i in range(len(shape))]
    data = {n: idx[i] for i, n in enumerate(names)}
    data["value"] = np.arange(idx.shape[1])
    return (
        spark.createDataFrame(pd.DataFrame(data)),
        [MDim(n, s) for n, s in zip(names, shape)],
    )


VIEW_CASES = [
    ((2, 4), "[1,2]"),
    ((2, 4), "[1]"),
    ((2, 4), "[:,2]"),
    ((2, 4), "[:,2:3:]"),
    ((2, 4), "[...,2]"),
    ((2, 4), "[:,::2]"),
    ((2, 4), "[:,1::2]"),
    ((2, 4), "[:,1:3:]"),
    ((2, 4), "[::-1,:]"),
    ((3, 4, 5), "[1:3,3::-2,::-1]"),
    ((3, 4, 5), "[...,4:1:-1]"),
    ((3, 4, 5), "[-1,-3:,:]"),
]


@pytest.mark.parametrize("shape,expr", VIEW_CASES)
def test_view_matches_numpy(spark, shape, expr):
    df, dims = _mk(spark, shape)
    ref = np.arange(int(np.prod(shape))).reshape(shape)
    key = eval("np.s_" + expr, {"np": np})  # the doc's own numpy semantics
    want = ref[key]
    out, odims = mdim_view(df, dims, expr)
    # integer indexing drops dims; squeeze nothing on the numpy side
    assert tuple(d.size for d in odims) == want.shape
    if want.ndim:
        got = _collect(out, odims)
        assert np.array_equal(got, want)
    else:
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["value"] == int(want)


def test_view_newaxis(spark):
    df, dims = _mk(spark, (2, 3))
    out, odims = mdim_view(df, dims, "[newaxis,...]")
    assert [d.size for d in odims] == [1, 2, 3]
    got = _collect(out, odims)
    assert np.array_equal(got, np.arange(6).reshape(1, 2, 3))


def test_empty_view_rejected(spark):
    df, dims = _mk(spark, (2, 3))
    with pytest.raises(ValueError):
        mdim_view(df, dims, "[1:1,:]")  # zero-size dim: gdalmultidim.cpp:5733
    with pytest.raises(IndexError):
        mdim_view(df, dims, "[5,:]")


def test_transpose_linearize(spark):
    df, dims = _mk(spark, (2, 3, 4))
    df2, tdims = mdim_transpose(df, dims, [2, 0, 1])
    assert [d.name for d in tdims] == ["d2", "d0", "d1"]
    lin = linearize(df2, tdims).collect()
    ref = np.arange(24).reshape(2, 3, 4).transpose(2, 0, 1)
    flat = ref.reshape(-1)
    for row in lin:
        assert flat[row["pos"]] == row["value"]
    with pytest.raises(ValueError):
        mdim_transpose(df, dims, [0, 0, 1])


def test_unscale_and_stats(spark):
    import pandas as pd

    pdf = pd.DataFrame({"value": [0, 10, 255, 20, 255]})
    df = spark.createDataFrame(pdf)
    un = mdim_unscale(df, 0.5, 1.0, nodata=255).collect()
    vals = sorted((r["value"] for r in un), key=lambda v: (v is None, v))
    assert vals[:3] == [1.0, 6.0, 11.0] and vals[3] is None and vals[4] is None
    st = mdim_stats(df, "t", nodata=255).collect()[0]
    assert (st["n_valid"], st["vmin"], st["vmax"]) == (3, 0, 20)
    assert (st["vsum"], st["vsumsq"]) == (30, 500)
