"""Median-cut quantization: the registry oracle pins the <=256-distinct
identity case; these pin the actual SPLIT path (>256 colors)."""

import numpy as np
import pandas as pd

from gdal_spark.operators.mediancut import median_cut_palette, rgb_to_palette


def _hist(colors, counts):
    c = np.asarray(colors)
    return pd.DataFrame(
        {"r": c[:, 0], "g": c[:, 1], "b": c[:, 2], "cnt": counts}
    )


def test_two_clusters_split_first():
    # two tight clusters -> with n_colors=2 the cut separates them
    cl_a = [(10 + i, 10, 10) for i in range(4)]
    cl_b = [(200 + i, 200, 200) for i in range(4)]
    pal = median_cut_palette(_hist(cl_a + cl_b, [1] * 8), n_colors=2)
    assert pal.shape == (2, 3)
    assert (pal[0] < 50).all() and (pal[1] > 150).all()


def test_palette_capped_and_weighted():
    colors = [(i, 0, 0) for i in range(0, 300, 1) if i < 256]
    pal = median_cut_palette(_hist(colors, [1] * len(colors)), n_colors=16)
    assert pal.shape[0] == 16
    # count weighting: a heavy color drags its box mean toward itself
    pal_w = median_cut_palette(
        _hist([(0, 0, 0), (40, 0, 0)], [1000, 1]), n_colors=1
    )
    assert pal_w[0, 0] == 0  # floor(40/1001 + .5) = 0


def test_assignment_is_nearest(spark):
    # 400 distinct colors, 8 palette entries: every output must be the
    # brute-force nearest palette entry for its input color
    rows = [
        (i % 20, i // 20, (i * 7) % 256, (i * 13) % 256, (i * 29) % 256)
        for i in range(400)
    ]
    pix = spark.createDataFrame(rows, "px int, py int, r int, g int, b int")
    out = rgb_to_palette(pix, n_colors=8, bits=8).collect()
    hist = pix.groupBy("r", "g", "b").count().toPandas()
    hist = hist.rename(columns={"count": "cnt"})
    pal = median_cut_palette(hist, 8)
    by_xy = {(r["px"], r["py"]): (r["pr"], r["pg"], r["pb"]) for r in out}
    for px, py, r, g, b in rows:
        d = ((pal - np.array([r, g, b])) ** 2).sum(axis=1)
        expect = tuple(pal[int(np.argmin(d))])
        assert by_xy[(px, py)] == expect
