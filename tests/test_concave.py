"""Chi-shape concave hull (geometry/concave.py)."""

import numpy as np

from gdal_spark.geometry.concave import concave_hull_tris
from gdal_spark.geometry.delaunay import delaunay


def test_no_long_edges_keeps_everything():
    rng = np.random.default_rng(3)
    px = rng.uniform(0, 10, 80)
    py = rng.uniform(0, 10, 80)
    full = delaunay(px, py)
    kept = concave_hull_tris(px, py, edge_threshold=1e9)
    assert kept.shape == full.shape


def test_l_shape_peels_to_outline():
    tg = np.arange(20)
    gx, gy = np.meshgrid(tg, tg, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    keep = ~((gx >= 11) & (gy >= 11))
    gx, gy = gx[keep], gy[keep]
    px = gx * 4 + (((gx * 7 + gy * 13) % 9) - 4) * 4.0e-2
    py = gy * 4 + (((gx * 11 + gy * 5) % 9) - 4) * 4.0e-2
    tris = concave_hull_tris(px.astype(float), py.astype(float), 6.7)
    # 280 full cells x 2 + the single 3-corner notch-cell triangle
    assert tris.shape[0] == 2 * 280 + 1
    # every surviving edge is short
    for a, b, c in tris:
        for i, j in ((a, b), (b, c), (a, c)):
            d = np.hypot(px[i] - px[j], py[i] - py[j])
            assert d <= 6.7


def test_two_clusters_isolated_guard():
    """Far-apart clusters: the bridge peels away but each cluster keeps
    at least one triangle (the isolated-triangle guard prevents
    deleting whole components)."""
    rng = np.random.default_rng(11)
    ax = rng.uniform(0, 5, 12)
    ay = rng.uniform(0, 5, 12)
    bx = rng.uniform(100, 105, 12)
    by = rng.uniform(0, 5, 12)
    px = np.concatenate([ax, bx])
    py = np.concatenate([ay, by])
    tris = concave_hull_tris(px, py, edge_threshold=20.0)
    assert tris.shape[0] >= 2
    # no surviving triangle spans the two clusters
    assert not ((px[tris] < 50).any(axis=1) & (px[tris] > 50).any(axis=1)).any()
