"""Curvature-corrected viewshed (gdal_viewshed -cc): the correction
must CHANGE the answer on the registry fixture (otherwise the knob is
vacuous), must only ever HIDE pixels relative to the flat-earth run
(heights only drop), and cc=0 must reduce to the plain path exactly."""

import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.operators.raster import source_grid
from gdal_spark.operators.viewshed import viewshed

OX, OY, R = 200, 100, 80
Z0 = ((OX * 7 + OY * 13 + 29) % 256) + 20


def _vis(df) -> dict:
    return {
        (r["px"], r["py"]): r["visible"] for r in df.collect()
    }


def _dem(spark):
    return (
        source_grid(spark)
        .filter(F.col("band") == 1)
        .select("px", "py", F.col("value").alias("z"))
    )


def test_curvature_flips_rim_pixels_and_only_hides(spark):
    dem = _dem(spark)
    flat = _vis(viewshed(dem, OX, OY, Z0, max_dist=R))
    curved = _vis(
        viewshed(dem, OX, OY, Z0, max_dist=R, curve_coeff=0.85714, cell_size=90.0)
    )
    assert set(flat) == set(curved)  # same disc
    hidden = [k for k in flat if flat[k] == 1 and curved[k] == 0]
    revealed = [k for k in flat if flat[k] == 0 and curved[k] == 1]
    assert len(hidden) > 0  # the knob does something on this fixture
    # dropping every height by a monotone-in-distance amount can also
    # UNBLOCK a target (the blocker drops more than the target when it
    # sits proportionally farther out) — but on this smooth fixture the
    # overwhelming effect must be hiding
    assert len(hidden) > len(revealed)


def test_cc_zero_is_the_flat_path(spark):
    dem = _dem(spark)
    a = _vis(viewshed(dem, OX, OY, Z0, max_dist=R))
    b = _vis(viewshed(dem, OX, OY, Z0, max_dist=R, curve_coeff=0.0))
    assert a == b


def test_heights_consistent_with_visibility(spark):
    # exact identity between the two output modes: a target is visible
    # iff it is unconstrained (no intermediate sample) or its own height
    # strictly clears the micro-quantized minimum observable bound
    from gdal_spark.operators.viewshed import HQ, viewshed_heights

    dem = _dem(spark)
    vis = _vis(viewshed(dem, OX, OY, Z0, max_dist=R))
    z_of = {(r["px"], r["py"]): r["z"] for r in dem.collect()}
    hrows = viewshed_heights(dem, OX, OY, Z0, max_dist=R).collect()
    assert len(hrows) == len(vis)
    n_constrained = 0
    for r in hrows:
        k = (r["px"], r["py"])
        if r["min_vis_mu"] is None:
            assert vis[k] == 1 and r["ground_mu"] == 0
        else:
            n_constrained += 1
            expect = 1 if r["min_vis_mu"] < z_of[k] * HQ else 0
            assert vis[k] == expect, k
            assert r["ground_mu"] == max(0, r["min_vis_mu"] - z_of[k] * HQ)
    assert n_constrained > len(hrows) // 2  # the bound actually binds


def test_tiny_cell_size_converges_to_flat(spark):
    # 1 m cells: the max correction at r=80 is ~5e-7 height units —
    # three orders below the 2^-20 quantizer, so visibility matches flat
    dem = _dem(spark)
    a = _vis(viewshed(dem, OX, OY, Z0, max_dist=R))
    b = _vis(
        viewshed(dem, OX, OY, Z0, max_dist=R, curve_coeff=0.85714, cell_size=1.0)
    )
    assert a == b
