"""Composed gdalwarp pipeline (`warp_pipeline`).

The registry query chains the gdalwarp lifecycle (-te/-tr target grid,
inverse -t_srs per dest-pixel center, -r bilinear 2x2 sampling via four
broadcast joins, -cutline mask, -dstnodata Byte output).  The driver
contract test oracle-checks the values; here we pin the plan shape and
that the fixture exercises both the masked and sampled paths.
"""

from __future__ import annotations

import duckdb

from gdal_spark import registry as R

SF_DIR = "/root/testdata/sf0.001"


def test_fixture_exercises_both_paths():
    df = duckdb.sql(R.ORACLES["warp_pipeline"]).df()
    assert len(df) == R._WP_W * R._WP_H * 3
    n_nodata = int((df.v == 255).sum())
    assert 0 < n_nodata < len(df)
    # interpolation produces values the pure source formula lattice
    # (step-7 / step-13 integer lattice) would rarely hit exactly:
    # at least half the sampled pixels are non-integral blends
    assert df.v.min() >= 0 and df.v.max() <= 255


def test_plan_broadcast_only(spark):
    df = R.QUERIES["warp_pipeline"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
