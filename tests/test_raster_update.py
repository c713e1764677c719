"""gdal raster update + partial overview refresh
(apps/gdalalg_raster_update.cpp, gdalalg_raster_overview_refresh.cpp):
fixture non-vacuousness — every semantic branch must fire — plus the
block-aligned refresh-window math."""

import pyspark.sql.functions as F

from gdal_spark.operators.raster import (
    UPD_NODATA,
    UPD_OX,
    UPD_OY,
    UPD_RES,
    UPD_H,
    UPD_W,
    overview_grid,
    raster_update,
    refresh_window,
    source_grid,
    update_src,
)


def _dst(spark):
    return source_grid(spark).filter(F.col("band") == 1).select("px", "py", "value")


def test_update_branches_all_fire(spark):
    dst = _dst(spark)
    upd = raster_update(dst, update_src(spark))
    j = (
        dst.withColumnRenamed("value", "old")
        .join(upd.withColumnRenamed("value", "new"), ["px", "py"])
    )
    changed = j.filter(F.col("old") != F.col("new"))
    # the update touched something, but not everything
    n_changed = changed.count()
    assert 0 < n_changed < dst.count()
    # changes happen ONLY inside the cutline outer rings and never in the hole
    bad = changed.filter(
        ~(
            (
                (F.col("px") >= 130) & (F.col("px") < 190)
                & (F.col("py") >= 50) & (F.col("py") < 80)
            )
            | (
                (F.col("px") >= 130) & (F.col("px") < 160)
                & (F.col("py") >= 80) & (F.col("py") < 88)
            )
        )
        | (
            (F.col("px") >= 140) & (F.col("px") < 150)
            & (F.col("py") >= 55) & (F.col("py") < 65)
        )
    )
    assert bad.count() == 0
    # srcnodata transparency: inside the cutline there exist pixels whose
    # NN source sample is UPD_NODATA and which therefore kept their value
    kept_nodata = (
        j.filter((F.col("px") >= 130) & (F.col("px") < 190)
                 & (F.col("py") >= 50) & (F.col("py") < 80))
        .filter(F.col("old") == F.col("new"))
        .withColumn("sx", F.floor((F.col("px") + 0.5 - UPD_OX) / UPD_RES))
        .withColumn("sy", F.floor((F.col("py") + 0.5 - UPD_OY) / UPD_RES))
        .filter((F.col("sx") * 11 + F.col("sy") * 3 + 5) % 256 == UPD_NODATA)
    )
    assert kept_nodata.count() > 0


def test_refresh_window_block_alignment():
    win = refresh_window(
        UPD_OX, UPD_OY, UPD_OX + UPD_W * UPD_RES, UPD_OY + UPD_H * UPD_RES
    )
    assert win == (48, 112, 16, 48)
    for v in win:
        assert v % 16 == 0
    # covers the raw overview window [60,101) x [20,46)
    assert win[0] <= 60 and win[1] >= 101 and win[2] <= 20 and win[3] >= 46


def test_partial_refresh_stale_vs_fresh(spark):
    from gdal_spark.operators.raster import overview_refresh

    dst = _dst(spark)
    upd = raster_update(dst, update_src(spark))
    win = refresh_window(
        UPD_OX, UPD_OY, UPD_OX + UPD_W * UPD_RES, UPD_OY + UPD_H * UPD_RES
    )
    out = overview_refresh(overview_grid(dst), upd, win).cache()
    full_new = overview_grid(upd)
    # refreshed rows equal a full recompute; a truly-partial refresh is
    # only observable because some refreshed rows DIFFER from the old
    # overview (the update flowed through) ...
    fresh = out.filter(F.col("refreshed") == 1).drop("refreshed")
    mism = fresh.join(
        full_new.withColumnRenamed("value", "v2"), ["opx", "opy"]
    ).filter(F.col("value") != F.col("v2"))
    assert mism.count() == 0
    diff_from_old = fresh.join(
        overview_grid(dst).withColumnRenamed("value", "v0"), ["opx", "opy"]
    ).filter(F.col("value") != F.col("v0"))
    assert diff_from_old.count() > 0
    # ... and every pass-through row is bit-identical to the old overview
    # (zero recompute outside the window)
    stale = out.filter(F.col("refreshed") == 0).drop("refreshed")
    old = overview_grid(dst).withColumnRenamed("value", "v0")
    assert stale.join(old, ["opx", "opy"]).filter(
        F.col("value") != F.col("v0")
    ).count() == 0
    # exact row accounting: 200*100 overview pixels total
    assert out.count() == 200 * 100
    assert out.filter(F.col("refreshed") == 1).count() == (112 - 48) * (48 - 16)
    out.unpersist()
