"""Fused sub-pyramid path vs the level-by-level chain: identical
(band, zoom, tx, ty, checksum) sets — the fused kernel must reproduce
the chain's per-level float math exactly."""

from gdal_spark.operators.raster import tile_pyramid_checksums


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_matches_chain(spark):
    fused = tile_pyramid_checksums(spark, zmax=3, fused=True)
    chain = tile_pyramid_checksums(spark, zmax=3, fused=False)
    a, b = _rows(fused), _rows(chain)
    assert len(a) > 0 and a == b


def test_fused_single_python_stage(spark):
    plan = (
        tile_pyramid_checksums(spark, zmax=3, fused=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one tile-assembly apply + one subpyramid apply, nothing else
    assert plan.count("FlatMapGroupsInPandas") == 2


def test_fused_multipass_matches_chain(spark):
    """zmax=5 forces two fused passes (3 + 2 levels) — identical to the
    level-by-level chain."""
    fused = tile_pyramid_checksums(spark, zmax=5, fused=True)
    chain = tile_pyramid_checksums(spark, zmax=5, fused=False)
    a, b = _rows(fused), _rows(chain)
    assert len(a) == sum(3 * 4**z for z in range(6)) and a == b


def test_fused_partial_coverage_matches_chain(spark):
    """Source covering only a corner of the world: parents with missing
    children must zero-fill identically in the fused kernel and the
    level-by-level chain."""
    import pyspark.sql.functions as F

    from gdal_spark.operators.raster import source_grid

    src = source_grid(spark).filter((F.col("px") < 120) & (F.col("py") < 70))
    fused = tile_pyramid_checksums(spark, zmax=3, src=src, fused=True)
    chain = tile_pyramid_checksums(spark, zmax=3, src=src, fused=False)
    a, b = _rows(fused), _rows(chain)
    assert len(a) > 0 and a == b
    # partial coverage: strictly fewer base tiles than the full world
    zmax_tiles = sum(1 for r in a if r[1] == 3)
    assert 0 < zmax_tiles < 64 * 3
