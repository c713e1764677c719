"""Raster pyramid tests: NN warp correctness by independent per-pixel
recompute, checksum determinism, pyramid structure."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.geometry import mercator
from gdal_spark.geometry.checksum import checksum_image
from gdal_spark.operators import raster


@pytest.fixture(scope="module")
def base(spark):
    return raster.base_tiles(spark, raster.source_grid(spark), zoom=2).cache()


def expected_pixel(band, zoom, tx, ty, i, j):
    """Independent recompute of one output pixel (i=col, j=row from top)."""
    res = mercator.resolution(zoom)
    mx = (tx * raster.TILE + i + 0.5) * res - mercator.ORIGIN_SHIFT
    jj = raster.TILE - 1 - j  # row from top -> TMS pixel index
    my = (ty * raster.TILE + jj + 0.5) * res - mercator.ORIGIN_SHIFT
    lat, lon = (float(v) for v in mercator.meters_to_lat_lon(mx, my))
    spx = int(np.floor((lon - raster.GT_X0) / raster.GT_DX))
    spy = int(np.floor((lat - raster.GT_Y0) / raster.GT_DY))
    if not (0 <= spx < raster.SRC_W and 0 <= spy < raster.SRC_H):
        return 0
    return (spx * 7 + spy * 13 + band * 29) % 256


class TestBaseTiles:
    def test_tile_count_and_coverage(self, base):
        rows = base.select("band", "tx", "ty").collect()
        # zoom 2: 4x4 grid; source spans all lon, lat in (-85, 85) → all 16
        per_band = {}
        for r in rows:
            per_band.setdefault(r.band, set()).add((r.tx, r.ty))
        assert set(per_band) == {1, 2, 3}
        for tiles in per_band.values():
            assert tiles == {(tx, ty) for tx in range(4) for ty in range(4)}

    def test_nn_warp_matches_independent_recompute(self, base):
        row = base.filter((F.col("band") == 2) & (F.col("tx") == 1) & (F.col("ty") == 2)).first()
        img = np.frombuffer(row.data, dtype=np.uint8).reshape(256, 256)
        rng = np.random.default_rng(0)
        for _ in range(50):
            i = int(rng.integers(0, 256))
            j = int(rng.integers(0, 256))
            assert img[j, i] == expected_pixel(2, 2, 1, 2, i, j), (i, j)

    def test_interior_tile_nonzero(self, base):
        row = base.filter((F.col("band") == 1) & (F.col("tx") == 2) & (F.col("ty") == 1)).first()
        img = np.frombuffer(row.data, dtype=np.uint8).reshape(256, 256)
        assert img.any()


class TestPyramid:
    def test_checksums_deterministic(self, spark):
        a = {
            (r.band, r.zoom, r.tx, r.ty): r.checksum
            for r in raster.tile_pyramid_checksums(spark, zmax=2).collect()
        }
        b = {
            (r.band, r.zoom, r.tx, r.ty): r.checksum
            for r in raster.tile_pyramid_checksums(spark, zmax=2).collect()
        }
        assert a == b
        assert len(a) == 3 * (16 + 4 + 1)

    def test_overview_is_box_average(self, spark, base):
        ov = raster.overview_tiles(base)
        parent = ov.filter(
            (F.col("band") == 1) & (F.col("tx") == 0) & (F.col("ty") == 0)
        ).first()
        pimg = np.frombuffer(parent.data, dtype=np.uint8).reshape(256, 256)
        children = {
            (r.tx, r.ty): np.frombuffer(r.data, dtype=np.uint8).reshape(256, 256)
            for r in base.filter(
                (F.col("band") == 1) & (F.col("tx") < 2) & (F.col("ty") < 2)
            ).collect()
        }
        mosaic = np.zeros((512, 512))
        for (tx, ty), img in children.items():
            r0 = 0 if (ty & 1) == 1 else 256
            mosaic[r0 : r0 + 256, tx * 256 : (tx + 1) * 256] = img
        expect = np.floor(
            mosaic.reshape(256, 2, 256, 2).mean(axis=(1, 3)) + 0.5
        ).astype(np.uint8)
        assert (pimg == expect).all()

    def test_checksum_port_on_tile(self, base):
        row = base.first()
        img = np.frombuffer(row.data, dtype=np.uint8).reshape(256, 256)
        c = checksum_image(img)
        assert 0 <= c <= 0xFFFF


def expected_pixel_bilinear(band, zoom, tx, ty, i, j):
    """Independent bilinear recompute (GDALInterpolateAtPoint rules)."""
    res = mercator.resolution(zoom)
    mx = (tx * raster.TILE + i + 0.5) * res - mercator.ORIGIN_SHIFT
    jj = raster.TILE - 1 - j
    my = (ty * raster.TILE + jj + 0.5) * res - mercator.ORIGIN_SHIFT
    lat, lon = (float(v) for v in mercator.meters_to_lat_lon(mx, my))
    gx = (lon - raster.GT_X0) / raster.GT_DX - 0.5
    gy = (lat - raster.GT_Y0) / raster.GT_DY - 0.5
    i0 = int(np.clip(np.floor(gx), 0, raster.SRC_W - 2))
    j0 = int(np.clip(np.floor(gy), 0, raster.SRC_H - 2))
    fx = min(max(gx - i0, 0.0), 1.0)
    fy = min(max(gy - j0, 0.0), 1.0)

    def v(px, py):
        if abs(90.0 - 0.9 * (py + 0.5)) > raster.MERC_LAT_LIMIT:
            return 0.0  # source row filtered at the mercator limit
        return (px * 7 + py * 13 + band * 29) % 256

    out = (1 - fy) * ((1 - fx) * v(i0, j0) + fx * v(i0 + 1, j0)) + fy * (
        (1 - fx) * v(i0, j0 + 1) + fx * v(i0 + 1, j0 + 1)
    )
    return int(np.clip(np.floor(out + 0.5), 0, 255))


class TestResamplers:
    def test_bilinear_matches_independent_recompute(self, spark):
        tiles = raster.base_tiles(
            spark, raster.source_grid(spark), zoom=2, resample="bilinear"
        )
        row = tiles.filter(
            (F.col("band") == 2) & (F.col("tx") == 1) & (F.col("ty") == 2)
        ).first()
        img = np.frombuffer(row.data, dtype=np.uint8).reshape(256, 256)
        rng = np.random.default_rng(1)
        for _ in range(40):
            i = int(rng.integers(0, 256))
            j = int(rng.integers(0, 256))
            assert img[j, i] == expected_pixel_bilinear(2, 2, 1, 2, i, j), (i, j)

    def test_cubic_runs_and_differs_from_nn(self, spark):
        src = raster.source_grid(spark)
        nn = raster.base_tiles(spark, src, zoom=1, resample="nearest")
        cu = raster.base_tiles(spark, src, zoom=1, resample="cubic")
        a = np.frombuffer(
            nn.filter((F.col("band") == 1) & (F.col("tx") == 1) & (F.col("ty") == 1)).first().data,
            dtype=np.uint8,
        )
        b = np.frombuffer(
            cu.filter((F.col("band") == 1) & (F.col("tx") == 1) & (F.col("ty") == 1)).first().data,
            dtype=np.uint8,
        )
        assert (a != b).any()
        # Catmull-Rom interpolates constant regions exactly: values stay in byte range
        assert b.min() >= 0 and b.max() <= 255

    def test_lanczos_and_cubicspline_run(self, spark):
        src = raster.source_grid(spark)
        for m in ("lanczos", "cubicspline"):
            t = raster.base_tiles(spark, src, zoom=1, resample=m)
            row = t.filter(
                (F.col("band") == 1) & (F.col("tx") == 1) & (F.col("ty") == 1)
            ).first()
            img = np.frombuffer(row.data, dtype=np.uint8)
            assert img.any(), m
            # a constant field must reproduce exactly under both kernels
        const = src.withColumn("value", F.lit(77))
        for m in ("lanczos", "cubicspline", "bilinear", "cubic"):
            t = raster.base_tiles(spark, const, zoom=1, resample=m)
            row = t.filter(
                (F.col("band") == 1) & (F.col("tx") == 1) & (F.col("ty") == 1)
            ).first()
            img = np.frombuffer(row.data, dtype=np.uint8).reshape(256, 256)
            # interior pixels (away from the raster edge fill) equal 77
            assert (img[64:192, 64:192] == 77).all(), m

    def test_overview_nearest_and_gauss(self, spark, base):
        near = raster.overview_tiles(base, method="nearest")
        gauss = raster.overview_tiles(base, method="gauss")
        parent_n = near.filter(
            (F.col("band") == 1) & (F.col("tx") == 0) & (F.col("ty") == 0)
        ).first()
        parent_g = gauss.filter(
            (F.col("band") == 1) & (F.col("tx") == 0) & (F.col("ty") == 0)
        ).first()
        children = {
            (r.tx, r.ty): np.frombuffer(r.data, dtype=np.uint8).reshape(256, 256)
            for r in base.filter(
                (F.col("band") == 1) & (F.col("tx") < 2) & (F.col("ty") < 2)
            ).collect()
        }
        mosaic = np.zeros((512, 512))
        for (tx, ty), img in children.items():
            r0 = 0 if (ty & 1) == 1 else 256
            mosaic[r0 : r0 + 256, tx * 256 : (tx + 1) * 256] = img
        pn = np.frombuffer(parent_n.data, dtype=np.uint8).reshape(256, 256)
        assert (pn == mosaic[0::2, 0::2].astype(np.uint8)).all()
        pg = np.frombuffer(parent_g.data, dtype=np.uint8).reshape(256, 256)
        # hand-compute one interior gauss sample
        y, x = 100, 117
        w = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]])
        blk = mosaic[2 * y - 1 : 2 * y + 2, 2 * x - 1 : 2 * x + 2]
        assert pg[y, x] == int(np.floor((w * blk).sum() / 16.0 + 0.5))

    def test_overview_mode_and_rms(self, spark, base):
        mode = raster.overview_tiles(base, method="mode")
        rms = raster.overview_tiles(base, method="rms")
        parent_m = mode.filter(
            (F.col("band") == 1) & (F.col("tx") == 0) & (F.col("ty") == 0)
        ).first()
        parent_r = rms.filter(
            (F.col("band") == 1) & (F.col("tx") == 0) & (F.col("ty") == 0)
        ).first()
        children = {
            (r.tx, r.ty): np.frombuffer(r.data, dtype=np.uint8).reshape(256, 256)
            for r in base.filter(
                (F.col("band") == 1) & (F.col("tx") < 2) & (F.col("ty") < 2)
            ).collect()
        }
        mosaic = np.zeros((512, 512))
        for (tx, ty), img in children.items():
            r0 = 0 if (ty & 1) == 1 else 256
            mosaic[r0 : r0 + 256, tx * 256 : (tx + 1) * 256] = img
        quads = mosaic.reshape(256, 2, 256, 2)
        pm = np.frombuffer(parent_m.data, dtype=np.uint8).reshape(256, 256)
        pr = np.frombuffer(parent_r.data, dtype=np.uint8).reshape(256, 256)
        # spot-check 100 pixels against hand-computed mode / rms
        rng = np.random.default_rng(2)
        for _ in range(100):
            y = int(rng.integers(0, 256))
            x = int(rng.integers(0, 256))
            q = quads[y, :, x, :].ravel()
            vals, cnt = np.unique(q, return_counts=True)
            assert pm[y, x] == vals[np.argmax(cnt)]  # ties -> smallest value
            assert pr[y, x] == int(np.floor(np.sqrt((q**2).mean()) + 0.5))


class TestConvolutionOverviews:
    """Convolution overview resamplers (bilinear/cubic/cubicspline/
    lanczos; gcore/overview.cpp shared-kernel convolution path) through
    the exact-2x _resample_window evaluation."""

    def test_bilinear_overview_equals_box_average(self, spark, base):
        # at the exact quad center the bilinear tap weights are all 1/4,
        # so a 2x bilinear overview IS the box average — same rounding
        bl = raster.overview_tiles(base, method="bilinear")
        av = raster.overview_tiles(base, method="average")
        key = lambda r: (r.band, r.tx, r.ty)  # noqa: E731
        b = {key(r): r.data for r in bl.collect()}
        a = {key(r): r.data for r in av.collect()}
        assert b.keys() == a.keys() and len(b) >= 4
        assert all(b[k] == a[k] for k in b)

    def test_cubic_overview_interior_recompute(self, spark, base):
        cu = raster.overview_tiles(base, method="cubic")
        row = cu.filter(
            (F.col("band") == 1) & (F.col("tx") == 0) & (F.col("ty") == 1)
        ).first()
        img = np.frombuffer(row.data, dtype=np.uint8).reshape(256, 256)
        children = {
            (r.tx, r.ty): np.frombuffer(r.data, dtype=np.uint8).reshape(256, 256)
            for r in base.filter(
                (F.col("band") == 1) & (F.col("tx") < 2) & (F.col("ty") >= 2)
            ).collect()
        }
        mosaic = np.zeros((512, 512))
        for (tx, ty), child in children.items():
            r0 = 0 if (ty & 1) == 1 else 256
            mosaic[r0 : r0 + 256, tx * 256 : (tx + 1) * 256] = child
        # hand-evaluate the Catmull-Rom 4x4 at one interior output pixel
        def k(t):
            at = abs(t)
            if at <= 1:
                return 1.5 * at**3 - 2.5 * at**2 + 1
            if at < 2:
                return -0.5 * at**3 + 2.5 * at**2 - 4 * at + 2
            return 0.0

        y, x = 97, 131
        gx, gy = 2 * x + 0.5, 2 * y + 0.5  # coords - 0.5
        i0, j0 = int(np.floor(gx)), int(np.floor(gy))
        acc = 0.0
        for dj in range(-1, 3):
            wy = k(gy - j0 - dj)
            for di in range(-1, 3):
                acc += wy * k(gx - i0 - di) * mosaic[j0 + dj, i0 + di]
        assert img[y, x] == int(np.clip(np.floor(acc + 0.5), 0, 255))

    def test_all_convolution_methods_preserve_constant(self, spark):
        const = raster.source_grid(spark).withColumn("value", F.lit(93))
        b = raster.base_tiles(spark, const, zoom=1)
        for m in ("bilinear", "cubic", "cubicspline", "lanczos"):
            ov = raster.overview_tiles(b, method=m)
            row = ov.filter((F.col("band") == 1) & (F.col("tx") == 0)).first()
            img = np.frombuffer(row.data, dtype=np.uint8).reshape(256, 256)
            assert (img[64:192, 64:192] == 93).all(), m
