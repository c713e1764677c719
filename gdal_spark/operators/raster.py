"""Raster tile pyramid — the gdalwarp + gdal2tiles workload as Spark.

Pipeline (mirrors gdal2tiles' two phases, gdal2tiles.py:1283 base tiles,
:1471 overview tiles):

  1. ``source_grid`` — deterministic world raster as a pixel table
     (band, px, py, value), geotransform (-180, 0.9, 0, 90, 0, -0.9) in
     EPSG:4326 (FIXTURES.md §4, byte.tif/small_world analog).
  2. ``base_tiles`` — output-tile-driven warp to EPSG:3857: every source
     pixel is scattered to the mercator tile containing its center plus
     a 1-cell halo (explode, JVM-side); one applyInPandas per tile
     assembles the local source window and nearest-neighbor resamples
     the 256x256 output (GRA_NearestNeighbour semantics,
     alg/gdalwarpkernel.cpp NN path) — the per-tile kernel IS the
     reference's WarpRegionToBuffer unit of work, scheduled by Spark
     instead of ChunkAndWarpImage's recursion.
  3. ``overview_tiles`` — zoom z-1 from <=4 children: stitch 512x512,
     2x2 box-average (AVERAGE resampler, gcore/overview.cpp:4188),
     parent = (tx>>1, ty>>1) exactly like create_overview_tile
     (gdal2tiles.py:1484-1486).

Tiles are verified by the GDALChecksumImage port (geometry/checksum.py) —
the same oracle the reference's own tile tests use
(autotest/pyscripts/test_gdal2tiles.py:121-156).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from gdal_spark.geometry import mercator
from gdal_spark.geometry.checksum import checksum_image

# geotransform of the synthetic source (FIXTURES.md §4)
GT_X0, GT_DX = -180.0, 0.9
GT_Y0, GT_DY = 90.0, -0.9
SRC_W, SRC_H = 400, 200
N_BANDS = 3
TILE = 256


def source_grid(spark: SparkSession) -> DataFrame:
    """(band, px, py, value) — value = (px*7 + py*13 + band*29) % 256."""
    n = SRC_W * SRC_H * N_BANDS
    df = spark.range(n)
    px = (F.col("id") % SRC_W).cast("int")
    py = ((F.col("id") / SRC_W).cast("long") % SRC_H).cast("int")
    band = (F.col("id") / (SRC_W * SRC_H)).cast("int") + 1
    value = ((px * 7 + py * 13 + band * 29) % 256).cast("int")
    return df.select(
        band.alias("band"), px.alias("px"), py.alias("py"), value.alias("value")
    )


def _tile_schema():
    return StructType(
        [
            StructField("band", IntegerType()),
            StructField("zoom", IntegerType()),
            StructField("tx", LongType()),
            StructField("ty", LongType()),
            StructField("data", BinaryType()),
        ]
    )


def base_tiles(spark: SparkSession, src: DataFrame, zoom: int) -> DataFrame:
    """Warp the source grid to mercator tiles at ``zoom`` (NN resample).

    Returns (band, zoom, tx, ty, data:binary 256*256 bytes, row-major
    top-left origin like GDAL's raster buffers; ty is TMS)."""
    z = str(zoom)
    # pixel-center coordinates (JVM)
    lon = F.lit(GT_X0) + (F.col("px") + F.lit(0.5)) * F.lit(GT_DX)
    lat = F.lit(GT_Y0) + (F.col("py") + F.lit(0.5)) * F.lit(GT_DY)
    pts = src.withColumn("lon", lon).withColumn("lat", lat).filter(
        (F.col("lat") > -85.0) & (F.col("lat") < 85.0)
    )
    # halo scatter: a tile's kernel needs every source pixel whose center
    # lies within the tile's geo-bounds expanded by one source pixel, so
    # each pixel is scattered to the exact tile RANGE covered by
    # [lon±GT_DX] x [lat±|GT_DY|] — duplication ~(1+eps)^2, not a blanket
    # 3x3 replication (which would 9x the shuffle at scale).
    n = 2**zoom
    pts = (
        pts.withColumn(
            "_lo_x", F.col("lon") - F.lit(GT_DX)
        )
        .withColumn("_hi_x", F.col("lon") + F.lit(GT_DX))
        .withColumn("_lo_y", F.col("lat") - F.lit(abs(GT_DY)))
        .withColumn("_hi_y", F.col("lat") + F.lit(abs(GT_DY)))
        .withColumn(
            "tx",
            F.explode(
                F.sequence(
                    F.expr(mercator.sql_tx("_lo_x", z)),
                    F.expr(mercator.sql_tx("_hi_x", z)),
                )
            ),
        )
        .withColumn(
            "ty",
            F.explode(
                F.sequence(
                    F.expr(mercator.sql_ty("greatest(-85.05, _lo_y)", z)),
                    F.expr(mercator.sql_ty("least(85.05, _hi_y)", z)),
                )
            ),
        )
        .select("band", "px", "py", "value", "tx", "ty")
        .filter(
            (F.col("tx") >= 0)
            & (F.col("tx") < n)
            & (F.col("ty") >= 0)
            & (F.col("ty") < n)
        )
    )

    res = mercator.resolution(zoom)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band, tx, ty = int(key[0]), int(key[1]), int(key[2])
        spx = pdf["px"].to_numpy(np.int64)
        spy = pdf["py"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.int64)
        x0, y0 = spx.min(), spy.min()
        win = np.zeros((spy.max() - y0 + 1, spx.max() - x0 + 1), dtype=np.int64)
        have = np.zeros_like(win, dtype=bool)
        win[spy - y0, spx - x0] = val
        have[spy - y0, spx - x0] = True
        # output pixel centers -> inverse warp -> nearest source pixel
        i = np.arange(TILE)
        mx = (tx * TILE + i + 0.5) * res - mercator.ORIGIN_SHIFT
        my = (ty * TILE + i + 0.5) * res - mercator.ORIGIN_SHIFT
        lat_r, lon_c = mercator.meters_to_lat_lon(
            np.zeros(1), my
        )[0], mercator.meters_to_lat_lon(mx, np.zeros(1))[1]
        src_px = np.floor((lon_c - GT_X0) / GT_DX).astype(np.int64)
        src_py = np.floor((lat_r - GT_Y0) / GT_DY).astype(np.int64)
        # assemble top-left-origin image: output row 0 = north = max my
        rows = src_py[::-1][:, None] - y0  # flip TMS bottom-up to top-down
        cols = (src_px - x0)[None, :]
        ok = (
            (rows >= 0)
            & (rows < win.shape[0])
            & (cols >= 0)
            & (cols < win.shape[1])
        )
        img = np.zeros((TILE, TILE), dtype=np.uint8)
        rr = np.clip(rows, 0, win.shape[0] - 1)
        cc = np.clip(cols, 0, win.shape[1] - 1)
        filled = np.where(ok & have[rr, cc], win[rr, cc], 0)
        img[:, :] = filled.astype(np.uint8)
        return pd.DataFrame(
            {
                "band": [band],
                "zoom": [np.int32(zoom)],
                "tx": [tx],
                "ty": [ty],
                "data": [img.tobytes()],
            }
        )

    return pts.groupBy("band", "tx", "ty").applyInPandas(assemble, _tile_schema())


def overview_tiles(tiles: DataFrame) -> DataFrame:
    """One overview level: parent (tx>>1, ty>>1) from <=4 children,
    2x2 box-average (floor(mean + 0.5), AVERAGE resampler semantics)."""

    def reduce4(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band, zoom, ptx, pty = int(key[0]), int(key[1]), int(key[2]), int(key[3])
        mosaic = np.zeros((2 * TILE, 2 * TILE), dtype=np.float64)
        for _, row in pdf.iterrows():
            child = np.frombuffer(row["data"], dtype=np.uint8).reshape(TILE, TILE)
            cx = int(row["tx"]) & 1  # 0 = west, 1 = east
            cy = int(row["ty"]) & 1  # TMS: 1 = north child -> top half
            r0 = 0 if cy == 1 else TILE
            mosaic[r0 : r0 + TILE, cx * TILE : (cx + 1) * TILE] = child
        avg = mosaic.reshape(TILE, 2, TILE, 2).mean(axis=(1, 3))
        img = np.floor(avg + 0.5).astype(np.uint8)
        return pd.DataFrame(
            {
                "band": [band],
                "zoom": [np.int32(zoom - 1)],
                "tx": [ptx],
                "ty": [pty],
                "data": [img.tobytes()],
            }
        )

    parents = tiles.groupBy(
        "band",
        "zoom",
        F.shiftright("tx", 1).alias("ptx"),
        F.shiftright("ty", 1).alias("pty"),
    )
    return parents.applyInPandas(reduce4, _tile_schema())


def tile_pyramid_checksums(
    spark: SparkSession, zmax: int = 2, src: DataFrame | None = None
) -> DataFrame:
    """Full pyramid zmax..0 with per-tile GDAL checksums.
    Returns (band, zoom, tx, ty, checksum)."""
    if src is None:
        src = source_grid(spark)
    levels = [base_tiles(spark, src, zmax)]
    for _ in range(zmax, 0, -1):
        levels.append(overview_tiles(levels[-1]))
    out_schema = StructType(
        [
            StructField("band", IntegerType()),
            StructField("zoom", IntegerType()),
            StructField("tx", LongType()),
            StructField("ty", LongType()),
            StructField("checksum", IntegerType()),
        ]
    )

    def to_checksum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cs = [
                np.int32(
                    checksum_image(
                        np.frombuffer(d, dtype=np.uint8).reshape(TILE, TILE)
                    )
                )
                for d in pdf["data"]
            ]
            out = pdf[["band", "zoom", "tx", "ty"]].copy()
            out["checksum"] = cs
            yield out

    from functools import reduce as _reduce

    all_tiles = _reduce(DataFrame.unionByName, levels)
    return all_tiles.mapInPandas(to_checksum, out_schema)
