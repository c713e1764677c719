"""GlobalMercator tile math — numpy + SQL port of the reference's
gdal2tiles.py GlobalMercator class (swig/python/gdal-utils/osgeo_utils/
gdal2tiles.py:422-530: LatLonToMeters, MetersToPixels, PixelsToTile,
TileBounds, Resolution, ZoomForPixelSize, QuadTree).

Tile coordinates are TMS (origin bottom-left), like the reference's
default.  ``google_ty`` converts to XYZ.

Two renderings of the SAME formulas are provided:
  * numpy (vectorized, for pandas-UDF kernels and local goldens);
  * SQL-text builders emitting expressions valid in BOTH Spark SQL and
    DuckDB — the correctness oracle and the engine share one formula
    string, so the only possible divergence is libm 1-ulp noise at tile
    boundaries (points are generated on a 0.001° lattice to keep
    boundary hits out of measure).
"""

from __future__ import annotations

import math

import numpy as np

TILE_SIZE = 256
ORIGIN_SHIFT = 2 * math.pi * 6378137 / 2.0  # 20037508.342789244
INITIAL_RESOLUTION = 2 * math.pi * 6378137 / TILE_SIZE  # 156543.03392804062
MAXZOOMLEVEL = 32  # gdal2tiles.py MAXZOOMLEVEL

__all__ = [
    "TILE_SIZE",
    "ORIGIN_SHIFT",
    "INITIAL_RESOLUTION",
    "lat_lon_to_meters",
    "meters_to_lat_lon",
    "resolution",
    "meters_to_pixels",
    "pixels_to_tile",
    "meters_to_tile",
    "lat_lon_to_tile",
    "tile_bounds",
    "zoom_for_pixel_size",
    "quadkey",
    "google_ty",
    "sql_mx",
    "sql_my",
    "sql_tx",
    "sql_ty",
]


# ---------------------------------------------------------------- numpy side
def lat_lon_to_meters(lat, lon):
    """WGS84 lat/lon -> EPSG:3857 meters (gdal2tiles.py:434-442)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * math.pi / 360.0)) / (math.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_lat_lon(mx, my):
    lon = (np.asarray(mx) / ORIGIN_SHIFT) * 180.0
    lat = (np.asarray(my) / ORIGIN_SHIFT) * 180.0
    lat = 180.0 / math.pi * (2.0 * np.arctan(np.exp(lat * math.pi / 180.0)) - math.pi / 2.0)
    return lat, lon


def resolution(zoom: int) -> float:
    """meters/pixel at equator (gdal2tiles.py:520-523)."""
    return INITIAL_RESOLUTION / (2**zoom)


def meters_to_pixels(mx, my, zoom):
    res = resolution(zoom)
    px = (np.asarray(mx) + ORIGIN_SHIFT) / res
    py = (np.asarray(my) + ORIGIN_SHIFT) / res
    return px, py


def pixels_to_tile(px, py):
    """ceil(p/256)-1, the reference's exact convention (gdal2tiles.py:460-464)."""
    tx = np.ceil(np.asarray(px) / float(TILE_SIZE)).astype(np.int64) - 1
    ty = np.ceil(np.asarray(py) / float(TILE_SIZE)).astype(np.int64) - 1
    return tx, ty


def meters_to_tile(mx, my, zoom):
    return pixels_to_tile(*meters_to_pixels(mx, my, zoom))


def lat_lon_to_tile(lat, lon, zoom):
    return meters_to_tile(*lat_lon_to_meters(lat, lon), zoom)


def tile_bounds(tx, ty, zoom):
    """TMS tile -> (minx, miny, maxx, maxy) in meters (gdal2tiles.py:477-485)."""
    res = resolution(zoom)
    minx = np.asarray(tx) * TILE_SIZE * res - ORIGIN_SHIFT
    miny = np.asarray(ty) * TILE_SIZE * res - ORIGIN_SHIFT
    maxx = (np.asarray(tx) + 1) * TILE_SIZE * res - ORIGIN_SHIFT
    maxy = (np.asarray(ty) + 1) * TILE_SIZE * res - ORIGIN_SHIFT
    return minx, miny, maxx, maxy


def zoom_for_pixel_size(pixel_size: float) -> int:
    """Max scaledown zoom closest to pixel_size (gdal2tiles.py:525-530)."""
    for i in range(MAXZOOMLEVEL):
        if pixel_size > resolution(i):
            return max(0, i - 1)
    return MAXZOOMLEVEL - 1


def google_ty(ty, zoom):
    """TMS -> XYZ/Google row flip (gdal2tiles.py:533-537)."""
    return (2**zoom - 1) - np.asarray(ty)


def quadkey(tx: int, ty: int, zoom: int) -> str:
    """Microsoft QuadTree key (gdal2tiles.py:539-553)."""
    key = []
    gy = (2**zoom - 1) - ty
    for i in range(zoom, 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if tx & mask:
            digit += 1
        if gy & mask:
            digit += 2
        key.append(str(digit))
    return "".join(key)


# ------------------------------------------------------------------ SQL side
# Expressions valid in both Spark SQL and DuckDB.  Constants are emitted in
# E-notation: both engines parse E-notation as DOUBLE (plain decimal
# literals become DECIMAL in DuckDB and overflow), and 17 significant
# digits round-trip the exact double bits.


def sql_double(v: float) -> str:
    """Render a float as a SQL literal that parses as DOUBLE in both
    Spark SQL and DuckDB with exactly these bits."""
    return f"{v:.17e}"


_OS = sql_double(ORIGIN_SHIFT)
_IR = sql_double(INITIAL_RESOLUTION)


def sql_mx(lon: str) -> str:
    return f"(({lon}) * {_OS} / 180.0)"


def sql_my(lat: str) -> str:
    return f"((ln(tan((90.0 + ({lat})) * pi() / 360.0)) / (pi() / 180.0)) * {_OS} / 180.0)"


def _sql_res(zoom: str) -> str:
    return f"({_IR} / power(2.0, {zoom}))"


def sql_tx(lon: str, zoom: str) -> str:
    px = f"(({sql_mx(lon)} + {_OS}) / {_sql_res(zoom)})"
    return f"(cast(ceiling({px} / 256.0) as bigint) - 1)"


def sql_ty(lat: str, zoom: str) -> str:
    py = f"(({sql_my(lat)} + {_OS}) / {_sql_res(zoom)})"
    return f"(cast(ceiling({py} / 256.0) as bigint) - 1)"
