"""ST_* scalar function surface over WKT columns.

Mirrors the SQLite-dialect spatial function family the reference
registers when Spatialite is absent
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:1188-1240:
ST_Area/Envelope/Intersects/Contains/... over geometry blobs), exposed
two ways:

  * column helpers (``st_area(col)``) — Arrow-vectorized pandas UDFs;
  * ``register_sql_functions(spark)`` — same kernels as SQL functions
    (``SELECT st_area(geom_wkt) FROM ...``), the ``spark.udf.register``
    analog of the reference's custom-function registrar
    (ogr/ogr_swq.h:415-423).

These are the slow-path escape hatch: engine operators use the
specialized join kernels, not these scalar forms — exactly like the
reference, where layer algebra never goes through the SQL functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, StringType

from gdal_spark.geometry.clip import shoelace_area
from gdal_spark.geometry.envelope import envelopes_intersect, wkt_envelope
from gdal_spark.geometry.pip import points_in_polygon_wkt
from gdal_spark.geometry.wkt import parse_wkt

__all__ = [
    "st_area",
    "st_envelope",
    "st_intersects_bbox",
    "st_contains_point",
    "st_centroid_x",
    "st_centroid_y",
    "register_sql_functions",
]


def _series(fn, out_np):
    def wrapped(*cols: pd.Series) -> pd.Series:
        n = len(cols[0])
        out = np.empty(n, dtype=out_np)
        for i in range(n):
            out[i] = fn(*(c.iat[i] for c in cols))
        return pd.Series(out)

    return wrapped


def _area(wkt: str) -> float:
    typ, payload = parse_wkt(wkt)
    if typ == "POLYGON":
        rings = [payload]
    elif typ == "MULTIPOLYGON":
        rings = payload
    else:
        return 0.0
    total = 0.0
    for poly in rings:
        for k, ring in enumerate(poly):
            a = abs(shoelace_area(ring))
            total += a if k == 0 else -a  # holes subtract
    return total


def _envelope_wkt(wkt: str) -> str:
    x0, y0, x1, y1 = wkt_envelope(wkt)
    return (
        f"POLYGON (({x0!r} {y0!r},{x1!r} {y0!r},{x1!r} {y1!r},"
        f"{x0!r} {y1!r},{x0!r} {y0!r}))"
    )


def _bbox_intersects(a: str, b: str) -> bool:
    return envelopes_intersect(wkt_envelope(a), wkt_envelope(b))


def _contains_point(poly_wkt: str, x: float, y: float) -> bool:
    return bool(
        points_in_polygon_wkt(np.array([x]), np.array([y]), poly_wkt)[0]
    )


def _centroid(wkt: str) -> tuple[float, float]:
    """Area-weighted centroid of the shell rings (reference: OGRGeometry
    Centroid, ogrgeometry.cpp:6108 — GEOS area centroid)."""
    typ, payload = parse_wkt(wkt)
    polys = [payload] if typ == "POLYGON" else payload if typ == "MULTIPOLYGON" else []
    if not polys:
        if typ == "POINT":
            return float(payload[0][0, 0]), float(payload[0][0, 1])
        return float("nan"), float("nan")
    ax = ay = aa = 0.0
    for poly in polys:
        ring = poly[0]
        x = ring[:-1, 0]
        y = ring[:-1, 1]
        xn = ring[1:, 0]
        yn = ring[1:, 1]
        cross = x * yn - xn * y
        a = cross.sum() / 2.0
        if a == 0:
            continue
        ax += ((x + xn) * cross).sum() / 6.0
        ay += ((y + yn) * cross).sum() / 6.0
        aa += a
    if aa == 0:
        return float("nan"), float("nan")
    return ax / aa, ay / aa


_st_area_udf = F.pandas_udf(_series(_area, np.float64), DoubleType())
_st_env_udf = F.pandas_udf(_series(_envelope_wkt, object), StringType())
_st_bbox_udf = F.pandas_udf(_series(_bbox_intersects, bool), BooleanType())
_st_contains_udf = F.pandas_udf(_series(_contains_point, bool), BooleanType())
_st_cx_udf = F.pandas_udf(_series(lambda w: _centroid(w)[0], np.float64), DoubleType())
_st_cy_udf = F.pandas_udf(_series(lambda w: _centroid(w)[1], np.float64), DoubleType())


def st_area(col) -> Column:
    return _st_area_udf(col)


def st_envelope(col) -> Column:
    return _st_env_udf(col)


def st_intersects_bbox(a, b) -> Column:
    return _st_bbox_udf(a, b)


def st_contains_point(poly, x, y) -> Column:
    return _st_contains_udf(poly, x, y)


def st_centroid_x(col) -> Column:
    return _st_cx_udf(col)


def st_centroid_y(col) -> Column:
    return _st_cy_udf(col)


def register_sql_functions(spark: SparkSession) -> None:
    """Make the family callable from spark.sql strings."""
    spark.udf.register("st_area", _st_area_udf)
    spark.udf.register("st_envelope", _st_env_udf)
    spark.udf.register("st_intersects_bbox", _st_bbox_udf)
    spark.udf.register("st_contains_point", _st_contains_udf)
    spark.udf.register("st_centroid_x", _st_cx_udf)
    spark.udf.register("st_centroid_y", _st_cy_udf)
