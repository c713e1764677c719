"""ST_* scalar function surface over WKT columns.

Mirrors the SQLite-dialect spatial function family the reference
registers when Spatialite is absent
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:1188-1240:
ST_Area/Envelope/Intersects/Contains/... over geometry blobs), exposed
two ways:

  * column helpers (``st_area(col)``) — Arrow-batched pandas UDFs;
  * ``register_sql_functions(spark)`` — same kernels as SQL functions
    (``SELECT st_area(geom_wkt) FROM ...``), the ``spark.udf.register``
    analog of the reference's custom-function registrar
    (ogr/ogr_swq.h:415-423).

Execution shape: each batch is grouped by UNIQUE geometry text (method
layers repeat geometries heavily), each unique WKT is parsed at most
once per executor process (module-level cache), and the scalar is
computed once per unique geometry then scattered back with a numpy
take — the only Python-level loop is over distinct geometries, the same
granularity as the PIP refine kernel.  Engine operators still use the
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
from gdal_spark.geometry.pip import points_in_polygon
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

# executor-level parse cache: WKT text -> (type, payload).  Bounded so a
# high-cardinality geometry column can't grow it without limit.
_PARSE_CACHE: dict[str, tuple] = {}
_PARSE_CACHE_MAX = 8192


def _parsed(wkt: str):
    v = _PARSE_CACHE.get(wkt)
    if v is None:
        v = parse_wkt(wkt)
        if len(_PARSE_CACHE) >= _PARSE_CACHE_MAX:
            _PARSE_CACHE.clear()
        _PARSE_CACHE[wkt] = v
    return v


def _as_polys(wkt: str) -> list:
    """Parsed WKT -> list of ring-lists (multipolygon form)."""
    typ, payload = _parsed(wkt)
    if typ == "POLYGON":
        return [payload]
    if typ == "MULTIPOLYGON":
        return payload
    return []


def _per_unique(fn, out_np):
    """Lift a per-geometry scalar to a batch kernel: evaluate once per
    UNIQUE wkt in the batch, scatter results back via numpy take."""

    def wrapped(col: pd.Series) -> pd.Series:
        uniq, inv = np.unique(col.to_numpy(dtype=object), return_inverse=True)
        vals = np.array([fn(w) for w in uniq], dtype=out_np)
        return pd.Series(vals[inv])

    return wrapped


def _area(wkt: str) -> float:
    total = 0.0
    for poly in _as_polys(wkt):
        for k, ring in enumerate(poly):
            a = abs(shoelace_area(ring))
            total += a if k == 0 else -a  # holes subtract
    return total


def _geom_envelope(wkt: str):
    typ, payload = _parsed(wkt)
    if typ == "MULTIPOLYGON":
        rings = [r for poly in payload for r in poly]
    else:
        rings = payload
    pts = np.vstack(rings)
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


def _envelope_wkt(wkt: str) -> str:
    x0, y0, x1, y1 = _geom_envelope(wkt)
    return (
        f"POLYGON (({x0!r} {y0!r},{x1!r} {y0!r},{x1!r} {y1!r},"
        f"{x0!r} {y1!r},{x0!r} {y0!r}))"
    )


def _centroid(wkt: str) -> tuple[float, float]:
    """Area-weighted centroid of the shell rings (reference: OGRGeometry
    Centroid, ogrgeometry.cpp:6108 — GEOS area centroid)."""
    typ, payload = _parsed(wkt)
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


def _envelopes_for(col: pd.Series) -> np.ndarray:
    """(n, 4) envelope matrix for a WKT column, one parse per unique."""
    uniq, inv = np.unique(col.to_numpy(dtype=object), return_inverse=True)
    envs = np.array([_geom_envelope(w) for w in uniq], dtype=np.float64)
    return envs[inv]


def _bbox_intersects_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    ea = _envelopes_for(a)
    eb = _envelopes_for(b)
    hit = (
        (ea[:, 0] <= eb[:, 2])
        & (eb[:, 0] <= ea[:, 2])
        & (ea[:, 1] <= eb[:, 3])
        & (eb[:, 1] <= ea[:, 3])
    )
    return pd.Series(hit)


def _contains_point_batch(poly: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    xs = x.to_numpy(np.float64)
    ys = y.to_numpy(np.float64)
    uniq, inv = np.unique(poly.to_numpy(dtype=object), return_inverse=True)
    out = np.zeros(len(xs), dtype=bool)
    for i, wkt in enumerate(uniq):
        mask = inv == i
        hit = np.zeros(int(mask.sum()), dtype=bool)
        for rings in _as_polys(wkt):
            hit |= points_in_polygon(xs[mask], ys[mask], rings)
        out[mask] = hit
    return pd.Series(out)


_st_area_udf = F.pandas_udf(_per_unique(_area, np.float64), DoubleType())
_st_env_udf = F.pandas_udf(_per_unique(_envelope_wkt, object), StringType())
_st_bbox_udf = F.pandas_udf(_bbox_intersects_batch, BooleanType())
_st_contains_udf = F.pandas_udf(_contains_point_batch, BooleanType())
_st_cx_udf = F.pandas_udf(
    _per_unique(lambda w: _centroid(w)[0], np.float64), DoubleType()
)
_st_cy_udf = F.pandas_udf(
    _per_unique(lambda w: _centroid(w)[1], np.float64), DoubleType()
)


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
