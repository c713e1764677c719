"""Geometry-collection surface: the container accessors and the
forceTo-multi constructors.

Reference anchors:
  * ``st_geometrytype``   — OGRGeometry::getGeometryName
    (ogr/ogrgeometry.cpp; e.g. OGRPoint::getGeometryName returns
    "POINT" regardless of Z/M flags) — pure JVM ``regexp_extract``,
    no Python.
  * ``st_numgeometries``  — OGR_G_GetGeometryCount semantics
    (ogr/ogr_api.h, ogrgeometrycollection.cpp getNumGeometries +
    ogrpolygon: a POLYGON's sub-geometries are its RINGS): POINT /
    LINESTRING -> 0, POLYGON -> ring count, MULTI* / collection ->
    member count.
  * ``st_geometryn``      — OGR_G_GetGeometryRef(i), 0-based,
    out-of-range -> NULL; a POLYGON's n-th sub-geometry is its n-th
    ring exported as LINEARRING WKT (the reference's ring spelling).
  * ``st_multi``          — OGRGeometryFactory::forceToMultiPoint /
    forceToMultiLineString / forceToMultiPolygon
    (ogr/ogrgeometryfactory.cpp): single types wrap into their
    multi container; multi / collection inputs pass through.

Arrow-batched pandas UDFs over the codec (geometry/wkt.py parse_wkt);
dim-layer functions like the rest of the ST_* family.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

from gdal_spark.geometry.wkt import parse_wkt, payload_to_wkt

_CONTAINERS = ("MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON",
               "GEOMETRYCOLLECTION")


def _num_geometries(wkt: str) -> int:
    typ, payload = parse_wkt(wkt)
    if typ == "MULTIPOINT":
        return 0 if not payload else int(payload[0].shape[0])
    # TIN / POLYHEDRALSURFACE count their POLYGON patches
    # (ogrpolyhedralsurface.cpp getNumGeometries) but are SURFACES, not
    # collections — -explodecollections leaves them whole (_CONTAINERS)
    if typ in ("MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION",
               "POLYGON", "TIN", "POLYHEDRALSURFACE"):
        return len(payload)
    return 0


def _geometry_n(wkt: str, n: int):
    typ, payload = parse_wkt(wkt)
    if n < 0:
        return None
    if typ == "MULTIPOINT":
        pts = payload[0] if payload else None
        if pts is None or n >= pts.shape[0]:
            return None
        return payload_to_wkt("POINT", [pts[n : n + 1]])
    if typ == "MULTILINESTRING":
        if n >= len(payload):
            return None
        return payload_to_wkt("LINESTRING", [payload[n]])
    if typ in ("MULTIPOLYGON", "TIN", "POLYHEDRALSURFACE"):
        if n >= len(payload):
            return None
        return payload_to_wkt("POLYGON", payload[n])
    if typ == "GEOMETRYCOLLECTION":
        if n >= len(payload):
            return None
        t, p = payload[n]
        return payload_to_wkt(t, p)
    if typ == "POLYGON":
        # the reference hands back the ring itself (ogrpolygon.cpp
        # getGeometryRef -> OGRLinearRing)
        if n >= len(payload):
            return None
        return payload_to_wkt("LINEARRING", [payload[n]])
    return None


def _force_multi(wkt: str) -> str:
    typ, payload = parse_wkt(wkt)
    if typ == "POINT":
        return payload_to_wkt("MULTIPOINT", payload)
    if typ == "LINESTRING":
        return payload_to_wkt("MULTILINESTRING", payload)
    if typ == "POLYGON":
        return payload_to_wkt("MULTIPOLYGON", [payload])
    # multi / collection / empty inputs pass through canonically
    return payload_to_wkt(typ, payload)


def _explode_parts(wkt: str) -> list[str]:
    """One level of -explodecollections (gdalalg_vector_
    explode_collections.cpp / ogr2ogr): container members emitted
    as-is (canonical WKT), non-containers pass through as the single
    part."""
    typ, payload = parse_wkt(wkt)
    if typ not in _CONTAINERS:
        return [payload_to_wkt(typ, payload)]
    n = _num_geometries(wkt)
    return [_geometry_n(wkt, i) for i in range(n)]


def _swap_payload(typ, payload):
    if typ == "GEOMETRYCOLLECTION":
        return [(t, _swap_payload(t, p)) for t, p in payload]
    if typ == "MULTIPOLYGON":
        return [[r[:, ::-1] for r in rings] for rings in payload]
    return [a[:, ::-1] for a in payload]


def _swap_xy(wkt: str) -> str:
    """OGRGeometry::swapXY (ogrgeometry.cpp) over every vertex."""
    typ, payload = parse_wkt(wkt)
    return payload_to_wkt(typ, _swap_payload(typ, payload))


@F.pandas_udf(IntegerType())
def _st_numgeoms_udf(w: pd.Series) -> pd.Series:
    return w.map(_num_geometries)


@F.pandas_udf(StringType())
def _st_multi_udf(w: pd.Series) -> pd.Series:
    return w.map(_force_multi)


@F.pandas_udf(StringType())
def _st_geometryn_udf(w: pd.Series, n: pd.Series) -> pd.Series:
    return pd.Series(
        [_geometry_n(a, int(b)) for a, b in zip(w, n)], dtype=object
    )


def st_geometrytype(wkt) -> Column:
    """Geometry type name (getGeometryName): leading WKT token,
    uppercased — stays in whole-stage codegen."""
    col = wkt if isinstance(wkt, Column) else F.col(wkt)
    return F.upper(F.regexp_extract(col, r"^\s*([A-Za-z]+)", 1))


def st_numgeometries(wkt) -> Column:
    return _st_numgeoms_udf(wkt)


def st_geometryn(wkt, n) -> Column:
    n_col = F.lit(n) if isinstance(n, int) else n
    return _st_geometryn_udf(wkt, n_col)


def st_multi(wkt) -> Column:
    return _st_multi_udf(wkt)


@F.pandas_udf(ArrayType(StringType()))
def _st_explode_udf(w: pd.Series) -> pd.Series:
    return w.map(_explode_parts)


@F.pandas_udf(StringType())
def _st_swapxy_udf(w: pd.Series) -> pd.Series:
    return w.map(_swap_xy)


def st_explode_parts(wkt) -> Column:
    """array<string> of member WKTs — posexplode for the
    -explodecollections row fan-out."""
    return _st_explode_udf(wkt)


def st_swapxy(wkt) -> Column:
    return _st_swapxy_udf(wkt)
