"""Z (2.5-D) geometry function surface.

The reference's 2.5-D classes (ogr/ogr_core.h:447-498 wkbPoint25D
family) flow through importFromWkt / exportToWkt / flattenTo2D
(ogr/ogrgeometry.cpp) and the SQLite dialect's 3-argument
ST_MakePoint(x, y, z) (ogr/ogrsqlitesqlfunctions.cpp MakePoint
overload).  Column functions here:

  * ``st_z``          — z of a POINT Z (NULL for 2-D), OGRPoint::getZ;
  * ``st_force2d``    — flattenTo2D re-serialization;
  * ``st_force3d``    — set z (existing z preserved, missing -> value);
  * ``st_makepoint_z``— the 3-arg MakePoint;
  * ``st_length3d``   — 3-D polyline length (engine extension in the
    spirit of the dialect's ST_3DDistance: sqrt(dx²+dy²+dz²) summed);
  * ``st_m`` / ``st_is_measured`` / ``st_drop_m`` /
    ``st_makepoint_m`` / ``st_makepoint_zm`` — the measured (M/ZM)
    family: OGRPoint::getM, OGRGeometry::IsMeasured,
    setMeasured(FALSE), ISO WKT dimension preamble
    (ogr_core.h:465-498, ogrgeometry.cpp:1808).

Arrow-batched pandas UDFs over the Z-aware codec (geometry/wkt.py
parse_wkt_z).  Like the rest of the ST_* family these are dim-layer
functions — per-row string parsing, not a corpus hot path.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, StringType

from gdal_spark.geometry.wkt import (
    parse_wkt_z,
    parse_wkt_zm,
    payload_to_wkt_z,
    payload_to_wkt_zm,
)


def _z_of(wkt: str):
    typ, payload, has_z = parse_wkt_z(wkt)
    if typ != "POINT" or not has_z:
        return None
    return float(payload[0][0][2])


def _force2d(wkt: str) -> str:
    try:
        typ, payload, _ = parse_wkt_z(wkt)
    except ValueError:
        # container types (MULTI*/GEOMETRYCOLLECTION) go through the 2-D
        # grammar only: a 2-D container is already flat (identity); a
        # dimensioned container is an honest unsupported case, not a
        # silent wrong answer
        if " Z " in wkt or " M " in wkt or " ZM " in wkt:
            raise
        return wkt
    return payload_to_wkt_z(typ, payload, has_z=False)


def _force3d(wkt: str, z: float) -> str:
    typ, payload, has_z = parse_wkt_z(wkt)
    if not has_z:
        for arr in _rings(typ, payload):
            arr[:, 2] = z
    return payload_to_wkt_z(typ, payload, has_z=True)


def _rings(typ, payload):
    return payload


def _length3d(wkt: str):
    typ, payload, _ = parse_wkt_z(wkt)
    if typ != "LINESTRING" or len(payload[0]) < 2:
        return None
    pts = payload[0]
    total = 0.0
    for i in range(len(pts) - 1):
        dx = pts[i + 1][0] - pts[i][0]
        dy = pts[i + 1][1] - pts[i][1]
        dz = pts[i + 1][2] - pts[i][2]
        total += math.sqrt(dx * dx + dy * dy + dz * dz)
    return total


@F.pandas_udf(DoubleType())
def _st_z_udf(w: pd.Series) -> pd.Series:
    return w.map(_z_of)


@F.pandas_udf(StringType())
def _st_force2d_udf(w: pd.Series) -> pd.Series:
    return w.map(_force2d)


@F.pandas_udf(StringType())
def _st_force3d_udf(w: pd.Series, z: pd.Series) -> pd.Series:
    return pd.Series([_force3d(a, b) for a, b in zip(w, z)])


@F.pandas_udf(DoubleType())
def _st_length3d_udf(w: pd.Series) -> pd.Series:
    return w.map(_length3d)


def st_z(wkt) -> Column:
    return _st_z_udf(wkt)


def st_force2d(wkt) -> Column:
    return _st_force2d_udf(wkt)


def st_force3d(wkt, z) -> Column:
    return _st_force3d_udf(wkt, z)


def st_length3d(wkt) -> Column:
    return _st_length3d_udf(wkt)


# --------------------------------------------------------- M variants
# Measured geometry (ogr/ogr_core.h:465-498 wkbPointM/wkbPointZM; WKT
# dimension preamble ogrgeometry.cpp:1808 importPreambleFromWkt):
# OGRPoint::getM, OGRGeometry::IsMeasured, setMeasured(FALSE) (drop M,
# keep Z) and the measured MakePoint spellings.


def _m_of(wkt: str):
    typ, payload, _, has_m = parse_wkt_zm(wkt)
    if typ != "POINT" or not has_m or not payload:
        return None
    return float(payload[0][0][3])


def _is_measured(wkt: str) -> bool:
    return parse_wkt_zm(wkt)[3]


def _drop_m(wkt: str) -> str:
    typ, payload, has_z, _ = parse_wkt_zm(wkt)
    return payload_to_wkt_zm(typ, payload, has_z, has_m=False)


@F.pandas_udf(DoubleType())
def _st_m_udf(w: pd.Series) -> pd.Series:
    return w.map(_m_of)


@F.pandas_udf(BooleanType())
def _st_ismeasured_udf(w: pd.Series) -> pd.Series:
    return w.map(_is_measured)


@F.pandas_udf(StringType())
def _st_dropm_udf(w: pd.Series) -> pd.Series:
    return w.map(_drop_m)


def st_m(wkt) -> Column:
    return _st_m_udf(wkt)


def st_is_measured(wkt) -> Column:
    return _st_ismeasured_udf(wkt)


def st_drop_m(wkt) -> Column:
    """setMeasured(FALSE): strip the measure dimension, keep Z."""
    return _st_dropm_udf(wkt)


def st_makepoint_m(x, y, m) -> Column:
    """'POINT M (x y m)' (ISO measured spelling)."""
    from gdal_spark.geometry.wkt import _fmt

    @F.pandas_udf(StringType())
    def mk(xs: pd.Series, ys: pd.Series, ms: pd.Series) -> pd.Series:
        return pd.Series(
            [
                f"POINT M ({_fmt(a)} {_fmt(b)} {_fmt(c)})"
                for a, b, c in zip(xs, ys, ms)
            ]
        )

    return mk(x, y, m)


def st_makepoint_zm(x, y, z, m) -> Column:
    """'POINT ZM (x y z m)'."""
    from gdal_spark.geometry.wkt import _fmt

    @F.pandas_udf(StringType())
    def mk(
        xs: pd.Series, ys: pd.Series, zs: pd.Series, ms: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                f"POINT ZM ({_fmt(a)} {_fmt(b)} {_fmt(c)} {_fmt(d)})"
                for a, b, c, d in zip(xs, ys, zs, ms)
            ]
        )

    return mk(x, y, z, m)


def st_makepoint_z(x, y, z) -> Column:
    """3-arg ST_MakePoint: 'POINT Z (x y z)' (canonical spelling)."""
    from gdal_spark.geometry.wkt import _fmt  # trimming formatter

    @F.pandas_udf(StringType())
    def mk(xs: pd.Series, ys: pd.Series, zs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                f"POINT Z ({_fmt(a)} {_fmt(b)} {_fmt(c)})"
                for a, b, c in zip(xs, ys, zs)
            ]
        )

    return mk(x, y, z)
