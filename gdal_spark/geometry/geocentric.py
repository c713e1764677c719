"""Geocentric (ECEF) conversion + Helmert 7-parameter datum shift.

The reference's OGRCoordinateTransformation (ogr/ogrct.cpp) routes datum
changes through PROJ's geocentric pipeline: geodetic -> geocentric
cartesian (EPSG method 9602), Helmert 7-parameter position-vector
transform (EPSG method 9606), geocentric -> geodetic on the target
ellipsoid.  We implement that pipeline with public closed forms:

  * geodetic->ECEF: N = a / sqrt(1 - e^2 sin^2(phi));
    X = (N+h) cos(phi) cos(lam), Y = (N+h) cos(phi) sin(lam),
    Z = (N (1-e^2) + h) sin(phi).
  * Helmert position-vector (small-angle):
    X2 = tx + (1+ds) (X - rz Y + ry Z)
    Y2 = ty + (1+ds) (rz X + Y - rx Z)
    Z2 = tz + (1+ds) (-ry X + rx Y + Z)
  * ECEF->geodetic: Bowring's single-shot formula (Bowring 1976,
    "Transformation from spatial to geographical coordinates"):
    p = sqrt(X^2+Y^2); u = atan(Z a / (p b));
    phi = atan((Z + e'^2 b sin^3 u) / (p - e^2 a cos^3 u));
    lam = atan2(Y, X).
    Single-shot Bowring is exact to ~1e-10 deg for |h| < 10 km —
    DOCUMENTED divergence from PROJ's iterative refinement, far below
    the engine's nano-degree output quantization.

Shipped transform: WGS84 -> OSGB36 (Airy 1830), the EPSG:1314 reverse
parameters (tx=-446.448 m, ty=+125.157, tz=-542.060, rx=-0.1502",
ry=-0.2470", rz=-0.8421", ds=20.4894 ppm) — the standard ~100 m
London-area shift.

Per the engine's shared-formula discipline every stage is emitted both
as numpy and as SQL text valid in Spark SQL and DuckDB (constants as
17-digit E-notation literals; only sqrt/sin/cos/atan/atan2 remain
per-row, all libm-correct on both engines), so the whole pipeline runs
in whole-stage codegen and the oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

# WGS84
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
# Airy 1830 (OSGB36)
AIRY_A = 6377563.396
AIRY_F = 1.0 / 299.3249646

_ARCSEC = math.pi / (180.0 * 3600.0)


def _d(v: float) -> str:
    return f"{v:.17e}"


@dataclass(frozen=True)
class Helmert:
    """Position-vector 7-parameter transform (EPSG method 9606)."""

    tx: float
    ty: float
    tz: float
    rx_as: float  # arc-seconds
    ry_as: float
    rz_as: float
    ds_ppm: float

    @property
    def rx(self) -> float:
        return self.rx_as * _ARCSEC

    @property
    def ry(self) -> float:
        return self.ry_as * _ARCSEC

    @property
    def rz(self) -> float:
        return self.rz_as * _ARCSEC

    @property
    def scale(self) -> float:
        return 1.0 + self.ds_ppm * 1.0e-6


# WGS84 -> OSGB36 (reverse of EPSG:1314 OSGB36->WGS84)
WGS84_TO_OSGB36 = Helmert(
    tx=-446.448, ty=125.157, tz=-542.060,
    rx_as=-0.1502, ry_as=-0.2470, rz_as=-0.8421,
    ds_ppm=20.4894,
)


def inverse(h: Helmert) -> Helmert:
    """Small-angle inverse: negate every parameter (standard EPSG
    practice; second-order terms ~r*ds are sub-micrometre)."""
    return Helmert(-h.tx, -h.ty, -h.tz, -h.rx_as, -h.ry_as, -h.rz_as, -h.ds_ppm)


# ------------------------------------------------------------------- numpy

def geodetic_to_ecef(lat_deg, lon_deg, h=0.0, a: float = WGS84_A, f: float = WGS84_F):
    lat = np.asarray(lat_deg, dtype=np.float64) * math.pi / 180.0
    lon = np.asarray(lon_deg, dtype=np.float64) * math.pi / 180.0
    e2 = f * (2.0 - f)
    s = np.sin(lat)
    n = a / np.sqrt(1.0 - e2 * s * s)
    x = (n + h) * np.cos(lat) * np.cos(lon)
    y = (n + h) * np.cos(lat) * np.sin(lon)
    z = (n * (1.0 - e2) + h) * s
    return x, y, z


def helmert_apply(x, y, z, t: Helmert = WGS84_TO_OSGB36):
    m = t.scale
    x2 = t.tx + m * (x - t.rz * y + t.ry * z)
    y2 = t.ty + m * (t.rz * x + y - t.rx * z)
    z2 = t.tz + m * (-t.ry * x + t.rx * y + z)
    return x2, y2, z2


def ecef_to_geodetic(x, y, z, a: float = AIRY_A, f: float = AIRY_F):
    """Bowring single-shot; returns (lat_deg, lon_deg, h)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    b = a * (1.0 - f)
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = np.sqrt(x * x + y * y)
    u = np.arctan(z * a / (p * b))
    su, cu = np.sin(u), np.cos(u)
    lat = np.arctan((z + ep2 * b * su * su * su) / (p - e2 * a * cu * cu * cu))
    lon = np.arctan2(y, x)
    s = np.sin(lat)
    n = a / np.sqrt(1.0 - e2 * s * s)
    h = p / np.cos(lat) - n
    return np.degrees(lat), np.degrees(lon), h


def wgs84_to_osgb36(lat_deg, lon_deg, h=0.0):
    x, y, z = geodetic_to_ecef(lat_deg, lon_deg, h)
    x2, y2, z2 = helmert_apply(x, y, z)
    return ecef_to_geodetic(x2, y2, z2)


def osgb36_to_wgs84(lat_deg, lon_deg, h=0.0):
    x, y, z = geodetic_to_ecef(lat_deg, lon_deg, h, a=AIRY_A, f=AIRY_F)
    x2, y2, z2 = helmert_apply(x, y, z, inverse(WGS84_TO_OSGB36))
    return ecef_to_geodetic(x2, y2, z2, a=WGS84_A, f=WGS84_F)


# ----------------------------------------------------- shared SQL builders
# Each stage returns SELECT-list fragments referencing the previous
# stage's column names, so the pipeline is identical chained projections
# on both engines (Spark selectExpr chain / DuckDB WITH chain).

def sql_ecef_stage(lat: str, lon: str, a: float = WGS84_A, f: float = WGS84_F) -> list[str]:
    """['... AS gx', '... AS gy', '... AS gz'] from lat/lon columns (h=0)."""
    e2 = f * (2.0 - f)
    phi = f"(({lat}) * pi() / 1.8e2)"
    lam = f"(({lon}) * pi() / 1.8e2)"
    s = f"sin({phi})"
    n = f"({_d(a)} / sqrt(1.0e0 - {_d(e2)} * {s} * {s}))"
    return [
        f"({n} * cos({phi}) * cos({lam})) AS gx",
        f"({n} * cos({phi}) * sin({lam})) AS gy",
        f"({n} * {_d(1.0 - e2)} * {s}) AS gz",
    ]


def sql_helmert_stage(t: Helmert = WGS84_TO_OSGB36) -> list[str]:
    """['... AS hx', '... AS hy', '... AS hz'] from gx/gy/gz."""
    m, rx, rz = _d(t.scale), _d(t.rx), _d(t.rz)
    return [
        f"({_d(t.tx)} + {m} * (gx - {rz} * gy + {_d(t.ry)} * gz)) AS hx",
        f"({_d(t.ty)} + {m} * ({rz} * gx + gy - {rx} * gz)) AS hy",
        f"({_d(t.tz)} + {m} * ({_d(-t.ry)} * gx + {rx} * gy + gz)) AS hz",
    ]


def sql_geodetic_stage(a: float = AIRY_A, f: float = AIRY_F) -> list[str]:
    """['... AS olat', '... AS olon'] from hx/hy/hz (Bowring)."""
    b = a * (1.0 - f)
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = "sqrt(hx * hx + hy * hy)"
    u = f"atan(hz * {_d(a)} / ({p} * {_d(b)}))"
    su, cu = f"sin({u})", f"cos({u})"
    lat = (
        f"atan((hz + {_d(ep2 * b)} * {su} * {su} * {su}) / "
        f"({p} - {_d(e2 * a)} * {cu} * {cu} * {cu}))"
    )
    return [
        f"({lat} * 1.8e2 / pi()) AS olat",
        f"(atan2(hy, hx) * 1.8e2 / pi()) AS olon",
    ]
