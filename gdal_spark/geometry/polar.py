"""Polar Stereographic (variant B, standard parallel) — the azimuthal
member of the engine's OGRCoordinateTransformation family (after
mercator, transverse mercator, LCC, Albers).

Reference defers to PROJ (ogr/ogrct.cpp); formulas are the public
ellipsoidal closed forms (Snyder PP 1395 eqs. 21-33..21-36 / EPSG
Guidance 7-2 "Polar Stereographic variant B").  Shipped CRS parameter
sets:

  * :data:`NSIDC_NORTH` — WGS84 / NSIDC Sea Ice Polar Stereographic
    North (EPSG:3413 parameters: lat_ts 70N, lon0 -45);
  * :data:`ANT_POLAR`   — WGS84 / Australian Antarctic Polar
    Stereographic (EPSG:3032 parameters: lat_ts 71S, lon0 70,
    FE = FN = 6 000 000) — the EPSG guidance worked example
    (75S, 120E -> E 7255380.79, N 7053389.56) pins the constants.

Shared-formula discipline: the scale constant k = a*mF/tF folds to a
double literal; the per-row SQL text (sin/tan/exp/ln only) is identical
in Spark whole-stage codegen and DuckDB.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from gdal_spark.geometry.conic import _E, _E2, _d, _m, _t, A_AXIS


@dataclass(frozen=True)
class PolarStereo:
    north: bool
    lat_ts: float  # standard parallel (signed)
    lon0: float
    fe: float
    fn: float

    @property
    def k(self) -> float:
        """a * mF / tF — folded scale constant."""
        aphi = math.radians(abs(self.lat_ts))
        return A_AXIS * _m(aphi) / _t(aphi)


NSIDC_NORTH = PolarStereo(north=True, lat_ts=70.0, lon0=-45.0, fe=0.0, fn=0.0)
ANT_POLAR = PolarStereo(north=False, lat_ts=-71.0, lon0=70.0, fe=6.0e6, fn=6.0e6)


def ps_forward(lat, lon, crs: PolarStereo):
    """numpy forward: (easting, northing)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    aphi = (lat if crs.north else -lat) * math.pi / 180.0
    s = np.sin(aphi)
    t = np.tan(math.pi / 4.0 - aphi / 2.0) / np.exp(
        (_E / 2.0) * np.log((1.0 - _E * s) / (1.0 + _E * s))
    )
    rho = crs.k * t
    theta = (lon - crs.lon0) * math.pi / 180.0
    x = crs.fe + rho * np.sin(theta)
    y = crs.fn + (-rho if crs.north else rho) * np.cos(theta)
    return x, y


def ps_inverse(x, y, crs: PolarStereo, iters: int = 8):
    """numpy inverse (Snyder 7-9 iteration on the conformal latitude)."""
    dx = np.asarray(x, dtype=np.float64) - crs.fe
    dy = np.asarray(y, dtype=np.float64) - crs.fn
    rho = np.sqrt(dx * dx + dy * dy)
    t = rho / crs.k
    aphi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        s = np.sin(aphi)
        aphi = math.pi / 2.0 - 2.0 * np.arctan(
            t * np.exp((_E / 2.0) * np.log((1.0 - _E * s) / (1.0 + _E * s)))
        )
    theta = np.arctan2(dx, -dy if crs.north else dy)
    lat = np.degrees(aphi) * (1.0 if crs.north else -1.0)
    lon = (crs.lon0 + np.degrees(theta) + 180.0) % 360.0 - 180.0
    return lat, lon


def _sql_t_abs(lat: str, north: bool) -> str:
    """Snyder 15-9 t of the pole-positive latitude."""
    sgn = "" if north else "(0.0e0 - 1.0e0) * "
    phi = f"({sgn}({lat}) * pi() / 1.8e2)"
    s = f"sin({phi})"
    return (
        f"(tan(pi() / 4.0e0 - {phi} / 2.0e0) / "
        f"exp({_d(_E / 2.0)} * ln((1.0e0 - {_d(_E)} * {s}) / (1.0e0 + {_d(_E)} * {s}))))"
    )


def sql_ps_easting(lat: str, lon: str, crs: PolarStereo) -> str:
    rho = f"({_d(crs.k)} * {_sql_t_abs(lat, crs.north)})"
    theta = f"((({lon}) - {_d(crs.lon0)}) * pi() / 1.8e2)"
    return f"({_d(crs.fe)} + {rho} * sin({theta}))"


def sql_ps_northing(lat: str, lon: str, crs: PolarStereo) -> str:
    rho = f"({_d(crs.k)} * {_sql_t_abs(lat, crs.north)})"
    theta = f"((({lon}) - {_d(crs.lon0)}) * pi() / 1.8e2)"
    sgn = "(0.0e0 - 1.0e0) * " if crs.north else ""
    return f"({_d(crs.fn)} + {sgn}{rho} * cos({theta}))"


def sql_ps_inverse_stages(
    x: str, y: str, crs: PolarStereo, prefix: str = "i_"
) -> list[tuple[str, str]]:
    """Snyder 7-9 conformal-latitude iteration (8 rounds, = ps_inverse)
    unrolled into a (column, expr) chain — identical text both engines;
    final columns {prefix}lat / {prefix}lon (degrees; longitude wrapped
    once into (-180, 180], matching the numpy kernel except at exactly
    +-180, which the fixtures avoid)."""
    u = prefix
    st = [
        (f"{u}dx", f"(({x}) - {_d(crs.fe)})"),
        (f"{u}dy", f"(({y}) - {_d(crs.fn)})"),
        (f"{u}rho", f"sqrt({u}dx * {u}dx + {u}dy * {u}dy)"),
        (f"{u}t", f"({u}rho / {_d(crs.k)})"),
        (f"{u}aphi0", f"(pi() / 2.0e0 - 2.0e0 * atan({u}t))"),
    ]
    for k in range(8):
        s = f"sin({u}aphi{k})"
        st.append(
            (
                f"{u}aphi{k + 1}",
                f"(pi() / 2.0e0 - 2.0e0 * atan({u}t * exp({_d(_E / 2.0)}"
                f" * ln((1.0e0 - {_d(_E)} * {s}) / (1.0e0 + {_d(_E)} * {s})))))",
            )
        )
    ysgn = f"(0.0e0 - {u}dy)" if crs.north else f"{u}dy"
    latsgn = "" if crs.north else "(0.0e0 - 1.0e0) * "
    st.append((f"{u}theta", f"atan2({u}dx, {ysgn})"))
    st.append((f"{u}lat", f"({latsgn}{u}aphi8 * 1.8e2 / pi())"))
    raw = f"({_d(crs.lon0)} + {u}theta * 1.8e2 / pi())"
    st.append(
        (
            f"{u}lon",
            f"(CASE WHEN {raw} > 1.8e2 THEN {raw} - 3.6e2"
            f" WHEN {raw} <= -1.8e2 THEN {raw} + 3.6e2 ELSE {raw} END)",
        )
    )
    return st
