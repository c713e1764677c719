"""Conic projections — Lambert Conformal Conic (2SP) and Albers Equal
Area (2SP), the engine's next OGRCoordinateTransformation targets after
web mercator (geometry/mercator.py) and UTM (geometry/tmerc.py).

The reference defers to PROJ (ogr/ogrct.cpp); we implement the standard
ellipsoidal closed forms directly (public formulas: Snyder, "Map
Projections — A Working Manual", USGS PP 1395; LCC eqs. 15-1..15-10,
Albers eqs. 14-1..14-6).  Per the engine's shared-formula discipline the
per-row math is emitted BOTH as numpy and as SQL text valid in Spark SQL
and DuckDB — projection constants (n, F, C, rho0) fold to E-notation
double literals in Python, so only sin/tan/ln/exp remain per-row and the
whole transform runs in whole-stage codegen.

Concrete CRS shipped:
  * :data:`LAMBERT93` — RGF93 / Lambert-93 (EPSG:2154 parameters;
    GRS80 vs WGS84 axis differences are < 0.1 mm for these formulas);
  * :data:`ALBERS_CONUS` — NAD83 / Conus Albers (EPSG:5070 parameters).

pow() is never used: t^n is rendered exp(n*ln(t)) in both numpy and SQL
so the two sides evaluate the identical primitive sequence.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

A_AXIS = 6378137.0
FLATTENING = 1.0 / 298.257223563
_E2 = FLATTENING * (2.0 - FLATTENING)
_E = math.sqrt(_E2)


def _d(v: float) -> str:
    return f"{v:.17e}"


def _m(phi: float) -> float:
    """Snyder 14-15: radius of the parallel / a."""
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - _E2 * s * s)


def _t(phi: float) -> float:
    """Snyder 15-9."""
    s = math.sin(phi)
    return math.tan(math.pi / 4.0 - phi / 2.0) / math.exp(
        (_E / 2.0) * math.log((1.0 - _E * s) / (1.0 + _E * s))
    )


def _q(phi: float) -> float:
    """Snyder 3-12 (authalic latitude kernel)."""
    s = math.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * math.log((1.0 - _E * s) / (1.0 + _E * s))
    )


# ------------------------------------------------------------------ LCC 2SP
@dataclass(frozen=True)
class LCC:
    """Lambert Conformal Conic, 2 standard parallels (ellipsoidal)."""

    lat1: float
    lat2: float
    lat0: float
    lon0: float
    fe: float
    fn: float

    @property
    def n(self) -> float:
        return (math.log(_m(math.radians(self.lat1))) - math.log(_m(math.radians(self.lat2)))) / (
            math.log(_t(math.radians(self.lat1))) - math.log(_t(math.radians(self.lat2)))
        )

    @property
    def f_const(self) -> float:
        return _m(math.radians(self.lat1)) / (
            self.n * math.exp(self.n * math.log(_t(math.radians(self.lat1))))
        )

    @property
    def rho0(self) -> float:
        return A_AXIS * self.f_const * math.exp(
            self.n * math.log(_t(math.radians(self.lat0)))
        )


LAMBERT93 = LCC(lat1=44.0, lat2=49.0, lat0=46.5, lon0=3.0, fe=700000.0, fn=6600000.0)


def lcc_forward(lat, lon, crs: LCC = LAMBERT93):
    """numpy forward: (easting, northing)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    phi = lat * math.pi / 180.0
    s = np.sin(phi)
    t = np.tan(math.pi / 4.0 - phi / 2.0) / np.exp(
        (_E / 2.0) * np.log((1.0 - _E * s) / (1.0 + _E * s))
    )
    rho = A_AXIS * crs.f_const * np.exp(crs.n * np.log(t))
    theta = crs.n * ((lon - crs.lon0) * math.pi / 180.0)
    x = crs.fe + rho * np.sin(theta)
    y = crs.fn + crs.rho0 - rho * np.cos(theta)
    return x, y


def lcc_inverse(x, y, crs: LCC = LAMBERT93, iters: int = 8):
    """numpy inverse (Snyder 15-11: iterate phi from t)."""
    x = np.asarray(x, dtype=np.float64) - crs.fe
    yp = crs.rho0 - (np.asarray(y, dtype=np.float64) - crs.fn)
    rho = np.sign(crs.n) * np.sqrt(x * x + yp * yp)
    theta = np.arctan2(x, yp)
    t = np.exp(np.log(rho / (A_AXIS * crs.f_const)) / crs.n)
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        s = np.sin(phi)
        phi = math.pi / 2.0 - 2.0 * np.arctan(
            t * np.exp((_E / 2.0) * np.log((1.0 - _E * s) / (1.0 + _E * s)))
        )
    lon = crs.lon0 + np.degrees(theta / crs.n)
    return np.degrees(phi), lon


def _sql_t(lat: str) -> str:
    phi = f"(({lat}) * pi() / 1.8e2)"
    s = f"sin({phi})"
    return (
        f"(tan(pi() / 4.0e0 - {phi} / 2.0e0) / "
        f"exp({_d(_E / 2.0)} * ln((1.0e0 - {_d(_E)} * {s}) / (1.0e0 + {_d(_E)} * {s}))))"
    )


def sql_lcc_easting(lat: str, lon: str, crs: LCC = LAMBERT93) -> str:
    rho = f"({_d(A_AXIS * crs.f_const)} * exp({_d(crs.n)} * ln({_sql_t(lat)})))"
    theta = f"({_d(crs.n)} * ((({lon}) - {_d(crs.lon0)}) * pi() / 1.8e2))"
    return f"({_d(crs.fe)} + {rho} * sin({theta}))"


def sql_lcc_northing(lat: str, lon: str, crs: LCC = LAMBERT93) -> str:
    rho = f"({_d(A_AXIS * crs.f_const)} * exp({_d(crs.n)} * ln({_sql_t(lat)})))"
    theta = f"({_d(crs.n)} * ((({lon}) - {_d(crs.lon0)}) * pi() / 1.8e2))"
    return f"({_d(crs.fn)} + {_d(crs.rho0)} - {rho} * cos({theta}))"


# --------------------------------------------------------------- Albers 2SP
@dataclass(frozen=True)
class Albers:
    """Albers Equal Area, 2 standard parallels (ellipsoidal)."""

    lat1: float
    lat2: float
    lat0: float
    lon0: float
    fe: float
    fn: float

    @property
    def n(self) -> float:
        m1 = _m(math.radians(self.lat1))
        m2 = _m(math.radians(self.lat2))
        return (m1 * m1 - m2 * m2) / (_q(math.radians(self.lat2)) - _q(math.radians(self.lat1)))

    @property
    def c_const(self) -> float:
        m1 = _m(math.radians(self.lat1))
        return m1 * m1 + self.n * _q(math.radians(self.lat1))

    @property
    def rho0(self) -> float:
        return A_AXIS * math.sqrt(self.c_const - self.n * _q(math.radians(self.lat0))) / self.n


ALBERS_CONUS = Albers(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0, fe=0.0, fn=0.0)


def albers_forward(lat, lon, crs: Albers = ALBERS_CONUS):
    """numpy forward: (easting, northing)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    phi = lat * math.pi / 180.0
    s = np.sin(phi)
    q = (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
    )
    rho = A_AXIS * np.sqrt(crs.c_const - crs.n * q) / crs.n
    theta = crs.n * ((lon - crs.lon0) * math.pi / 180.0)
    x = crs.fe + rho * np.sin(theta)
    y = crs.fn + crs.rho0 - rho * np.cos(theta)
    return x, y


def albers_inverse(x, y, crs: Albers = ALBERS_CONUS, iters: int = 10):
    """numpy inverse (Snyder 14-19: Newton on q->phi)."""
    x = np.asarray(x, dtype=np.float64) - crs.fe
    yp = crs.rho0 - (np.asarray(y, dtype=np.float64) - crs.fn)
    rho = np.sqrt(x * x + yp * yp)
    theta = np.arctan2(x, yp)
    q = (crs.c_const - (rho * crs.n / A_AXIS) ** 2) / crs.n
    phi = np.arcsin(q / 2.0)
    for _ in range(iters):
        s = np.sin(phi)
        one = 1.0 - _E2 * s * s
        phi = phi + (one * one / (2.0 * np.cos(phi))) * (
            q / (1.0 - _E2)
            - s / one
            + (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
        )
    lon = crs.lon0 + np.degrees(theta / crs.n)
    return np.degrees(phi), lon


def _sql_q(lat: str) -> str:
    phi = f"(({lat}) * pi() / 1.8e2)"
    s = f"sin({phi})"
    return (
        f"({_d(1.0 - _E2)} * ({s} / (1.0e0 - {_d(_E2)} * {s} * {s}) - "
        f"{_d(1.0 / (2.0 * _E))} * ln((1.0e0 - {_d(_E)} * {s}) / (1.0e0 + {_d(_E)} * {s}))))"
    )


def sql_albers_easting(lat: str, lon: str, crs: Albers = ALBERS_CONUS) -> str:
    rho = f"({_d(A_AXIS)} * sqrt({_d(crs.c_const)} - {_d(crs.n)} * {_sql_q(lat)}) / {_d(crs.n)})"
    theta = f"({_d(crs.n)} * ((({lon}) - {_d(crs.lon0)}) * pi() / 1.8e2))"
    return f"({_d(crs.fe)} + {rho} * sin({theta}))"


def sql_albers_northing(lat: str, lon: str, crs: Albers = ALBERS_CONUS) -> str:
    rho = f"({_d(A_AXIS)} * sqrt({_d(crs.c_const)} - {_d(crs.n)} * {_sql_q(lat)}) / {_d(crs.n)})"
    theta = f"({_d(crs.n)} * ((({lon}) - {_d(crs.lon0)}) * pi() / 1.8e2))"
    return f"({_d(crs.fn)} + {_d(crs.rho0)} - {rho} * cos({theta}))"


# --------------------------------------------- inverse SQL stage chains
# The fixed-iteration numpy inverses above unroll into straight-line
# (column, expr) chains, same pattern as tmerc.sql_tm_inverse_stages —
# identical text both engines, term order mirrors the numpy kernels.


def sql_lcc_inverse_stages(
    x: str, y: str, crs: LCC = LAMBERT93, prefix: str = "i_"
) -> list[tuple[str, str]]:
    """Snyder 15-11 phi iteration (8 rounds, = lcc_inverse) unrolled;
    final columns {prefix}lat / {prefix}lon (degrees)."""
    u = prefix
    sgn = _d(1.0 if crs.n >= 0 else -1.0)
    st = [
        (f"{u}dx", f"(({x}) - {_d(crs.fe)})"),
        (f"{u}yp", f"({_d(crs.rho0)} - (({y}) - {_d(crs.fn)}))"),
        (f"{u}rho", f"({sgn} * sqrt({u}dx * {u}dx + {u}yp * {u}yp))"),
        (f"{u}theta", f"atan2({u}dx, {u}yp)"),
        (
            f"{u}t",
            f"exp(ln({u}rho / {_d(A_AXIS * crs.f_const)}) / {_d(crs.n)})",
        ),
        (f"{u}phi0", f"(pi() / 2.0e0 - 2.0e0 * atan({u}t))"),
    ]
    for k in range(8):
        s = f"sin({u}phi{k})"
        st.append(
            (
                f"{u}phi{k + 1}",
                f"(pi() / 2.0e0 - 2.0e0 * atan({u}t * exp({_d(_E / 2.0)}"
                f" * ln((1.0e0 - {_d(_E)} * {s}) / (1.0e0 + {_d(_E)} * {s})))))",
            )
        )
    st.append((f"{u}lat", f"({u}phi8 * 1.8e2 / pi())"))
    st.append(
        (f"{u}lon", f"({_d(crs.lon0)} + ({u}theta / {_d(crs.n)}) * 1.8e2 / pi())")
    )
    return st


def sql_albers_inverse_stages(
    x: str, y: str, crs: Albers = ALBERS_CONUS, prefix: str = "i_"
) -> list[tuple[str, str]]:
    """Snyder 14-19 Newton on q -> phi (10 rounds, = albers_inverse)
    unrolled; final columns {prefix}lat / {prefix}lon (degrees)."""
    u = prefix
    st = [
        (f"{u}dx", f"(({x}) - {_d(crs.fe)})"),
        (f"{u}yp", f"({_d(crs.rho0)} - (({y}) - {_d(crs.fn)}))"),
        (f"{u}rho", f"sqrt({u}dx * {u}dx + {u}yp * {u}yp)"),
        (f"{u}theta", f"atan2({u}dx, {u}yp)"),
        (
            f"{u}q",
            f"(({_d(crs.c_const)} - ({u}rho * {_d(crs.n)} / {_d(A_AXIS)})"
            f" * ({u}rho * {_d(crs.n)} / {_d(A_AXIS)})) / {_d(crs.n)})",
        ),
        (f"{u}phi0", f"asin({u}q / 2.0e0)"),
    ]
    for k in range(10):
        s = f"sin({u}phi{k})"
        one = f"(1.0e0 - {_d(_E2)} * {s} * {s})"
        st.append(
            (
                f"{u}phi{k + 1}",
                f"({u}phi{k} + ({one} * {one} / (2.0e0 * cos({u}phi{k})))"
                f" * ({u}q / {_d(1.0 - _E2)} - {s} / {one}"
                f" + {_d(1.0 / (2.0 * _E))} * ln((1.0e0 - {_d(_E)} * {s})"
                f" / (1.0e0 + {_d(_E)} * {s}))))",
            )
        )
    st.append((f"{u}lat", f"({u}phi10 * 1.8e2 / pi())"))
    st.append(
        (f"{u}lon", f"({_d(crs.lon0)} + ({u}theta / {_d(crs.n)}) * 1.8e2 / pi())")
    )
    return st
