"""Lambert Azimuthal Equal Area (ellipsoidal, oblique aspect) — the
kernel behind EPSG:3035 (ETRS89 / LAEA Europe), the pan-European
statistical grid CRS.

The reference defers to PROJ (ogr/ogrct.cpp; EPSG method 9820); we
implement the standard ellipsoidal formulas directly (public: Snyder,
"Map Projections — A Working Manual", USGS PP 1395, eqs. 24-26..24-34 +
3-11/3-12/3-16; identical to the EPSG Guidance Note 7-2 method 9820
equations).  Per the engine's shared-formula discipline the math is
emitted BOTH as numpy and as SQL text valid in Spark SQL and DuckDB —
projection constants (q_p, beta_0, R_q, D) fold to E-notation double
literals, so only sin/cos/asin/atan2/ln remain per-row and the whole
transform runs in whole-stage codegen.

Ellipsoid: WGS84 axes (the GRS80 flattening difference moves positions
by < 1 mm for these formulas — same documented simplification as
conic.LAMBERT93).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from gdal_spark.geometry.conic import _E, _E2, _d, _q, A_AXIS


@dataclass(frozen=True)
class LAEA:
    """Lambert Azimuthal Equal Area (ellipsoidal, oblique)."""

    lat0: float
    lon0: float
    fe: float
    fn: float

    @property
    def qp(self) -> float:
        return _q(math.pi / 2.0)

    @property
    def beta0(self) -> float:
        return math.asin(_q(math.radians(self.lat0)) / self.qp)

    @property
    def rq(self) -> float:
        return A_AXIS * math.sqrt(self.qp / 2.0)

    @property
    def d_const(self) -> float:
        phi0 = math.radians(self.lat0)
        s = math.sin(phi0)
        m0 = math.cos(phi0) / math.sqrt(1.0 - _E2 * s * s)
        return A_AXIS * m0 / (self.rq * math.cos(self.beta0))


# EPSG:3035 ETRS89 / LAEA Europe
LAEA_EUROPE = LAEA(lat0=52.0, lon0=10.0, fe=4321000.0, fn=3210000.0)


def laea_forward(lat, lon, crs: LAEA = LAEA_EUROPE):
    """numpy forward: (easting, northing) — Snyder 24-26..24-28."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    phi = lat * math.pi / 180.0
    s = np.sin(phi)
    q = (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
    )
    beta = np.arcsin(q / crs.qp)
    dlam = (lon - crs.lon0) * math.pi / 180.0
    sb0, cb0 = math.sin(crs.beta0), math.cos(crs.beta0)
    b = crs.rq * np.sqrt(
        2.0 / (1.0 + sb0 * np.sin(beta) + cb0 * np.cos(beta) * np.cos(dlam))
    )
    x = crs.fe + b * crs.d_const * np.cos(beta) * np.sin(dlam)
    y = crs.fn + (b / crs.d_const) * (
        cb0 * np.sin(beta) - sb0 * np.cos(beta) * np.cos(dlam)
    )
    return x, y


def laea_inverse(x, y, crs: LAEA = LAEA_EUROPE, iters: int = 8):
    """numpy inverse — Snyder 24-29..24-31 + the 3-16 phi iteration."""
    xp = (np.asarray(x, dtype=np.float64) - crs.fe) / crs.d_const
    yp = crs.d_const * (np.asarray(y, dtype=np.float64) - crs.fn)
    rho = np.sqrt(xp * xp + yp * yp)
    ce = 2.0 * np.arcsin(rho / (2.0 * crs.rq))
    sb0, cb0 = math.sin(crs.beta0), math.cos(crs.beta0)
    qd = crs.qp * (
        np.cos(ce) * sb0 + np.where(rho > 0, yp * np.sin(ce) * cb0 / rho, 0.0)
    )
    lon = crs.lon0 + np.degrees(
        np.arctan2(
            xp * np.sin(ce),
            rho * cb0 * np.cos(ce) - yp * sb0 * np.sin(ce),
        )
    )
    phi = np.arcsin(qd / 2.0)
    for _ in range(iters):
        s = np.sin(phi)
        one = 1.0 - _E2 * s * s
        phi = phi + (one * one / (2.0 * np.cos(phi))) * (
            qd / (1.0 - _E2)
            - s / one
            + (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
        )
    return np.degrees(phi), lon


def _sql_q(lat: str) -> str:
    phi = f"(({lat}) * pi() / 1.8e2)"
    s = f"sin({phi})"
    return (
        f"({_d(1.0 - _E2)} * ({s} / (1.0e0 - {_d(_E2)} * {s} * {s}) - "
        f"{_d(1.0 / (2.0 * _E))} * ln((1.0e0 - {_d(_E)} * {s}) /"
        f" (1.0e0 + {_d(_E)} * {s}))))"
    )


def _sql_fwd_parts(lat: str, lon: str, crs: LAEA) -> tuple[str, str, str]:
    beta = f"asin({_sql_q(lat)} / {_d(crs.qp)})"
    dlam = f"((({lon}) - {_d(crs.lon0)}) * pi() / 1.8e2)"
    sb0, cb0 = _d(math.sin(crs.beta0)), _d(math.cos(crs.beta0))
    b = (
        f"({_d(crs.rq)} * sqrt(2.0e0 / (1.0e0 + {sb0} * sin({beta})"
        f" + {cb0} * cos({beta}) * cos({dlam}))))"
    )
    return beta, dlam, b


def sql_laea_easting(lat: str, lon: str, crs: LAEA = LAEA_EUROPE) -> str:
    beta, dlam, b = _sql_fwd_parts(lat, lon, crs)
    return (
        f"({_d(crs.fe)} + {b} * {_d(crs.d_const)} * cos({beta})"
        f" * sin({dlam}))"
    )


def sql_laea_northing(lat: str, lon: str, crs: LAEA = LAEA_EUROPE) -> str:
    beta, dlam, b = _sql_fwd_parts(lat, lon, crs)
    sb0, cb0 = _d(math.sin(crs.beta0)), _d(math.cos(crs.beta0))
    return (
        f"({_d(crs.fn)} + ({b} / {_d(crs.d_const)}) * ({cb0} * sin({beta})"
        f" - {sb0} * cos({beta}) * cos({dlam})))"
    )


def sql_laea_inverse_stages(
    x: str, y: str, crs: LAEA = LAEA_EUROPE, prefix: str = "i_"
) -> list[tuple[str, str]]:
    """Snyder 3-16 phi iteration (8 rounds, = laea_inverse) unrolled;
    final columns {prefix}lat / {prefix}lon (degrees).  Term order
    mirrors the numpy kernel exactly."""
    u = prefix
    sb0, cb0 = _d(math.sin(crs.beta0)), _d(math.cos(crs.beta0))
    st = [
        (f"{u}xp", f"((({x}) - {_d(crs.fe)}) / {_d(crs.d_const)})"),
        (f"{u}yp", f"({_d(crs.d_const)} * (({y}) - {_d(crs.fn)}))"),
        (f"{u}rho", f"sqrt({u}xp * {u}xp + {u}yp * {u}yp)"),
        (f"{u}ce", f"(2.0e0 * asin({u}rho / {_d(2.0 * crs.rq)}))"),
        (
            f"{u}qd",
            f"({_d(crs.qp)} * (cos({u}ce) * {sb0} + CASE WHEN {u}rho > 0"
            f" THEN {u}yp * sin({u}ce) * {cb0} / {u}rho"
            f" ELSE 0.0e0 END))",
        ),
        (
            f"{u}lon",
            f"({_d(crs.lon0)} + atan2({u}xp * sin({u}ce),"
            f" {u}rho * {cb0} * cos({u}ce) - {u}yp * {sb0} * sin({u}ce))"
            f" * 1.8e2 / pi())",
        ),
        (f"{u}phi0", f"asin({u}qd / 2.0e0)"),
    ]
    prev = f"{u}phi0"
    for k in range(8):
        s = f"sin({prev})"
        one = f"(1.0e0 - {_d(_E2)} * {s} * {s})"
        st.append(
            (
                f"{u}phi{k + 1}",
                f"({prev} + ({one} * {one} / (2.0e0 * cos({prev}))) * "
                f"({u}qd / {_d(1.0 - _E2)} - {s} / {one} + "
                f"{_d(1.0 / (2.0 * _E))} * ln((1.0e0 - {_d(_E)} * {s}) /"
                f" (1.0e0 + {_d(_E)} * {s}))))",
            )
        )
        prev = f"{u}phi{k + 1}"
    st.append((f"{u}lat", f"({prev} * 1.8e2 / pi())"))
    return st
