"""Transverse Mercator (UTM) forward/inverse — the engine's
OGRCoordinateTransformation analog for projected CRS beyond web
mercator (reference: PROJ-backed ogr/ogrct.cpp; the reference defers to
PROJ, we implement the standard Krüger series directly — public
formulas, e.g. Karney (2011) "Transverse Mercator with an accuracy of a
few nanometers", J. Geodesy 85; series truncated at n⁴ ≈ sub-mm for
|λ−λ0| ≤ 3.5°, the UTM band).

Two renderings of the same series (the engine's shared-formula
discipline, cf. geometry/mercator.py):

  * numpy (vectorized kernels, inverse included);
  * SQL text via :func:`sql_utm_easting` / :func:`sql_utm_northing` —
    valid in Spark SQL AND DuckDB, so a UTM query can run fully
    JVM-side (whole-stage codegen) while the DuckDB oracle evaluates
    the identical expression.

Supported CRS ids: EPSG:326xx (UTM north), EPSG:327xx (south),
EPSG:4326, EPSG:3857 (via geometry/mercator.py).
"""

from __future__ import annotations

import math

import numpy as np

# WGS84
A_AXIS = 6378137.0
FLATTENING = 1.0 / 298.257223563
K0 = 0.9996
E0 = 500000.0  # false easting
N0_SOUTH = 10000000.0

_n = FLATTENING / (2.0 - FLATTENING)
_n2, _n3, _n4 = _n**2, _n**3, _n**4
# rectifying radius and the Krüger alpha/beta series (Karney 2011, eq. 12/35)
A_RECT = A_AXIS / (1.0 + _n) * (1.0 + _n2 / 4.0 + _n4 / 64.0)
ALPHA = (
    _n / 2.0 - 2.0 * _n2 / 3.0 + 5.0 * _n3 / 16.0 + 41.0 * _n4 / 180.0,
    13.0 * _n2 / 48.0 - 3.0 * _n3 / 5.0 + 557.0 * _n4 / 1440.0,
    61.0 * _n3 / 240.0 - 103.0 * _n4 / 140.0,
    49561.0 * _n4 / 161280.0,
)
BETA = (
    _n / 2.0 - 2.0 * _n2 / 3.0 + 37.0 * _n3 / 96.0 - _n4 / 360.0,
    _n2 / 48.0 + _n3 / 15.0 - 437.0 * _n4 / 1440.0,
    17.0 * _n3 / 480.0 - 37.0 * _n4 / 840.0,
    4397.0 * _n4 / 161280.0,
)
_E2 = FLATTENING * (2.0 - FLATTENING)  # eccentricity²
_E = math.sqrt(_E2)


def utm_zone_lon0(zone: int) -> float:
    """Central meridian (degrees) of UTM zone 1..60."""
    return -183.0 + 6.0 * zone


# ------------------------------------------------------------- numpy side
def utm_forward(lat, lon, zone: int, south: bool = False):
    """(easting, northing) for WGS84 lat/lon (degrees), vectorized."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - utm_zone_lon0(zone))
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    E = eta.copy()
    N = xi.copy()
    for j, a in enumerate(ALPHA, start=1):
        E = E + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        N = N + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    easting = E0 + K0 * A_RECT * E
    northing = K0 * A_RECT * N + (N0_SOUTH if south else 0.0)
    return easting, northing


def _tauf(taup):
    """Karney's inverse of tau' -> tau = tan(phi) (Newton, exact)."""
    tau = taup / np.sqrt(1.0 - _E2)  # first guess (spherical-ish)
    for _ in range(6):
        s = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1.0 + tau * tau)))
        taup_i = tau * np.sqrt(1.0 + s * s) - s * np.sqrt(1.0 + tau * tau)
        dtau = (
            (taup - taup_i)
            * (1.0 + (1.0 - _E2) * tau * tau)
            / ((1.0 - _E2) * np.sqrt((1.0 + taup_i**2) * (1.0 + tau * tau)))
        )
        tau = tau + dtau
    return tau


def utm_inverse(easting, northing, zone: int, south: bool = False):
    """(lat, lon) degrees from UTM easting/northing, vectorized."""
    xi = (np.asarray(northing, dtype=np.float64) - (N0_SOUTH if south else 0.0)) / (
        K0 * A_RECT
    )
    eta = (np.asarray(easting, dtype=np.float64) - E0) / (K0 * A_RECT)
    xip = xi.copy()
    etap = eta.copy()
    for j, b in enumerate(BETA, start=1):
        xip = xip - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        etap = etap - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    taup = np.sin(xip) / np.sqrt(np.sinh(etap) ** 2 + np.cos(xip) ** 2)
    phi = np.arctan(_tauf(taup))
    lam = np.arctan2(np.sinh(etap), np.cos(xip))
    return np.degrees(phi), np.degrees(lam) + utm_zone_lon0(zone)


# -------------------------------------------------------------- SQL side
def _d(v: float) -> str:
    return f"{v:.17e}"


def _sinh(x: str) -> str:
    return f"((exp({x}) - exp(0.0e0 - ({x}))) / 2.0e0)"


def _cosh(x: str) -> str:
    return f"((exp({x}) + exp(0.0e0 - ({x}))) / 2.0e0)"


def _atanh(x: str) -> str:
    return f"(5.0e-1 * ln((1.0e0 + ({x})) / (1.0e0 - ({x}))))"


def _asinh(x: str) -> str:
    return f"ln(({x}) + sqrt(({x}) * ({x}) + 1.0e0))"


def _parts(lat: str, lon: str, zone, lon0_sql: str | None = None):
    """Shared subexpressions as SQL text.  ``zone`` may be an int, or
    pass ``lon0_sql`` (an expression) for per-row zones."""
    phi = f"(({lat}) * pi() / 1.8e2)"
    lon0 = lon0_sql if lon0_sql is not None else _d(utm_zone_lon0(zone))
    lam = f"((({lon}) - ({lon0})) * pi() / 1.8e2)"
    sphi = f"sin({phi})"
    t = _sinh(f"({_atanh(sphi)} - {_d(_E)} * {_atanh(f'({_d(_E)} * {sphi})')})")
    xi = f"atan2({t}, cos({lam}))"
    eta = _asinh(f"(sin({lam}) / sqrt(({t}) * ({t}) + cos({lam}) * cos({lam})))")
    return xi, eta


def sql_utm_easting(lat: str, lon: str, zone: int = 0, lon0_sql: str | None = None) -> str:
    xi, eta = _parts(lat, lon, zone, lon0_sql)
    terms = [f"({eta})"]
    for j, a in enumerate(ALPHA, start=1):
        terms.append(
            f"({_d(a)} * cos({2 * j}.0e0 * ({xi})) * {_sinh(f'({2 * j}.0e0 * ({eta}))')})"
        )
    return f"({_d(E0)} + {_d(K0 * A_RECT)} * ({' + '.join(terms)}))"


def sql_utm_northing(
    lat: str, lon: str, zone: int = 0, south: bool = False, lon0_sql: str | None = None
) -> str:
    xi, eta = _parts(lat, lon, zone, lon0_sql)
    terms = [f"({xi})"]
    for j, a in enumerate(ALPHA, start=1):
        terms.append(
            f"({_d(a)} * sin({2 * j}.0e0 * ({xi})) * {_cosh(f'({2 * j}.0e0 * ({eta}))')})"
        )
    base = f"({_d(K0 * A_RECT)} * ({' + '.join(terms)}))"
    return f"({base} + {_d(N0_SOUTH)})" if south else base


def sql_utm_inverse_stages(
    e: str, n: str, lon0_sql: str, south: bool = False
) -> list[tuple[str, str]]:
    """The INVERSE transform as an ordered list of ``(column, expr)``
    stages, each expr referencing only input columns and earlier stage
    columns.  Karney's Newton loop (:func:`_tauf`) has a FIXED iteration
    count, so it unrolls into a straight-line column chain — apply with
    successive ``SELECT *, expr AS column`` (Spark ``selectExpr`` or a
    nested-select DuckDB oracle).  Identical text in both engines, same
    term order as the numpy kernel, so a warp query can inverse-project
    target pixels fully JVM-side (whole-stage codegen) while the oracle
    evaluates the same expressions.  Final columns: ``u_lat``/``u_lon``
    (degrees)."""
    st: list[tuple[str, str]] = []
    fn = N0_SOUTH if south else 0.0
    st.append(("u_xi", f"((({n}) - {_d(fn)}) / {_d(K0 * A_RECT)})"))
    st.append(("u_eta", f"((({e}) - {_d(E0)}) / {_d(K0 * A_RECT)})"))
    xip = "(u_xi)"
    etap = "(u_eta)"
    for j, b in enumerate(BETA, start=1):
        xip = (
            f"({xip} - {_d(b)} * sin({2 * j}.0e0 * u_xi)"
            f" * {_cosh(f'({2 * j}.0e0 * u_eta)')})"
        )
        etap = (
            f"({etap} - {_d(b)} * cos({2 * j}.0e0 * u_xi)"
            f" * {_sinh(f'({2 * j}.0e0 * u_eta)')})"
        )
    st.append(("u_xip", xip))
    st.append(("u_etap", etap))
    st.append(("u_shp", _sinh("u_etap")))
    st.append(("u_cxp", "cos(u_xip)"))
    st.append(
        ("u_taup", "(sin(u_xip) / sqrt(u_shp * u_shp + u_cxp * u_cxp))")
    )
    st.append(("u_tau0", f"(u_taup / {_d(math.sqrt(1.0 - _E2))})"))
    one_m_e2 = _d(1.0 - _E2)
    for k in range(6):
        t = f"u_tau{k}"
        s = f"u_s{k}"
        ti = f"u_ti{k}"
        st.append(
            (
                s,
                _sinh(
                    f"({_d(_E)} * "
                    f"{_atanh(f'({_d(_E)} * {t} / sqrt(1.0e0 + {t} * {t}))')})"
                ),
            )
        )
        st.append(
            (
                ti,
                f"({t} * sqrt(1.0e0 + {s} * {s})"
                f" - {s} * sqrt(1.0e0 + {t} * {t}))",
            )
        )
        st.append(
            (
                f"u_tau{k + 1}",
                f"({t} + (u_taup - {ti}) * (1.0e0 + {one_m_e2} * {t} * {t})"
                f" / ({one_m_e2} * sqrt((1.0e0 + {ti} * {ti})"
                f" * (1.0e0 + {t} * {t}))))",
            )
        )
    st.append(("u_lat", "(atan(u_tau6) * 1.8e2 / pi())"))
    st.append(
        ("u_lon", f"(atan2(u_shp, u_cxp) * 1.8e2 / pi() + ({lon0_sql}))")
    )
    return st
