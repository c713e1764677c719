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
EPSG:4326, EPSG:3857 (via geometry/mercator.py); the generalized
:class:`TM` parameter set covers any transverse-mercator CRS
(e.g. EPSG:27700 British National Grid on Airy 1830 with a non-zero
latitude of origin) — dispatch lives in geometry/epsg.py.
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


class TM:
    """Generalized transverse-mercator parameter set: ellipsoid (a, f),
    scale k0, central meridian lon0, latitude of origin lat0, false
    easting/northing.  Derives the Krüger series constants (Karney 2011
    eq. 12/35) and the meridian-arc offset m0 = k0·A·μ(lat0), so a
    non-zero latitude of origin (EPSG:27700's 49°N) folds into one
    northing constant."""

    def __init__(
        self,
        a: float,
        f: float,
        k0: float,
        lon0: float,
        lat0: float = 0.0,
        fe: float = 0.0,
        fn: float = 0.0,
    ):
        self.a, self.f, self.k0 = a, f, k0
        self.lon0, self.lat0, self.fe, self.fn = lon0, lat0, fe, fn
        n = f / (2.0 - f)
        n2, n3, n4 = n**2, n**3, n**4
        self.a_rect = a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0)
        self.alpha = (
            n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0,
            13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0,
            61.0 * n3 / 240.0 - 103.0 * n4 / 140.0,
            49561.0 * n4 / 161280.0,
        )
        self.beta = (
            n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0,
            n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0,
            17.0 * n3 / 480.0 - 37.0 * n4 / 840.0,
            4397.0 * n4 / 161280.0,
        )
        self.e2 = f * (2.0 - f)
        self.e = math.sqrt(self.e2)
        # meridian-arc offset: ξ at (lat0, λ=0) through the same series,
        # so N(lat0, lon0) == fn exactly (lat0 == 0 -> m0 == 0)
        if lat0 == 0.0:
            self.m0 = 0.0
        else:
            phi0 = math.radians(lat0)
            s0 = math.sin(phi0)
            t0 = math.sinh(math.atanh(s0) - self.e * math.atanh(self.e * s0))
            xi0 = math.atan2(t0, 1.0)
            mu0 = xi0 + sum(
                aj * math.sin(2.0 * j * xi0)
                for j, aj in enumerate(self.alpha, start=1)
            )
            self.m0 = k0 * self.a_rect * mu0
        # the northing constant the forward adds / the inverse subtracts
        self.fn_eff = self.fn - self.m0


def _wgs84_utm(zone: int = 0, south: bool = False, lon0: float | None = None) -> TM:
    return TM(
        A_AXIS,
        FLATTENING,
        K0,
        utm_zone_lon0(zone) if lon0 is None else lon0,
        0.0,
        E0,
        N0_SOUTH if south else 0.0,
    )


_WGS84_BASE = None  # lazily built default (module init order)


def _default_tm() -> TM:
    global _WGS84_BASE
    if _WGS84_BASE is None:
        _WGS84_BASE = _wgs84_utm()
    return _WGS84_BASE


# module-level WGS84 constants kept for existing callers
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
def tm_forward(lat, lon, p: TM):
    """(easting, northing) for geographic lat/lon (degrees) on ``p``'s
    ellipsoid, vectorized — the generalized Krüger forward."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p.lon0)
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - p.e * np.arctanh(p.e * sphi))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    E = eta.copy()
    N = xi.copy()
    for j, a in enumerate(p.alpha, start=1):
        E = E + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        N = N + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    easting = p.fe + p.k0 * p.a_rect * E
    northing = p.k0 * p.a_rect * N + p.fn_eff
    return easting, northing


def utm_forward(lat, lon, zone: int, south: bool = False):
    """(easting, northing) for WGS84 lat/lon (degrees), vectorized."""
    return tm_forward(lat, lon, _wgs84_utm(zone, south))


def _tauf(taup, e2: float = _E2):
    """Karney's inverse of tau' -> tau = tan(phi) (Newton, exact)."""
    e = math.sqrt(e2)
    tau = taup / np.sqrt(1.0 - e2)  # first guess (spherical-ish)
    for _ in range(6):
        s = np.sinh(e * np.arctanh(e * tau / np.sqrt(1.0 + tau * tau)))
        taup_i = tau * np.sqrt(1.0 + s * s) - s * np.sqrt(1.0 + tau * tau)
        dtau = (
            (taup - taup_i)
            * (1.0 + (1.0 - e2) * tau * tau)
            / ((1.0 - e2) * np.sqrt((1.0 + taup_i**2) * (1.0 + tau * tau)))
        )
        tau = tau + dtau
    return tau


def tm_inverse(easting, northing, p: TM):
    """(lat, lon) degrees from easting/northing on ``p``, vectorized."""
    xi = (np.asarray(northing, dtype=np.float64) - p.fn_eff) / (p.k0 * p.a_rect)
    eta = (np.asarray(easting, dtype=np.float64) - p.fe) / (p.k0 * p.a_rect)
    xip = xi.copy()
    etap = eta.copy()
    for j, b in enumerate(p.beta, start=1):
        xip = xip - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        etap = etap - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    taup = np.sin(xip) / np.sqrt(np.sinh(etap) ** 2 + np.cos(xip) ** 2)
    phi = np.arctan(_tauf(taup, p.e2))
    lam = np.arctan2(np.sinh(etap), np.cos(xip))
    return np.degrees(phi), np.degrees(lam) + p.lon0


def utm_inverse(easting, northing, zone: int, south: bool = False):
    """(lat, lon) degrees from UTM easting/northing, vectorized."""
    return tm_inverse(easting, northing, _wgs84_utm(zone, south))


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


def _parts(
    lat: str, lon: str, zone=0, lon0_sql: str | None = None, p: TM | None = None
):
    """Shared subexpressions as SQL text.  ``zone`` may be an int, or
    pass ``lon0_sql`` (an expression) for per-row zones; ``p``
    generalizes the ellipsoid (defaults to WGS84 UTM)."""
    if p is None:
        p = _wgs84_utm(zone)
        lon0 = lon0_sql if lon0_sql is not None else _d(utm_zone_lon0(zone))
    else:
        lon0 = lon0_sql if lon0_sql is not None else _d(p.lon0)
    phi = f"(({lat}) * pi() / 1.8e2)"
    lam = f"((({lon}) - ({lon0})) * pi() / 1.8e2)"
    sphi = f"sin({phi})"
    t = _sinh(f"({_atanh(sphi)} - {_d(p.e)} * {_atanh(f'({_d(p.e)} * {sphi})')})")
    xi = f"atan2({t}, cos({lam}))"
    eta = _asinh(f"(sin({lam}) / sqrt(({t}) * ({t}) + cos({lam}) * cos({lam})))")
    return xi, eta


def sql_tm_easting(lat: str, lon: str, p: TM, lon0_sql: str | None = None) -> str:
    xi, eta = _parts(lat, lon, lon0_sql=lon0_sql, p=p)
    terms = [f"({eta})"]
    for j, a in enumerate(p.alpha, start=1):
        terms.append(
            f"({_d(a)} * cos({2 * j}.0e0 * ({xi})) * {_sinh(f'({2 * j}.0e0 * ({eta}))')})"
        )
    return f"({_d(p.fe)} + {_d(p.k0 * p.a_rect)} * ({' + '.join(terms)}))"


def sql_tm_northing(lat: str, lon: str, p: TM, lon0_sql: str | None = None) -> str:
    xi, eta = _parts(lat, lon, lon0_sql=lon0_sql, p=p)
    terms = [f"({xi})"]
    for j, a in enumerate(p.alpha, start=1):
        terms.append(
            f"({_d(a)} * sin({2 * j}.0e0 * ({xi})) * {_cosh(f'({2 * j}.0e0 * ({eta}))')})"
        )
    base = f"({_d(p.k0 * p.a_rect)} * ({' + '.join(terms)}))"
    return f"({base} + {_d(p.fn_eff)})" if p.fn_eff != 0.0 else base


def sql_utm_easting(lat: str, lon: str, zone: int = 0, lon0_sql: str | None = None) -> str:
    return sql_tm_easting(lat, lon, _wgs84_utm(zone), lon0_sql=lon0_sql)


def sql_utm_northing(
    lat: str, lon: str, zone: int = 0, south: bool = False, lon0_sql: str | None = None
) -> str:
    return sql_tm_northing(lat, lon, _wgs84_utm(zone, south), lon0_sql=lon0_sql)


def sql_utm_inverse_stages(
    e: str, n: str, lon0_sql: str, south: bool = False
) -> list[tuple[str, str]]:
    """WGS84-UTM wrapper over :func:`sql_tm_inverse_stages` (existing
    warp callers; per-row zone via ``lon0_sql``)."""
    return sql_tm_inverse_stages(e, n, _wgs84_utm(0, south), lon0_sql=lon0_sql)


def sql_tm_inverse_stages(
    e: str, n: str, p: TM, lon0_sql: str | None = None, prefix: str = "u_"
) -> list[tuple[str, str]]:
    """The INVERSE transform as an ordered list of ``(column, expr)``
    stages, each expr referencing only input columns and earlier stage
    columns.  Karney's Newton loop (:func:`_tauf`) has a FIXED iteration
    count, so it unrolls into a straight-line column chain — apply with
    successive ``SELECT *, expr AS column`` (Spark ``selectExpr`` or a
    nested-select DuckDB oracle).  Identical text in both engines, same
    term order as the numpy kernel, so a warp query can inverse-project
    target pixels fully JVM-side (whole-stage codegen) while the oracle
    evaluates the same expressions.  Final columns: ``{prefix}lat`` /
    ``{prefix}lon`` (degrees); pass distinct prefixes to chain several
    inverse transforms in one pipeline (geometry/epsg.py)."""
    u = prefix
    lon0 = lon0_sql if lon0_sql is not None else _d(p.lon0)
    st: list[tuple[str, str]] = []
    st.append((f"{u}xi", f"((({n}) - {_d(p.fn_eff)}) / {_d(p.k0 * p.a_rect)})"))
    st.append((f"{u}eta", f"((({e}) - {_d(p.fe)}) / {_d(p.k0 * p.a_rect)})"))
    xip = f"({u}xi)"
    etap = f"({u}eta)"
    for j, b in enumerate(p.beta, start=1):
        xip = (
            f"({xip} - {_d(b)} * sin({2 * j}.0e0 * {u}xi)"
            f" * {_cosh(f'({2 * j}.0e0 * {u}eta)')})"
        )
        etap = (
            f"({etap} - {_d(b)} * cos({2 * j}.0e0 * {u}xi)"
            f" * {_sinh(f'({2 * j}.0e0 * {u}eta)')})"
        )
    st.append((f"{u}xip", xip))
    st.append((f"{u}etap", etap))
    st.append((f"{u}shp", _sinh(f"{u}etap")))
    st.append((f"{u}cxp", f"cos({u}xip)"))
    st.append(
        (f"{u}taup", f"(sin({u}xip) / sqrt({u}shp * {u}shp + {u}cxp * {u}cxp))")
    )
    st.append((f"{u}tau0", f"({u}taup / {_d(math.sqrt(1.0 - p.e2))})"))
    one_m_e2 = _d(1.0 - p.e2)
    for k in range(6):
        t = f"{u}tau{k}"
        s = f"{u}s{k}"
        ti = f"{u}ti{k}"
        st.append(
            (
                s,
                _sinh(
                    f"({_d(p.e)} * "
                    f"{_atanh(f'({_d(p.e)} * {t} / sqrt(1.0e0 + {t} * {t}))')})"
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
                f"{u}tau{k + 1}",
                f"({t} + ({u}taup - {ti}) * (1.0e0 + {one_m_e2} * {t} * {t})"
                f" / ({one_m_e2} * sqrt((1.0e0 + {ti} * {ti})"
                f" * (1.0e0 + {t} * {t}))))",
            )
        )
    st.append((f"{u}lat", f"(atan({u}tau6) * 1.8e2 / pi())"))
    st.append(
        (f"{u}lon", f"(atan2({u}shp, {u}cxp) * 1.8e2 / pi() + ({lon0}))")
    )
    return st
