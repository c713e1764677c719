"""EPSG-code dispatch over the engine's projection kernels — the
OGRCoordinateTransformation analog.

The reference builds a PROJ pipeline from two OGRSpatialReferences
(ogr/ogrct.cpp:~1500 `OGRCreateCoordinateTransformation`,
ogr/ogr_spatialref.h `importFromEPSG`) and lets PROJ compose
  source-projection inverse -> (geocentric Helmert datum step when the
  datums differ) -> target-projection forward.
Here a small parameter registry maps EPSG codes onto the hand-ported
kernels (tmerc Krüger, LCC 2SP, Albers 2SP, polar stereographic, web
mercator, geocentric Helmert) and composes the same three-step pipeline
as ONE ordered list of ``(column, expr)`` SQL stages — identical text
in Spark SQL and DuckDB, so a transform query runs fully JVM-side
(whole-stage codegen, zero Python, zero shuffle) while the oracle
evaluates the very same expressions.

Registry notes (all parameters from the public EPSG registry):

* 4326 / 4277 — geographic WGS84 / OSGB36.
* 326xx / 327xx — UTM north/south on WGS84 (zone from the code).
* 27700 — British National Grid: tmerc on Airy 1830, k0=0.9996012717,
  origin (49°N, 2°W), FE 400 000, FN −100 000; datum OSGB36, so any
  transform to/from a WGS84-based CRS routes through the Helmert step
  (geometry/geocentric.py, EPSG methods 9602/9606).
* 2154 (RGF93 / Lambert-93) and 5070 (NAD83 / CONUS Albers) — RGF93 and
  NAD83 are treated as coincident with WGS84 (null datum step), the
  same default PROJ applies absent a specific transformation.
* 3857 web mercator, 3413 NSIDC polar north, 3031 Antarctic polar
  stereographic — WGS84-based.

Inverse (projected -> geographic) SQL is wired for EVERY registered
kind: tmerc and web mercator (round-3a), plus LCC / Albers / polar
stereographic (round-3b — their fixed-iteration numpy inverses unroll
into straight-line column chains exactly like tmerc's Newton loop), so
any registered pair composes projected -> projected.
"""

from __future__ import annotations

from dataclasses import dataclass

from gdal_spark.geometry import conic, geocentric, laea, mercator, polar, tmerc

_d = mercator.sql_double


@dataclass(frozen=True)
class CRS:
    epsg: int
    kind: str  # geographic | tmerc | webmerc | lcc | albers | ps
    datum: str  # WGS84 | OSGB36
    params: object = None


# datum -> ellipsoid (a, f) for the geocentric step
ELLIPSOID = {
    "WGS84": (geocentric.WGS84_A, geocentric.WGS84_F),
    "OSGB36": (geocentric.AIRY_A, geocentric.AIRY_F),
}

# EPSG:27700 British National Grid (Airy 1830)
OSGB_GRID = tmerc.TM(
    geocentric.AIRY_A,
    geocentric.AIRY_F,
    0.9996012717,
    -2.0,
    49.0,
    400000.0,
    -100000.0,
)

_FIXED = {
    4326: CRS(4326, "geographic", "WGS84"),
    4277: CRS(4277, "geographic", "OSGB36"),
    3857: CRS(3857, "webmerc", "WGS84"),
    # web mercator aliases (deprecated codes still in the wild: the
    # ESRI 102100/google 900913 lineage and EPSG:3785)
    3785: CRS(3785, "webmerc", "WGS84"),
    900913: CRS(900913, "webmerc", "WGS84"),
    27700: CRS(27700, "tmerc", "OSGB36", OSGB_GRID),
    2154: CRS(2154, "lcc", "WGS84", conic.LAMBERT93),
    5070: CRS(5070, "albers", "WGS84", conic.ALBERS_CONUS),
    3413: CRS(3413, "ps", "WGS84", polar.NSIDC_NORTH),
    3031: CRS(
        3031,
        "ps",
        "WGS84",
        polar.PolarStereo(north=False, lat_ts=-71.0, lon0=0.0, fe=0.0, fn=0.0),
    ),
    # ETRS89 pan-European set (ETRS89 treated as coincident with WGS84,
    # the same null datum step PROJ applies absent a specific
    # transformation; GRS80 axis difference < 1 mm, conic.py note)
    3035: CRS(3035, "laea", "WGS84", laea.LAEA_EUROPE),
    3034: CRS(3034, "lcc", "WGS84", conic.LCC(
        lat1=35.0, lat2=65.0, lat0=52.0, lon0=10.0,
        fe=4000000.0, fn=2800000.0)),
    3416: CRS(3416, "lcc", "WGS84", conic.LCC(
        lat1=49.0, lat2=46.0, lat0=47.5, lon0=13.0 + 1.0 / 3.0,
        fe=400000.0, fn=400000.0)),
    # NAD83 state-plane sampler (NAD83 ~ WGS84 null datum step): LCC
    # states (NY Long Island, Maryland) + the TM state with the
    # tightest k0 (Rhode Island) + a NAD83 UTM zone
    32118: CRS(32118, "lcc", "WGS84", conic.LCC(
        lat1=41.0 + 2.0 / 60.0, lat2=40.0 + 40.0 / 60.0,
        lat0=40.0 + 10.0 / 60.0, lon0=-74.0, fe=300000.0, fn=0.0)),
    26985: CRS(26985, "lcc", "WGS84", conic.LCC(
        lat1=39.45, lat2=38.3, lat0=37.0 + 40.0 / 60.0, lon0=-77.0,
        fe=400000.0, fn=0.0)),
    32130: CRS(32130, "tmerc", "WGS84", tmerc.TM(
        geocentric.WGS84_A, geocentric.WGS84_F, 0.99999375,
        -71.5, 41.0 + 5.0 / 60.0, 100000.0, 0.0)),
    26918: CRS(26918, "tmerc", "WGS84", tmerc._wgs84_utm(18)),
}


def lookup(code: int) -> CRS:
    """EPSG code -> CRS descriptor (UTM ranges handled generatively)."""
    if code in _FIXED:
        return _FIXED[code]
    if 32601 <= code <= 32660:
        return CRS(code, "tmerc", "WGS84", tmerc._wgs84_utm(code - 32600))
    if 32701 <= code <= 32760:
        return CRS(code, "tmerc", "WGS84", tmerc._wgs84_utm(code - 32700, south=True))
    raise KeyError(f"EPSG:{code} is not in the dispatch registry")


def _frags_to_stages(frags: list[str]) -> list[tuple[str, str]]:
    """geocentric.py emits 'expr AS col' SELECT fragments; normalize to
    the (col, expr) stage tuples the pipeline renderers consume."""
    out = []
    for f in frags:
        expr, col = f.rsplit(" AS ", 1)
        out.append((col, expr))
    return out


def _to_geographic(crs: CRS, x: str, y: str) -> tuple[list[tuple[str, str]], str, str]:
    """Inverse-project columns (x, y) in ``crs`` to geographic degrees
    on crs.datum; returns (stages, lat_expr, lon_expr)."""
    if crs.kind == "geographic":
        return [], y, x  # axis order: x = lon, y = lat
    if crs.kind == "tmerc":
        st = tmerc.sql_tm_inverse_stages(x, y, crs.params, prefix="i_")
        return st, "i_lat", "i_lon"
    if crs.kind == "webmerc":
        os_ = _d(mercator.ORIGIN_SHIFT)
        st = [
            ("i_lon", f"(({x}) / {os_} * 1.8e2)"),
            (
                "i_lat",
                f"((2.0e0 * atan(exp((({y}) / {os_} * 1.8e2) * pi() / 1.8e2))"
                f" - pi() / 2.0e0) * 1.8e2 / pi())",
            ),
        ]
        return st, "i_lat", "i_lon"
    if crs.kind == "lcc":
        st = conic.sql_lcc_inverse_stages(x, y, crs.params, prefix="i_")
        return st, "i_lat", "i_lon"
    if crs.kind == "albers":
        st = conic.sql_albers_inverse_stages(x, y, crs.params, prefix="i_")
        return st, "i_lat", "i_lon"
    if crs.kind == "ps":
        st = polar.sql_ps_inverse_stages(x, y, crs.params, prefix="i_")
        return st, "i_lat", "i_lon"
    if crs.kind == "laea":
        st = laea.sql_laea_inverse_stages(x, y, crs.params, prefix="i_")
        return st, "i_lat", "i_lon"
    raise KeyError(f"unknown CRS kind {crs.kind}")  # pragma: no cover


def _datum_stages(
    src_datum: str, dst_datum: str, lat: str, lon: str
) -> tuple[list[tuple[str, str]], str, str]:
    """Geocentric Helmert step between datums (no-op when equal)."""
    if src_datum == dst_datum:
        return [], lat, lon
    a_s, f_s = ELLIPSOID[src_datum]
    a_d, f_d = ELLIPSOID[dst_datum]
    if (src_datum, dst_datum) == ("WGS84", "OSGB36"):
        t = geocentric.WGS84_TO_OSGB36
    elif (src_datum, dst_datum) == ("OSGB36", "WGS84"):
        t = geocentric.inverse(geocentric.WGS84_TO_OSGB36)
    else:  # pragma: no cover - two-datum registry today
        raise KeyError(f"no Helmert parameters for {src_datum} -> {dst_datum}")
    st = _frags_to_stages(geocentric.sql_ecef_stage(lat, lon, a=a_s, f=f_s))
    st += _frags_to_stages(geocentric.sql_helmert_stage(t))
    st += _frags_to_stages(geocentric.sql_geodetic_stage(a=a_d, f=f_d))
    return st, "olat", "olon"


def _from_geographic(crs: CRS, lat: str, lon: str) -> list[tuple[str, str]]:
    """Forward-project geographic degrees to (ox, oy) in ``crs``
    (for geographic targets ox = lon, oy = lat)."""
    if crs.kind == "geographic":
        return [("ox", f"({lon})"), ("oy", f"({lat})")]
    if crs.kind == "tmerc":
        return [
            ("ox", tmerc.sql_tm_easting(lat, lon, crs.params)),
            ("oy", tmerc.sql_tm_northing(lat, lon, crs.params)),
        ]
    if crs.kind == "webmerc":
        return [("ox", mercator.sql_mx(lon)), ("oy", mercator.sql_my(lat))]
    if crs.kind == "lcc":
        return [
            ("ox", conic.sql_lcc_easting(lat, lon, crs.params)),
            ("oy", conic.sql_lcc_northing(lat, lon, crs.params)),
        ]
    if crs.kind == "albers":
        return [
            ("ox", conic.sql_albers_easting(lat, lon, crs.params)),
            ("oy", conic.sql_albers_northing(lat, lon, crs.params)),
        ]
    if crs.kind == "ps":
        return [
            ("ox", polar.sql_ps_easting(lat, lon, crs.params)),
            ("oy", polar.sql_ps_northing(lat, lon, crs.params)),
        ]
    if crs.kind == "laea":
        return [
            ("ox", laea.sql_laea_easting(lat, lon, crs.params)),
            ("oy", laea.sql_laea_northing(lat, lon, crs.params)),
        ]
    raise KeyError(f"unknown CRS kind {crs.kind}")


def sql_transform_stages(
    src_code: int, dst_code: int, x: str = "x", y: str = "y"
) -> list[tuple[str, str]]:
    """The full src->dst pipeline as ordered (column, expr) stages over
    input columns (x, y) in the source CRS (x = lon, y = lat when the
    source is geographic); the final stage emits ``ox``/``oy`` in the
    target CRS.  Apply with chained ``SELECT *, expr AS col`` on either
    engine."""
    src, dst = lookup(src_code), lookup(dst_code)
    stages, lat, lon = _to_geographic(src, x, y)
    dstages, lat, lon = _datum_stages(src.datum, dst.datum, lat, lon)
    stages += dstages
    stages += _from_geographic(dst, lat, lon)
    return stages


# ------------------------------------------------------------- numpy twin
def transform(x, y, src_code: int, dst_code: int):
    """Vectorized numpy pipeline (same composition as the SQL stages) —
    the independent check the tests pin the SQL rendering against."""
    import numpy as np

    src, dst = lookup(src_code), lookup(dst_code)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if src.kind == "geographic":
        lat, lon = y, x
    elif src.kind == "tmerc":
        lat, lon = tmerc.tm_inverse(x, y, src.params)
    elif src.kind == "webmerc":
        lat, lon = mercator.meters_to_lat_lon(x, y)
    elif src.kind == "lcc":
        lat, lon = conic.lcc_inverse(x, y, src.params)
    elif src.kind == "albers":
        lat, lon = conic.albers_inverse(x, y, src.params)
    elif src.kind == "ps":
        lat, lon = polar.ps_inverse(x, y, src.params)
    elif src.kind == "laea":
        lat, lon = laea.laea_inverse(x, y, src.params)
    else:  # pragma: no cover
        raise KeyError(src.kind)
    if src.datum != dst.datum:
        a_s, f_s = ELLIPSOID[src.datum]
        a_d, f_d = ELLIPSOID[dst.datum]
        t = (
            geocentric.WGS84_TO_OSGB36
            if (src.datum, dst.datum) == ("WGS84", "OSGB36")
            else geocentric.inverse(geocentric.WGS84_TO_OSGB36)
        )
        gx, gy, gz = geocentric.geodetic_to_ecef(lat, lon, a=a_s, f=f_s)
        hx, hy, hz = geocentric.helmert_apply(gx, gy, gz, t)
        lat, lon, _ = geocentric.ecef_to_geodetic(hx, hy, hz, a=a_d, f=f_d)
    if dst.kind == "geographic":
        return lon, lat
    if dst.kind == "tmerc":
        e, n = tmerc.tm_forward(lat, lon, dst.params)
    elif dst.kind == "webmerc":
        e, n = mercator.lat_lon_to_meters(lat, lon)
    elif dst.kind == "lcc":
        e, n = conic.lcc_forward(lat, lon, dst.params)
    elif dst.kind == "albers":
        e, n = conic.albers_forward(lat, lon, dst.params)
    elif dst.kind == "ps":
        e, n = polar.ps_forward(lat, lon, dst.params)
    elif dst.kind == "laea":
        e, n = laea.laea_forward(lat, lon, dst.params)
    else:  # pragma: no cover
        raise KeyError(dst.kind)
    return e, n
