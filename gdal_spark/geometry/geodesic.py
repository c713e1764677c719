"""Geodesic length + spherical-excess area — ST_Length(g,1)/ST_Area(g,1).

The reference's geodesic variants call PROJ's Karney implementation
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp ST_Area(geom,1);
ogr/ogrlinestring.cpp:3251 get_GeodesicArea -> geod_polygonarea).  This
module re-answers them with public textbook algorithms:

  * segment length: Vincenty inverse on the WGS84 ellipsoid, the lambda
    iteration UNROLLED to a fixed 6 steps (converges to double
    precision for non-antipodal inputs) so the whole computation is a
    straight-line column program;
  * polygon area: l'Huilier spherical excess per fan triangle on the
    WGS84 AUTHALIC sphere (R = 6371007.18 m).  Documented divergence
    from PROJ's ellipsoidal area: bounded by the authalic-sphere
    approximation (< ~0.3% latitude-dependent), exact on the sphere.

Everything is expressed as an ORDERED LIST of (column, expression-text)
steps: the engine applies them as DataFrame ``withColumn`` (whole-stage
codegen, no Python), the oracle replays the identical text as a DuckDB
CTE chain — outputs agree to final-rounding precision (transcendental
1-ulp tails absorbed by rounding to metres / kilo-m^2).
"""

from __future__ import annotations

_F = "3.3528106647474805e-3"  # WGS84 flattening 1/298.257223563
_B = "6.356752314245179e6"  # WGS84 semi-minor axis a*(1-f)
_R_AUTH = "6.3710071809184747e6"  # WGS84 authalic radius
_PI180 = "(pi() / 1.8e2)"

#: Vincenty setup: expects columns lat1, lon1, lat2, lon2 (degrees).
VIN_SETUP: list[tuple[str, str]] = [
    ("vu1", f"atan((1.0e0 - {_F}) * tan(lat1 * {_PI180}))"),
    ("vu2", f"atan((1.0e0 - {_F}) * tan(lat2 * {_PI180}))"),
    ("su1", "sin(vu1)"),
    ("cu1", "cos(vu1)"),
    ("su2", "sin(vu2)"),
    ("cu2", "cos(vu2)"),
    ("vll", f"((lon2 - lon1) * {_PI180})"),
    ("lam0", "vll"),
]


def vin_iter(k: int) -> list[tuple[str, str]]:
    """One lambda iteration reading lam{k}, producing lam{k+1}."""
    p = f"lam{k}"
    s = f"_{k}"
    return [
        (f"sl{s}", f"sin({p})"),
        (f"cl{s}", f"cos({p})"),
        (
            f"ss{s}",
            f"sqrt((cu2 * sl{s}) * (cu2 * sl{s})"
            f" + (cu1 * su2 - su1 * cu2 * cl{s})"
            f" * (cu1 * su2 - su1 * cu2 * cl{s}))",
        ),
        (f"cs{s}", f"(su1 * su2 + cu1 * cu2 * cl{s})"),
        (f"sg{s}", f"atan2(ss{s}, cs{s})"),
        (f"sa{s}", f"(cu1 * cu2 * sl{s} / ss{s})"),
        (f"ca{s}", f"(1.0e0 - sa{s} * sa{s})"),
        (f"cm{s}", f"(cs{s} - 2.0e0 * su1 * su2 / ca{s})"),
        (
            f"cc{s}",
            f"({_F} / 1.6e1 * ca{s} * (4.0e0 + {_F} * (4.0e0 - 3.0e0 * ca{s})))",
        ),
        (
            f"lam{k + 1}",
            f"(vll + (1.0e0 - cc{s}) * {_F} * sa{s}"
            f" * (sg{s} + cc{s} * ss{s} * (cm{s} + cc{s} * cs{s}"
            f" * ((0.0e0 - 1.0e0) + 2.0e0 * cm{s} * cm{s}))))",
        ),
    ]


N_ITER = 6

#: final distance from the last iteration's sigma terms (suffix _{N-1}
#: names are re-derived from lam{N} by one more evaluation pass).
VIN_FINAL: list[tuple[str, str]] = [
    (
        "vus",
        f"(ca_{N_ITER - 1} * (6.378137e6 * 6.378137e6 - {_B} * {_B})"
        f" / ({_B} * {_B}))",
    ),
    (
        "vaa",
        "(1.0e0 + vus / 1.6384e4 * (4.096e3 + vus"
        " * ((0.0e0 - 7.68e2) + vus * (3.2e2 - 1.75e2 * vus))))",
    ),
    (
        "vbb",
        "(vus / 1.024e3 * (2.56e2 + vus"
        " * ((0.0e0 - 1.28e2) + vus * (7.4e1 - 4.7e1 * vus))))",
    ),
    (
        "vds",
        f"(vbb * ss_{N_ITER - 1} * (cm_{N_ITER - 1} + vbb / 4.0e0"
        f" * (cs_{N_ITER - 1} * ((0.0e0 - 1.0e0) + 2.0e0 * cm_{N_ITER - 1} * cm_{N_ITER - 1})"
        f" - vbb / 6.0e0 * cm_{N_ITER - 1}"
        f" * ((0.0e0 - 3.0e0) + 4.0e0 * ss_{N_ITER - 1} * ss_{N_ITER - 1})"
        f" * ((0.0e0 - 3.0e0) + 4.0e0 * cm_{N_ITER - 1} * cm_{N_ITER - 1}))))",
    ),
    ("s_m", f"({_B} * vaa * (sg_{N_ITER - 1} - vds))"),
]


def vincenty_steps() -> list[tuple[str, str]]:
    """Full ordered column program: setup, N_ITER lambda iterations
    (the sigma terms of the final iteration are reused for the distance
    — one extra evaluation beyond the last lambda update would change
    nothing at double precision), then the distance."""
    steps = list(VIN_SETUP)
    for k in range(N_ITER):
        steps += vin_iter(k)
    steps += VIN_FINAL
    return steps


def _hav(lat_a: str, lon_a: str, lat_b: str, lon_b: str, name: str) -> list:
    h = f"h_{name}"
    return [
        (
            h,
            f"(sin((({lat_b} - {lat_a}) * {_PI180}) / 2.0e0)"
            f" * sin((({lat_b} - {lat_a}) * {_PI180}) / 2.0e0)"
            f" + cos({lat_a} * {_PI180}) * cos({lat_b} * {_PI180})"
            f" * sin((({lon_b} - {lon_a}) * {_PI180}) / 2.0e0)"
            f" * sin((({lon_b} - {lon_a}) * {_PI180}) / 2.0e0))",
        ),
        (f"ang_{name}", f"(2.0e0 * asin(least(1.0e0, sqrt(h_{name}))))"),
    ]


#: l'Huilier spherical-excess triangle area on the authalic sphere:
#: expects columns la0, lo0, la1, lo1, la2, lo2 (degrees).
TRI_AREA_STEPS: list[tuple[str, str]] = (
    _hav("la0", "lo0", "la1", "lo1", "a")
    + _hav("la1", "lo1", "la2", "lo2", "b")
    + _hav("la0", "lo0", "la2", "lo2", "c")
    + [
        ("hs", "((ang_a + ang_b + ang_c) / 2.0e0)"),
        (
            "ht",
            "(tan(hs / 2.0e0) * tan((hs - ang_a) / 2.0e0)"
            " * tan((hs - ang_b) / 2.0e0) * tan((hs - ang_c) / 2.0e0))",
        ),
        (
            "tri_area",
            f"(4.0e0 * atan(sqrt(greatest(0.0e0, ht)))"
            f" * {_R_AUTH} * {_R_AUTH})",
        ),
    ]
)


def steps_to_sql(base_select: str, steps: list[tuple[str, str]]) -> str:
    """Chain the column program as nested subqueries over base_select."""
    sql = f"({base_select})"
    for name, text in steps:
        sql = f"(SELECT *, {text} AS {name} FROM {sql})"
    return sql
