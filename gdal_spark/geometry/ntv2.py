"""NTv2-style grid-shift datum step — the accurate-path alternative to
the Helmert step for datum pairs that PROJ serves from a shift grid
(ogr/ogrct.cpp builds such pipelines whenever PROJ finds a grid, e.g.
OSGB36 -> WGS84 via OSTN15; grid fixtures in autotest/proj_grids/).

NTv2 semantics implemented faithfully (public: the NTv2 format spec and
PROJ's hgridshift step):

  * the grid is a small raster of per-node (dlat, dlon) shifts in
    ARC-SECONDS on a regular geographic lattice;
  * a point interpolates the four surrounding nodes BILINEARLY;
  * latitude shift is ADDED; longitude shift is stored POSITIVE WEST
    (the NTv2 sign quirk), so it is SUBTRACTED from an east-positive
    longitude.

Documented divergence: PROJ reads binary ``.gsb`` grid files; the
sandbox has none, so the node VALUES here are a deterministic synthetic
surface (integer lattice formula below — no libm in the node values, so
both engines agree bit-for-bit).  The machinery — grid-as-broadcast-dim
join, cell indexing, fractional bilinear weights, the sign conventions,
and the composition into the projection pipeline — is the real NTv2
path; swapping in a parsed .gsb table changes only the dim's rows.

Scale shape: the grid is a DIM (hundreds to a few million nodes even
for national grids), broadcast once; each corpus row computes its cell
key in codegen and hits ONE broadcast hash join, then the bilinear
resolves in codegen — no Python, no extra shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class NTv2Grid:
    """Regular geographic shift lattice (degrees)."""

    lat0: float = 49.0
    lon0: float = -8.0
    dlat: float = 0.5
    dlon: float = 0.5
    nrows: int = 25  # lat nodes: 49 .. 61
    ncols: int = 21  # lon nodes: -8 .. 2


UK_GRID = NTv2Grid()

# synthetic node shifts in arc-seconds (integer lattice formula — the
# .gsb stand-in; OSGB-like magnitudes of a few arc-seconds)
_DLAT_SEC = "(((gi * 7 + gj * 13) % 11) * 1.0e-1 + 5.0e-1)"
_DLON_SEC = "(((gi * 5 + gj * 3) % 13) * 1.0e-1 - 1.2e0)"


def node_formula_sql(gi: str, gj: str) -> tuple[str, str]:
    """(dlat_sec, dlon_sec) SQL text at integer node (gi, gj) — the
    closed form the ORACLE evaluates inline (the engine reads the same
    values out of the materialized dim)."""
    return (
        _DLAT_SEC.replace("gi", f"({gi})").replace("gj", f"({gj})"),
        _DLON_SEC.replace("gi", f"({gi})").replace("gj", f"({gj})"),
    )


def grid_nodes(spark: SparkSession, g: NTv2Grid = UK_GRID) -> DataFrame:
    """The shift grid as a table: (gi, gj, dlat_sec, dlon_sec) — the
    .gsb analog a production deployment would read from parquet."""
    return spark.range(g.nrows * g.ncols).selectExpr(
        f"CAST(id % {g.nrows} AS INT) AS gi",
        f"CAST((id - id % {g.nrows}) / {g.nrows} AS INT) AS gj",
    ).selectExpr(
        "gi",
        "gj",
        f"{_DLAT_SEC} AS dlat_sec",
        f"{_DLON_SEC} AS dlon_sec",
    )


def grid_cells(spark: SparkSession, g: NTv2Grid = UK_GRID) -> DataFrame:
    """Per-CELL corner values (ci, cj, four dlat + four dlon) — three
    dim-sized self-joins at build time so the per-point path is ONE
    broadcast equi-join."""
    n = grid_nodes(spark, g)

    def corner(tag: str, di: int, dj: int) -> DataFrame:
        return n.selectExpr(
            f"gi - {di} AS ci",
            f"gj - {dj} AS cj",
            f"dlat_sec AS la{tag}",
            f"dlon_sec AS lo{tag}",
        )

    cells = (
        corner("00", 0, 0)
        .join(corner("10", 1, 0), ["ci", "cj"])
        .join(corner("01", 0, 1), ["ci", "cj"])
        .join(corner("11", 1, 1), ["ci", "cj"])
        .filter(f"ci >= 0 AND ci < {g.nrows - 1} AND cj >= 0 AND cj < {g.ncols - 1}")
    )
    return cells


def cell_key_exprs(lat: str, lon: str, g: NTv2Grid = UK_GRID) -> dict:
    """SQL fragments shared by engine and oracle: cell indices and
    fractional bilinear weights of a point in the grid."""
    fi = f"((({lat}) - {g.lat0:.17e}) / {g.dlat:.17e})"
    fj = f"((({lon}) - {g.lon0:.17e}) / {g.dlon:.17e})"
    ci = f"CAST(floor({fi}) AS INT)"
    cj = f"CAST(floor({fj}) AS INT)"
    return {
        "ci": ci,
        "cj": cj,
        "tx": f"({fi} - floor({fi}))",
        "ty": f"({fj} - floor({fj}))",
    }


def bilinear_sql(v00: str, v10: str, v01: str, v11: str,
                 tx: str, ty: str) -> str:
    """The NTv2 bilinear: tx = fractional lat, ty = fractional lon."""
    return (
        f"(({v00}) * (1.0e0 - ({tx})) * (1.0e0 - ({ty}))"
        f" + ({v10}) * ({tx}) * (1.0e0 - ({ty}))"
        f" + ({v01}) * (1.0e0 - ({tx})) * ({ty})"
        f" + ({v11}) * ({tx}) * ({ty}))"
    )


def apply_grid_shift(
    df: DataFrame,
    spark: SparkSession,
    lat_col: str,
    lon_col: str,
    g: NTv2Grid = UK_GRID,
    out_lat: str = "glat",
    out_lon: str = "glon",
) -> DataFrame:
    """The ENGINE path: broadcast the cell dim, one equi-join on the
    cell key, bilinear + sign conventions in codegen.  Points outside
    the grid pass through unshifted (PROJ's behavior for out-of-grid
    points absent a fallback).

    Contract: ``lat_col`` / ``lon_col`` should be MATERIALIZED (leaf)
    columns, not deep expression chains — the cell key becomes a join
    key, and Catalyst's constraint inference walks the key expressions
    (a projection-chain input hangs analysis; cut lineage first, e.g.
    ``df.select(...).localCheckpoint(eager=True)`` — the
    spark-iterative-lineage invariant)."""
    k = cell_key_exprs(lat_col, lon_col, g)
    keyed = df.selectExpr(
        "*",
        f"{k['ci']} AS _ci",
        f"{k['cj']} AS _cj",
        f"{k['tx']} AS _tx",
        f"{k['ty']} AS _ty",
    )
    cells = grid_cells(spark, g)
    joined = keyed.join(
        F.broadcast(cells),
        (F.col("_ci") == F.col("ci")) & (F.col("_cj") == F.col("cj")),
        "left",
    )
    dlat = bilinear_sql("la00", "la10", "la01", "la11", "_tx", "_ty")
    dlon = bilinear_sql("lo00", "lo10", "lo01", "lo11", "_tx", "_ty")
    return joined.selectExpr(
        "*",
        # lat shift added; NTv2 longitudes are positive WEST -> subtract
        f"CASE WHEN la00 IS NULL THEN ({lat_col}) "
        f"ELSE ({lat_col}) + {dlat} / 3.6e3 END AS {out_lat}",
        f"CASE WHEN lo00 IS NULL THEN ({lon_col}) "
        f"ELSE ({lon_col}) - {dlon} / 3.6e3 END AS {out_lon}",
    ).drop("_ci", "_cj", "_tx", "_ty", "ci", "cj",
           "la00", "la10", "la01", "la11",
           "lo00", "lo10", "lo01", "lo11")


def oracle_shift_stages(
    lat: str, lon: str, g: NTv2Grid = UK_GRID,
    out_lat: str = "glat", out_lon: str = "glon",
) -> list[tuple[str, str]]:
    """The ORACLE formulation: corner values evaluated INLINE from the
    node closed form (no table, no join) — an independent second path
    over the same semantics."""
    k = cell_key_exprs(lat, lon, g)
    st = [
        ("o_ci", k["ci"]),
        ("o_cj", k["cj"]),
        ("o_tx", k["tx"]),
        ("o_ty", k["ty"]),
        ("o_in", f"(o_ci >= 0 AND o_ci < {g.nrows - 1} AND o_cj >= 0"
                 f" AND o_cj < {g.ncols - 1})"),
    ]
    corners = {}
    for tag, di, dj in (("00", 0, 0), ("10", 1, 0), ("01", 0, 1),
                        ("11", 1, 1)):
        a, o = node_formula_sql(f"o_ci + {di}", f"o_cj + {dj}")
        st.append((f"o_la{tag}", a))
        st.append((f"o_lo{tag}", o))
        corners[tag] = (f"o_la{tag}", f"o_lo{tag}")
    dlat = bilinear_sql("o_la00", "o_la10", "o_la01", "o_la11",
                        "o_tx", "o_ty")
    dlon = bilinear_sql("o_lo00", "o_lo10", "o_lo01", "o_lo11",
                        "o_tx", "o_ty")
    st.append((out_lat, f"CASE WHEN o_in THEN ({lat}) + {dlat} / 3.6e3"
                        f" ELSE ({lat}) END"))
    st.append((out_lon, f"CASE WHEN o_in THEN ({lon}) - {dlon} / 3.6e3"
                        f" ELSE ({lon}) END"))
    return st
