"""Zone method layer — the polygon side of the spatial joins.

Analog of the reference's canonical ``poly.shp`` fixture (schema from
autotest/ogr/data/poly.dbf: AREA, EAS_ID, PRFEDEA; FIXTURES.md §2).

Two tiers:
  * ``rect_zones`` — NZONES axis-aligned rectangles from integer
    formulas, reproducible in DuckDB via :func:`duckdb_zones_cte`; these
    back the driver's oracle-checked queries. Bounds carry a +5e-4
    offset so no corpus point (a /1e3 lattice) ever sits on a boundary.
  * ``fancy_zones`` — hole/concave/adjacent polygons for the pytest
    golden tests (PIP refine correctness beyond rectangles), mirroring
    the layer-algebra fixtures (autotest/ogr/ogr_layer_algebra.py:56-102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NZONES = 100

# zone rectangle formulas over zone index i (0-based):
ZXMIN_SQL = "(-1.8e2 + ((i * 73) % 340) + 5.0e-4)"
ZYMIN_SQL = "(-6.0e1 + ((i * 37) % 100) + 5.0e-4)"
ZXMAX_SQL = f"({ZXMIN_SQL} + 4 + (i % 13))"
ZYMAX_SQL = f"({ZYMIN_SQL} + 3 + (i % 11))"
ZONE_ID_SQL = "(158 + i)"  # EAS_ID-style ids


def duckdb_zones_cte(n: int = NZONES) -> str:
    """DuckDB derived table producing exactly the rect_zones envelope set."""
    return (
        f"SELECT {ZONE_ID_SQL} AS zone_id, {ZXMIN_SQL} AS zxmin, "
        f"{ZYMIN_SQL} AS zymin, {ZXMAX_SQL} AS zxmax, {ZYMAX_SQL} AS zymax "
        f"FROM range(0, {n}) t(i)"
    )


def rect_zones(spark: SparkSession, n: int = NZONES) -> DataFrame:
    """Zone layer as a DataFrame: zone_id, area, prfedea, geom_wkt.

    Formulas evaluate JVM-side (spark.range + F.expr) — identical text to
    the DuckDB CTE, so bounds are bit-identical doubles.
    """
    df = spark.range(n).select(F.col("id").alias("i"))
    df = (
        df.withColumn("zone_id", F.expr(ZONE_ID_SQL))
        .withColumn("zxmin", F.expr(ZXMIN_SQL))
        .withColumn("zymin", F.expr(ZYMIN_SQL))
        .withColumn("zxmax", F.expr(ZXMAX_SQL))
        .withColumn("zymax", F.expr(ZYMAX_SQL))
    )
    s, c = F.lit(" "), F.lit(",")
    x0, y0, x1, y1 = (F.col(k) for k in ("zxmin", "zymin", "zxmax", "zymax"))
    wkt = F.concat(
        F.lit("POLYGON (("),
        x0, s, y0, c, x1, s, y0, c, x1, s, y1, c, x0, s, y1, c, x0, s, y0,
        F.lit("))"),
    )
    return (
        df.withColumn("area", (x1 - x0) * (y1 - y0))
        .withColumn("prfedea", F.concat(F.lit("35043413"), F.lpad(F.col("i"), 8, "0")))
        .withColumn("geom_wkt", wkt)
        .select("zone_id", "area", "prfedea", "geom_wkt", "zxmin", "zymin", "zxmax", "zymax")
    )


# ------------------------------------------------------------- clip layer
# Disjoint rectangle grid (12 cols x 5 rows, gaps between cells) for the
# overlay operators whose union-of-B semantics (Clip/Erase,
# ogrlayer.cpp:5497,5806) require non-overlapping method geometries for
# an ANSI-SQL-expressible oracle: with disjoint B, A ∩ union(B) equals
# the disjoint union of pairwise pieces.
NCLIP = 60
CXMIN_SQL = "(-1.8e2 + (i % 12) * 30 + 5.0e-4)"
# integer row index: (i - i%12)/12 divides exactly, so the double->bigint
# cast is identical in Spark (truncate) and DuckDB (round)
CYMIN_SQL = "(-6.0e1 + cast(((i - (i % 12)) / 12) as bigint) * 24 + 5.0e-4)"
CXMAX_SQL = f"({CXMIN_SQL} + 22)"
CYMAX_SQL = f"({CYMIN_SQL} + 16)"
CLIP_ID_SQL = "(500 + i)"


def duckdb_clip_zones_cte(n: int = NCLIP) -> str:
    return (
        f"SELECT {CLIP_ID_SQL} AS zone_id, {CXMIN_SQL} AS zxmin, "
        f"{CYMIN_SQL} AS zymin, {CXMAX_SQL} AS zxmax, {CYMAX_SQL} AS zymax "
        f"FROM range(0, {n}) t(i)"
    )


def clip_zones(spark: SparkSession, n: int = NCLIP) -> DataFrame:
    """Disjoint clip layer: zone_id, geom_wkt (+ envelope cols)."""
    df = spark.range(n).select(F.col("id").alias("i"))
    df = (
        df.withColumn("zone_id", F.expr(CLIP_ID_SQL))
        .withColumn("zxmin", F.expr(CXMIN_SQL))
        .withColumn("zymin", F.expr(CYMIN_SQL))
        .withColumn("zxmax", F.expr(CXMAX_SQL))
        .withColumn("zymax", F.expr(CYMAX_SQL))
    )
    s, c = F.lit(" "), F.lit(",")
    x0, y0, x1, y1 = (F.col(k) for k in ("zxmin", "zymin", "zxmax", "zymax"))
    wkt = F.concat(
        F.lit("POLYGON (("),
        x0, s, y0, c, x1, s, y0, c, x1, s, y1, c, x0, s, y1, c, x0, s, y0,
        F.lit("))"),
    )
    return df.select("zone_id", wkt.alias("geom_wkt"), "zxmin", "zymin", "zxmax", "zymax")


# ----------------------------------------------------------- rich layer
# CONCAVE method layer with holes and OVERLAPS — the general-polygon
# overlay fixture (mirrors real admin-boundary layers; reference tests
# autotest/ogr/ogr_layer_algebra.py use concave/overlapping method
# features).  Every zone is an L-shaped rectilinear polygon with one
# rectangular hole; zones come in pairs (2k, 2k+1) whose base corners
# differ by (+5, +3) while arms are >= 8 x 5 — guaranteed overlap.
#
# Closed-form decomposition (for the SQL oracle AND the area algebra):
#   A = [bx, bx+w1] x [by, by+h1]          (bottom arm)
#   B = [bx, bx+w2] x [by+h1, by+h1+ha]    (upper arm, w2 < w1)
#   H = [bx+1, bx+1+hw] x [by+1, by+3]     (hole, strictly inside A)
# zone cover = (A ∪ B) \ H;  A,B disjoint;  area = w1*h1 + w2*ha - 2*hw.
NRICH = 40
RBX_SQL = "(-1.7e2 + (((i - (i % 2)) * 31) % 300) + (i % 2) * 5 + 5.0e-4)"
RBY_SQL = "(-5.5e1 + (((i - (i % 2)) * 17) % 95) + (i % 2) * 3 + 5.0e-4)"
RW1_SQL = "(8 + (i % 7))"
RH1_SQL = "(5 + (i % 5))"
RW2_SQL = "(3 + (i % 3))"
RHA_SQL = "(4 + (i % 4))"
RHW_SQL = "(2 + (i % 2))"
RICH_ID_SQL = "(700 + i)"

# derived corner expressions, shared text both engines
_R = {
    "bx": RBX_SQL,
    "by": RBY_SQL,
    "x_w1": f"({RBX_SQL} + {RW1_SQL})",
    "x_w2": f"({RBX_SQL} + {RW2_SQL})",
    "y_h1": f"({RBY_SQL} + {RH1_SQL})",
    "y_top": f"({RBY_SQL} + {RH1_SQL} + {RHA_SQL})",
    "hx0": f"({RBX_SQL} + 1)",
    "hx1": f"({RBX_SQL} + 1 + {RHW_SQL})",
    "hy0": f"({RBY_SQL} + 1)",
    "hy1": f"({RBY_SQL} + 3)",
}


def duckdb_rich_parts_cte(n: int = NRICH) -> str:
    """One row per (zone, part): kind 'A'/'B' positive cover, 'H' hole.
    The parts are the oracle's exact view of the rich zone geometry."""
    r = _R
    rows = [
        f"SELECT {RICH_ID_SQL} AS zone_id, 'A' AS kind, {r['bx']} AS pxmin, "
        f"{r['by']} AS pymin, {r['x_w1']} AS pxmax, {r['y_h1']} AS pymax "
        f"FROM range(0, {n}) t(i)",
        f"SELECT {RICH_ID_SQL} AS zone_id, 'B' AS kind, {r['bx']} AS pxmin, "
        f"{r['y_h1']} AS pymin, {r['x_w2']} AS pxmax, {r['y_top']} AS pymax "
        f"FROM range(0, {n}) t(i)",
        f"SELECT {RICH_ID_SQL} AS zone_id, 'H' AS kind, {r['hx0']} AS pxmin, "
        f"{r['hy0']} AS pymin, {r['hx1']} AS pxmax, {r['hy1']} AS pymax "
        f"FROM range(0, {n}) t(i)",
    ]
    return " UNION ALL ".join(rows)


def rich_zones(spark: SparkSession, n: int = NRICH) -> DataFrame:
    """Concave-with-hole overlapping zone layer: (zone_id, geom_wkt).

    WKT is built from the SAME coordinate expressions the oracle CTE
    uses (JVM double -> shortest-round-trip string -> kernel parse gives
    back identical bits)."""
    df = spark.range(n).select(F.col("id").alias("i"))
    c = {k: F.expr(v) for k, v in _R.items()}
    s, cm = F.lit(" "), F.lit(",")
    shell = F.concat(
        F.lit("POLYGON (("),
        c["bx"], s, c["by"], cm,
        c["x_w1"], s, c["by"], cm,
        c["x_w1"], s, c["y_h1"], cm,
        c["x_w2"], s, c["y_h1"], cm,
        c["x_w2"], s, c["y_top"], cm,
        c["bx"], s, c["y_top"], cm,
        c["bx"], s, c["by"],
        F.lit("),("),
        c["hx0"], s, c["hy0"], cm,
        c["hx1"], s, c["hy0"], cm,
        c["hx1"], s, c["hy1"], cm,
        c["hx0"], s, c["hy1"], cm,
        c["hx0"], s, c["hy0"],
        F.lit("))"),
    )
    return df.select(
        F.expr(RICH_ID_SQL).alias("zone_id"), shell.alias("geom_wkt")
    )


# pytest-only polygons exercising the refine kernel beyond rectangles
FANCY_ZONES: list[tuple[int, str]] = [
    # donut: hole in the middle
    (9001, "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (8 8, 12 8, 12 12, 8 12, 8 8))"),
    # C-shape (concave)
    (9002, "POLYGON ((30 0, 50 0, 50 4, 34 4, 34 16, 50 16, 50 20, 30 20, 30 0))"),
    # two adjacent squares sharing an edge
    (9003, "POLYGON ((-40 -20, -30 -20, -30 -10, -40 -10, -40 -20))"),
    (9004, "POLYGON ((-30 -20, -20 -20, -20 -10, -30 -10, -30 -20))"),
    # multipolygon
    (9005, "MULTIPOLYGON (((60 0, 62 0, 62 2, 60 2, 60 0)), ((70 0, 72 0, 72 2, 70 2, 70 0)))"),
]


def fancy_zones(spark: SparkSession) -> DataFrame:
    rows = [(zid, float(0), f"FANCY{zid}", wkt) for zid, wkt in FANCY_ZONES]
    df = spark.createDataFrame(rows, "zone_id long, area double, prfedea string, geom_wkt string")
    return df
