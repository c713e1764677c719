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
