"""Interleaved document corpus — the engine's primary input shape.

BASELINE.json input_hint:
    docs(doc_id:string, spans:array<struct<kind,text,media_ref,offset:int>>)

The sandbox has no external spatial data, so the corpus is synthesized
DETERMINISTICALLY from the driver's ``documents`` parquet table: every
derived quantity (lon, lat, rect half-width, hot-cell membership) is an
integer-hash + IEEE-exact float formula over ``doc_id``.  The formulas
are defined ONCE as SQL text (``LON_SQL`` etc.) evaluated by BOTH Spark
(via ``F.expr``) and DuckDB (inlined into oracle queries), so the engine
and the correctness oracle see bit-identical coordinates.

Spatial distribution (FIXTURES.md §1): ~80% uniform in lon [-180,180) x
lat [-60,60), ~20% clustered into 10 hot cells (±1° jitter) — the hot
cells exercise skew handling in the cell joins.

Geometry rides INSIDE the span sequence (kind='geom', text=WKT), so the
payload stays "interleaved text + media" and every operator must carry
the span array through untouched (per-row span-sequence equality is the
standing invariant, cf. field passthrough in
ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1479 TranslateFeature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ----------------------------------------------------------------- formulas
# All integer ops use `%` with non-negative operands (identical semantics
# in Spark SQL and DuckDB); float constants are E-notation so both engines
# parse DOUBLE (see gdal_spark.geometry.mercator.sql_double).

_HOT_N = 10  # number of hot cells

# hot-cell centers: clon(i) = -162 + 36 i  in [-162, 162]
#                   clat(i) =  -45 + 10 i  in [-45, 45]
_HOT_SEL = "((doc_id * 2654435761 + 3) % 5)"  # == 0 -> hot (20%)
_HOT_IDX = "((doc_id * 97 + 13) % 10)"

_LON_U = "(((doc_id * 40503 + 7) % 360000) / 1.0e3 - 1.8e2)"
_LAT_U = "(((doc_id * 69069 + 11) % 120000) / 1.0e3 - 6.0e1)"
_JLON = "(((doc_id * 131 + 1) % 2000) / 1.0e3 - 1.0e0)"
_JLAT = "(((doc_id * 151 + 2) % 2000) / 1.0e3 - 1.0e0)"

LON_SQL = (
    f"(CASE WHEN {_HOT_SEL} = 0 "
    f"THEN (-1.62e2 + {_HOT_IDX} * 3.6e1) + {_JLON} "
    f"ELSE {_LON_U} END)"
)
LAT_SQL = (
    f"(CASE WHEN {_HOT_SEL} = 0 "
    f"THEN (-4.5e1 + {_HOT_IDX} * 1.0e1) + {_JLAT} "
    f"ELSE {_LAT_U} END)"
)

# rectangle half-width for polygon docs, 0.1° .. 1.0° (lattice step 1e-3)
HALFW_SQL = "(((doc_id * 17 + 5) % 900 + 100) / 1.0e3)"

# SQL snippets for the doc rectangle's envelope (polygon-doc corpus)
RECT_XMIN_SQL = f"({LON_SQL} - {HALFW_SQL})"
RECT_XMAX_SQL = f"({LON_SQL} + {HALFW_SQL})"
RECT_YMIN_SQL = f"({LAT_SQL} - {HALFW_SQL})"
RECT_YMAX_SQL = f"({LAT_SQL} + {HALFW_SQL})"


def duckdb_docs_cte(table: str = "documents") -> str:
    """CTE body computing the derived point corpus in DuckDB — the oracle's
    view of exactly what :func:`load_docs` computes in Spark."""
    return (
        f"SELECT doc_id, text, lang, source, n_chars, "
        f"{LON_SQL} AS lon, {LAT_SQL} AS lat FROM {table}"
    )


def duckdb_polydocs_cte(table: str = "documents") -> str:
    """Oracle view of the polygon-doc corpus (axis-aligned rectangles)."""
    return (
        f"SELECT doc_id, {RECT_XMIN_SQL} AS xmin, {RECT_YMIN_SQL} AS ymin, "
        f"{RECT_XMAX_SQL} AS xmax, {RECT_YMAX_SQL} AS ymax FROM {table}"
    )


# --------------------------------------------------------------- spark side
def _point_wkt_col():
    return F.concat(
        F.lit("POINT ("), F.expr(LON_SQL), F.lit(" "), F.expr(LAT_SQL), F.lit(")")
    )


def _rect_wkt_col():
    x0, x1 = F.expr(RECT_XMIN_SQL), F.expr(RECT_XMAX_SQL)
    y0, y1 = F.expr(RECT_YMIN_SQL), F.expr(RECT_YMAX_SQL)
    s = F.lit(" ")
    c = F.lit(",")
    return F.concat(
        F.lit("POLYGON (("),
        x0, s, y0, c, x1, s, y0, c, x1, s, y1, c, x0, s, y1, c, x0, s, y0,
        F.lit("))"),
    )


def _span(kind, text, media_ref, offset):
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


def _with_spans(df: DataFrame, geom_wkt_col) -> DataFrame:
    """Interleave text / geom / media / text spans (2-6 span shape)."""
    null_s = F.lit(None).cast("string")
    media = F.concat(F.lit("media://"), F.col("doc_id"), F.lit("/2"))
    spans = F.array(
        _span(F.lit("text"), F.substring("text", 1, 40), null_s, F.lit(0)),
        _span(F.lit("geom"), geom_wkt_col, null_s, F.lit(1)),
        _span(F.lit("media"), null_s, media, F.lit(2)),
        _span(F.lit("text"), F.expr("substring(text, 41, 1000000)"), null_s, F.lit(3)),
    )
    return df.withColumn("spans", spans)


def _replicated(spark: SparkSession, sf_dir: str, replicate: int) -> DataFrame:
    """documents table, optionally replicated to bench scale.

    The parquet is one small file (one input partition), so replication
    puts the PARTITIONED range on the left and broadcasts the table:
    every core generates its replicas locally — full parallelism, zero
    shuffle. New doc_ids ``doc_id * replicate + r`` keep the geometry
    hash formulas live so replicas land in distinct locations.
    """
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        r = spark.range(replicate).select(F.col("id").alias("_r"))
        df = (
            r.crossJoin(F.broadcast(df))
            .withColumn("doc_id", F.col("doc_id") * replicate + F.col("_r"))
            .drop("_r")
        )
    return df


def load_docs(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Point-doc corpus: documents parquet + derived (lon, lat) + spans.
    Correctness runs use replicate=1; benches scale with replicate>1."""
    df = _replicated(spark, sf_dir, replicate)
    df = df.withColumn("lon", F.expr(LON_SQL)).withColumn("lat", F.expr(LAT_SQL))
    return _with_spans(df, _point_wkt_col())


def load_polydocs(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Polygon-doc corpus: same docs, geometry = axis-aligned rectangle
    (half-width 0.1°-1.0°) centered on the point coordinate."""
    df = _replicated(spark, sf_dir, replicate)
    df = (
        df.withColumn("lon", F.expr(LON_SQL))
        .withColumn("lat", F.expr(LAT_SQL))
        .withColumn("xmin", F.expr(RECT_XMIN_SQL))
        .withColumn("ymin", F.expr(RECT_YMIN_SQL))
        .withColumn("xmax", F.expr(RECT_XMAX_SQL))
        .withColumn("ymax", F.expr(RECT_YMAX_SQL))
    )
    return _with_spans(df, _rect_wkt_col())
