"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers:
  * a Spark callable ``(spark, sf_dir) -> DataFrame``;
  * where ANSI-SQL-expressible, the equivalent DuckDB oracle SQL over the
    driver's pre-registered views (documents, lineitem, ...).

Column names are aliased identically on both sides (driver hashes values
under sorted column names).  Float outputs are rounded to 6 decimals on
both sides to keep the value-hash stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import corpus, zones
from gdal_spark.geometry import mercator

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Spatial join family (ogrlayer.cpp:3345 Intersection semantics)
# --------------------------------------------------------------------------

_DOCS_CTE = corpus.duckdb_docs_cte("documents")
_ZONES_CTE = zones.duckdb_zones_cte()

_PIP_ORACLE = f"""
WITH docs AS ({_DOCS_CTE}), zones AS ({_ZONES_CTE})
SELECT d.doc_id, z.zone_id
FROM docs d JOIN zones z
  ON d.lon > z.zxmin AND d.lon < z.zxmax
 AND d.lat > z.zymin AND d.lat < z.zymax
"""


@register("pip_join", _PIP_ORACLE)
def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join: docs x rect zones -> (doc_id, zone_id)."""
    from gdal_spark.operators.pip_join import pip_join

    docs = corpus.load_docs(spark, sf_dir)
    z = zones.rect_zones(spark).drop("zxmin", "zymin", "zxmax", "zymax")
    return pip_join(docs, z).select("doc_id", "zone_id")


_PIP_AGG_ORACLE = f"""
WITH docs AS ({_DOCS_CTE}), zones AS ({_ZONES_CTE})
SELECT z.zone_id, count(*) AS n_docs
FROM docs d JOIN zones z
  ON d.lon > z.zxmin AND d.lon < z.zxmax
 AND d.lat > z.zymin AND d.lat < z.zymax
GROUP BY z.zone_id
"""


@register("pip_join_agg", _PIP_AGG_ORACLE)
def q_pip_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal count — groupBy(zone).agg after the PIP join (SURVEY §2.4
    zonal stats)."""
    from gdal_spark.operators.pip_join import pip_join

    docs = corpus.load_docs(spark, sf_dir)
    z = zones.rect_zones(spark).drop("zxmin", "zymin", "zxmax", "zymax")
    return (
        pip_join(docs, z)
        .groupBy("zone_id")
        .agg(F.count("*").alias("n_docs"))
    )


_TILE_ZOOM = 8
_TILE_ORACLE = f"""
WITH docs AS ({_DOCS_CTE})
SELECT doc_id, {mercator.sql_tx('lon', str(_TILE_ZOOM))} AS tx,
       {mercator.sql_ty('lat', str(_TILE_ZOOM))} AS ty
FROM docs
"""


@register("tile_assign", _TILE_ORACLE)
def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal2tiles tile assignment (gdal2tiles.py:422-530 math) for every
    doc at zoom 8 — pure JVM-side expression, no Python."""
    docs = corpus.load_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.expr(mercator.sql_tx("lon", str(_TILE_ZOOM))).alias("tx"),
        F.expr(mercator.sql_ty("lat", str(_TILE_ZOOM))).alias("ty"),
    )


# --------------------------------------------------------------------------
# public surface used by __spark_entry__
# --------------------------------------------------------------------------
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
