"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship PIP join on /root/testdata/sf0.001.
queries()       — every implemented operator (SURVEY.md §2) as
                  (spark, sf_dir) -> DataFrame.
oracle_sql()    — DuckDB-runnable ANSI SQL equivalents (same column
                  names/aliases; driver compares row-count + schema +
                  order-insensitive value hash at sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from gdal_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: point-in-polygon spatial join (cell-key broadcast
    hash join + ray-cast refine) of the interleaved doc corpus against
    the rect zone layer at sf0.001."""
    return registry.QUERIES["pip_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
