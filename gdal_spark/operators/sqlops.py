"""OGR SQL surface semantics that aren't plain Catalyst defaults.

The one genuinely custom semantic is the FIRST-MATCH join: OGR SQL's
``JOIN … ON`` fetches only the first matching secondary feature per
primary row (null-padded on miss for LEFT JOIN) —
ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1497-1527.  The reference takes
the secondary layer's iteration order; we define the deterministic
tiebreak as min of an explicit order column (SURVEY §7 watch-list).

Everything else in OGR SQL (projection/WHERE/LIKE/IN/BETWEEN/CAST,
summary aggregates swq_op_registrar.cpp:53-59, DISTINCT mode,
ORDER BY/LIMIT ogr_gensql.cpp:2185-2400) maps 1:1 onto DataFrame ops and
is exercised through the registry queries directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_match_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    order_cols: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Join keeping only the first right-side match per left row.

    ``order_cols`` (right-side columns) define "first" and must be a
    unique composite for a deterministic result (SURVEY §7: the
    reference inherits arbitrary iteration order — we pin it).
    Null-padded on miss when how='left' (ogr_gensql.cpp:1497-1527
    fetch-first).  Implemented as join + per-key row_number — Catalyst
    picks broadcast/shuffle hash join; the window partitions by the left
    key, so no extra shuffle beyond the join's own exchange.
    """
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    joined = left.join(right, on, how)
    w = Window.partitionBy(*on).orderBy(
        *[F.col(c).asc_nulls_last() for c in order_cols]
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
