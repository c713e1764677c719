"""Hilbert-clustered table layout — FlatGeobuf's packed-R-tree sort,
re-expressed as a Spark write strategy.

Reference behavior: FlatGeobuf sorts features by the Hilbert value of
their envelope midpoint (``ogr/ogrsf_frmts/flatgeobuf/packedrtree.cpp:
74-150,176-210``) so a spatial filter touches a contiguous slice of the
file. At 100 TB the Spark-native equivalent is to *cluster the table* on
the same key: ``repartitionByRange(hkey)`` gives globally range-ordered
files, ``sortWithinPartitions(hkey)`` orders rows inside each file, and
parquet row-group min/max statistics on the coordinate columns then act
as the R-tree: a bbox scan prunes every file/row-group whose coordinate
envelope misses the query window. No driver-side index structure exists
at any scale — the "index" is the layout plus per-row-group stats, both
of which Spark maintains distributedly.

The key is computed entirely JVM-side (exact integer bit-ops through
``geometry/hilbert.py``'s step chain), so the write path adds no Python
cost; the extent used to normalize coordinates is a 1-row aggregate
broadcast back onto the corpus (the same calcExtent-then-sort shape as
``hilbertSort``, packedrtree.cpp:176-183).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.geometry.hilbert import hilbert_steps

# Shared formula text (Spark + DuckDB): 16-bit grid coordinate from a
# data-extent-normalized double. FLOOR first makes the BIGINT cast exact
# on both engines (no round-vs-truncate divergence). The lon==maxx row
# lands exactly on 65535: (maxx-minx)/(maxx-minx) is exactly 1.0 in
# IEEE, matching the reference's hilbertMax top cell.
HX_SQL = "CAST(FLOOR(6.5535e4 * (lon - minx) / (maxx - minx)) AS BIGINT)"
HY_SQL = "CAST(FLOOR(6.5535e4 * (lat - miny) / (maxy - miny)) AS BIGINT)"


def with_hilbert_key(df: DataFrame, out: str = "hkey") -> DataFrame:
    """Append the FlatGeobuf Hilbert key of (lon, lat) as BIGINT ``out``.

    One tiny extent aggregate is broadcast-joined back (calcExtent,
    packedrtree.cpp:176); every other step is whole-stage-codegen
    integer arithmetic.
    """
    ext = df.agg(
        F.min("lon").alias("minx"),
        F.max("lon").alias("maxx"),
        F.min("lat").alias("miny"),
        F.max("lat").alias("maxy"),
    )
    keyed = (
        df.crossJoin(F.broadcast(ext))
        .withColumn("hx", F.expr(HX_SQL))
        .withColumn("hy", F.expr(HY_SQL))
    )
    for name, text in hilbert_steps("hx", "hy", out, "spark"):
        keyed = keyed.withColumn(name, F.expr(text))
    drop = [n for n, _ in hilbert_steps("hx", "hy", out, "spark") if n != out]
    return keyed.drop("minx", "maxx", "miny", "maxy", "hx", "hy", *drop)


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    num_files: int = 32,
    key: str = "hkey",
    **writer_options,
) -> None:
    """Write ``df`` as a Hilbert-clustered parquet table.

    ``repartitionByRange`` on the key yields one contiguous curve range
    per output file (range exchange samples the key distribution, so
    skewed corpora still split evenly); the within-file sort makes
    row-group coordinate stats tight. Readers need no special API — a
    plain bbox filter prunes via parquet min/max.
    """
    keyed = df if key in df.columns else with_hilbert_key(df, key)
    (
        keyed.repartitionByRange(num_files, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .options(**writer_options)
        .parquet(path)
    )
