"""gdal_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-answers the GDAL reference's core workloads (point-in-polygon joins,
layer-algebra overlays, kNN lookup, raster tile pyramids) over Spark
DataFrames of interleaved text+media documents.

Design (see SURVEY.md §7):
  * geometry lives as WKT/WKB columns + numeric (lon, lat) columns;
  * every kernel is pure numpy inside Arrow-vectorized pandas UDFs —
    there is NO per-row Python anywhere in a hot path;
  * the spatial access path is GlobalMercator tile/cell keys (a numpy +
    Spark-SQL port of the reference's gdal2tiles math) so that spatial
    joins become broadcast/shuffle hash joins Catalyst already optimizes.
"""

__version__ = "0.1.0"
