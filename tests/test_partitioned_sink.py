"""Partitioned sink + partition pruning — the Iceberg-layout story at
parquet level (SURVEY §2.1 write/sink, §4 partition pruning): the tile
table written partitionBy(zoom) must be read back with a zoom predicate
that prunes at PLAN level (PartitionFilters), not post-scan."""

import tempfile

from pyspark.sql import functions as F

from gdal_spark.operators.tiling import tile_counts


def _docs(spark):
    return spark.range(2000).select(
        (F.col("id") % 360 - 180.0 + 0.5).alias("lon"),
        (F.col("id") % 120 - 60.0 + 0.5).alias("lat"),
    )


def test_zoom_partition_pruning(spark):
    with tempfile.TemporaryDirectory() as root:
        tiles = None
        for z in range(4):
            t = tile_counts(_docs(spark), z)
            tiles = t if tiles is None else tiles.unionByName(t)
        tiles.write.mode("overwrite").partitionBy("zoom").parquet(root)

        back = spark.read.parquet(root).filter(F.col("zoom") == 2)
        plan = back._jdf.queryExecution().executedPlan().toString()
        # the zoom predicate must land in PartitionFilters (directory
        # pruning), not in PushedFilters/post-scan Filter
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "zoom" in pf, f"zoom not pruned at partition level: {pf}"

        want = {
            (r.tx, r.ty, r.n_docs) for r in tile_counts(_docs(spark), 2).collect()
        }
        got = {(r.tx, r.ty, r.n_docs) for r in back.collect()}
        assert got == want

        # only the zoom=2 directory is read
        files = [
            r.filePath
            for r in spark.read.parquet(root)
            .filter(F.col("zoom") == 2)
            .select(F.input_file_name().alias("filePath"))
            .distinct()
            .collect()
        ]
        assert files and all("zoom=2" in f for f in files)
