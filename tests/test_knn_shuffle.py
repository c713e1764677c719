"""Shuffle-strategy kNN / radius join: bit-parity with the map-side
kernels (same tie-break, same d2 op order) — the huge-target-table
scale path with no driver collect."""

from pyspark.sql import functions as F

from gdal_spark.operators.knn import (
    knn_join,
    knn_join_shuffle,
    knn_targets,
    radius_join,
    radius_join_shuffle,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 % 360) - 180.0 + 0.123).alias("lon"),
        ((F.col("id") * 53 % 120) - 60.0 + 0.321).alias("lat"),
    )


def test_knn_shuffle_matches_mapside(spark):
    docs = _docs(spark)
    t = knn_targets(spark)
    a = {
        (r.doc_id, r.target_id, r.rnk)
        for r in knn_join(docs, t, k=5).collect()
    }
    b = {
        (r.doc_id, r.target_id, r.rnk)
        for r in knn_join_shuffle(docs, t, k=5).collect()
    }
    assert a == b


def test_radius_shuffle_matches_mapside(spark):
    docs = _docs(spark)
    t = knn_targets(spark)
    a = {
        (r.doc_id, r.target_id)
        for r in radius_join(docs, t, radius2_sql=25.0).collect()
    }
    b = {
        (r.doc_id, r.target_id)
        for r in radius_join_shuffle(docs, t, radius2_sql=25.0).collect()
    }
    assert a == b
    assert len(a) > 0
