"""IVF+PQ structural guarantee (registry.py _ivfpq_ctes): an exact
duplicate's source attains the GLOBAL-minimum asymmetric distance —
codes(q) minimizes pd(q, m, ·) per subspace by construction, a clone
shares its source's codes and coarse cell, so ADC(clone, source) =
Σ_m min_code pd(clone, m, code) ≤ ADC(clone, x) for every x.  This
holds for ANY data distribution (the fixture's random vectors make
recall fixture-bound; this theorem is what the operator owes)."""

from pyspark.sql import functions as F

from gdal_spark.registry import (
    _KM_SPARK_DIMS,
    _KM_SPARK_ELEM,
    _ivfpq_ctes,
    _run_cte_chain,
)


def test_clone_query_retrieves_source_at_min_adc(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clones = e.where("vec_id % 25 = 0").select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    e.unionByName(clones).createOrReplaceTempView("embeddings")
    try:
        out = _run_cte_chain(
            spark,
            *_ivfpq_ctes(_KM_SPARK_DIMS, _KM_SPARK_ELEM),
            materialize={"q", "cb", "pd", "cd", "codes", "tassign", "qprobe"},
        )
        rows = out.where("query_id >= 1000000").collect()
    finally:
        # leave the plain layer registered for subsequent tests
        e.createOrReplaceTempView("embeddings")
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) > 0
    for qid, rs in by_q.items():
        src = qid - 1000000
        best = min(r.ad2 for r in rs)
        hit = [r for r in rs if r.neighbor_id == src]
        # the source must be in the top-k AND carry the minimum ADC
        assert hit, f"clone {qid} did not retrieve source {src}: {rs}"
        assert hit[0].ad2 == best
