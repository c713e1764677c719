"""Bucketed co-located join (operators/bucketed.py): plan-shape pin —
both sides pre-bucketed on the join key means the join plans with ZERO
Exchange operators — plus bit-parity against the ordinary shuffle join."""

import shutil

import pytest

from gdal_spark import corpus
from gdal_spark.operators.bucketed import bucketed_join, write_bucketed

_DB = "bktest"
_LOC = "/tmp/gdal_spark_bktest"


@pytest.fixture()
def bucket_db(spark):
    shutil.rmtree(_LOC, ignore_errors=True)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_DB} LOCATION '{_LOC}'")
    yield _DB
    spark.sql(f"DROP DATABASE IF EXISTS {_DB} CASCADE")
    shutil.rmtree(_LOC, ignore_errors=True)


def test_bucketed_join_is_exchange_free(spark, sf_dir, bucket_db):
    docs = corpus.load_docs(spark, sf_dir).selectExpr(
        "doc_id", "n_chars", "CAST(doc_id % 97 AS INT) AS cell"
    )
    dims = corpus.load_docs(spark, sf_dir).selectExpr(
        "CAST(doc_id % 97 AS INT) AS cell", "doc_id AS rhs_id"
    )
    write_bucketed(docs, f"{bucket_db}.docs_by_cell", ["cell"], 8)
    write_bucketed(dims, f"{bucket_db}.dims_by_cell", ["cell"], 8)

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, f"{bucket_db}.docs_by_cell", f"{bucket_db}.dims_by_cell",
            ["cell"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan

        # bit-parity with the shuffle twin on the raw DataFrames
        expect = docs.join(dims, "cell").groupBy().sum("doc_id", "rhs_id")
        got = joined.groupBy().sum("doc_id", "rhs_id")
        assert got.collect() == expect.collect()
        assert joined.count() == docs.join(dims, "cell").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_bucket_pruning_on_key_predicate(spark, sf_dir, bucket_db):
    """An equality predicate on the bucket key prunes whole buckets at
    PLAN time (SelectedBucketsCount < total) — the hash-layout analog of
    partition pruning: a key lookup touches 1/N of the files no matter
    how large the table grows."""
    docs = corpus.load_docs(spark, sf_dir).selectExpr(
        "doc_id", "CAST(doc_id % 31 AS INT) AS cell"
    )
    write_bucketed(docs, f"{bucket_db}.a", ["cell"], 4)
    # autoBucketedScan falls back to a plain scan when nothing needs the
    # bucketed output partitioning; force the bucketed read so the
    # pruning branch (FileSourceScanExec genBucketSet) is exercised
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        filtered = spark.table(f"{bucket_db}.a").where("cell = 5")
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
        assert filtered.count() == docs.where("cell = 5").count()
    finally:
        spark.conf.set(key, old)
