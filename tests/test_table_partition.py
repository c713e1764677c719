"""SnapshotTable hidden partitioning + schema evolution (the Iceberg
features that matter at 100 TB: equality predicates open only the files
whose partition tuple can match, the layout stays the table's private
concern so it can change under running queries, and a column added
later is merge-on-read NULL for older files)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.table import SnapshotTable, _pt_expr, _pt_value


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 100).alias("score"),
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ptab")


def _spec_table(spark, root):
    return SnapshotTable(
        spark, root, partition_spec=[("doc_id", "bucket[4]")]
    )


class TestTransforms:
    def test_bucket_spark_matches_python(self, spark):
        """The write-side Spark expression and the read-side Python
        transform MUST agree on every value, or pruning silently drops
        rows.  Exercise the md5 idiom over a value range."""
        df = spark.range(0, 500).select(
            F.col("id"),
            F.expr(_pt_expr("id", "bucket[8]")).alias("b"),
        )
        for r in df.collect():
            assert r["b"] == _pt_value(r["id"], "bucket[8]"), r["id"]

    def test_truncate_floor_semantics(self, spark):
        df = spark.createDataFrame(
            [(-25,), (-1,), (0,), (99,), (101,)], ["v"]
        ).select("v", F.expr(_pt_expr("v", "truncate[100]")).alias("t"))
        for r in df.collect():
            assert r["t"] == _pt_value(r["v"], "truncate[100]")
        assert _pt_value(-1, "truncate[100]") == -100  # floor, not toward 0


class TestPartitionPruning:
    def test_pruned_read_equals_plain_filter(self, spark, root):
        t = _spec_table(spark, root)
        t.append(_docs(spark, 0, 200))
        t.append(_docs(spark, 200, 400))
        for key in (7, 42, 399):
            got = sorted(
                r["score"]
                for r in t.partition_pruned_read({"doc_id": key}).collect()
            )
            want = sorted(
                r["score"]
                for r in t.read()
                .filter(F.col("doc_id") == key)
                .collect()
            )
            assert got == want and len(got) == 1

    def test_pruning_opens_fewer_files(self, spark, root):
        t = _spec_table(spark, root)
        t.append(_docs(spark, 0, 200).repartition(4, "doc_id"))
        total = len(t._manifest(t.current_snapshot_id())["files"])
        kept = len(t.partition_pruned_files({"doc_id": 7}))
        assert kept < total, (kept, total)
        # every kept file shares the predicate's bucket
        want = str(_pt_value(7, "bucket[4]"))
        for f in t.partition_pruned_files({"doc_id": 7}):
            assert f["partition"]["_p0"] == want

    def test_missing_row_never_pruned_to_wrong_answer(self, spark, root):
        t = _spec_table(spark, root)
        t.append(_docs(spark, 0, 50))
        assert t.partition_pruned_read({"doc_id": 999}).count() == 0

    def test_spec_evolution_keeps_old_files(self, spark, root):
        """Files committed before the spec existed carry no partition
        tuple; a pruned read must still see their rows (Iceberg spec
        evolution: older files are judged by the spec they were written
        under — here, none)."""
        t0 = SnapshotTable(spark, root)  # no spec
        t0.append(_docs(spark, 0, 100))
        t1 = _spec_table(spark, root)  # spec added later, same table
        t1.append(_docs(spark, 100, 200))
        got = t1.partition_pruned_read({"doc_id": 5}).count()
        assert got == 1  # doc 5 lives in a pre-spec (unpartitioned) file
        files = t1.partition_pruned_files({"doc_id": 5})
        assert any(not f.get("partition") for f in files)

    def test_unknown_predicate_col_keeps_everything(self, spark, root):
        t = _spec_table(spark, root)
        t.append(_docs(spark, 0, 100))
        m = t._manifest(t.current_snapshot_id())
        assert len(t.partition_pruned_files({"score": 3})) == len(
            m["files"]
        )


class TestHilbertClusteredManifestPruning:
    def test_clustered_layout_prunes_manifest_files(self, spark, tmp_path):
        """The Iceberg scan-planning composition: a table written in
        Hilbert order has TIGHT per-file lon/lat manifest stats, so a
        bbox query opens few files; the same data in doc_id order has
        world-spanning stats in every file and prunes nothing.  Results
        must be identical across layouts (pruning is planning only)."""
        from gdal_spark.operators.layout import with_hilbert_key

        n = 4096
        pts = spark.range(n).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") % 64) / 64.0 * 360.0 - 180.0).alias("lon"),
            ((F.col("id") / 64).cast("long") / 64.0 * 170.0 - 85.0).alias(
                "lat"
            ),
        )
        bbox = dict(xmin=-10.0, xmax=10.0, ymin=-10.0, ymax=10.0)

        def kept(t):
            by_lon = {
                f["path"]
                for f in t.pruned_files("lon", bbox["xmin"], bbox["xmax"])
            }
            both = [
                f
                for f in t.pruned_files("lat", bbox["ymin"], bbox["ymax"])
                if f["path"] in by_lon
            ]
            return both, len(t._manifest(t.current_snapshot_id())["files"])

        tc = SnapshotTable(
            spark, str(tmp_path / "clustered"), stats_cols=["lon", "lat"]
        )
        tc.append(
            with_hilbert_key(pts)
            .repartitionByRange(16, "hkey")
            .sortWithinPartitions("hkey")
            .drop("hkey")
        )
        tn = SnapshotTable(
            spark, str(tmp_path / "natural"), stats_cols=["lon", "lat"]
        )
        tn.append(pts.repartition(16, "doc_id"))

        ck, ctot = kept(tc)
        nk, ntot = kept(tn)
        assert len(ck) < ctot / 2, (len(ck), ctot)  # clustered: few files
        assert len(nk) == ntot  # shuffled: every file spans the world
        # identical answers either way — pruning is scan planning only
        cond = (
            (F.col("lon") >= bbox["xmin"]) & (F.col("lon") <= bbox["xmax"])
            & (F.col("lat") >= bbox["ymin"]) & (F.col("lat") <= bbox["ymax"])
        )
        want = sorted(r["doc_id"] for r in tn.read().filter(cond).collect())
        got = sorted(
            r["doc_id"]
            for r in tc._scan(
                tc._manifest(tc.current_snapshot_id()), ck
            ).filter(cond).collect()
        )
        assert got == want and len(got) > 0


class TestSchemaEvolution:
    def test_added_column_is_null_for_old_files(self, spark, root):
        t = SnapshotTable(spark, root)
        t.append(_docs(spark, 0, 10))
        s1 = t.current_snapshot_id()
        t.append(_docs(spark, 10, 20).withColumn("lang", F.lit("en")))
        cur = t.read()
        assert "lang" in cur.columns
        rows = {r["doc_id"]: r["lang"] for r in cur.collect()}
        assert rows[5] is None and rows[15] == "en"
        # time travel: the older snapshot sees the older schema
        assert "lang" not in t.read(s1).columns

    def test_schema_recorded_in_manifest(self, spark, root):
        t = SnapshotTable(spark, root)
        t.append(_docs(spark, 0, 10))
        m = t._manifest(t.current_snapshot_id())
        names = [f["name"] for f in m["schema"]["fields"]]
        assert names == ["doc_id", "score"]

    def test_evolution_composes_with_deletes(self, spark, root):
        t = SnapshotTable(spark, root)
        t.append(_docs(spark, 0, 10))
        t.append(_docs(spark, 10, 20).withColumn("lang", F.lit("en")))
        t.delete_where("doc_id % 2 = 0", ["doc_id"])
        got = sorted(r["doc_id"] for r in t.read().collect())
        assert got == [i for i in range(20) if i % 2 == 1]
