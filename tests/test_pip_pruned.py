"""pip_join_pruned / pip_join_agg_incremental — the flagship spatial
join composed with the snapshot table (manifest file skipping +
files-added-since incremental maintenance).

The driver contract certifies values; these tests pin the part the
oracle can't see: that the manifest pruning actually SKIPS files (the
100 TB claim), and that the incremental path really only reads the
delta snapshot's files.
"""

import pyspark.sql.functions as F
import pytest

from gdal_spark import corpus, zones
from gdal_spark.registry import (
    _PRUNED_ZONE_IDS,
    _corpus_snapshot_table,
)


@pytest.fixture(scope="module")
def table(spark, sf_dir):
    return _corpus_snapshot_table(spark, sf_dir, "pippruned_test", 1)


class TestManifestPruning:
    def test_selective_zone_skips_files(self, spark, table):
        m = table._manifest(table._resolve(None))
        total = len(m["files"])
        assert total >= 8, "clustered commit should produce several files"
        zr = (
            zones.rect_zones(spark)
            .filter(F.col("zone_id") == _PRUNED_ZONE_IDS[0])
            .collect()[0]
        )
        kept = table.pruned_files("lon", zr.zxmin, zr.zxmax)
        # S2 clustering makes per-file lon ranges tight: a ~10-degree
        # zone must not touch most of the planet's files
        assert len(kept) < total, (len(kept), total)
        assert len(kept) <= total // 2, (len(kept), total)

    def test_pruned_scan_equals_full_filter(self, spark, sf_dir, table):
        zr = (
            zones.rect_zones(spark)
            .filter(F.col("zone_id") == _PRUNED_ZONE_IDS[0])
            .collect()[0]
        )
        pred = (
            (F.col("lon") > F.lit(zr.zxmin))
            & (F.col("lon") < F.lit(zr.zxmax))
            & (F.col("lat") > F.lit(zr.zymin))
            & (F.col("lat") < F.lit(zr.zymax))
        )
        a = {
            r.doc_id
            for r in table.pruned_read("lon", zr.zxmin, zr.zxmax)
            .filter(pred)
            .collect()
        }
        docs = corpus.load_docs(spark, sf_dir)
        b = {r.doc_id for r in docs.filter(pred).collect()}
        assert a == b and len(a) > 0


class TestIncrementalZonal:
    def test_delta_reads_only_appended_files(self, spark, sf_dir):
        t = _corpus_snapshot_table(spark, sf_dir, "pipinc_test", 2)
        m1 = t._manifest(1)
        m2 = t._manifest(2)
        inc_files = {f["path"] for f in m2["files"]} - {
            f["path"] for f in m1["files"]
        }
        # the incremental read's row count == rows in exactly the
        # appended files (doc_id % 2 != 0 half... n=2 split: r=1)
        n_inc = t.incremental(1).count()
        n_snap2_only = (
            spark.read.parquet(*sorted(inc_files)).count()
            if inc_files
            else 0
        )
        assert n_inc == n_snap2_only > 0

    def test_state_merge_equals_full(self, spark, sf_dir):
        from gdal_spark.registry import q_pip_join_agg, q_pip_join_agg_incremental

        full = {
            (r.zone_id, r.n_docs)
            for r in q_pip_join_agg(spark, sf_dir).collect()
        }
        inc = {
            (r.zone_id, r.n_docs)
            for r in q_pip_join_agg_incremental(spark, sf_dir).collect()
        }
        assert full == inc and len(full) > 0


class TestManifestJoinPlanning:
    """Round-5 rework: pruning is a manifest-stats JOIN, not a driver
    loop — plan size must not grow with zone count, and the matched
    file set must still skip most of the table."""

    def test_matched_files_skip_most_of_table(self, spark, table):
        from gdal_spark import zones

        m = table._manifest(table._resolve(None))
        total = len(m["files"])
        zdim = (
            zones.rect_zones(spark)
            .filter(F.col("zone_id").isin(*_PRUNED_ZONE_IDS))
            .select("zxmin", "zxmax")
        )
        stats = spark.createDataFrame(
            table.stats_rows("lon"), "path string, lo double, hi double"
        )
        matched = stats.join(
            F.broadcast(zdim),
            F.col("lo").isNull()
            | ((F.col("lo") <= F.col("zxmax"))
               & (F.col("hi") >= F.col("zxmin"))),
            "left_semi",
        )
        n = matched.select("path").distinct().count()
        assert 0 < n < total, (n, total)

    def test_plan_has_one_scan_and_no_zone_growth(self, spark, sf_dir):
        """The physical plan contains exactly ONE parquet scan of the
        corpus table regardless of zone count (the round-4 driver loop
        unioned one scan per zone)."""
        from gdal_spark.registry import q_pip_join_pruned

        plan = q_pip_join_pruned(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") == 1, plan

    def test_read_subset_applies_to_committed_paths(self, spark, table):
        rows = table.stats_rows("lon")
        some = [p for p, lo, hi in rows[:3]]
        n = table.read_subset(some).count()
        full = table.read().count()
        assert 0 < n < full
        assert table.read_subset([]).count() == 0
