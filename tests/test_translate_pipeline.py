"""Composed ogr2ogr translate pipeline (`vector_translate`).

The registry query chains the GDALVectorTranslate per-feature lifecycle
(apps/ogr2ogr_lib.cpp:6456 LayerTranslator::Translate): -spat + -where
at the scan, -clipsrc in source SRS, -t_srs 4326->3857, -clipdst in
destination SRS.  The driver contract test oracle-checks the values;
here we pin (a) that EVERY stage of the composition actually does work
on the fixture (drops rows / modifies geometry — otherwise the
composition test would be vacuous), and (b) the plan shape: one scan,
zero Exchange, zero Python.
"""

from __future__ import annotations

import duckdb

from gdal_spark import corpus
from gdal_spark import registry as R

SF_DIR = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


_BASE = (
    "WITH d AS (SELECT doc_id, lang, n_chars, "
    f"{corpus.RECT_XMIN_SQL} AS xmin, {corpus.RECT_YMIN_SQL} AS ymin, "
    f"{corpus.RECT_XMAX_SQL} AS xmax, {corpus.RECT_YMAX_SQL} AS ymax "
    "FROM documents)"
)


def test_every_stage_does_work():
    """spat, where, clipsrc-drop, clipdst-drop each remove rows, and
    clipsrc clamps (not just drops) at least one surviving geometry."""
    con = _con()

    def cnt(sql: str) -> int:
        return con.sql(_BASE + sql).fetchone()[0]

    n_base = cnt(" SELECT count(*) FROM d")
    n_spat = cnt(f" SELECT count(*) FROM d WHERE {R._VT_SPAT_COND}")
    n_where = cnt(
        f" SELECT count(*) FROM d WHERE {R._VT_SPAT_COND} AND {R._VT_WHERE_COND}"
    )
    clip = (
        f", f AS (SELECT *, {R._vt_stage_sql(R._VT_CSRC_STAGE)} FROM d"
        f" WHERE {R._VT_SPAT_COND} AND {R._VT_WHERE_COND})"
    )
    n_csrc = cnt(clip + " SELECT count(*) FROM f WHERE cx1 > cx0 AND cy1 > cy0")
    n_mod = cnt(
        clip
        + " SELECT count(*) FROM f WHERE cx1 > cx0 AND cy1 > cy0"
        " AND (cx0 <> xmin OR cy0 <> ymin OR cx1 <> xmax OR cy1 <> ymax)"
    )
    n_final = con.sql(
        f"SELECT count(*) FROM ({R.ORACLES['vector_translate']})"
    ).fetchone()[0]

    assert n_base > n_spat > n_where > n_csrc > n_final > 0, (
        n_base,
        n_spat,
        n_where,
        n_csrc,
        n_final,
    )
    assert n_mod > 0  # -clipsrc clamps some survivor, not only drops


def test_plan_single_scan_no_exchange(spark):
    df = R.QUERIES["vector_translate"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") == 1, plan


class TestStepChainAPI:
    """gdal_spark.pipeline — the `gdal vector pipeline` step surface."""

    def test_pipeline_reproduces_one_shot_query(self, spark):
        a = R.QUERIES["vector_translate"](spark, SF_DIR)
        b = R.QUERIES["vector_pipeline"](spark, SF_DIR)
        cols = a.columns
        assert b.columns == cols
        ra = sorted(tuple(r[c] for c in cols) for r in a.collect())
        rb = sorted(tuple(r[c] for c in cols) for r in b.collect())
        assert ra == rb and len(ra) > 0

    def test_pipeline_is_one_plan_no_exchange(self, spark):
        df = R.QUERIES["vector_pipeline"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
        assert plan.count("Scan parquet") == 1

    def test_parse_validation(self):
        import pytest

        from gdal_spark.pipeline import parse_pipeline

        with pytest.raises(ValueError, match="first step"):
            parse_pipeline("filter a > 1 ! write stream")
        with pytest.raises(ValueError, match="last step"):
            parse_pipeline("read corpus:docs ! filter a > 1")
        steps = parse_pipeline("read x ! limit 5 ! write stream")
        assert [s[0] for s in steps] == ["read", "limit", "write"]


class TestRasterStepChain:
    def test_steps_compose_and_do_work(self):
        """Each step changes the result (the composition is non-vacuous)."""
        import duckdb

        from gdal_spark.pipeline import render_raster_pipeline_sql

        src = (
            f"SELECT band, px, py, CAST({R._SRC_VAL} AS INT) AS value"
            f" FROM ({R._SRC_GRID_CTE}) s"
        )
        full = R._RP_SPEC
        n_full = duckdb.sql(render_raster_pipeline_sql(full, src)).df()
        assert len(n_full) == 100 * 50 * 2  # window/2 x selected bands
        # dropping the resize step quadruples the rows
        no_resize = full.replace(" ! resize 2", "")
        assert len(duckdb.sql(
            render_raster_pipeline_sql(no_resize, src)).df()) == 4 * len(n_full)
        # band renumbering: selected bands 2,3 emerge as 1,2
        assert sorted(n_full.band.unique()) == [1, 2]

    def test_plan_is_fused(self, spark):
        df = R.QUERIES["raster_pipeline"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestMixedPipeline:
    def test_bridge_validation(self):
        import pytest

        from gdal_spark.pipeline import run_mixed_pipeline

        with pytest.raises(ValueError, match="rasterize"):
            run_mixed_pipeline(None, "read zones:rect ! resize 2 ! write stream")

    def test_raster_suffix_does_work(self):
        """The raster steps transform the burn output (non-vacuous):
        scale maps burn values into [0, 100] and resize samples roughly
        a quarter of the burned pixels."""
        import duckdb

        full = duckdb.sql(R.ORACLES["mixed_pipeline"]).df()
        assert 0 <= full.value.min() and full.value.max() <= 100
        assert len(full) > 1000
        no_resize = duckdb.sql(
            R.ORACLES["mixed_pipeline"].replace(
                "WHERE (px - 1) % 2 = 0 AND (py - 1) % 2 = 0", "WHERE TRUE"
            )
        ).df()
        assert len(no_resize) > 3 * len(full)
