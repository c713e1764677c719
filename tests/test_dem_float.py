"""Independent Python ports of the gdaldem float algorithms
(apps/gdaldem_lib.cpp) checked against the oracle SQL — the shared-text
queries prove Spark == DuckDB; these prove the text computes the
reference's algorithm (port follows the C code, not the SQL)."""

import math

import duckdb
import numpy as np
import pytest

K = math.pi / 180


def _terr(px, py):
    return (px * 7 + py * 13 + 29) % 256


def _win(px, py):
    return [
        _terr(px - 1, py - 1), _terr(px, py - 1), _terr(px + 1, py - 1),
        _terr(px - 1, py),     _terr(px, py),     _terr(px + 1, py),
        _terr(px - 1, py + 1), _terr(px, py + 1), _terr(px + 1, py + 1),
    ]


def _horn(w):
    x = ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) * 1.0
    y = ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) * -1.0
    return x, y


def _rows(sql, limit=1200):
    return duckdb.connect().execute(
        sql + f" ORDER BY px, py LIMIT {limit}"
    ).fetchall()


def _azimuth_adjust(a):
    a = np.float32(450.0 - float(a)) if a > np.float32(90) else np.float32(
        90.0 - float(a)
    )
    return np.float32(0) if a == np.float32(360) else a


class TestDemFloatPorts:
    def test_slope_aspect_horn(self):
        from gdal_spark.registry import _DEM_FLOAT_ORACLE

        for px, py, sdeg, adeg in _rows(_DEM_FLOAT_ORACLE):
            w = _win(px, py)
            dx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
            dy = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
            sdx = -dx
            key = float(sdx) * sdx + float(dy) * dy
            assert sdeg == float(
                np.float32(math.atan(math.sqrt(key) / 8) * (180 / math.pi))
            )
            if dx == 0 and dy == 0:
                assert adeg is None
            else:
                a = np.float32(math.atan2(dy, -dx) / K)
                assert adeg == float(_azimuth_adjust(a))

    def test_slope_aspect_zt(self):
        from gdal_spark.registry import _DEM_ZT_ORACLE

        for px, py, sdeg, adeg in _rows(_DEM_ZT_ORACLE):
            dx = _terr(px + 1, py) - _terr(px - 1, py)
            dy = _terr(px, py + 1) - _terr(px, py - 1)
            key = float(-dx) * -dx + float(dy) * dy
            assert sdeg == float(
                np.float32(math.atan(math.sqrt(key) / 2) * (180 / math.pi))
            )
            if dx == 0 and dy == 0:
                assert adeg is None
            else:
                a = np.float32(math.atan2(dy, -dx) / K)
                assert adeg == float(_azimuth_adjust(a))

    def test_hillshade_multidirectional(self):
        from gdal_spark.registry import _HSM_ORACLE

        sin127 = 127.0 * math.sin(45 * K)
        sin254 = 254.0 * math.sin(45 * K)
        cam = math.cos(45 * K) * 0.125
        cos225c = 127.0 * math.cos(225 * K) * cam
        cosalt127 = 127.0 * cam
        for px, py, hv in _rows(_HSM_ORACLE):
            x, y = _horn(_win(px, py))
            xpy = x * x + y * y
            if xpy == 0:
                assert hv == float(np.float32(1.0 + sin254))
                continue
            v225 = max(sin127 + (x - y) * cos225c, 0.0)
            v270 = max(sin127 - x * cosalt127, 0.0)
            v315 = max(sin127 + (x + y) * cos225c, 0.0)
            v360 = max(sin127 - y * cosalt127, 0.0)
            w225 = 0.5 * xpy - x * y
            cang = 1.0 + (
                (w225 * v225 + x * x * v270 + (xpy - w225) * v315 + y * y * v360)
                / xpy
            ) / math.sqrt(1 + 0.015625 * xpy)
            assert hv == float(np.float32(cang))

    def test_hillshade_combined(self):
        from gdal_spark.registry import _HSC_ORACLE

        sin_alt = math.sin(45 * K)
        cam = math.cos(45 * K) * 0.125
        caz = math.cos(315 * K) * cam
        saz = math.sin(315 * K) * cam
        inv = 1.0 / ((math.pi * math.pi) / 4)
        for px, py, hv in _rows(_HSC_ORACLE):
            x, y = _horn(_win(px, py))
            slope = (x * x + y * y) * 0.015625
            cang = math.acos(
                (sin_alt - (y * caz - x * saz)) / math.sqrt(1 + slope)
            )
            cang = 1 - cang * math.atan(math.sqrt(slope)) * inv
            want = 1.0 if cang <= 0 else float(np.float32(1.0 + 254.0 * cang))
            assert hv == want


class TestSemDedupSemantics:
    def test_only_planted_clones_removed(self):
        """Organic vectors (max pairwise cosine 0.51) all survive the
        0.95 gate; every planted clone is removed with its source as
        witness."""
        import __spark_entry__ as entry

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM"
            " '/root/testdata/sf0.001/embeddings.parquet'"
        )
        rows = con.execute(entry.oracle_sql()["semdedup"]).fetchall()
        removed = {r[0]: r[3] for r in rows if r[2] == 0}
        n_src = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
        want = {1000000 + v: v for v in range(0, n_src, 25)}
        assert removed == want

    def test_hot_cluster_guard_bounds_pairs(self):
        """A planted 300-member cluster: the sign-LSH re-split (cap=50)
        bounds the within-cluster pair join >=10x below the quadratic
        count, while the keeper output stays IDENTICAL (exact clones
        share every sign bit, so the split can't separate them; organic
        cosines stay far below the 0.95 gate)."""
        import pandas as pd

        from gdal_spark.registry import (
            _KM_DUCK_DIMS,
            _KM_DUCK_ELEM,
            _semdedup_sql,
        )

        rng = np.random.default_rng(3)
        rows = []
        # 8 k-means seeds: seed 0 near the hot ball, seeds 1..7 far away
        for k in range(8):
            v = np.zeros(64)
            if k == 0:
                v[47] = 1.0
            else:
                v[40 + k] = 1000.0
            rows.append((k, [float(x) for x in v]))
        # 300 hot members: random +-1 over dims 0..39 — mutually
        # non-dup (cos ~ N(0, 1/40)), diverse first-6 sign bits
        for i in range(300):
            v = np.zeros(64)
            v[:40] = rng.choice([-1.0, 1.0], 40)
            rows.append((8 + i, [float(x) for x in v]))
        emb = pd.DataFrame(rows, columns=["vec_id", "embedding"])

        def run(cap):
            con = duckdb.connect()
            con.register("embeddings", emb)
            sql = _semdedup_sql(_KM_DUCK_DIMS, _KM_DUCK_ELEM, cap=cap)
            out = sorted(con.execute(sql).fetchall())
            pairs = con.execute(
                sql.rsplit("\nSELECT", 1)[0] + "\nSELECT COUNT(*) FROM pair"
            ).fetchone()[0]
            return out, pairs

        out_full, pairs_full = run(cap=4096)
        out_capped, pairs_capped = run(cap=50)
        # clones of vec_id 0,25,...,300 removed with their source as witness
        removed = {r[0]: r[3] for r in out_full if r[2] == 0}
        assert removed == {1000000 + v: v for v in range(0, 308, 25)}
        assert out_capped == out_full
        assert pairs_full > 40000  # the quadratic count the guard avoids
        assert pairs_capped * 10 < pairs_full


class TestCurationSemantics:
    def test_stage_labels(self):
        """Planted clones are exactly the 'dup' set; every stage drops
        at least one doc; labels partition the corpus."""
        import __spark_entry__ as entry

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM"
            " '/root/testdata/sf0.001/documents.parquet'"
        )
        rows = con.execute(entry.oracle_sql()["curation_pipeline"]).fetchall()
        by_stage = {}
        for doc_id, source, n_words, stage in rows:
            by_stage.setdefault(stage, set()).add(doc_id)
        assert set(by_stage) == {"kept", "dup", "quality", "cap", "sample"}
        n_src = con.execute("SELECT count(*) FROM documents").fetchone()[0]
        assert by_stage["dup"] == {
            1000000 + d for d in range(0, n_src, 40)
        }
        # kept docs all pass the word-count gate
        kept_words = [n for _, _, n, s in rows if s == "kept"]
        assert all(20 <= n <= 1000 for n in kept_words)
