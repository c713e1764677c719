"""gdalgrid invdistnn (alg/gdalgrid.cpp:241-480) — third-implementation
pins for the two registry queries.

The driver-contract test already certifies Spark == DuckDB on both
queries; here a plain-numpy port of the reference selection loops (the
multimap walk at :309-326 and the quadrant round-robin at :433-460)
recomputes every cell independently, and the fixture's branch coverage
is pinned so the caps/nodata paths can never go vacuous.
"""

import duckdb
import numpy as np
import pytest

from gdal_spark.registry import (
    _GRID_H,
    _GRID_W,
    _INVDISTNN_ORACLE,
    _INVDISTNN_Q_ORACLE,
    _NN_MAXP,
    _NN_MINP,
    _NNQ_MAXP,
    _NNQ_MAXPQ,
)

R2 = 100.0
SM2 = 0.25
NODATA = -9999.0


@pytest.fixture(scope="module")
def fixture():
    i = np.arange(_GRID_W * _GRID_H)
    gx, gy = i % _GRID_W, i // _GRID_W
    lon = -180.0 + gx * 4 + 2.0005
    lat = -90.0 + gy * 4 + 2.0005
    ti = np.arange(2000)
    tlon = ((ti * 48271 + 19) % 360000) / 1e3 - 180.0
    tlat = ((ti * 16807 + 23) % 120000) / 1e3 - 60.0
    tval = ((ti * 37) % 100).astype(np.float64)
    dx = lon[:, None] - tlon[None, :]
    dy = lat[:, None] - tlat[None, :]
    d2 = dx * dx + dy * dy
    return gx, gy, lon, lat, tlon, tlat, tval, d2


def _idw(rs2: np.ndarray, tv: np.ndarray) -> float:
    # per-term floor quantization, exactly the shared SQL text
    w = np.floor(1e12 / rs2)
    wz = np.floor(1e12 * tv / rs2)
    return round(float(wz.sum()) / float(w.sum()), 6)


def _plain_cell(ci, rs2, tv):
    """alg/gdalgrid.cpp:309-334 — nearest nMaxPoints by rsmoothed2."""
    order = np.lexsort((ci, rs2))[:_NN_MAXP]
    n = len(order)
    if n < _NN_MINP:
        return n, NODATA
    return n, _idw(rs2[order], tv[order])


def _quadrant_cell(ci, rs2, tv, quad):
    """alg/gdalgrid.cpp:433-480 — round-robin across quadrants."""
    picks = []
    for qi in range(4):
        qs = np.nonzero(quad == qi)[0]
        o = qs[np.lexsort((ci[qs], rs2[qs]))][:_NNQ_MAXPQ]
        picks.extend((r, qi, int(k)) for r, k in enumerate(o))
    picks.sort()
    kept = [p[2] for p in picks[:_NNQ_MAXP]]
    nq = len({int(quad[k]) for k in kept})
    if nq < 4:
        return len(kept), nq, NODATA
    return len(kept), nq, _idw(rs2[kept], tv[kept])


def _oracle(sql):
    return (
        duckdb.sql(sql)
        .df()
        .sort_values(["gx", "gy"])
        .reset_index(drop=True)
    )


class TestPlain:
    def test_matches_reference_loop(self, fixture):
        gx, gy, lon, lat, tlon, tlat, tval, d2 = fixture
        got = _oracle(_INVDISTNN_ORACLE)
        vals = dict()
        for c in range(len(gx)):
            ci = np.nonzero(d2[c] <= R2)[0]
            if len(ci) == 0:
                vals[(gx[c], gy[c])] = (0, NODATA)
                continue
            vals[(gx[c], gy[c])] = _plain_cell(ci, d2[c, ci] + SM2, tval[ci])
        assert len(got) == len(vals)
        for row in got.itertuples():
            n, v = vals[(row.gx, row.gy)]
            assert row.n_used == n, (row.gx, row.gy)
            assert row.idw_nn == v, (row.gx, row.gy, row.idw_nn, v)

    def test_branch_coverage(self, fixture):
        *_, d2 = fixture
        ncand = (d2 <= R2).sum(axis=1)
        # empty cells, sparse-but-nonzero (nodata via nMinPoints), capped
        assert (ncand == 0).sum() > 100
        assert ((ncand > 0) & (ncand < _NN_MINP)).sum() > 100
        assert (ncand > _NN_MAXP).sum() > 1000

    def test_inclusive_radius_and_smoothing_guard(self, fixture):
        *_, d2 = fixture
        # smoothing² = 0.25 > 1e-13 ⇒ the exact-hit shortcut (:291)
        # is structurally unreachable
        assert SM2 > 1e-13
        # the centers sit off the target lattice, so d2 == R2 exactly
        # never happens on this fixture — the <= is still the faithful
        # port of :295 (pin that nothing sits ON the boundary, so both
        # < and <= agree and the query text documents the semantics)
        assert not np.any(d2 == R2)


class TestQuadrant:
    def test_matches_reference_loop(self, fixture):
        gx, gy, lon, lat, tlon, tlat, tval, d2 = fixture
        got = _oracle(_INVDISTNN_Q_ORACLE)
        quad_all = (tlon[None, :] >= lon[:, None]).astype(np.int64) + 2 * (
            tlat[None, :] >= lat[:, None]
        ).astype(np.int64)
        diverged = 0
        for row in got.itertuples():
            c = int(row.gy) * _GRID_W + int(row.gx)
            ci = np.nonzero(d2[c] <= R2)[0]
            if len(ci) == 0:
                assert row.n_used == 0 and row.idw_nnq == NODATA
                continue
            rs2 = d2[c, ci] + SM2
            n, nq, v = _quadrant_cell(ci, rs2, tval[ci], quad_all[c, ci])
            assert (row.n_used, row.n_quads) == (n, nq), (row.gx, row.gy)
            assert row.idw_nnq == v, (row.gx, row.gy, row.idw_nnq, v)
            # round-robin vs global-distance top-6: the kept SETS differ
            if len(ci) > _NNQ_MAXP:
                order = np.lexsort((ci, rs2))[:_NNQ_MAXP]
                picks = []
                for qi in range(4):
                    qs = np.nonzero(quad_all[c, ci] == qi)[0]
                    o = qs[np.lexsort((ci[qs], rs2[qs]))][:_NNQ_MAXPQ]
                    picks.extend((r, qi, int(k)) for r, k in enumerate(o))
                picks.sort()
                kept = {ci[p[2]] for p in picks[:_NNQ_MAXP]}
                if kept != set(ci[order]):
                    diverged += 1
        # the round-robin order is not a re-dressed global sort
        assert diverged > 1000, diverged

    def test_partial_quadrant_nodata(self, fixture):
        got = _oracle(_INVDISTNN_Q_ORACLE)
        partial = got[(got.n_used > 0) & (got.n_quads < 4)]
        assert len(partial) > 500
        assert (partial.idw_nnq == NODATA).all()
