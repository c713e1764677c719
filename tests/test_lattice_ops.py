"""Independent checks for the shared-SQL-text lattice operators: the
oracle gate proves Spark == DuckDB bit-for-bit; these tests prove the
shared text computes the RIGHT thing, via a numpy reimplementation
(k-means) and closed-form invariants (vertical shift grid)."""

import duckdb
import numpy as np

from gdal_spark.registry import (
    _KM_ITERS,
    _KM_K,
    _KMEANS_ORACLE,
    _VSG_STEP,
    _VSHIFT_ORACLE,
)

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    return con


class TestKmeansLattice:
    def test_matches_numpy_reimplementation(self):
        """3 Lloyd iterations on the integer lattice, reimplemented with
        numpy broadcasting (different code path entirely), must produce
        identical assignments AND distances."""
        con = _con()
        emb = con.execute(
            "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
        ).fetchall()
        ids = np.array([r[0] for r in emb])
        P = np.floor(
            1e3 * np.array([r[1] for r in emb], dtype=np.float64)
        ).astype(np.int64)
        C = 1000 * P[:_KM_K]  # init: first K vectors, micro-units
        # the query's output is iteration N's ASSIGNMENT, made against
        # the centroids entering that iteration — so the last update is
        # never consumed
        for it in range(_KM_ITERS):
            # dist² in exact int64: (1000·p − c)² summed over dims
            D = ((1000 * P[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(D, axis=1)  # ties -> lowest cid (np argmin)
            if it == _KM_ITERS - 1:
                break
            newC = C.copy()
            for k in range(_KM_K):
                m = assign == k
                if m.any():
                    s = P[m].sum(axis=0)
                    newC[k] = np.floor(1e3 * s / m.sum()).astype(np.int64)
            C = newC
        want = {int(i): (int(a), int(d)) for i, a, d in
                zip(ids, assign, D[np.arange(len(ids)), assign])}
        got = {
            r[0]: (r[1], r[2])
            for r in con.execute(_KMEANS_ORACLE).fetchall()
        }
        assert got == want

    def test_every_cluster_nonempty(self):
        con = _con()
        rows = con.execute(_KMEANS_ORACLE).fetchall()
        assert len({r[1] for r in rows}) == _KM_K


class TestVshiftGrid:
    def test_node_positions_exact_and_bounded(self):
        """At grid-node pixel positions (px,py multiples of the step)
        the bilinear shift IS the node value exactly; everywhere the
        shifted output stays within the cell's corner-value bounds."""
        import __spark_entry__ as entry

        con = duckdb.connect()
        data = con.execute(entry.oracle_sql()["vshift_grid"]).fetchall()
        node = lambda gx, gy: (gx * 11 + gy * 17) % 40 - 20  # noqa: E731
        terr = lambda px, py: (px * 7 + py * 13 + 29) % 256  # noqa: E731
        by = {(px, py): um for px, py, um in data}
        for px in range(0, 400, _VSG_STEP):
            for py in range(0, 200, _VSG_STEP):
                gx, gy = px // _VSG_STEP, py // _VSG_STEP
                # exact integer micrometers: 1e6*0.3048 = 304800 and the
                # node shift is a whole meter -> *1e6; the float form
                # np.floor(1e6*(v*0.3048 + node)) sits ON the boundary
                # for every pixel and drifts a ulp either way
                expect = terr(px, py) * 304800 + node(gx, gy) * 1000000
                assert by[(px, py)] == expect
        # bounds at a sample of off-node pixels
        for px, py in [(3, 5), (37, 41), (399, 199), (123, 77)]:
            gx, gy = px // _VSG_STEP, py // _VSG_STEP
            cs = [node(gx, gy), node(gx + 1, gy), node(gx, gy + 1),
                  node(gx + 1, gy + 1)]
            lo = 1e6 * (terr(px, py) * 0.3048 + min(cs)) - 1
            hi = 1e6 * (terr(px, py) * 0.3048 + max(cs)) + 1
            assert lo <= by[(px, py)] <= hi
