"""GNM shortest path: independent Dijkstra pin plus operator behavior
(non-convergence raises; unreachable nodes are absent)."""

import heapq

import duckdb
import pytest

from gdal_spark.registry import _GNM_N, _gnm_oracle


def _grid_edges(n):
    wgt = lambda u, v: (u * 7 + v * 13) % 20 + 1  # noqa: E731
    edges = []
    for r in range(n):
        for c in range(n):
            u = r * n + c
            if c + 1 < n:
                v = u + 1
                edges += [(u, v, wgt(u, v)), (v, u, wgt(v, u))]
            if r + 1 < n:
                v = u + n
                edges += [(u, v, wgt(u, v)), (v, u, wgt(v, u))]
    return edges


def _dijkstra(edges, source):
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist = {source: 0}
    pq = [(0, source)]
    seen = set()
    while pq:
        d, u = heapq.heappop(pq)
        if u in seen:
            continue
        seen.add(u)
        for v, w in adj.get(u, []):
            if d + w < dist.get(v, float("inf")):
                dist[v] = d + w
                heapq.heappush(pq, (d + w, v))
    return dist


class TestShortestPath:
    def test_oracle_matches_dijkstra(self):
        """The 30-round unrolled relaxation equals a real Dijkstra."""
        got = dict(duckdb.connect().execute(_gnm_oracle()).fetchall())
        want = _dijkstra(_grid_edges(_GNM_N), 0)
        assert got == want

    def test_components_oracle_matches_union_find(self):
        """gnm_components vs an independent union-find partition."""
        from gdal_spark.registry import _gnmc_oracle

        n = _GNM_N
        keep = lambda u, v: (u * 13 + v * 7) % 3 != 0  # noqa: E731
        edges = []
        for r in range(n):
            for c in range(n):
                u = r * n + c
                if c + 1 < n and keep(u, u + 1):
                    edges.append((u, u + 1))
                if r + 1 < n and keep(u, u + n):
                    edges.append((u, u + n))
        par = {}
        nodes = {u for e in edges for u in e}
        for u in nodes:
            par[u] = u

        def find(x):
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        for u, v in edges:
            par[find(u)] = find(v)
        want = {u: min(w for w in nodes if find(w) == find(u)) for u in nodes}
        got = dict(duckdb.connect().execute(_gnmc_oracle()).fetchall())
        assert got == want

    def test_route_tree_is_valid_shortest_path_tree(self):
        """Every tree edge is a real graph edge satisfying
        dist[v] = dist[pred] + w(pred, v), and the distances equal the
        independent Dijkstra's."""
        from gdal_spark.registry import _gnm_tree_oracle

        n = _GNM_N
        wgt = lambda u, v: (u * 7 + v * 13) % 20 + 1  # noqa: E731
        rows = duckdb.connect().execute(_gnm_tree_oracle()).fetchall()
        d = {nid: dist for nid, dist, pred in rows}
        p = {nid: pred for nid, dist, pred in rows}
        assert d == _dijkstra(_grid_edges(n), 0)
        for v, dv in d.items():
            if v == 0:
                assert dv == 0 and p[v] == 0
                continue
            u = p[v]
            adj = (abs(u - v) == 1 and u // n == v // n) or abs(u - v) == n
            assert adj and dv == d[u] + wgt(u, v)

    def test_unreachable_absent_and_nonconvergence_raises(self, spark):
        from gdal_spark.operators.graph import shortest_paths

        # two components: 0-1-2 chain and isolated 10-11 pair
        edges = spark.createDataFrame(
            [(0, 1, 5), (1, 0, 5), (1, 2, 7), (2, 1, 7), (10, 11, 1), (11, 10, 1)],
            "src long, dst long, w long",
        )
        out = {r.node_id: r.dist for r in shortest_paths(edges, 0).collect()}
        assert out == {0: 0, 1: 5, 2: 12}  # 10/11 unreachable -> absent
        # a long chain cannot converge in 2 rounds -> loud failure
        chain = spark.createDataFrame(
            [(i, i + 1, 1) for i in range(6)], "src long, dst long, w long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            shortest_paths(chain, 0, max_rounds=2)
