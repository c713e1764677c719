"""Hex pluggable cell encoder (operators/pip_join.py HEX_DEG block) —
kernel properties + end-to-end parity with the mercator index.

The grid is an axial pointy-top hex lattice on the lon/lat plane; the
point side is pure JVM SQL (cube rounding), the zone side a superset
hex-center cover.  The load-bearing property is CONSISTENCY: every
point inside a zone must land in a hex that the zone's cover contains.
"""

import numpy as np
import pytest

from gdal_spark.operators.pip_join import (
    HEX_DEG,
    _SQRT3,
    hex_cover_rect,
    pip_join,
    with_point_cell_hex,
)

S = HEX_DEG


def _cube_round(qf, rf):
    """Reference numpy cube rounding (same algorithm as the SQL)."""
    x, z = qf, rf
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    c1 = (dx > dy) & (dx > dz)
    c2 = ~c1 & (dy > dz)
    q = np.where(c1, -ry - rz, rx)
    r = np.where(c1 | c2, rz, -rx - ry)
    return q.astype(np.int64), r.astype(np.int64)


def _hex_center(q, r):
    return S * _SQRT3 * (q + r / 2.0), S * 1.5 * r


class TestKernel:
    def test_assigned_center_within_circumradius(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 20000)
        lat = rng.uniform(-90, 90, 20000)
        qf = (_SQRT3 / 3.0 * lon - lat / 3.0) / S
        rf = (2.0 / 3.0 * lat) / S
        q, r = _cube_round(qf, rf)
        cx, cy = _hex_center(q, r)
        d = np.hypot(lon - cx, lat - cy)
        # cube rounding assigns the CONTAINING hexagon: center distance
        # is at most one circumradius (up to fp slack)
        assert d.max() <= S * (1.0 + 1e-9), d.max()

    def test_cover_contains_every_interior_point_hex(self):
        rng = np.random.default_rng(11)
        for _ in range(50):
            x0, y0 = rng.uniform(-170, 160), rng.uniform(-80, 70)
            w, h = rng.uniform(0.1, 30), rng.uniform(0.1, 20)
            cover = set(hex_cover_rect(x0, y0, x0 + w, y0 + h))
            lon = rng.uniform(x0, x0 + w, 500)
            lat = rng.uniform(y0, y0 + h, 500)
            qf = (_SQRT3 / 3.0 * lon - lat / 3.0) / S
            rf = (2.0 / 3.0 * lat) / S
            q, r = _cube_round(qf, rf)
            assert all((int(a), int(b)) in cover for a, b in zip(q, r))

    def test_poles_covered(self):
        # unlike mercator tiles the hex grid has no +-85 deg blind spot
        lon = np.array([0.0, 120.0])
        lat = np.array([89.9, -89.9])
        qf = (_SQRT3 / 3.0 * lon - lat / 3.0) / S
        rf = (2.0 / 3.0 * lat) / S
        q, r = _cube_round(qf, rf)
        cover = set(hex_cover_rect(-180, 85, 180, 90))
        assert (int(q[0]), int(r[0])) in cover


class TestSparkKernel:
    def test_sql_matches_numpy_cube_round(self, spark):
        rng = np.random.default_rng(3)
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "lon": rng.uniform(-180, 180, 4000),
                "lat": rng.uniform(-90, 90, 4000),
            }
        )
        got = (
            with_point_cell_hex(spark.createDataFrame(pdf))
            .select("lon", "lat", "hex_q", "hex_r")
            .toPandas()
        )
        qf = (_SQRT3 / 3.0 * got.lon.to_numpy() - got.lat.to_numpy() / 3.0) / S
        rf = (2.0 / 3.0 * got.lat.to_numpy()) / S
        q, r = _cube_round(qf, rf)
        # Spark round() is HALF_UP, numpy HALF_EVEN: ties are measure-
        # zero on random doubles, so the assignments agree exactly here;
        # consistency with the cover holds for EITHER tie rule (the
        # cover has a full extra circumradius of slack)
        assert np.array_equal(got.hex_q.to_numpy(), q)
        assert np.array_equal(got.hex_r.to_numpy(), r)


class TestPipJoinHexParity:
    def test_same_rows_as_mercator_index(self, spark, sf_dir):
        from gdal_spark import corpus, zones

        docs = corpus.load_docs(spark, sf_dir)
        z = zones.rich_zones(spark)
        a = {
            (r.doc_id, r.zone_id)
            for r in pip_join(docs, z, index="hex", rect_fast=False)
            .select("doc_id", "zone_id")
            .collect()
        }
        b = {
            (r.doc_id, r.zone_id)
            for r in pip_join(docs, z, index="mercator", rect_fast=False)
            .select("doc_id", "zone_id")
            .collect()
        }
        assert a == b and len(a) > 0
