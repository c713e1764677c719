"""S2 cell-id encoder correctness (geometry/s2.py).

Strategy: the vectorized lookup-table encoder is checked against an
INDEPENDENT scalar reimplementation (per-bit Hilbert walk, no tables —
a structurally different derivation of the same published spec), plus
the layout invariants the join machinery relies on: leaf round-trip,
ancestor containment, Hilbert-curve adjacency, and coverage-superset.
The end-to-end proof is the `pip_join_s2` parity class at the bottom —
the S2 index must be output-invisible vs the mercator index.
"""

import numpy as np
import pytest

from gdal_spark.geometry import s2

# ------------------------------------------------------- scalar reference
# Hilbert order per orientation, same published spec, but applied one
# 2-bit level at a time (the table-free formulation).
_IJ_TO_POS = [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]]
_SWAP, _INVERT = 1, 2
_ORIENT_ADJ = [_SWAP, 0, 0, _SWAP | _INVERT]


def scalar_leaf(lat_deg, lng_deg):
    import math

    lat, lng = math.radians(lat_deg), math.radians(lng_deg)
    x = math.cos(lat) * math.cos(lng)
    y = math.cos(lat) * math.sin(lng)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x >= 0 else 3
    elif ay >= az:
        face = 1 if y >= 0 else 4
    else:
        face = 2 if z >= 0 else 5
    u_of = [
        lambda: (y / x, z / x),
        lambda: (-x / y, z / y),
        lambda: (-x / z, -y / z),
        lambda: (z / x, y / x),
        lambda: (z / y, -x / y),
        lambda: (-y / z, -x / z),
    ]
    u, v = u_of[face]()

    def st(w):
        return 0.5 * math.sqrt(1 + 3 * w) if w >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * w)

    lim = (1 << 30) - 1
    i = min(max(int(math.floor(st(u) * (1 << 30))), 0), lim)
    j = min(max(int(math.floor(st(v) * (1 << 30))), 0), lim)
    # per-bit Hilbert walk, msb to lsb
    pos = 0
    orient = face & _SWAP
    for k in range(29, -1, -1):
        bi = (i >> k) & 1
        bj = (j >> k) & 1
        ij = bi * 2 + bj
        sub = _IJ_TO_POS[orient][ij]
        pos = (pos << 2) | sub
        orient ^= _ORIENT_ADJ[sub]
    return (((face << 60) | pos) << 1) | 1


class TestKernel:
    def test_scalar_parity(self):
        rng = np.random.default_rng(7)
        lat = rng.uniform(-89.9, 89.9, 2000)
        lng = rng.uniform(-180.0, 180.0, 2000)
        vec = s2.leaf_from_lat_lng(lat, lng)
        ref = np.array(
            [scalar_leaf(a, b) for a, b in zip(lat, lng)], dtype=np.uint64
        )
        assert (vec == ref).all()

    def test_roundtrip_and_level(self):
        rng = np.random.default_rng(11)
        lat = rng.uniform(-89.99, 89.99, 30000)
        lng = rng.uniform(-180.0, 180.0, 30000)
        leaf = s2.leaf_from_lat_lng(lat, lng)
        assert (leaf & np.uint64(1)).all()
        assert (s2.level_of(leaf) == 30).all()
        assert ((s2.face_of(leaf) >= 0) & (s2.face_of(leaf) < 6)).all()
        clat, clng = s2.cell_center_lat_lng(leaf)
        assert (s2.leaf_from_lat_lng(clat, clng) == leaf).all()
        # leaf center within one leaf diagonal (~1.3e-7 deg) of the point
        dlat = np.abs(clat - lat)
        dlng = np.abs((clng - lng + 180) % 360 - 180) * np.cos(np.deg2rad(lat))
        assert float(dlat.max()) < 2e-7 and float(dlng.max()) < 2e-7

    def test_parent_containment(self):
        rng = np.random.default_rng(13)
        leaf = s2.leaf_from_lat_lng(
            rng.uniform(-85, 85, 10000), rng.uniform(-180, 180, 10000)
        )
        for level in (2, 6, 12, 29):
            p = s2.parent_at_level(leaf, level)
            assert (s2.level_of(p) == level).all()
            lsb = p & (~p + np.uint64(1))
            assert ((leaf >= p - (lsb - np.uint64(1))) & (leaf <= p + (lsb - np.uint64(1)))).all()
        # ancestor chain commutes
        assert (
            s2.parent_at_level(s2.parent_at_level(leaf, 12), 6)
            == s2.parent_at_level(leaf, 6)
        ).all()

    def test_hilbert_adjacency(self):
        # consecutive level-6 cells along the curve on one face are
        # edge-adjacent in (i, j) — the locality property layout
        # clustering relies on
        for face in range(6):
            ii = np.repeat(np.arange(64), 64).astype(np.int64)
            jj = np.tile(np.arange(64), 64).astype(np.int64)
            ids = s2._id_from_face_ij(
                np.full(ii.shape, face, dtype=np.int64), ii << 24, jj << 24
            )
            order = np.argsort(s2.parent_at_level(ids, 6))
            d = np.abs(np.diff(ii[order])) + np.abs(np.diff(jj[order]))
            assert (d == 1).all()

    def test_cover_rect_superset(self):
        rng = np.random.default_rng(17)
        for _ in range(120):
            x0 = rng.uniform(-179.0, 160.0)
            y0 = rng.uniform(-84.0, 68.0)
            x1 = x0 + rng.uniform(0.05, 18.0)
            y1 = min(y0 + rng.uniform(0.05, 14.0), 85.0)
            cover = set(s2.cover_rect(x0, y0, x1, y1, 6).tolist())
            px = rng.uniform(x0, x1, 400)
            py = rng.uniform(y0, y1, 400)
            cells = s2.parent_at_level(s2.leaf_from_lat_lng(py, px), 6)
            assert set(cells.tolist()) <= cover

    def test_cover_rect_tight(self):
        # a sub-cell rect covers only a handful of cells, not a face:
        # at most a 2x2 straddle padded by one cell each side = 16
        c = s2.cover_rect(10.0, 10.0, 10.5, 10.5, 6)
        assert 1 <= len(c) <= 16


class TestS2Layout:
    def test_s2_clustered_layout_prunes_row_groups(self, spark, sf_dir, tmp_path):
        """S2 leaf ids are Hilbert keys, so range-clustering a table on
        them IS a spatial layout: a bbox query overlaps few row groups'
        lon/lat min/max stats (the test_hilbert.py claim, reusing the
        same writer with the S2 key instead of the FlatGeobuf key)."""
        import glob

        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        from gdal_spark import corpus
        from gdal_spark.geometry import s2
        from gdal_spark.operators.layout import write_hilbert_clustered

        docs = corpus.load_docs(spark, sf_dir, replicate=32).select(
            "doc_id", "lon", "lat"
        )

        @F.pandas_udf(LongType())
        def leaf(lat: pd.Series, lon: pd.Series) -> pd.Series:
            return pd.Series(
                s2.leaf_from_lat_lng(
                    lat.to_numpy(np.float64), lon.to_numpy(np.float64)
                ).view(np.int64)
            )

        keyed = docs.withColumn("s2key", leaf(F.col("lat"), F.col("lon")))
        path = str(tmp_path / "s2_clustered")
        write_hilbert_clustered(
            keyed, path, num_files=4, key="s2key",
            **{"parquet.block.size": str(4 * 1024)},
        )

        xmin, xmax, ymin, ymax = 10.0, 20.0, 10.0, 20.0
        total = hit = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                lo = g.column(sch["lon"]).statistics
                la = g.column(sch["lat"]).statistics
                total += 1
                if lo.min <= xmax and lo.max >= xmin and la.min <= ymax and la.max >= ymin:
                    hit += 1
        assert total >= 8, f"row groups too coarse ({total})"
        assert hit <= 0.5 * total, f"S2 layout not local: {hit}/{total}"

        pred = (
            (F.col("lon") >= xmin)
            & (F.col("lon") <= xmax)
            & (F.col("lat") >= ymin)
            & (F.col("lat") <= ymax)
        )
        a = {r.doc_id for r in docs.filter(pred).collect()}
        b = {
            r.doc_id
            for r in spark.read.parquet(path).filter(pred).collect()
        }
        assert a == b and len(a) > 0


class TestPipJoinS2Parity:
    def test_same_rows_as_mercator_index(self, spark, sf_dir):
        from gdal_spark import corpus, zones
        from gdal_spark.operators.pip_join import pip_join

        docs = corpus.load_docs(spark, sf_dir)
        z = zones.rect_zones(spark).drop("zxmin", "zymin", "zxmax", "zymax")
        a = pip_join(docs, z).select("doc_id", "zone_id")
        b = pip_join(docs, z, index="s2", rect_fast=False).select(
            "doc_id", "zone_id"
        )
        rows_a = sorted((r.doc_id, r.zone_id) for r in a.collect())
        rows_b = sorted((r.doc_id, r.zone_id) for r in b.collect())
        assert rows_a == rows_b and len(rows_a) > 0

    def test_polar_points_join(self, spark):
        # S2 has no mercator ±85° singularity: a polar zone still joins
        from pyspark.sql import Row

        from gdal_spark.operators.pip_join import pip_join

        pts = spark.createDataFrame(
            [
                Row(doc_id="n1", lon=30.0, lat=88.5),
                Row(doc_id="n2", lon=-120.0, lat=89.2),
                Row(doc_id="out", lon=30.0, lat=80.0),
            ]
        )
        zdf = spark.createDataFrame(
            [
                Row(
                    zone_id=1,
                    geom_wkt="POLYGON ((-180 87,180 87,180 90,-180 90,-180 87))",
                )
            ]
        )
        out = pip_join(pts, zdf, index="s2", rect_fast=False).select(
            "doc_id", "zone_id"
        )
        got = sorted(r.doc_id for r in out.collect())
        assert got == ["n1", "n2"]
