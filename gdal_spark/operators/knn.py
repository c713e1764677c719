"""kNN feature lookup — cell-ring expansion + vectorized top-k.

Re-answers the reference's quadtree radius search used by the gridding
operators (alg/gdalgrid.cpp:241-330 GDALGridInverseDistanceToAPower...
search via CPLQuadTreeSearch at :276, nearest-neighbor variant :879):
grow the search region ring-by-ring around the query point until the
k-th nearest candidate is provably closer than anything outside.

Spark-first shape: the target layer (a dim table, like the reference's
in-memory quadtree) is bucketed into a uniform degree grid and shipped
once per executor inside a mapInPandas closure; the doc corpus streams
through in Arrow batches with ZERO shuffle — the output is produced
map-side, partition-parallel.  Distance metric: squared euclidean in
degrees (IEEE-exact, so the DuckDB brute-force oracle agrees bit-for-bit
on ordering); ties break by min target_id (deterministic analog of the
reference's iteration order, SURVEY §7 watch-list).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ------------------------------------------------------------------ targets
N_TARGETS = 2000
TLON_SQL = "(((i * 48271 + 19) % 360000) / 1.0e3 - 1.8e2)"
TLAT_SQL = "(((i * 16807 + 23) % 120000) / 1.0e3 - 6.0e1)"


def duckdb_targets_cte(n: int = N_TARGETS) -> str:
    return (
        f"SELECT i AS target_id, {TLON_SQL} AS tlon, {TLAT_SQL} AS tlat "
        f"FROM range(0, {n}) t(i)"
    )


def knn_targets(spark: SparkSession, n: int = N_TARGETS) -> DataFrame:
    df = spark.range(n).select(F.col("id").alias("i"))
    return df.select(
        F.col("i").alias("target_id"),
        F.expr(TLON_SQL).alias("tlon"),
        F.expr(TLAT_SQL).alias("tlat"),
    )


# ----------------------------------------------------------------- operator
CELL_DEG = 4.0  # degree-grid cell size for the ring index


def _build_buckets(tlon: np.ndarray, tlat: np.ndarray, cell: float):
    cx = np.floor(tlon / cell).astype(np.int64)
    cy = np.floor(tlat / cell).astype(np.int64)
    buckets: dict[tuple[int, int], np.ndarray] = {}
    order = np.lexsort((cy, cx))
    cx_s, cy_s = cx[order], cy[order]
    starts = np.flatnonzero(
        np.r_[True, (cx_s[1:] != cx_s[:-1]) | (cy_s[1:] != cy_s[:-1])]
    )
    ends = np.r_[starts[1:], len(order)]
    for s, e in zip(starts, ends):
        buckets[(int(cx_s[s]), int(cy_s[s]))] = order[s:e]
    return buckets


def _ring_cells(cx: int, cy: int, r: int):
    if r == 0:
        return [(cx, cy)]
    cells = []
    for dx in range(-r, r + 1):
        cells.append((cx + dx, cy - r))
        cells.append((cx + dx, cy + r))
    for dy in range(-r + 1, r):
        cells.append((cx - r, cy + dy))
        cells.append((cx + r, cy + dy))
    return cells


def _knn_group(qx, qy, qidx, cx, cy, buckets, tlon, tlat, tid, k, max_ring):
    """kNN for a group of query points sharing grid cell (cx, cy).
    Returns (query_row_indices, target_ids, ranks) arrays."""
    m = len(qx)
    cand: list[np.ndarray] = []
    best_d2 = np.full((m, k), np.inf)
    best_id = np.full((m, k), -1, dtype=np.int64)

    def refresh(cand_idx):
        nonlocal best_d2, best_id
        if cand_idx.size == 0:
            return
        dx = qx[:, None] - tlon[cand_idx][None, :]
        dy = qy[:, None] - tlat[cand_idx][None, :]
        d2 = dx * dx + dy * dy
        # merge with current best: concat then select k smallest by (d2, id)
        all_d2 = np.concatenate([best_d2, d2], axis=1)
        all_id = np.concatenate(
            [best_id, np.broadcast_to(tid[cand_idx], (m, cand_idx.size))], axis=1
        )
        # lexsort per row: primary d2, secondary id
        ordr = np.lexsort((all_id, all_d2), axis=1)[:, :k]
        best_d2 = np.take_along_axis(all_d2, ordr, axis=1)
        best_id = np.take_along_axis(all_id, ordr, axis=1)

    for r in range(max_ring + 1):
        new = [buckets[c] for c in _ring_cells(cx, cy, r) if c in buckets]
        if new:
            refresh(np.concatenate(new))
        # stop when the kth best (worst row) beats the closest possible
        # point in the NEXT unexplored ring: ring r+1 is at least
        # r*CELL_DEG away from any point in the center cell
        if r >= 1:
            worst_kth = best_d2[:, k - 1].max()
            ring_min = (r * CELL_DEG) ** 2
            if worst_kth < ring_min:
                break

    valid = best_id >= 0
    ranks = np.broadcast_to(np.arange(1, k + 1), (m, k))
    rows = np.broadcast_to(qidx[:, None], (m, k))
    return rows[valid], best_id[valid], ranks[valid], best_d2[valid]


def knn_join(
    docs: DataFrame,
    targets: DataFrame,
    k: int = 5,
    cell_deg: float = CELL_DEG,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """For each doc, its k nearest targets: (doc columns..., target_id, rnk).

    Map-side only: targets are collected (dim-table contract, like the
    reference's in-memory quadtree) and bucketed per executor; docs never
    shuffle.
    """
    tpd = targets.select("target_id", "tlon", "tlat").toPandas()
    tlon = tpd["tlon"].to_numpy(np.float64)
    tlat = tpd["tlat"].to_numpy(np.float64)
    tid = tpd["target_id"].to_numpy(np.int64)
    max_ring = int(np.ceil(360.0 / cell_deg))  # full-world fallback bound

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        list(docs.schema.fields)
        + [
            StructField("target_id", LongType()),
            StructField("rnk", IntegerType()),
            StructField("d2", DoubleType()),
        ]
    )
    doc_cols = [f.name for f in docs.schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buckets = _build_buckets(tlon, tlat, cell_deg)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qx = pdf[lon_col].to_numpy(np.float64)
            qy = pdf[lat_col].to_numpy(np.float64)
            cx = np.floor(qx / cell_deg).astype(np.int64)
            cy = np.floor(qy / cell_deg).astype(np.int64)
            rows_l, ids_l, rnk_l, d2_l = [], [], [], []
            order = np.lexsort((cy, cx))
            cxs, cys = cx[order], cy[order]
            starts = np.flatnonzero(
                np.r_[True, (cxs[1:] != cxs[:-1]) | (cys[1:] != cys[:-1])]
            )
            ends = np.r_[starts[1:], len(order)]
            for s, e in zip(starts, ends):
                gi = order[s:e]
                r_rows, r_ids, r_rnk, r_d2 = _knn_group(
                    qx[gi], qy[gi], gi, int(cxs[s]), int(cys[s]),
                    buckets, tlon, tlat, tid, k, max_ring,
                )
                rows_l.append(r_rows)
                ids_l.append(r_ids)
                rnk_l.append(r_rnk)
                d2_l.append(r_d2)
            rows = np.concatenate(rows_l)
            out = pdf.iloc[rows].reset_index(drop=True)
            out = out[doc_cols].copy()
            out["target_id"] = np.concatenate(ids_l)
            out["rnk"] = np.concatenate(rnk_l).astype(np.int32)
            out["d2"] = np.concatenate(d2_l)
            yield out

    return docs.mapInPandas(kernel, out_schema)


def radius_join(
    docs: DataFrame,
    targets: DataFrame,
    radius2_sql: str | float,
    cell_deg: float = CELL_DEG,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """All (doc, target) pairs with squared distance < radius² — the
    fixed-radius variant of the quadtree search (GDALGridMovingAverage's
    search circle, alg/gdalgrid.cpp:644).  Same map-side shape as
    knn_join: bucketed targets per executor, docs never shuffle; each
    query group only scans buckets within ceil(r/cell)+1 cells."""
    radius2 = float(radius2_sql)
    radius = float(np.sqrt(radius2))
    rmax = int(np.ceil(radius / cell_deg)) + 1
    tpd = targets.select("target_id", "tlon", "tlat").toPandas()
    tlon = tpd["tlon"].to_numpy(np.float64)
    tlat = tpd["tlat"].to_numpy(np.float64)
    tid = tpd["target_id"].to_numpy(np.int64)

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        list(docs.schema.fields)
        + [StructField("target_id", LongType()), StructField("d2", DoubleType())]
    )
    doc_cols = [f.name for f in docs.schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buckets = _build_buckets(tlon, tlat, cell_deg)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qx = pdf[lon_col].to_numpy(np.float64)
            qy = pdf[lat_col].to_numpy(np.float64)
            cx = np.floor(qx / cell_deg).astype(np.int64)
            cy = np.floor(qy / cell_deg).astype(np.int64)
            order = np.lexsort((cy, cx))
            cxs, cys = cx[order], cy[order]
            starts = np.flatnonzero(
                np.r_[True, (cxs[1:] != cxs[:-1]) | (cys[1:] != cys[:-1])]
            )
            ends = np.r_[starts[1:], len(order)]
            rows_l, ids_l, d2_l = [], [], []
            for s, e in zip(starts, ends):
                gi = order[s:e]
                cand = [
                    buckets[c]
                    for dx in range(-rmax, rmax + 1)
                    for dy in range(-rmax, rmax + 1)
                    if (c := (int(cxs[s]) + dx, int(cys[s]) + dy)) in buckets
                ]
                if not cand:
                    continue
                ci = np.concatenate(cand)
                ddx = qx[gi][:, None] - tlon[ci][None, :]
                ddy = qy[gi][:, None] - tlat[ci][None, :]
                d2 = ddx * ddx + ddy * ddy
                hit_r, hit_c = np.nonzero(d2 < radius2)
                rows_l.append(gi[hit_r])
                ids_l.append(tid[ci][hit_c])
                d2_l.append(d2[hit_r, hit_c])
            if not rows_l:
                continue
            rows = np.concatenate(rows_l)
            out = pdf.iloc[rows].reset_index(drop=True)[doc_cols].copy()
            out["target_id"] = np.concatenate(ids_l)
            out["d2"] = np.concatenate(d2_l)
            yield out

    return docs.mapInPandas(kernel, out_schema)
