"""Layer-algebra overlays: Intersection / Clip / Erase / Identity.

Reference semantics (ogr/ogrsf_frmts/generic/ogrlayer.cpp):
  * Intersection (:3345) — pairwise A x B intersection pieces, result
    schema = A's fields ⊕ B's fields, empty and lower-dimension results
    dropped (KEEP_LOWER_DIMENSION_GEOMETRIES=NO default, :3369-3406);
  * Clip (:5497)  — A ∩ union(B), A's fields only;
  * Erase (:5806) — A − union(B);
  * Identity (:4730) — Intersection pieces ⊕ the Erase remainder with
    null-padded B fields.

Spark-first plan (replacing the reference's index nested loop):
  1. both sides get mercator cell covers of their envelopes — the doc
     (big) side via pure Spark SQL ``sequence()`` explode, the zone (dim)
     side via the same mapInPandas index the PIP join uses;
  2. broadcast hash join on the cell key; duplicate (doc, zone) pairs
     from multi-cell overlap are eliminated WITHOUT a distinct shuffle by
     keeping only the canonical cell = min corner of the envelope
     intersection;
  3. envelope prefilter JVM-side, then the exact clip kernel in an
     Arrow-batched pandas UDF: axis-aligned rectangle pairs take the
     exact min/max fast path (the reference's rect-filter special case,
     ogrlayer.cpp:2276-2303); general convex clip polygons take
     Sutherland–Hodgman.

v1 limitation (documented): exact piece GEOMETRY requires the clip side
convex; union-of-B semantics (Clip/Erase) require B disjoint — both hold
for the engine's clip layer and are asserted, not assumed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from gdal_spark.geometry import mercator
from gdal_spark.geometry.clip import clip_polygon_convex, shoelace_area
from gdal_spark.geometry.wkt import _fmt, parse_wkt, polygon_wkt
from gdal_spark.operators.pip_join import zone_cell_index

DEFAULT_ZOOM = 5


def _env_cells(df: DataFrame, zoom: int, xmin, ymin, xmax, ymax) -> DataFrame:
    """Explode rows by the mercator cells covering their envelope —
    pure JVM (sequence + explode), stays in whole-stage codegen."""
    z = str(zoom)
    df = df.withColumn("_tx0", F.expr(mercator.sql_tx(xmin, z))).withColumn(
        "_tx1", F.expr(mercator.sql_tx(xmax, z))
    ).withColumn("_ty0", F.expr(mercator.sql_ty(ymin, z))).withColumn(
        "_ty1", F.expr(mercator.sql_ty(ymax, z))
    )
    df = df.withColumn("cell_tx", F.explode(F.sequence("_tx0", "_tx1")))
    df = df.withColumn("cell_ty", F.explode(F.sequence("_ty0", "_ty1")))
    return df


def _intersection_candidates(
    polydocs: DataFrame, zones: DataFrame, zoom: int
) -> DataFrame:
    """Cell join + canonical-cell dedup + envelope prefilter.
    polydocs must carry envelope columns xmin/ymin/xmax/ymax."""
    z = str(zoom)
    docs = _env_cells(polydocs, zoom, "xmin", "ymin", "xmax", "ymax")
    zcells = zone_cell_index(zones, zoom)  # adds cell_tx/ty + env_*
    cand = docs.join(F.broadcast(zcells), ["cell_tx", "cell_ty"], "inner")
    # envelope overlap (inclusive bbox test, ogrgeometry.cpp:586-593)
    cand = cand.filter(
        (F.col("xmin") <= F.col("env_xmax"))
        & (F.col("env_xmin") <= F.col("xmax"))
        & (F.col("ymin") <= F.col("env_ymax"))
        & (F.col("env_ymin") <= F.col("ymax"))
    )
    # canonical cell of the envelope intersection = its min corner's cell
    cand = cand.filter(
        (
            F.col("cell_tx")
            == F.greatest(F.col("_tx0"), F.expr(mercator.sql_tx("env_xmin", z)))
        )
        & (
            F.col("cell_ty")
            == F.greatest(F.col("_ty0"), F.expr(mercator.sql_ty("env_ymin", z)))
        )
    )
    return cand.drop("_tx0", "_tx1", "_ty0", "_ty1", "cell_tx", "cell_ty")


def _clip_kernel(zone_geoms: dict, doc_wkt_col: str | None, emit_wkt: bool = True):
    """mapInPandas kernel computing exact intersection pieces.

    Emits (piece_wkt, piece_area) per candidate row; area 0 rows =
    empty/lower-dimension intersections (dropped by the caller, matching
    KEEP_LOWER_DIMENSION_GEOMETRIES=NO).
    """

    # pre-classify zones once per executor: rect zones get a vectorized
    # min/max path (same least/greatest ops as the oracle); general
    # convex zones take Sutherland–Hodgman per row
    rect_env: dict = {}
    general: dict = {}
    for zid, polys in zone_geoms.items():
        if len(polys) != 1 or len(polys[0]) != 1:
            raise ValueError("overlay v1 supports single-ring clip polygons")
        ring0 = polys[0][0]
        if (
            ring0.shape[0] == 5
            and len(np.unique(ring0[:, 0])) == 2
            and len(np.unique(ring0[:, 1])) == 2
        ):
            rect_env[zid] = (
                ring0[:, 0].min(),
                ring0[:, 1].min(),
                ring0[:, 0].max(),
                ring0[:, 1].max(),
            )
        else:
            general[zid] = ring0

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            areas = np.zeros(n, dtype=np.float64)
            wkts = np.full(n, None, dtype=object)
            xmin = pdf["xmin"].to_numpy(np.float64)
            ymin = pdf["ymin"].to_numpy(np.float64)
            xmax = pdf["xmax"].to_numpy(np.float64)
            ymax = pdf["ymax"].to_numpy(np.float64)
            zids = pdf["zone_id"].to_numpy()
            rect_rows = (
                np.array([z in rect_env for z in zids])
                if general or doc_wkt_col is not None
                else np.ones(n, dtype=bool)
            )
            if doc_wkt_col is not None:
                rect_rows &= False  # WKT docs always take the exact path
            if rect_rows.any():
                zx0 = np.array([rect_env[z][0] for z in zids[rect_rows]])
                zy0 = np.array([rect_env[z][1] for z in zids[rect_rows]])
                zx1 = np.array([rect_env[z][2] for z in zids[rect_rows]])
                zy1 = np.array([rect_env[z][3] for z in zids[rect_rows]])
                ix0 = np.maximum(xmin[rect_rows], zx0)
                iy0 = np.maximum(ymin[rect_rows], zy0)
                ix1 = np.minimum(xmax[rect_rows], zx1)
                iy1 = np.minimum(ymax[rect_rows], zy1)
                nonempty = (ix0 < ix1) & (iy0 < iy1)
                a = np.where(nonempty, (ix1 - ix0) * (iy1 - iy0), 0.0)
                areas[rect_rows] = a
                idx = np.flatnonzero(rect_rows)[nonempty]
                for j, k in enumerate(np.flatnonzero(nonempty)) if emit_wkt else ():
                    x0s, y0s = _fmt(ix0[k]), _fmt(iy0[k])
                    x1s, y1s = _fmt(ix1[k]), _fmt(iy1[k])
                    wkts[idx[j]] = (
                        f"POLYGON (({x0s} {y0s},{x1s} {y0s},"
                        f"{x1s} {y1s},{x0s} {y1s},{x0s} {y0s}))"
                    )
            for i in np.flatnonzero(~rect_rows):
                ring0 = general.get(zids[i])
                if ring0 is None:
                    e = rect_env[zids[i]]
                    ring0 = np.array(
                        [
                            [e[0], e[1]],
                            [e[2], e[1]],
                            [e[2], e[3]],
                            [e[0], e[3]],
                            [e[0], e[1]],
                        ]
                    )
                subj = (
                    parse_wkt(pdf[doc_wkt_col].iat[i])[1][0]
                    if doc_wkt_col is not None
                    else np.array(
                        [
                            [xmin[i], ymin[i]],
                            [xmax[i], ymin[i]],
                            [xmax[i], ymax[i]],
                            [xmin[i], ymax[i]],
                            [xmin[i], ymin[i]],
                        ]
                    )
                )
                piece = clip_polygon_convex(subj, ring0)
                if piece.size:
                    areas[i] = abs(shoelace_area(piece))
                    if emit_wkt:
                        wkts[i] = polygon_wkt([piece])
            out = pdf.copy()
            out["piece_area"] = areas
            out["piece_wkt"] = wkts
            yield out

    return kernel


def intersection_join(
    polydocs: DataFrame,
    zones: DataFrame,
    zoom: int = DEFAULT_ZOOM,
    doc_wkt_col: str | None = None,
    emit_wkt: bool = True,
) -> DataFrame:
    """OGRLayer::Intersection: one row per overlapping (doc, zone) pair
    with the exact intersection piece (piece_wkt, piece_area > 0)."""
    from gdal_spark.operators.pip_join import collect_zone_geoms

    cand = _intersection_candidates(polydocs, zones, zoom)
    schema = StructType(
        [f for f in cand.schema.fields]
        + [StructField("piece_area", DoubleType()), StructField("piece_wkt", StringType())]
    )
    geoms = collect_zone_geoms(zones)
    # flatten multipolygon dim entries: kernel expects ring lists
    pieces = cand.mapInPandas(_clip_kernel(geoms, doc_wkt_col, emit_wkt), schema)
    return pieces.filter(F.col("piece_area") > 0).drop(
        "env_xmin", "env_ymin", "env_xmax", "env_ymax"
    )


def erase_area(polydocs: DataFrame, zones: DataFrame, zoom: int = DEFAULT_ZOOM) -> DataFrame:
    """Erase (A − union B) reported as remaining area per doc; requires a
    disjoint zone layer (union = sum of pairwise pieces)."""
    pieces = intersection_join(polydocs, zones, zoom)
    cut = pieces.groupBy("doc_id").agg(F.sum("piece_area").alias("_cut"))
    docs = polydocs.select(
        "doc_id",
        ((F.col("xmax") - F.col("xmin")) * (F.col("ymax") - F.col("ymin"))).alias(
            "_full"
        ),
    )
    out = docs.join(cut, "doc_id", "left").fillna({"_cut": 0.0})
    return out.select(
        "doc_id", (F.col("_full") - F.col("_cut")).alias("erase_area")
    )


def identity_join(
    polydocs: DataFrame, zones: DataFrame, zoom: int = DEFAULT_ZOOM
) -> DataFrame:
    """Identity (ogrlayer.cpp:4730): intersection pieces with zone fields
    plus the uncovered remainder of each doc with null zone fields."""
    pieces = intersection_join(polydocs, zones, zoom)
    remainder = (
        erase_area(polydocs, zones, zoom)
        .filter(F.col("erase_area") > 0)
        .select(
            "doc_id",
            F.lit(None).cast("long").alias("zone_id"),
            F.col("erase_area").alias("piece_area"),
        )
    )
    return pieces.select("doc_id", "zone_id", "piece_area").unionByName(remainder)
