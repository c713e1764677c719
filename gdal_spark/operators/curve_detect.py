"""Arc re-detection — curveFromLineString (the stroker's inverse).

Port of ``OGRGeometryFactory::curveFromLineString``
(ogr/ogrgeometryfactory.cpp:6214) + ``OGRGF_DetectArc`` (:5650) +
``GetCurveParameters`` (:5176): scan a stroked vertex stream, greedily
grow maximal runs of consecutive point triples that lie on one circle
(same R/cx/cy within 1e-7 of the anchor's decimal scale, same winding,
angle steps < 2x the anchor's), and re-emit each run as a 3-point
CIRCULARSTRING piece (5-point for a full circle, :6127-6150), with the
unconsumed vertices in between as LINESTRING pieces.  Consecutive arcs
accumulate into ONE arc piece (the reference appends to the live
OGRCircularString, :5957-5962), so pieces alternate LINE/ARC.

Midpoint selection (the hidden-bit channel is OFF, see below):

* irregular-step detection (:5896-5903): the first examined triple
  ``j > i+1`` whose step10/step21 deviates from the anchor's max step
  by more than ``dfDeltaEpsilon`` pins the stroker's explicitly-emitted
  intermediate point — ``j + (constantStep ? 0 : 1)`` for step10,
  ``j + (constantStep ? 1 : 2)`` for step21, frozen at first fire,
  accepted iff ``1 <= iMidPoint < j``;
* otherwise the index midpoint ``(i + j + 1) // 2`` (:6174);
* full circle (start == final exactly, :6129): quarter points
  ``(i+j+2)//4``, ``(i+j+1)//2``, ``3*(i+j+2)//4``.

DOCUMENTED DIVERGENCE — the stealth hidden-bit channel
(OGRGF_GetHiddenValue, :5683-5686,5800-5856) is not reproduced: our
stroker runs the reference's ADD_INTERMEDIATE_POINT=YES mode, which
does NOT stealth-encode the arc ratio into coordinate low bits, so on
such input the reference's own ``bValidAlphaRatio`` collapses to false
(the 0xFFFFFFFF-then-reversed-ref pattern, :5918, cannot appear in
non-encoded mantissa bits) and every branch it gates is dead.  The one
other reachable use — the early-exit j-correction (:5829-5868) —
additionally needs >10 spurious 0xFFFFFFFF patterns
(nCountValidAlphaRatio), which arbitrary doubles cannot accumulate.
The engine therefore omits the channel; everything else is
branch-for-branch, including the log-relative-diff break heuristic
(:5764-5788), which tests pin as never firing on exactly-stroked
input (within-run relative diffs sit at ~1e-13, outside its
(1e-8, 1e-7] trigger band).

Distribution contract: detection is a serial scan per CURVE (the
reference's own loop is), so the unit of parallelism is the curve —
one applyInPandas group per curve_id, curves fanned across executors;
at scale the corpus is millions of bounded-size strokes (same shape as
operators/dither.py).  The per-triple circle parameters are
numpy-vectorized per curve; only the O(n) greedy index scan is Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_PIECE_SCHEMA = (
    "curve_id int, piece_idx int, piece_type string, pt_idx int, "
    "x double, y double"
)

# 2 * 20 degrees — max angular span of the anchor triple (:5672)
_MAX_ANCHOR_SPAN = 2.0 * 20.0 / 180.0 * math.pi


def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """Scalar GetCurveParameters (ogrgeometryfactory.cpp:5176).

    Returns (ok, R, cx, cy, alpha0, alpha1, alpha2); angles unwrapped
    monotonically in the winding direction exactly as the reference.
    """
    if any(math.isnan(v) for v in (x0, y0, x1, y1, x2, y2)):
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    if x0 == x2 and y0 == y2:
        # Full circle through two distinct points (:5188-5205).
        if x0 != x1 or y0 != y1:
            cx = (x0 + x1) / 2
            cy = (y0 + y1) / 2
            r = math.sqrt((cx - x0) ** 2 + (cy - y0) ** 2)
            a0 = math.atan2(y0 - cy, x0 - cx)
            return True, r, cx, cy, a0, a0 + math.pi, a0 + 2 * math.pi
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    dx01 = x1 - x0
    dy01 = y1 - y0
    dx12 = x2 - x1
    dy12 = y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1.0e-8 or math.isnan(det):
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    c01 = dx01 * ((x0 + x1) * inv) + dy01 * ((y0 + y1) * inv)
    c12 = dx12 * ((x1 + x2) * inv) + dy12 * ((y1 + y2) * inv)
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    a0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    a1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    a2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    r = math.sqrt((cx - x0) ** 2 + (cy - y0) ** 2)
    if det < 0:  # clockwise (:5248-5261)
        if a1 > a0:
            a1 -= 2 * math.pi
        if a2 > a1:
            a2 -= 2 * math.pi
    else:
        if a1 < a0:
            a1 += 2 * math.pi
        if a2 < a1:
            a2 += 2 * math.pi
    return True, r, cx, cy, a0, a1, a2


def _detect_arc(xs, ys, i, par):
    """OGRGF_DetectArc (:5650) for anchor index ``i``.

    ``par`` is the per-triple parameter list (from :func:`_triples`).
    Returns (consumed_final_index, arc_indices, log_breaks) — final
    index of the detected arc's last vertex and the emitted vertex
    indices — or (None, None, 0) when no arc starts at ``i``.
    """
    n = len(xs)
    if i + 3 >= n:
        return None, None, 0
    ok1, r1, cx1, cy1, a0_1, a1_1, a2_1 = par[i]
    if not (ok1 and abs(a2_1 - a0_1) < _MAX_ANCHOR_SPAN):
        return None, None, 0
    d10 = a1_1 - a0_1
    d21 = a2_1 - a1_1
    maxd = max(abs(d10), abs(d21))
    scale = max(1.0, r1, abs(cx1), abs(cy1))
    inv_scale = 1.0 / (10.0 ** math.ceil(math.log10(scale)))
    const_step = (abs(d10 - d21) / maxd) < 1.0e-4
    delta_eps = maxd * 1e-4 if const_step else maxd / 10
    i_mid = -1
    last_log = 0.0
    log_breaks = 0

    j = i + 1
    while j + 2 < n:
        ok2, r2, cx2, cy2, a0_2, a1_2, a2_2 = par[j]
        if not ok2:
            break
        rel_r = abs(r1 - r2) * inv_scale
        rel_cx = abs(cx1 - cx2) * inv_scale
        rel_cy = abs(cy1 - cy2) * inv_scale
        if (
            rel_r > 1.0e-7
            or rel_cx > 1.0e-7
            or rel_cy > 1.0e-7
            or d10 * (a1_2 - a0_2) < 0.0
        ):
            break
        if rel_r > 0.0 and rel_cx > 0.0 and rel_cy > 0.0:
            # Significant-change-in-relative-error break (:5764-5788);
            # pinned by tests as unreachable on exactly-stroked arcs.
            log_rel = min(
                abs(math.log10(rel_r)),
                abs(math.log10(rel_cx)),
                abs(math.log10(rel_cy)),
            )
            if (
                log_rel > 0.0
                and last_log >= 8.0
                and log_rel <= 8.0
                and log_rel < last_log - 2.0
            ):
                log_breaks += 1
                break
            last_log = log_rel
        step10 = abs(a1_2 - a0_2)
        step21 = abs(a2_2 - a1_2)
        if not (step10 < 2.0 * maxd and step21 < 2.0 * maxd):
            break
        # (hidden-bit alpha-ratio block elided — see module docstring)
        if j > i + 1 and i_mid < 0 and delta_eps < 1.0 / 180.0 * math.pi:
            if abs(step10 - maxd) > delta_eps:
                i_mid = j + (0 if const_step else 1)
            elif abs(step21 - maxd) > delta_eps:
                i_mid = j + (1 if const_step else 2)
        j += 1

    if j < i + 3:  # minimum consecutive-triple threshold (:5919)
        return None, None, log_breaks
    final = j + 1  # poFinalPoint: p2 on break, p3 == point j+1 on exit
    if xs[i] == xs[final] and ys[i] == ys[final]:
        # Full circle of a non-polygonal zone -> 5-point form (:6129).
        idxs = [
            i,
            (i + j + 2) // 4,
            (i + j + 1) // 2,
            3 * (i + j + 2) // 4,
            final,
        ]
    elif 1 <= i_mid < j:
        idxs = [i, i_mid, final]
    else:
        idxs = [i, (i + j + 1) // 2, final]
    return final, idxs, log_breaks


def _triples(xs, ys):
    """Per-triple GetCurveParameters over one curve's vertex arrays."""
    n = len(xs)
    return [
        get_curve_parameters(
            xs[k], ys[k], xs[k + 1], ys[k + 1], xs[k + 2], ys[k + 2]
        )
        for k in range(max(0, n - 2))
    ]


def detect_pieces(xs, ys):
    """curveFromLineString's scan loop (:6214-6263) over one curve.

    Returns (pieces, log_breaks): pieces is a list of
    (piece_type, [vertex indices]) alternating 'LINE'/'ARC'.
    Consecutive arcs merge into one ARC piece; a line piece between
    arcs starts AT the previous arc's final vertex and ends AT the
    next arc's first vertex (both shared, the reference's poLSNew
    joint handling :5934-5947,6245-6258 — fixture vertices are never
    duplicated, so the 1e-14-scaled dedup never drops a point).
    """
    n = len(xs)
    par = _triples(xs, ys)
    pieces = []
    cur_line = []
    cur_arc = None
    total_log_breaks = 0
    i = 0
    while i < n:
        final, idxs, lb = _detect_arc(xs, ys, i, par)
        total_log_breaks += lb
        if final is not None:
            if cur_line:
                if cur_line[-1] != i:
                    cur_line.append(i)
                if len(cur_line) >= 2:
                    pieces.append(("LINE", cur_line))
                cur_line = []
            if cur_arc is None:
                cur_arc = [idxs[0]]
            cur_arc.extend(idxs[1:])
            if final + 1 >= n:  # j + 2 >= n: consumed through the end (-2)
                break
            i = final
            continue
        if cur_arc is not None:
            pieces.append(("ARC", cur_arc))
            cur_arc = None
        if not cur_line or cur_line[-1] != i:
            cur_line.append(i)
        i += 1
    if cur_line and len(cur_line) >= 2:
        pieces.append(("LINE", cur_line))
    if cur_arc is not None:
        pieces.append(("ARC", cur_arc))
    return pieces, total_log_breaks


def curve_from_line(stroked: DataFrame) -> DataFrame:
    """Detect arcs in a stroked vertex table (curve_id, seq, x, y).

    One shuffle on curve_id; each curve's serial greedy scan runs
    inside its own Arrow task (see module docstring for the scale
    contract).  Output: (curve_id, piece_idx, piece_type, pt_idx,
    x, y) — coordinates are SELECTED input vertices (the reference
    emits computed midpoints only on stealth-encoded input), so the
    values are bit-exact copies of the stroke.
    """

    def _detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        xs = pdf["x"].to_numpy()
        ys = pdf["y"].to_numpy()
        cid = int(pdf["curve_id"].iloc[0])
        pieces, _ = detect_pieces(xs, ys)
        rows = []
        for piece_idx, (ptype, idxs) in enumerate(pieces):
            for pt_idx, v in enumerate(idxs):
                rows.append((cid, piece_idx, ptype, pt_idx, xs[v], ys[v]))
        return pd.DataFrame(
            rows,
            columns=[
                "curve_id",
                "piece_idx",
                "piece_type",
                "pt_idx",
                "x",
                "y",
            ],
        )

    return stroked.groupBy("curve_id").applyInPandas(_detect, _PIECE_SCHEMA)
