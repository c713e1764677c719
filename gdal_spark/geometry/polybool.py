"""General polygon boolean EMIT — arbitrary-angle concave pairs with
holes/multipart, the class the exact rectilinear kernel
(geometry/rectbool.py) and the convex Sutherland-Hodgman path don't
cover.  Reference: GEOS-backed OGRGeometry::Intersection / Difference /
Union / SymDifference (ogr/ogrgeometry.cpp:4895,4950,5014,5229).

Arrangement approach (the classical overlay):

  1. canonicalize ring orientation (shell CCW, holes CW) so the REGION
     INTERIOR is always on the LEFT of every directed edge;
  2. split every edge of A at its intersections with B's edges (and
     vice versa) — proper crossings, endpoint touches, and collinear
     overlap spans all come from geometry/boolean.py's
     ``segment_intersections``;
  3. classify each sub-edge by its midpoint against the OTHER polygon
     (even-odd, holes respected) and keep / reverse / drop it per the
     op's rule table (collinear shared boundary resolved from the A
     side only, by direction agreement);
  4. chain the kept directed edges into rings (geometry/ringchain.py:
     leftmost-turn walk, shells CCW / holes CW, hole containment) and
     serialize canonical WKT.

Keep-rule table (interior-left convention; "same/opp" = direction
agreement of a collinear shared-boundary sub-edge):

  op            A-edge inside B   A-edge outside B   shared same   shared opp
  intersection  keep              drop               keep (A)      drop
  union         drop              keep               keep (A)      drop
  difference    drop              keep               drop          keep (A)
  symdifference keep REVERSED     keep               drop          drop
  (B-edges mirror the rule with A<->B; difference keeps inside-A
  B-edges REVERSED; B-edges on A's boundary always drop.)

Output contract: AREAL parts only (a touching pair yields POLYGON
EMPTY, where GEOS would emit the shared LINESTRING) and vertices
quantized to the 2^-20 grid — both documented divergences.

Precondition (same as GEOS): inputs must be VALID simple polygons —
self-intersecting rings are undefined behavior (the chaining walker
raises loudly on the inconsistent boundaries they produce, it does not
silently mend them the way ST_MakeValid would).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry.boolean import ring_edges, segment_intersections
from gdal_spark.geometry.ringchain import (
    QSCALE,
    chain_rings,
    fmt_q,
    group_shells_holes,
    quantize,
)

_EPS = 1e-9
_EPS_B = 1e-7  # on-boundary distance threshold (coords are O(1..100))


def _shoelace2(v: np.ndarray) -> float:
    return float(
        np.sum(v[:-1, 0] * v[1:, 1] - v[1:, 0] * v[:-1, 1])
    )


def canon_orient(polys: list) -> list:
    """Closed float rings, shell CCW / holes CW (interior-left)."""
    out = []
    for poly in polys:
        rings = []
        for k, r in enumerate(poly):
            v = np.asarray(r, dtype=np.float64)
            if not np.array_equal(v[0], v[-1]):
                v = np.vstack([v, v[:1]])
            if (_shoelace2(v) > 0) != (k == 0):
                v = v[::-1]
            rings.append(v)
        out.append(rings)
    return out


def _split_subedges(ea: np.ndarray, eb: np.ndarray):
    """Split each directed edge of ``ea`` at every intersection with
    ``eb``; yields (a, b, mid) float sub-edges."""
    pts, ai, t, spans = segment_intersections(ea, eb)
    params: dict[int, list[float]] = {i: [0.0, 1.0] for i in range(len(ea))}
    for i, tt in zip(ai, t):
        params[int(i)].append(float(tt))
    for i, s0, s1 in spans:
        params[int(i)] += [float(s0), float(s1)]
    out = []
    for i, ps in params.items():
        ps = sorted(ps)
        merged = [ps[0]]
        for p in ps[1:]:
            if p - merged[-1] > _EPS:
                merged.append(p)
        p0, p1 = ea[i, 0], ea[i, 1]
        d = p1 - p0
        for s0, s1 in zip(merged, merged[1:]):
            a = p0 + s0 * d
            b = p0 + s1 * d
            out.append((a, b, p0 + ((s0 + s1) / 2.0) * d))
    return out


def _pip_evenodd(pt, polys: list) -> bool:
    x, y = float(pt[0]), float(pt[1])
    inside = False
    for poly in polys:
        for ring in poly:
            v = ring
            y1 = v[:-1, 1]
            y2 = v[1:, 1]
            x1 = v[:-1, 0]
            x2 = v[1:, 0]
            m = (y1 > y) != (y2 > y)
            if m.any():
                xc = x1[m] + (y - y1[m]) / (y2[m] - y1[m]) * (x2[m] - x1[m])
                inside ^= bool(np.count_nonzero(x < xc) % 2)
    return inside


def _nearest_edge(pt, edges: np.ndarray):
    """(min_distance, unit direction of nearest edge)."""
    p = np.asarray(pt, dtype=np.float64)
    a = edges[:, 0]
    d = edges[:, 1] - a
    L2 = (d * d).sum(axis=1)
    L2s = np.where(L2 > 0, L2, 1.0)
    t = np.clip(((p - a) * d).sum(axis=1) / L2s, 0.0, 1.0)
    proj = a + t[:, None] * d
    dist = np.hypot(*(p - proj).T)
    j = int(np.argmin(dist))
    dj = d[j]
    n = np.hypot(dj[0], dj[1])
    return float(dist[j]), (dj / n if n > 0 else dj)


def _keep_edges(subs, other_polys, other_edges, side: str, op: str):
    """Apply the keep-rule table to one side's sub-edges."""
    kept = []
    for a, b, m in subs:
        dist, odir = _nearest_edge(m, other_edges)
        if dist < _EPS_B:
            if side == "b":
                continue  # shared boundary resolved from the A side
            d = b - a
            same = float(d[0] * odir[0] + d[1] * odir[1]) > 0
            if op in ("intersection", "union"):
                if same:
                    kept.append((a, b))
            elif op == "difference":
                if not same:
                    kept.append((a, b))
            # symdifference: always drop shared boundary
            continue
        inside = _pip_evenodd(m, other_polys)
        if op == "intersection":
            if inside:
                kept.append((a, b))
        elif op == "union":
            if not inside:
                kept.append((a, b))
        elif op == "difference":
            if side == "a" and not inside:
                kept.append((a, b))
            elif side == "b" and inside:
                kept.append((b, a))
        elif op == "symdifference":
            kept.append((b, a) if inside else (a, b))
    return kept


def general_bool_op(polys_a: list, polys_b: list, op: str) -> list:
    """Boolean op of two arbitrary multipolygons-with-holes -> list of
    [shell, holes...] CLOSED float ring lists on the 2^-20 grid
    (shell CCW, holes CW, canonical ring starts); [] when empty."""
    A = canon_orient(polys_a)
    B = canon_orient(polys_b)
    ea = ring_edges(A)
    eb = ring_edges(B)
    ea = ea[((ea[:, 1] - ea[:, 0]) ** 2).sum(axis=1) > _EPS * _EPS]
    eb = eb[((eb[:, 1] - eb[:, 0]) ** 2).sum(axis=1) > _EPS * _EPS]
    kept = _keep_edges(_split_subedges(ea, eb), B, eb, "a", op)
    kept += _keep_edges(_split_subedges(eb, ea), A, ea, "b", op)
    qedges = []
    for a, b in kept:
        qa = (quantize(a[0]), quantize(a[1]))
        qb = (quantize(b[0]), quantize(b[1]))
        if qa != qb:
            qedges.append((qa, qb))
    if not qedges:
        return []
    groups = group_shells_holes(chain_rings(qedges))
    out = []
    for rings in groups:
        # drop quantization slivers
        from gdal_spark.geometry.ringchain import signed_area2

        if abs(signed_area2(rings[0])) < 4:  # < ~2 ulp² of the q-grid
            continue
        fr = []
        for ring in rings:
            v = np.array(
                [(x / QSCALE, y / QSCALE) for x, y in ring + [ring[0]]],
                dtype=np.float64,
            )
            fr.append(v)
        out.append(fr)
    return out


def q_ring_wkt(ring: np.ndarray) -> str:
    """Closed float ring on the q-grid -> canonical '(x y, ...)' text
    (start at the lexicographic min vertex, %.6f-trimmed)."""
    v = ring[:-1]
    qs = [(quantize(x), quantize(y)) for x, y in v]
    i0 = min(range(len(qs)), key=lambda i: qs[i])
    qs = qs[i0:] + qs[:i0]
    return "(" + ",".join(f"{fmt_q(x)} {fmt_q(y)}" for x, y in qs + [qs[0]]) + ")"


def polys_wkt_q(groups: list) -> str:
    """Canonical quantized WKT of [shell, holes...] closed-ring groups
    (polygon order by shell start, holes by min vertex)."""
    if not groups:
        return "POLYGON EMPTY"

    def start_key(rings):
        q = [(quantize(x), quantize(y)) for x, y in rings[0][:-1]]
        return min(q)

    groups = sorted(groups, key=start_key)
    polys = []
    for rings in groups:
        shell = rings[0]
        holes = sorted(rings[1:], key=lambda r: min(
            (quantize(x), quantize(y)) for x, y in r[:-1]
        ))
        polys.append(
            "(" + ",".join(q_ring_wkt(r) for r in [shell] + holes) + ")"
        )
    if len(polys) == 1:
        return "POLYGON " + polys[0]
    return "MULTIPOLYGON (" + ",".join(polys) + ")"


def general_setop_wkt(polys_a: list, polys_b: list, op: str) -> str:
    """Canonical WKT of the general boolean (POLYGON EMPTY when the
    areal result is empty)."""
    return polys_wkt_q(general_bool_op(polys_a, polys_b, op))


# --------------------------------------------------------------------------
# Lower-dimension intersection results (the linework GEOS emits when two
# polygons TOUCH without interior overlap — OGRLayer::Intersection keeps
# or drops them per KEEP_LOWER_DIMENSION_GEOMETRIES,
# ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345-3580).  With the
# interior-left canonical orientation, a collinear shared sub-edge whose
# two directed edges run OPPOSITE ways has the interiors on opposite
# sides — an exterior touch, exactly the lower-dimension boundary.
# Same-direction shared sub-edges belong to the AREAL result's boundary
# and are not lower-dimensional.  Documented divergence: corner
# (point) touches are not emitted (GEOS yields POINT there).
# --------------------------------------------------------------------------


def shared_boundary_chains(polys_a: list, polys_b: list) -> list:
    """Maximal polyline chains (quantized vertex lists) of the shared
    boundary where the interiors are on opposite sides."""
    A = canon_orient(polys_a)
    B = canon_orient(polys_b)
    ea = ring_edges(A)
    eb = ring_edges(B)
    ea = ea[((ea[:, 1] - ea[:, 0]) ** 2).sum(axis=1) > _EPS * _EPS]
    eb = eb[((eb[:, 1] - eb[:, 0]) ** 2).sum(axis=1) > _EPS * _EPS]
    segs = set()
    for a, b, m in _split_subedges(ea, eb):
        dist, odir = _nearest_edge(m, eb)
        if dist < _EPS_B:
            d = b - a
            same = float(d[0] * odir[0] + d[1] * odir[1]) > 0
            if not same:
                qa = (quantize(a[0]), quantize(a[1]))
                qb = (quantize(b[0]), quantize(b[1]))
                if qa != qb:
                    segs.add((min(qa, qb), max(qa, qb)))
    if not segs:
        return []
    # chain maximal paths through the undirected segment graph,
    # splitting at branch points (degree != 2)
    from collections import defaultdict

    adj: dict = defaultdict(list)
    for p, q in segs:
        adj[p].append(q)
        adj[q].append(p)
    visited: set = set()

    def walk(start, nxt):
        chain = [start, nxt]
        visited.add((min(start, nxt), max(start, nxt)))
        while True:
            cur, prev = chain[-1], chain[-2]
            if len(adj[cur]) != 2:
                break
            nbrs = [
                x
                for x in adj[cur]
                if (min(cur, x), max(cur, x)) not in visited
            ]
            if not nbrs:
                break
            x = nbrs[0]
            visited.add((min(cur, x), max(cur, x)))
            chain.append(x)
        return chain

    chains = []
    for p in sorted(adj):
        if len(adj[p]) != 2:
            for q in sorted(adj[p]):
                if (min(p, q), max(p, q)) not in visited:
                    chains.append(walk(p, q))
    for p in sorted(adj):  # leftover pure loops
        for q in sorted(adj[p]):
            if (min(p, q), max(p, q)) not in visited:
                chains.append(walk(p, q))
    out = []
    for ch in chains:
        if ch[-1] < ch[0]:
            ch = ch[::-1]
        out.append(ch)
    return sorted(out)


def lines_wkt_q(chains: list) -> str:
    """Canonical quantized WKT of shared-boundary chains
    ('LINESTRING EMPTY' when none)."""
    if not chains:
        return "LINESTRING EMPTY"

    def txt(ch):
        return (
            "(" + ",".join(f"{fmt_q(x)} {fmt_q(y)}" for x, y in ch) + ")"
        )

    if len(chains) == 1:
        return "LINESTRING " + txt(chains[0])
    return "MULTILINESTRING (" + ",".join(txt(c) for c in chains) + ")"


def chains_length(chains: list) -> float:
    """Total euclidean length of the chains on the q-grid."""
    total = 0.0
    for ch in chains:
        for (x0, y0), (x1, y1) in zip(ch, ch[1:]):
            dx = (x1 - x0) / QSCALE
            dy = (y1 - y0) / QSCALE
            total += float(np.hypot(dx, dy))
    return total


def shared_boundary_wkt(polys_a: list, polys_b: list) -> str:
    return lines_wkt_q(shared_boundary_chains(polys_a, polys_b))
