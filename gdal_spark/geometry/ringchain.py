"""Directed-edge-soup ring assembly shared by the contour polygonizer
(operators/contour_poly.py) and the general polygon boolean kernel
(geometry/polybool.py).

Edges are directed with the region interior on the LEFT, endpoints
quantized to a 2^-20 grid so chaining keys are exact; the walker takes
the leftmost turn at branch (pinch) vertices, which keeps shells CCW
and holes CW and splits figure-eight contacts into separate rings.
"""

from __future__ import annotations

import math

QSCALE = 1 << 20


def quantize(v: float) -> int:
    return int(round(v * QSCALE))


def fmt_q(q: int) -> str:
    s = f"{q / QSCALE:.6f}".rstrip("0").rstrip(".")
    return s if s not in ("-0", "") else "0"


def collapse_collinear(
    ring: list[tuple[int, int]], tol: float = 2.0
) -> list[tuple[int, int]]:
    """Drop vertices whose deviation from the neighbor chord is within
    ``tol`` q-units — exact collinearity plus the sub-quantization noise
    a rotated/split boundary accumulates (|cross| = chord * deviation)."""
    out = []
    n = len(ring)
    for i in range(n):
        p0, p1, p2 = ring[i - 1], ring[i], ring[(i + 1) % n]
        cross = (p1[0] - p0[0]) * (p2[1] - p1[1]) - (p1[1] - p0[1]) * (
            p2[0] - p1[0]
        )
        chord = math.hypot(p2[0] - p0[0], p2[1] - p0[1])
        if abs(cross) > tol * chord:
            out.append(p1)
    return out if len(out) >= 3 else ring


def signed_area2(ring) -> int:
    s = 0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def point_in_ring(pt, ring) -> bool:
    x, y = pt
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xc = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
            if x < xc:
                inside = not inside
    return inside


def chain_rings(edges: list[tuple[tuple[int, int], tuple[int, int]]]):
    """Directed edge soup -> closed rings (leftmost-turn walk at branch
    vertices; loud error on dangling ends)."""
    out_map: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for a, b in edges:
        out_map.setdefault(a, []).append(b)
    for v in out_map.values():
        v.sort()
    used = set()
    rings = []
    for a0, b0 in sorted(edges):
        if (a0, b0) in used:
            continue
        ring = [a0]
        prev, cur = a0, b0
        used.add((a0, b0))
        while cur != a0:
            ring.append(cur)
            outs = [b for b in out_map.get(cur, []) if (cur, b) not in used]
            if not outs:
                raise ValueError(
                    f"ring chaining: dangling boundary at {cur} "
                    "(degenerate tangency — not supported)"
                )
            if len(outs) == 1:
                nxt = outs[0]
            else:
                # leftmost turn relative to the incoming direction
                din = math.atan2(cur[1] - prev[1], cur[0] - prev[0])

                def turn(b):
                    ang = math.atan2(b[1] - cur[1], b[0] - cur[0])
                    return (ang - din + math.pi) % (2 * math.pi)

                nxt = max(outs, key=turn)
            used.add((cur, nxt))
            prev, cur = cur, nxt
        rings.append(ring)
    return rings


def group_shells_holes(rings):
    """Quantized rings -> list of [shell, holes...] groups (collinear
    collapsed; holes assigned to their innermost containing shell)."""
    shells, holes = [], []
    for ring in rings:
        ring = collapse_collinear(ring)
        if signed_area2(ring) > 0:
            shells.append(ring)
        else:
            holes.append(ring)
    groups = {i: [s] for i, s in enumerate(shells)}
    for h in holes:
        owner = [i for i, s in enumerate(shells) if point_in_ring(h[0], s)]
        if not owner:
            raise ValueError("ring chaining: hole without a shell")
        best = min(owner, key=lambda i: signed_area2(shells[i]))
        groups[best].append(h)
    return [groups[i] for i in sorted(groups)]
