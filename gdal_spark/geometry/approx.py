"""Error-bounded approximate coordinate transformer.

Analog of GDALApproxTransform (alg/gdaltransformer.cpp:2592): exact
transforms are evaluated only at scanline endpoints and midpoints; when
the midpoint's linear-interpolation error is within ``max_error`` the
whole span is filled by interpolation, else the span subdivides
recursively.  The reference uses this to amortize expensive PROJ calls
across warp scanlines; here it amortizes the Krüger/conic/polar series
inside tile kernels (the per-tile UDFs transform pixel-center scanlines
with constant y — exactly the shape this optimization wants).
"""

from __future__ import annotations

import numpy as np


def approx_scanline(fn, xs: np.ndarray, max_error: float):
    """Approximate ``fn`` (vectorized: xs -> (outx, outy)) over a sorted
    1-D parameter array.  Returns (outx, outy, n_exact) where n_exact
    counts the exact evaluations actually performed."""
    n = xs.size
    outx = np.empty(n)
    outy = np.empty(n)
    exact_idx: set[int] = set()

    def _eval(idx: np.ndarray):
        ex, ey = fn(xs[idx])
        outx[idx] = ex
        outy[idx] = ey
        exact_idx.update(int(i) for i in idx)

    _eval(np.array([0, n - 1]))
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= 1:
            continue
        mid = (lo + hi) // 2
        _eval(np.array([mid]))
        t = (xs[mid] - xs[lo]) / (xs[hi] - xs[lo])
        ix = outx[lo] + t * (outx[hi] - outx[lo])
        iy = outy[lo] + t * (outy[hi] - outy[lo])
        err = max(abs(ix - outx[mid]), abs(iy - outy[mid]))
        if err <= max_error:
            # fill both halves by interpolation
            for a, b in ((lo, mid), (mid, hi)):
                if b - a > 1:
                    idx = np.arange(a + 1, b)
                    tt = (xs[idx] - xs[a]) / (xs[b] - xs[a])
                    outx[idx] = outx[a] + tt * (outx[b] - outx[a])
                    outy[idx] = outy[a] + tt * (outy[b] - outy[a])
        else:
            stack.append((lo, mid))
            stack.append((mid, hi))
    return outx, outy, len(exact_idx)
