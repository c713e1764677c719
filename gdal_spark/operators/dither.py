"""Floyd–Steinberg dithering (rgb2pct's missing half).

Port of ``alg/gdaldither.cpp`` ``GDALDitherRGB2PCTInternal`` in its
PUBLIC configuration (``GDALDitherRGB2PCT``, gdaldither.cpp:139-151:
``nBits=5``, static color cube, ``bDither=TRUE``):

* nearest-color lookup goes through the 32-level color cube — the cube
  cell stores the palette index nearest (L1 distance, strict ``<`` so
  the FIRST palette entry wins ties, gdaldither.cpp:666-683) to the
  CELL CENTER ``(iRed*255/31, iGreen*255/31, iBlue*255/31)`` where
  ``iRed = nRedValue*32/256`` (gdaldither.cpp:480-487,699-714) — all
  truncating integer divisions;
* error diffusion (gdaldither.cpp:379-392,404-553): the previous row's
  error buffer is added to the raw bytes and CLAMPED to [0,255] once
  per row, then the running in-row error (``2*(e/6)`` from the pixel to
  the left) is added and clamped AGAIN; the quantization error
  ``e = value - palette[idx]`` splits as right ``2*(e/6)``, down-left
  ``e/6``, down ``e - 5*(e/6)``, down-right ``e/6`` with C truncating
  division (``e/6`` rounds toward zero for negative errors);
* the down-right write is an ASSIGNMENT (gdaldither.cpp:520) but the
  scanline walks left→right, so pixel ``i`` is always the first writer
  of buffer slot ``i+2`` — assignment ≡ accumulate, which is what makes
  the per-slot error a well-defined 3-term sum.

Distribution contract: error diffusion is a serial recurrence across
the WHOLE image (every pixel depends on the full scanline prefix and
the previous row's diffused errors — the reference's own scanline loop
is just as serial), so the unit of parallelism is the IMAGE: one
applyInPandas group per image_id, images fanned across executors.  At
100 TB the corpus is millions of bounded-size images (the multimodal
`media` shape), which parallelizes perfectly; a single huge image is
fundamentally serial in any faithful implementation.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_DITHER_SCHEMA = "image_id int, px int, py int, idx int"


def _trunc_div6(e: int) -> int:
    """C integer division ``e / 6`` (truncation toward zero)."""
    return -((-e) // 6) if e < 0 else e // 6


def _nearest_cube(pal: np.ndarray, r: int, g: int, b: int) -> int:
    """Palette index for the 5-bit cube cell holding (r, g, b).

    The cell index is ``v*32/256`` and the stored palette entry is the
    L1-nearest color to the cell CENTER ``i*255/31`` (first entry wins
    ties) — exactly what FindNearestColor(nColors, panPCT, pabyColorMap,
    nCLevels=32) precomputes in gdaldither.cpp:692-717.
    """
    cr = ((r >> 3) * 255) // 31
    cg = ((g >> 3) * 255) // 31
    cb = ((b >> 3) * 255) // 31
    d = np.abs(pal[:, 0] - cr) + np.abs(pal[:, 1] - cg) + np.abs(pal[:, 2] - cb)
    return int(np.argmin(d))  # argmin returns the first minimum


def dither_image(
    r: np.ndarray, g: np.ndarray, b: np.ndarray, palette: Iterable[tuple[int, int, int]]
) -> np.ndarray:
    """Dither one (H, W) RGB image to palette indices (H, W) uint8.

    Faithful port of the gdaldither.cpp:328-565 scanline loop in the
    public static-cube configuration; see module docstring.
    """
    pal = np.asarray(list(palette), dtype=np.int64)
    h, w = r.shape
    out = np.zeros((h, w), dtype=np.int64)
    # panError layout: (w+2) pixel slots x 3 channels, shifted by one
    # pixel — pixel i of the NEXT row reads slot i+1 (gdaldither.cpp:384).
    err = np.zeros((w + 2) * 3, dtype=np.int64)
    cube_cache: dict[tuple[int, int, int], int] = {}
    for row in range(h):
        # Apply the previous line's error, clamp to byte (0..255), reset.
        rv = np.clip(r[row] + err[3 : 3 + 3 * w : 3], 0, 255)
        gv = np.clip(g[row] + err[4 : 4 + 3 * w : 3], 0, 255)
        bv = np.clip(b[row] + err[5 : 5 + 3 * w : 3], 0, 255)
        err[:] = 0
        last_r = last_g = last_b = 0
        for i in range(w):
            red = min(255, max(0, int(rv[i]) + last_r))
            grn = min(255, max(0, int(gv[i]) + last_g))
            blu = min(255, max(0, int(bv[i]) + last_b))
            key = (red >> 3, grn >> 3, blu >> 3)
            idx = cube_cache.get(key)
            if idx is None:
                idx = _nearest_cube(pal, red, grn, blu)
                cube_cache[key] = idx
            out[row, i] = idx

            e = red - int(pal[idx, 0])
            s = _trunc_div6(e)
            err[i * 3] += s
            err[i * 3 + 6] = s
            err[i * 3 + 3] += e - 5 * s
            last_r = 2 * s

            e = grn - int(pal[idx, 1])
            s = _trunc_div6(e)
            err[i * 3 + 1] += s
            err[i * 3 + 7] = s
            err[i * 3 + 4] += e - 5 * s
            last_g = 2 * s

            e = blu - int(pal[idx, 2])
            s = _trunc_div6(e)
            err[i * 3 + 2] += s
            err[i * 3 + 8] = s
            err[i * 3 + 5] += e - 5 * s
            last_b = 2 * s
    return out


def dither_rgb(pix: DataFrame, palette: list[tuple[int, int, int]]) -> DataFrame:
    """Dither a corpus of images: (image_id, px, py, r, g, b) ->
    (image_id, px, py, idx).

    One shuffle on image_id; each image dithers serially inside its own
    applyInPandas task (see module docstring for why per-image is the
    only faithful parallel unit).
    """
    pal = [tuple(int(c) for c in entry) for entry in palette]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["py", "px"])
        w = int(pdf["px"].max()) + 1
        h = int(pdf["py"].max()) + 1
        r = pdf["r"].to_numpy(np.int64).reshape(h, w)
        g = pdf["g"].to_numpy(np.int64).reshape(h, w)
        b = pdf["b"].to_numpy(np.int64).reshape(h, w)
        idx = dither_image(r, g, b, pal)
        return pd.DataFrame(
            {
                "image_id": pdf["image_id"].to_numpy(np.int32),
                "px": pdf["px"].to_numpy(np.int32),
                "py": pdf["py"].to_numpy(np.int32),
                "idx": idx.reshape(-1).astype(np.int32),
            }
        )

    return pix.groupBy("image_id").applyInPandas(kernel, _DITHER_SCHEMA)
