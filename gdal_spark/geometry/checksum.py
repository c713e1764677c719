"""GDALChecksumImage port — the reference's golden-output oracle.

Numpy port of alg/gdalchecksum.cpp:48-260: per pixel (row-major),
checksum += (round-half-up(value) C-mod primes[i % 11]); checksum &= 0xffff
after each add.  Prime cycle index is the GLOBAL pixel index
(iPrime = (y * xsize + x) % 11, gdalchecksum.cpp block path), so windowed
and whole-image computations agree.

Used as the tile-equality oracle for the tiling/pyramid operators, the
same way the reference asserts gdal2tiles outputs
(autotest/pyscripts/test_gdal2tiles.py:121-156).
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)

__all__ = ["checksum_image"]


def checksum_image(arr: np.ndarray) -> int:
    """Checksum of a 2-D array (one band, full window)."""
    a = np.asarray(arr, dtype=np.float64)
    # IntFromDouble: +0.5 then floor, clamp to int32 range, NaN/inf -> INT_MIN
    v = a + 0.5
    v = np.where(np.isfinite(v), v, np.nan)
    iv = np.where(
        np.isnan(v),
        np.int64(-2147483648),
        np.clip(np.floor(np.where(np.isnan(v), 0.0, v)), -2147483647, 2147483647).astype(
            np.int64
        ),
    )
    flat = iv.ravel()
    primes = PRIMES[np.arange(flat.size, dtype=np.int64) % 11]
    # C-style truncating modulo (sign follows dividend)
    rem = np.fmod(flat, primes)
    return int(rem.sum() & 0xFFFF)
