"""Encoded tile sink: deterministic PNG bytes per tile.

The reference's tiling pipeline ENDS in encoded tile files —
gdal2tiles.py:1283-1345 (create_base_tile writes the tile through the
PNG driver) and :1471-1560 (overview tiles) — while the repo's
tile_pyramid queries emit per-tile counts/checksums.  This module closes
that gap: a from-scratch PNG writer (PNG spec, RFC 2083; zlib RFC 1950;
deflate RFC 1951) producing BYTE-DETERMINISTIC output by using STORED
(uncompressed) deflate blocks — the byte stream is then a pure function
of the pixel array, so its length and its zlib Adler-32 are closed-form
SQL over the pixel values, giving the registry's ``tile_encode`` query
an exact DuckDB oracle over the encoded bytes (the same oracle role
GDALChecksumImage plays for raster results, alg/gdalchecksum.cpp:48).

Layout of an encoded tile (8-bit grayscale, no interlace):

    8   PNG signature
    25  IHDR chunk (len 13 + type + payload + CRC)
    12+L IDAT chunk, where L = 2 (zlib hdr 0x78 0x01)
                              + 5*ceil(n/65535) (stored-block headers)
                              + n (raw data: per row 1 filter byte 0
                                   + W pixel bytes; n = H*(W+1))
                              + 4 (Adler-32)
    12  IEND chunk

CRC-32 is implemented here table-driven from the PNG-spec polynomial
(0xEDB88320) — tests/test_tile_encode.py cross-checks it against
zlib.crc32 (an independent implementation) and round-trips the bytes
through zlib.decompress.

Scale shape: one shuffle keys pixels to their tile, one Arrow stage
encodes each tile group; tiles are independent, so the job partitions
by tile exactly like the pyramid builders, and the bytes commit through
the snapshot table (WAP) like any other data column.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# table-driven CRC-32, PNG spec annex D polynomial (reflected 0xEDB88320)
_CRC_TABLE = np.zeros(256, dtype=np.uint32)
for _i in range(256):
    _c = np.uint32(_i)
    for _ in range(8):
        _c = np.uint32(0xEDB88320) ^ (_c >> np.uint32(1)) \
            if (_c & np.uint32(1)) else (_c >> np.uint32(1))
    _CRC_TABLE[_i] = _c


def crc32(data: bytes, crc: int = 0) -> int:
    """Table-driven CRC-32 (PNG spec annex D) — the INDEPENDENT
    implementation the tests cross-check against zlib's; the encoder
    hot path uses zlib.crc32 (C speed) below."""
    c = np.uint32(crc ^ 0xFFFFFFFF)
    tab = _CRC_TABLE
    for b in np.frombuffer(data, dtype=np.uint8):
        c = tab[(c ^ b) & np.uint32(0xFF)] ^ (c >> np.uint32(8))
    return int(c ^ np.uint32(0xFFFFFFFF))


def adler32(data: np.ndarray) -> int:
    """RFC 1950 Adler-32 over a uint8 array, vectorized: A = 1 + sum,
    B = n + sum((n - i + 1) * d_i), both mod 65521."""
    d = data.astype(np.int64)
    n = d.size
    a = (1 + int(d.sum())) % 65521
    w = np.arange(n, 0, -1, dtype=np.int64)
    b = (n + int((d * w).sum())) % 65521
    return (b << 16) | a


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def png_gray(img: np.ndarray) -> bytes:
    """8-bit grayscale PNG with stored-deflate IDAT — byte-deterministic
    (no compressor heuristics anywhere in the stream)."""
    h, w = img.shape
    # filter type 0 per scanline + raw row bytes
    raw = np.zeros((h, w + 1), dtype=np.uint8)
    raw[:, 1:] = img
    data = raw.reshape(-1)
    # zlib stream: 0x78 0x01 header, stored blocks of <= 65535 bytes
    out = [b"\x78\x01"]
    n = data.size
    pos = 0
    while True:
        take = min(65535, n - pos)
        final = 1 if pos + take >= n else 0
        out.append(struct.pack("<BHH", final, take, take ^ 0xFFFF))
        out.append(data[pos:pos + take].tobytes())
        pos += take
        if pos >= n:
            break
    out.append(struct.pack(">I", adler32(data)))
    idat = b"".join(out)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def png_bytes_expected(w: int, h: int) -> int:
    """Closed-form encoded size (the SQL-oracle half of the format)."""
    n = h * (w + 1)
    nblocks = (n + 65534) // 65535
    return 8 + 25 + 12 + (2 + 5 * nblocks + n + 4) + 12


def encode_png_tiles(
    pixels: DataFrame, tile: int = 64, value_col: str = "value"
) -> DataFrame:
    """(tx, ty, r, c, value) pixel table -> one PNG per tile:
    (tx, ty, png, n_bytes, adler).  Missing pixels inside a tile fill
    with 0 (the gdal2tiles nodata fill for partial edge tiles,
    gdal2tiles.py:1302-1314)."""
    schema = StructType(
        [
            StructField("tx", LongType()),
            StructField("ty", LongType()),
            StructField("png", BinaryType()),
            StructField("n_bytes", IntegerType()),
            StructField("adler", LongType()),
        ]
    )

    def enc(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.zeros((tile, tile), dtype=np.uint8)
        img[pdf["r"].to_numpy(), pdf["c"].to_numpy()] = (
            pdf[value_col].to_numpy().astype(np.uint8)
        )
        png = png_gray(img)
        raw = np.zeros((tile, tile + 1), dtype=np.uint8)
        raw[:, 1:] = img
        return pd.DataFrame(
            {
                "tx": [key[0]],
                "ty": [key[1]],
                "png": [png],
                "n_bytes": [len(png)],
                "adler": [adler32(raw.reshape(-1))],
            }
        )

    return pixels.groupBy("tx", "ty").applyInPandas(enc, schema)
