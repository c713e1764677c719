"""Encoded tile sink (operators/tile_encode.py): the PNG bytes are real
— decoded back with INDEPENDENT implementations (zlib.decompress for
the stream, zlib.crc32 against the module's table-driven CRC), and
committed through the snapshot table's write-audit-publish flow."""

import struct
import zlib

import numpy as np
import pytest

from gdal_spark.operators.tile_encode import (
    adler32,
    crc32,
    crc32 as tile_crc32,
    encode_png_tiles,
    png_bytes_expected,
    png_gray,
)


def _decode_png_gray(png: bytes) -> np.ndarray:
    """Minimal independent PNG reader: parse chunks, zlib-decompress
    IDAT, strip filter bytes (all must be 0)."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos:pos + 4])
        ctype = png[pos + 4:pos + 8]
        payload = png[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", png[pos + 8 + ln:pos + 12 + ln])[0]
        assert crc == zlib.crc32(ctype + payload), "chunk CRC"
        # independent second implementation (table-driven PNG-spec CRC)
        assert crc == tile_crc32(ctype + payload), "chunk CRC (table)"
        if ctype == b"IHDR":
            w, h, depth, ctyp = struct.unpack(">IIBB", payload[:10])
            assert (depth, ctyp) == (8, 0)
        elif ctype == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = raw.reshape(h, w + 1)
    assert (rows[:, 0] == 0).all(), "filter type must be 0"
    return rows[:, 1:]


class TestPngWriter:
    def test_round_trip(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
        png = png_gray(img)
        assert len(png) == png_bytes_expected(64, 64)
        assert (_decode_png_gray(png) == img).all()

    def test_multi_block_stream(self):
        # 300x300 -> n = 300*301 = 90300 > 65535: two stored blocks
        img = (np.arange(300 * 300) % 251).reshape(300, 300).astype(np.uint8)
        png = png_gray(img)
        assert len(png) == png_bytes_expected(300, 300)
        assert (_decode_png_gray(png) == img).all()

    def test_crc32_matches_zlib(self):
        for blob in (b"", b"IEND", b"abc" * 1000, bytes(range(256))):
            assert crc32(blob) == zlib.crc32(blob)

    def test_adler_matches_zlib(self):
        rng = np.random.RandomState(3)
        for n in (1, 100, 65535, 70000):
            d = rng.randint(0, 256, size=n).astype(np.uint8)
            assert adler32(d) == zlib.adler32(d.tobytes())

    def test_byte_determinism(self):
        img = np.full((64, 64), 129, dtype=np.uint8)
        assert png_gray(img) == png_gray(img)


class TestSparkEncode:
    def test_tiles_match_local(self, spark):
        # 100x70 source, 64-px tiles -> 2x2 tiles with zero-padded edges
        src = spark.range(100 * 70).selectExpr(
            "CAST(id % 100 AS INT) AS px",
            "CAST((id - id % 100) / 100 AS INT) AS py",
            "CAST((id * 37) % 256 AS INT) AS value",
        ).selectExpr(
            "CAST((px - px % 64) / 64 AS BIGINT) AS tx",
            "CAST((py - py % 64) / 64 AS BIGINT) AS ty",
            "px % 64 AS c",
            "py % 64 AS r",
            "value",
        )
        out = {
            (r["tx"], r["ty"]): bytes(r["png"])
            for r in encode_png_tiles(src, tile=64).collect()
        }
        assert len(out) == 4
        # rebuild tile (1, 1) locally: px 64..99, py 64..69
        img = np.zeros((64, 64), dtype=np.uint8)
        for py in range(64, 70):
            for px in range(64, 100):
                img[py - 64, px - 64] = ((py * 100 + px) * 37) % 256
        assert out[(1, 1)] == png_gray(img)
        assert (_decode_png_gray(out[(1, 1)]) == img).all()

    def test_wap_commit_of_tile_bytes(self, spark, tmp_path):
        """gdal2tiles writes tiles to disk; here the tile bytes publish
        through write-audit-publish: staged on a branch, audited
        (count + byte-length check), fast-forwarded to main, read back
        bit-identical."""
        from gdal_spark.table import SnapshotTable

        src = spark.range(64 * 64).selectExpr(
            "CAST(0 AS BIGINT) AS tx",
            "CAST(0 AS BIGINT) AS ty",
            "CAST(id % 64 AS INT) AS c",
            "CAST((id - id % 64) / 64 AS INT) AS r",
            "CAST(id % 256 AS INT) AS value",
        )
        tiles = encode_png_tiles(src, tile=64)
        t = SnapshotTable(spark, str(tmp_path / "tiles"))
        t.append(tiles.limit(0))  # empty base snapshot
        t.create_branch("audit")
        t.append_to(tiles, "audit")
        staged = t.read_ref("audit")
        n_expected = png_bytes_expected(64, 64)
        assert staged.count() == 1
        assert staged.filter(f"n_bytes <> {n_expected}").count() == 0
        t.fast_forward("audit")
        got = t.read().collect()[0]
        img = (np.arange(64 * 64) % 256).reshape(64, 64).astype(np.uint8)
        assert bytes(got["png"]) == png_gray(img)
