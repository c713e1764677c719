"""ogr_deflate / ogr_inflate semantics (ogrsqlitesqlfunctions.cpp:1117):
TEXT deflates strlen+1 bytes (trailing NUL included), BLOB deflates raw,
bad inflate input -> NULL, level parameter honored."""

import zlib

import pandas as pd

from gdal_spark.functions.codec import _deflate_series, _inflate_series


class TestCodecKernels:
    def test_text_roundtrip_includes_nul(self):
        out = _inflate_series(_deflate_series(pd.Series(["hello", "a"]), -1))
        assert out[0] == b"hello\x00"
        assert out[1] == b"a\x00"

    def test_blob_roundtrip_raw(self):
        blob = b"\x01\x02\x00\xff" * 100
        out = _inflate_series(_deflate_series(pd.Series([blob]), -1))
        assert out[0] == blob

    def test_invalid_inflate_is_null(self):
        out = _inflate_series(pd.Series([b"not a zlib stream", None]))
        assert out[0] is None and out[1] is None

    def test_level_changes_stream_not_content(self):
        s = pd.Series(["x" * 10000])
        fast = _deflate_series(s, 1)[0]
        best = _deflate_series(s, 9)[0]
        assert len(best) <= len(fast)
        assert zlib.decompress(fast) == zlib.decompress(best) == b"x" * 10000 + b"\x00"

    def test_matches_plain_zlib(self):
        # our TEXT stream is exactly zlib.compress(utf8 + NUL)
        assert _deflate_series(pd.Series(["abc"]), -1)[0] == zlib.compress(b"abc\x00", -1)
