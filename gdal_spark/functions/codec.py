"""``ogr_deflate`` / ``ogr_inflate`` — zlib blob codec SQL functions.

Analog of OGR2SQLITE_ogr_deflate / OGR2SQLITE_ogr_inflate
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:1117-1126 registration;
kernels wrap CPLZLibDeflate/CPLZLibInflate, port/cpl_vsil_gzip.cpp:4952).
Reference semantics preserved:

* TEXT input deflates ``strlen + 1`` bytes — the terminating NUL is
  INCLUDED in the compressed stream (``CPLZLibDeflate(pszVal,
  strlen(pszVal) + 1, ...)``), so ``inflate(deflate(text))`` returns the
  text bytes plus a trailing ``\\x00``.
* BLOB input deflates the raw bytes.
* ``level`` = zlib level, -1 for the library default.
* Invalid input to inflate -> NULL (reference returns SQL NULL).

The exact compressed byte stream is zlib-implementation-defined (the
reference may link libdeflate), so the portable contract — and what the
registered ``ogr_codec`` query oracle pins — is lossless roundtrip.

Arrow-batched pandas UDFs; zlib runs C-side per value (no per-byte
Python), matching the per-row cost shape of every blob codec.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

__all__ = ["ogr_deflate", "ogr_inflate", "register_codec_functions"]


def _deflate_series(vals: pd.Series, level: int) -> pd.Series:
    out = []
    for v in vals:
        if v is None:
            out.append(None)
        elif isinstance(v, str):
            # TEXT path: strlen+1 bytes (trailing NUL included)
            out.append(zlib.compress(v.encode("utf-8") + b"\x00", level))
        else:
            out.append(zlib.compress(bytes(v), level))
    return pd.Series(out)


def _inflate_series(vals: pd.Series) -> pd.Series:
    out = []
    for v in vals:
        if v is None:
            out.append(None)
        else:
            try:
                out.append(zlib.decompress(bytes(v)))
            except zlib.error:
                out.append(None)  # reference: sqlite3_result_null
    return pd.Series(out)


def ogr_deflate(col, level: int = -1) -> Column:
    @F.pandas_udf(BinaryType())
    def _udf(v: pd.Series) -> pd.Series:
        return _deflate_series(v, level)

    return _udf(col)


def ogr_inflate(col) -> Column:
    @F.pandas_udf(BinaryType())
    def _udf(v: pd.Series) -> pd.Series:
        return _inflate_series(v)

    return _udf(col)


def register_codec_functions(spark) -> None:
    """Expose both as ``spark.sql`` functions (default level only — SQL
    registration can't bind the optional level argument)."""

    @F.pandas_udf(BinaryType())
    def _deflate_udf(v: pd.Series) -> pd.Series:
        return _deflate_series(v, -1)

    @F.pandas_udf(BinaryType())
    def _inflate_udf(v: pd.Series) -> pd.Series:
        return _inflate_series(v)

    spark.udf.register("ogr_deflate", _deflate_udf)
    spark.udf.register("ogr_inflate", _inflate_udf)
