"""Hilbert space-filling-curve key — the FlatGeobuf packed-R-tree order.

The reference sorts features by the Hilbert value of their envelope
midpoint before building the packed R-tree
(``ogr/ogrsf_frmts/flatgeobuf/packedrtree.cpp:74-150`` — ``hilbert()``,
``hilbertSort()``; kernel based on the public-domain
rawrunprotected/hilbert_curves bit-twiddling, 16-bit x/y -> 32-bit d).
That sort is what gives FlatGeobuf its scan locality: features near each
other on disk are near each other in space, so a bbox query touches a
contiguous byte range.

The Spark-native translation of the same idea is a *clustered table
layout*: compute the Hilbert key as a pure-JVM integer-bitop column,
``repartitionByRange`` + ``sortWithinPartitions`` on it at write time,
and let parquet row-group min/max statistics (on the coordinate columns)
prune bbox scans — the moral equivalent of the packed R-tree's
level-order node ranges, with Catalyst/parquet doing the index walk.

Everything here is exact integer arithmetic, so Spark/DuckDB parity is
structural (no float-formula subtleties); the only dialect difference is
XOR spelling (``^`` in Spark SQL, ``xor()`` in DuckDB — DuckDB's ``^``
is exponentiation) and shift spelling (``shiftleft()`` vs ``<<``).

Validation (tests/test_hilbert.py): the kernel is pinned against an
independent transcription of the textbook iterative xy2d Hilbert walk
(2 000 random 16-bit pairs, zero mismatches) plus the four grid-corner
golden values, and the Spark and DuckDB renderings are cross-checked
against the numpy twin.
"""

from __future__ import annotations

import numpy as np

HILBERT_MAX = (1 << 16) - 1  # packedrtree.cpp:56 hilbertMax default

# Interleave masks, decimal because Spark SQL has no 0x literals.
_M16 = 65535
_SPREAD = ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765))


def _ops(dialect: str):
    """Per-dialect renderers for the exact-integer operators."""
    if dialect == "spark":
        xor = lambda a, b: f"({a} ^ {b})"
        shr = lambda a, n: f"shiftright({a}, {n})"
        shl = lambda a, n: f"shiftleft({a}, {n})"
    elif dialect == "duckdb":
        xor = lambda a, b: f"xor({a}, {b})"
        shr = lambda a, n: f"({a} >> {n})"
        shl = lambda a, n: f"({a} << {n})"
    else:  # pragma: no cover - guarded by callers
        raise ValueError(dialect)
    band = lambda a, b: f"({a} & {b})"
    bor = lambda a, b: f"({a} | {b})"
    return xor, band, bor, shr, shl


def hilbert_steps(x: str, y: str, out: str, dialect: str) -> list[tuple[str, str]]:
    """Ordered (column_name, sql_text) steps computing the FlatGeobuf
    Hilbert value ``out`` from 16-bit BIGINT columns ``x``/``y``.

    Each step may reference prior step columns by name, so the Spark side
    folds them through ``withColumn`` and the DuckDB oracle nests them as
    subselects. All intermediates are non-negative and < 2^32, so plain
    64-bit signed arithmetic reproduces the reference's uint32 kernel
    with no wraparound handling.
    """
    X, A, O, R, L = _ops(dialect)
    s: list[tuple[str, str]] = []
    # packedrtree.cpp:75-90 — initial state
    s.append(("h_a1", X(x, y)))
    s.append(("h_b1", X(str(_M16), "h_a1")))
    s.append(("h_c1", X(str(_M16), O(x, y))))
    s.append(("h_d1", A(x, X(y, str(_M16)))))
    s.append(("h_a2", O("h_a1", R("h_b1", 1))))
    s.append(("h_b2", X(R("h_a1", 1), "h_a1")))
    s.append(("h_c2", X(X(R("h_c1", 1), A("h_b1", R("h_d1", 1))), "h_c1")))
    s.append(("h_d2", X(X(A("h_a1", R("h_c1", 1)), R("h_d1", 1)), "h_d1")))
    # packedrtree.cpp:92-110 — two prefix-doubling rounds (shift 2, 4)
    for rnd, sh in ((3, 2), (4, 4)):
        a, b, c, d = (f"h_{n}{rnd - 1}" for n in "abcd")
        s.append((f"h_a{rnd}", X(A(a, R(a, sh)), A(b, R(b, sh)))))
        s.append((f"h_b{rnd}", X(A(a, R(b, sh)), A(b, R(X(a, b), sh)))))
        s.append((f"h_c{rnd}", X(c, X(A(a, R(c, sh)), A(b, R(d, sh))))))
        s.append((f"h_d{rnd}", X(d, X(A(b, R(c, sh)), A(X(a, b), R(d, sh))))))
    # packedrtree.cpp:112-117 — final round only touches c/d (shift 8)
    s.append(("h_c5", X("h_c4", X(A("h_a4", R("h_c4", 8)), A("h_b4", R("h_d4", 8))))))
    s.append(
        ("h_d5", X("h_d4", X(A("h_b4", R("h_c4", 8)), A(X("h_a4", "h_b4"), R("h_d4", 8)))))
    )
    s.append(("h_ga", X("h_c5", R("h_c5", 1))))
    s.append(("h_gb", X("h_d5", R("h_d5", 1))))
    # packedrtree.cpp:119-121 — gray-code indices
    s.append(("h_i0_0", X(x, y)))
    s.append(("h_i1_0", O("h_gb", X(str(_M16), O("h_i0_0", "h_ga")))))
    # packedrtree.cpp:123-133 — bit spreading (interleave prep)
    for name in ("i0", "i1"):
        prev = f"h_{name}_0"
        for step, (sh, mask) in enumerate(_SPREAD, start=1):
            cur = f"h_{name}_{step}"
            s.append((cur, A(O(prev, L(prev, sh)), str(mask))))
            prev = cur
    # packedrtree.cpp:135 — value = (i1 << 1) | i0
    s.append((out, O(L("h_i1_4", 1), "h_i0_4")))
    return s


def duckdb_hilbert_select(
    inner: str, x: str, y: str, out: str, keep: str = "doc_id"
) -> str:
    """Nest the step chain into DuckDB subselects over ``inner`` (a SQL
    body producing columns ``x``/``y`` plus ``keep``)."""
    sql = f"SELECT * FROM ({inner})"
    for name, text in hilbert_steps(x, y, out, "duckdb"):
        sql = f"SELECT *, {text} AS {name} FROM ({sql})"
    return f"SELECT {keep}, {out} FROM ({sql})"


def hilbert_u32(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized numpy twin of packedrtree.cpp:74-135 (test cross-check
    and the write-path key kernel when coordinates are already in numpy)."""
    x = np.asarray(x, np.uint32)
    y = np.asarray(y, np.uint32)
    M = np.uint32(_M16)
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    for sh in (2, 4):
        a, b, c, d = A, B, C, D
        A = (a & (a >> sh)) ^ (b & (b >> sh))
        B = (a & (b >> sh)) ^ (b & ((a ^ b) >> sh))
        C = c ^ ((a & (c >> sh)) ^ (b & (d >> sh)))
        D = d ^ ((b & (c >> sh)) ^ ((a ^ b) & (d >> sh)))
    a, b, c, d = A, B, C, D
    C = c ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = d ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    ga = C ^ (C >> 1)
    gb = D ^ (D >> 1)
    i0 = x ^ y
    i1 = gb | (M ^ (i0 | ga))
    for arr_name in ("i0", "i1"):
        v = i0 if arr_name == "i0" else i1
        for sh, mask in _SPREAD:
            v = (v | (v << np.uint32(sh))) & np.uint32(mask)
        if arr_name == "i0":
            i0 = v
        else:
            i1 = v
    return ((i1.astype(np.uint64) << np.uint64(1)) | i0.astype(np.uint64)).astype(
        np.uint64
    )
