"""Multidimensional dataset surface (gdalmdiminfo / gdalmdimtranslate).

The reference's multidim model (gcore/gdalmultidim.cpp: GDALGroup →
GDALDimension / GDALMDArray) re-expressed Spark-first: an MDArray is a
DataFrame with one INT index column per dimension plus a ``value``
column — the natural distributed layout for an n-D array (what the
netCDF/Zarr chunk grid flattens to anyway).

Implemented operations, each a pure filter/projection (ZERO shuffle —
the array never leaves its scan partitioning):

* ``mdim_view`` — ``GDALMDArray::GetView`` basic slicing
  (gdalmultidim.cpp:5678-5762: NumPy semantics — integer indexing
  drops the dimension, start:stop:step ranges including negative
  steps, ellipsis, newaxis; ranges that would produce zero elements
  are an error, :5733-5735);
* ``mdim_transpose`` — ``GDALMDArray::GetTransposed`` axis permutation
  (metadata-only here: the dims list reorders, the row-major
  linearization changes);
* ``mdim_unscale`` — ``GDALMDArray::GetUnscaled``
  (value*scale + offset, nodata → NULL);
* ``mdim_stats`` — ``GDALMDArray::GetStatistics`` over valid samples,
  emitted as EXACT integer partials (n, sum, sum-of-squares, min,
  max): distributive, aggregation-order-proof, and sufficient to
  reconstruct mean/stddev.

Scale contract: slicing composes into the scan as codegen filters
(partition pruning applies when the array is written partitioned on
the leading dims — the chunk-grid analog), and statistics are one
map-side-combined aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MDim:
    """One dimension: name + extent (GDALDimension analog)."""

    name: str
    size: int


def _parse_piece(piece: str):
    piece = piece.strip()
    if piece == "...":
        return ("ellipsis",)
    if piece == "newaxis":
        return ("newaxis",)
    if ":" not in piece:
        return ("int", int(piece))
    parts = piece.split(":")
    if len(parts) == 2:
        parts.append("")
    if len(parts) != 3:
        raise ValueError(f"bad slice {piece!r}")
    start = int(parts[0]) if parts[0] else None
    stop = int(parts[1]) if parts[1] else None
    step = int(parts[2]) if parts[2] else 1
    if step == 0:
        raise ValueError("slice step cannot be 0")
    return ("slice", start, stop, step)


def _normalize_slice(start, stop, step, n):
    """NumPy basic-slicing normalization for extent n."""
    if step > 0:
        start = 0 if start is None else (start + n if start < 0 else start)
        start = min(max(start, 0), n)
        stop = n if stop is None else (stop + n if stop < 0 else stop)
        stop = min(max(stop, 0), n)
        size = max(0, -(-(stop - start) // step))
    else:
        start = n - 1 if start is None else (start + n if start < 0 else start)
        start = min(max(start, -1), n - 1)
        if stop is None:
            stop = -1
        else:
            stop = stop + n if stop < 0 else stop
            stop = min(max(stop, -1), n - 1)
        size = max(0, -(-(stop - start) // step))
    return start, stop, step, size


def parse_view(expr: str, dims: list[MDim]):
    """Parse a GetView expression like ``[1:5,::2,newaxis,...,3]`` into
    per-dimension ops, expanding the ellipsis against ``dims``."""
    expr = expr.strip()
    if not (expr.startswith("[") and expr.endswith("]")):
        raise ValueError("view expression must be bracketed")
    pieces = [_parse_piece(p) for p in expr[1:-1].split(",")]
    n_consuming = sum(1 for p in pieces if p[0] in ("int", "slice"))
    n_ellipsis = sum(1 for p in pieces if p[0] == "ellipsis")
    if n_ellipsis > 1:
        raise ValueError("only one ellipsis allowed")
    fill = len(dims) - n_consuming
    if fill < 0:
        raise ValueError("too many indexers for dimension count")
    out = []
    for p in pieces:
        if p[0] == "ellipsis":
            out.extend([("slice", None, None, 1)] * fill)
        else:
            out.append(p)
    if n_ellipsis == 0:
        out.extend([("slice", None, None, 1)] * fill)
    return out


def mdim_view(
    df: DataFrame, dims: list[MDim], expr: str
) -> tuple[DataFrame, list[MDim]]:
    """Apply a GetView slice: returns (new df, new dims).

    Every op is a codegen filter + affine index remap; integer indexing
    drops the dimension column, newaxis adds a constant-0 one.
    """
    ops = parse_view(expr, dims)
    new_dims: list[MDim] = []
    cond = F.lit(True)
    proj: list = []
    di = 0
    naxis = 0
    for op in ops:
        if op[0] == "newaxis":
            name = f"newaxis{naxis}"
            naxis += 1
            proj.append(F.lit(0).cast("int").alias(name))
            new_dims.append(MDim(name, 1))
            continue
        d = dims[di]
        di += 1
        c = F.col(d.name)
        if op[0] == "int":
            k = op[1] + d.size if op[1] < 0 else op[1]
            if not 0 <= k < d.size:
                raise IndexError(f"index {op[1]} out of range for {d.name}")
            cond = cond & (c == k)
            continue
        start, stop, step, size = _normalize_slice(op[1], op[2], op[3], d.size)
        if size == 0:
            # gdalmultidim.cpp:5733: zero-sized views are an error
            raise ValueError(f"view produces empty dimension {d.name}")
        if step > 0:
            cond = cond & (c >= start) & (c < stop) & ((c - start) % step == 0)
            newc = ((c - start) / step).cast("int")
        else:
            cond = (
                cond & (c <= start) & (c > stop) & ((start - c) % (-step) == 0)
            )
            newc = ((start - c) / (-step)).cast("int")
        proj.append(newc.alias(d.name))
        new_dims.append(MDim(d.name, size))
    assert di == len(dims)
    out = df.filter(cond).select(*proj, F.col("value"))
    return out, new_dims


def mdim_transpose(
    df: DataFrame, dims: list[MDim], axis_map: list[int]
) -> tuple[DataFrame, list[MDim]]:
    """GetTransposed: axis_map[i] = source axis feeding new axis i.

    Tabular transpose is metadata — the dims list reorders; the data
    rows are untouched (linearization happens at emit time)."""
    if sorted(axis_map) != list(range(len(dims))):
        raise ValueError("axis_map must be a permutation")
    return df, [dims[a] for a in axis_map]


def linearize(df: DataFrame, dims: list[MDim], out_col: str = "pos") -> DataFrame:
    """Row-major position under the CURRENT dims order — what
    mdimtranslate would write; makes transposition observable."""
    pos = F.lit(0).cast("bigint")
    for d in dims:
        pos = pos * d.size + F.col(d.name)
    return df.withColumn(out_col, pos)


def mdim_unscale(
    df: DataFrame, scale: float, offset: float, nodata: float | None = None
) -> DataFrame:
    """GetUnscaled: value*scale + offset, nodata → NULL."""
    v = F.col("value")
    out = v.cast("double") * F.lit(scale) + F.lit(offset)
    if nodata is not None:
        out = F.when(v == nodata, F.lit(None)).otherwise(out)
    return df.withColumn("value", out)


def mdim_stats(df: DataFrame, name: str, nodata: int | None = None) -> DataFrame:
    """GetStatistics over valid samples as exact BIGINT partials."""
    v = F.col("value")
    valid = df if nodata is None else df.filter(v != nodata)
    return valid.agg(
        F.lit(name).alias("array_name"),
        F.count("*").cast("bigint").alias("n_valid"),
        F.min(v).cast("bigint").alias("vmin"),
        F.max(v).cast("bigint").alias("vmax"),
        F.sum(v.cast("bigint")).cast("bigint").alias("vsum"),
        F.sum((v.cast("bigint") * v.cast("bigint"))).cast("bigint").alias("vsumsq"),
    )
