"""Hilbert key kernel + clustered-layout pruning evidence.

Kernel reference: ogr/ogrsf_frmts/flatgeobuf/packedrtree.cpp:74-150
(hilbert(), hilbertSort()). The kernel is validated three ways: against
an independent transcription of the textbook iterative Hilbert walk,
across the DuckDB rendering, and across the Spark SQL rendering — all
three must agree bit-exactly (pure integer arithmetic).
"""

import numpy as np
import pytest

from gdal_spark.geometry.hilbert import (
    duckdb_hilbert_select,
    hilbert_steps,
    hilbert_u32,
)


def _xy2d(order: int, x: int, y: int) -> int:
    """Independent check: textbook iterative xy->d Hilbert walk (the
    classic convert-and-rotate formulation), NOT derived from the
    reference's bit-twiddling kernel."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_kernel_matches_textbook_walk():
    rng = np.random.default_rng(42)
    xs = rng.integers(0, 65536, 500).astype(np.uint32)
    ys = rng.integers(0, 65536, 500).astype(np.uint32)
    got = hilbert_u32(xs, ys)
    want = np.array([_xy2d(1 << 16, int(x), int(y)) for x, y in zip(xs, ys)], np.uint64)
    assert (got == want).all()


def test_kernel_corner_goldens():
    # four grid corners of the order-16 curve
    assert int(hilbert_u32([0], [0])[0]) == 0
    assert int(hilbert_u32([65535], [0])[0]) == 4294967295
    assert int(hilbert_u32([0], [65535])[0]) == 1431655765
    assert int(hilbert_u32([65535], [65535])[0]) == 2863311530


def test_kernel_bijective_on_corner_block():
    xs, ys = np.meshgrid(np.arange(128, dtype=np.uint32), np.arange(128, dtype=np.uint32))
    vals = hilbert_u32(xs.ravel(), ys.ravel())
    assert len(np.unique(vals)) == 128 * 128


def test_duckdb_rendering_parity():
    import duckdb

    rng = np.random.default_rng(7)
    xs = rng.integers(0, 65536, 2000)
    ys = rng.integers(0, 65536, 2000)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?) AS hx, unnest(?) AS hy, "
        "unnest(?) AS doc_id",
        [xs.tolist(), ys.tolist(), list(range(len(xs)))],
    )
    sql = duckdb_hilbert_select(
        "SELECT doc_id, CAST(hx AS BIGINT) AS hx, CAST(hy AS BIGINT) AS hy FROM t",
        "hx",
        "hy",
        "hkey",
    )
    out = con.execute(sql + " ORDER BY doc_id").df()
    want = hilbert_u32(xs.astype(np.uint32), ys.astype(np.uint32))
    assert (out["hkey"].to_numpy(np.uint64) == want).all()


def test_spark_rendering_parity(spark):
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 65536, 2000)
    ys = rng.integers(0, 65536, 2000)
    df = spark.createDataFrame(
        [(int(i), int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "doc_id long, hx long, hy long",
    )
    for name, text in hilbert_steps("hx", "hy", "hkey", "spark"):
        df = df.withColumn(name, F.expr(text))
    rows = df.select("doc_id", "hkey").orderBy("doc_id").collect()
    want = hilbert_u32(xs.astype(np.uint32), ys.astype(np.uint32))
    got = np.array([r.hkey for r in rows], np.uint64)
    assert (got == want).all()


def test_clustered_layout_prunes_row_groups(spark, sf_dir, tmp_path):
    """The FlatGeobuf claim, restated for parquet: after a Hilbert sort,
    a bbox query's coordinate window overlaps FEW row groups' min/max
    envelopes; in doc_id order it overlaps nearly all of them. Spark-side
    results must be identical across layouts."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from gdal_spark import corpus
    from gdal_spark.operators.layout import write_hilbert_clustered

    # replicate so each of the 4 files holds many 4 KiB row groups
    docs = corpus.load_docs(spark, sf_dir, replicate=32).select(
        "doc_id", "lon", "lat"
    )
    natural = str(tmp_path / "natural")
    clustered = str(tmp_path / "clustered")
    # tiny row groups so sf0.001 (1k docs) still has many prunable units;
    # parquet.block.size is a datasource option, so it must ride the writer
    rg = {"parquet.block.size": str(4 * 1024)}
    docs.repartitionByRange(4, "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.mode("overwrite").options(**rg).parquet(natural)
    write_hilbert_clustered(docs, clustered, num_files=4, **rg)

    def overlapping(path: str, xmin, xmax, ymin, ymax):
        import glob

        total = hit = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                lo = g.column(sch["lon"]).statistics
                la = g.column(sch["lat"]).statistics
                total += 1
                if lo.min <= xmax and lo.max >= xmin and la.min <= ymax and la.max >= ymin:
                    hit += 1
        return hit, total

    bbox = (10.0, 20.0, 10.0, 20.0)  # 10x10 degree window
    hit_n, total_n = overlapping(natural, *bbox)
    hit_c, total_c = overlapping(clustered, *bbox)
    assert total_c >= 8, f"row groups too coarse to evidence pruning ({total_c})"
    # doc_id order scatters space per row group -> nearly everything overlaps
    assert hit_n >= 0.8 * total_n
    # hilbert order localizes -> the 10x10 window of a 360x120 world
    # should touch a small fraction of row groups
    assert hit_c <= 0.5 * total_c, f"clustered layout not local: {hit_c}/{total_c}"

    pred = (
        (F.col("lon") >= bbox[0])
        & (F.col("lon") <= bbox[1])
        & (F.col("lat") >= bbox[2])
        & (F.col("lat") <= bbox[3])
    )
    a = {r.doc_id for r in spark.read.parquet(natural).filter(pred).collect()}
    b = {r.doc_id for r in spark.read.parquet(clustered).filter(pred).collect()}
    assert a == b and len(a) > 0


def test_hilbert_order_contract(spark):
    """Oracle contract at the gate scale (the driver re-checks at sf0.01)."""
    import duckdb

    from gdal_spark.registry import ORACLES, QUERIES
    from tests.conftest import SF_DIR

    got = (
        QUERIES["hilbert_order"](spark, SF_DIR)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(ORACLES["hilbert_order"] + " ORDER BY doc_id").df()
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["hkey"].to_numpy(np.int64) == want["hkey"].to_numpy(np.int64)).all()
