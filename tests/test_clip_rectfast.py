"""JVM rect-fast clip branch vs the Python kernel path: bit-identical
piece areas (the kernel path is forced by emit_wkt=True, which routes
every candidate through the Arrow kernel)."""

from gdal_spark import corpus, zones
from gdal_spark.operators.overlay import intersection_join


def _rows(df):
    return sorted(tuple(r) for r in df.select(
        "doc_id", "zone_id", "piece_area").collect())


def test_rect_fast_bit_parity(spark, sf_dir):
    cz = zones.clip_zones(spark).drop("zxmin", "zymin", "zxmax", "zymax")
    pdocs = corpus.load_polydocs(spark, sf_dir, replicate=3)
    fast = intersection_join(pdocs, cz, emit_wkt=False)   # JVM rect branch
    slow = intersection_join(pdocs, cz, emit_wkt=True)    # Arrow kernel
    a, b = _rows(fast), _rows(slow)
    assert len(a) > 0 and a == b


def test_rich_layer_unaffected(spark, sf_dir):
    rz = zones.rich_zones(spark)
    pdocs = corpus.load_polydocs(spark, sf_dir, replicate=3)
    fast = intersection_join(pdocs, rz, emit_wkt=False)
    slow = intersection_join(pdocs, rz, emit_wkt=True)
    a, b = _rows(fast), _rows(slow)
    assert len(a) > 0 and a == b


def test_rect_fast_parity_randomized(spark):
    """Seeded random rect zones x random rect docs (corners on the 1/256
    lattice, so both paths are FP-exact): the JVM branch must equal the
    kernel branch bit-for-bit beyond the fixture shapes."""
    import numpy as np

    rng = np.random.default_rng(42)

    def rect(lo, hi, min_w, max_w):
        x0 = float(rng.integers(lo * 256, hi * 256)) / 256.0
        w = float(rng.integers(min_w * 256, max_w * 256)) / 256.0
        return x0, x0 + w

    zrows = []
    for i in range(25):
        x0, x1 = rect(-170, 140, 8, 30)
        y0, y1 = rect(-75, 50, 6, 25)
        wkt = (
            f"POLYGON (({x0} {y0},{x1} {y0},{x1} {y1},{x0} {y1},{x0} {y0}))"
        )
        zrows.append((700 + i, wkt))
    zdf = spark.createDataFrame(zrows, "zone_id long, geom_wkt string")

    drows = []
    for d in range(800):
        x0, x1 = rect(-175, 165, 1, 5)
        y0, y1 = rect(-80, 70, 1, 4)
        drows.append((d, x0, y0, x1, y1))
    ddf = spark.createDataFrame(
        drows, "doc_id long, xmin double, ymin double, xmax double, ymax double"
    )

    fast = intersection_join(ddf, zdf, emit_wkt=False)
    slow = intersection_join(ddf, zdf, emit_wkt=True)
    a, b = _rows(fast), _rows(slow)
    assert len(a) > 100 and a == b
