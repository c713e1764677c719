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
