"""pip_join_strtree (operators/strtree_join.py) must be bit-identical
to the cell-join pip_join on the same layers — two independent
candidate generators (packed STR R-tree vs mercator cell cover) feeding
the same ray-cast refine."""

from gdal_spark import corpus, zones
from gdal_spark.operators.pip_join import pip_join
from gdal_spark.operators.strtree_join import pip_join_strtree


def _pairs(df):
    return sorted((r[0], r[1]) for r in df.select("doc_id", "zone_id").collect())


def test_parity_on_rect_layer(spark, sf_dir):
    docs = corpus.load_docs(spark, sf_dir)
    z = zones.rect_zones(spark).drop("zxmin", "zymin", "zxmax", "zymax")
    got = _pairs(pip_join_strtree(docs, z))
    want = _pairs(pip_join(docs, z))
    assert got == want and len(got) > 0


def test_parity_on_rich_concave_layer(spark, sf_dir):
    docs = corpus.load_docs(spark, sf_dir)
    z = zones.rich_zones(spark)
    got = _pairs(pip_join_strtree(docs, z))
    want = _pairs(pip_join(docs, z))
    assert got == want and len(got) > 0
