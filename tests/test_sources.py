"""Multi-format vector sources (the OGR format-driver axis re-expressed
Spark-first): the zone layer round-trips through CSV and JSON-lines
files bit-exactly — spark.read with an EXPLICIT schema, never
inference, so types survive (the reference's CSV driver needs .csvt
sidecars for the same reason)."""

import pyspark.sql.functions as F

from gdal_spark import zones


def _rows(df):
    return sorted(tuple(r) for r in df.select(
        "zone_id", "geom_wkt", "zxmin", "zymin", "zxmax", "zymax").collect())


def test_csv_source_roundtrip(spark, tmp_path):
    z = zones.clip_zones(spark)
    ref = _rows(z)
    path = str(tmp_path / "zones_csv")
    z.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(z.schema).option("header", True).csv(path)
    assert _rows(back) == ref


def test_jsonl_source_roundtrip(spark, tmp_path):
    z = zones.clip_zones(spark)
    ref = _rows(z)
    path = str(tmp_path / "zones_jsonl")
    z.write.mode("overwrite").json(path)
    back = spark.read.schema(z.schema).json(path)
    assert _rows(back) == ref


def test_csv_source_feeds_operators(spark, sf_dir, tmp_path):
    """A CSV-backed zone layer drives the SAME spatial join as parquet:
    format is an ingestion detail, not an operator concern."""
    from gdal_spark import corpus
    from gdal_spark.operators.pip_join import pip_join

    z = zones.rect_zones(spark).drop("zxmin", "zymin", "zxmax", "zymax")
    path = str(tmp_path / "rect_csv")
    z.write.mode("overwrite").option("header", True).csv(path)
    z_csv = spark.read.schema(z.schema).option("header", True).csv(path)
    docs = corpus.load_docs(spark, sf_dir)
    a = sorted(tuple(r) for r in pip_join(docs, z_csv).select(
        "doc_id", "zone_id").collect())
    b = sorted(tuple(r) for r in pip_join(docs, z).select(
        "doc_id", "zone_id").collect())
    assert len(a) > 0 and a == b
