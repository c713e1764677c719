"""Multimodal span plumbing: extraction, fetch, features, frame explode.
Codec layer is a deterministic stub (no media libs in the sandbox); the
Spark-side schema/batching/partitioning under test is production-shaped."""

import pytest
from pyspark.sql import functions as F

from gdal_spark import corpus
from gdal_spark.operators import media


@pytest.fixture(scope="module")
def refs(spark, sf_dir):
    docs = corpus.load_docs(spark, sf_dir)
    return media.media_refs(docs).cache()


class TestMediaPipeline:
    def test_refs_extracted_without_touching_spans(self, spark, sf_dir, refs):
        docs = corpus.load_docs(spark, sf_dir)
        n_docs = docs.count()
        assert refs.count() == n_docs  # corpus has exactly 1 media span/doc
        r = refs.first()
        assert r.media_ref.startswith("media://")

    def test_fetch_schema_and_determinism(self, refs):
        fetched = media.fetch_media(refs)
        row = fetched.first()
        assert row.media_type == "image/fake"
        assert row.n_bytes == len(row.payload) == 256
        # deterministic: same ref -> same payload
        again = media.fetch_media(refs).filter(
            F.col("media_ref") == row.media_ref
        ).first()
        assert bytes(again.payload) == bytes(row.payload)

    def test_image_features_shape(self, refs):
        feats = media.image_features(media.fetch_media(refs))
        row = feats.first()
        assert len(row.features) == media.FEATURE_DIM
        assert abs(sum(row.features) - 1.0) < 1e-5  # histogram normalized

    def test_frame_sample_explodes(self, refs):
        limited = refs.limit(10)
        frames = media.frame_sample(media.fetch_media(limited), every_k=2)
        per_doc = (
            frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
        )
        assert len(per_doc) == 10
        # 256 bytes / 32 per frame = 8 frames, every 2nd -> 4
        assert all(r.n == 4 for r in per_doc)
        f0 = frames.filter(F.col("frame_idx") == 0).first()
        assert len(f0.frame) == 32
