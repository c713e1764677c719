"""Multimodal span processing — image/audio/video as opaque binary
columns with typed metadata.

The corpus carries media as `kind='media'` spans holding a `media_ref`
URI. This module provides the Spark-side plumbing a 100 TB multimodal
pipeline needs — schema, partitioning, Arrow batch shape, UDF
signatures — with the actual codec work stubbed per the sandbox
constraint (no image/audio libs in this container):

  * ``fetch_media``     — media_ref -> (payload binary, metadata struct);
                          deterministic fake payload derived from the ref
                          (so downstream tests are exact), clearly marked.
  * ``image_features``  — payload -> fixed-size feature vector
                          (deterministic fake "embedding" over the bytes;
                          a real build swaps in PIL/torchvision inside
                          the SAME mapInPandas kernel).
  * ``frame_sample``    — video payload -> every k-th "frame" record
                          (explode shape: 1 row in, N rows out).

All kernels are mapInPandas (Arrow-batched); payloads never transit the
driver. Real decoders plug in by replacing _fake_decode only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16


def _fake_decode(ref: str, n_bytes: int = 256) -> bytes:
    """STUB: deterministic pseudo-payload for a media_ref.

    A real deployment replaces this with an object-store fetch + codec
    (PIL.Image.open / av.open). Everything around it — batching, schema,
    partition behavior — is production-shaped and tested.
    """
    seed = hashlib.md5(ref.encode()).digest()
    reps = (n_bytes + len(seed) - 1) // len(seed)
    return (seed * reps)[:n_bytes]


def media_refs(docs: DataFrame) -> DataFrame:
    """Extract (doc_id, media_ref) rows from the span sequence without
    disturbing it (spans stay intact on the source table)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
        ).alias("_s"),
    ).select("doc_id", F.col("_s.media_ref").alias("media_ref"))


_FETCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def fetch_media(refs: DataFrame) -> DataFrame:
    """media_ref -> binary payload + typed metadata (Arrow-batched)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_fake_decode(r) for r in pdf["media_ref"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "payload": payloads,
                    "media_type": ["image/fake"] * len(pdf),
                    "n_bytes": np.int32([len(p) for p in payloads]),
                }
            )

    return refs.mapInPandas(kernel, _FETCH_SCHEMA)


_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_ref", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """payload -> FEATURE_DIM float features, vectorized per batch.
    STUB feature map: byte-histogram projection (deterministic); a real
    build runs the vision model forward pass here, same batch shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                v = hist / max(arr.size, 1)
                feats.append(v.astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "features": feats,
                }
            )

    return media.mapInPandas(kernel, _FEAT_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_k: int = 4, frame_bytes: int = 32) -> DataFrame:
    """1 payload row -> N frame rows (every k-th chunk) — the explode
    shape of video frame sampling, stubbed at the codec level."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_ref": [], "frame_idx": [], "frame": []}
            for did, ref, p in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                n_frames = max(len(p) // frame_bytes, 1)
                for fi in range(0, n_frames, every_k):
                    rows["doc_id"].append(did)
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(np.int32(fi))
                    rows["frame"].append(p[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, _FRAME_SCHEMA)
