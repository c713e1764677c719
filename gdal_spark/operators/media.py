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


def _fake_decode_rich(ref: str, n_bytes: int = 256) -> bytes:
    """STUB variant with NON-PERIODIC bytes: per-16-byte block b the
    digest is md5(f"{ref}:{b}"), so block statistics differ across the
    whole payload (the repeated-digest stub above collapses any
    block-grid fingerprint to a handful of values).  Used by operators
    whose semantics depend on payload variety (perceptual hashing)."""
    out = b""
    b = 0
    while len(out) < n_bytes:
        out += hashlib.md5(f"{ref}:{b}".encode()).digest()
        b += 1
    return out[:n_bytes]


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


def fetch_media(refs: DataFrame, rich: bool = False) -> DataFrame:
    """media_ref -> binary payload + typed metadata (Arrow-batched).
    ``rich`` selects the non-periodic stub payload (see
    :func:`_fake_decode_rich`)."""
    decode = _fake_decode_rich if rich else _fake_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [decode(r) for r in pdf["media_ref"]]
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


_PHASH_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("phash", LongType()),
    ]
)

# dHash grid: 7 rows x 9 cols of 4-byte block sums over the first 252
# payload bytes; bit (r,c) set iff cell > right neighbor -> 7*8 = 56
# bits (a positive BIGINT).  Comparing 4-byte SUMS == comparing means
# (equal block sizes), so the hash is exact integer end to end.
PHASH_ROWS, PHASH_COLS, PHASH_BLOCK = 7, 9, 4


def perceptual_hash(media: DataFrame) -> DataFrame:
    """payload -> 56-bit dHash (difference hash — the standard
    perceptual image fingerprint; Krawetz 2013 "Kind of Like That").
    On real decoders the grid comes from a grayscale resize; the stub
    payload stands in, same batch shape and bit layout."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_bytes = PHASH_ROWS * PHASH_COLS * PHASH_BLOCK
        # bit p = 8r + c for cell (r, c) vs its right neighbor
        pow2 = (
            np.int64(1)
            << (
                8 * np.arange(PHASH_ROWS, dtype=np.int64)[:, None]
                + np.arange(PHASH_COLS - 1, dtype=np.int64)[None, :]
            )
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # whole-batch vectorization (no per-row bit loops): stack the
            # payload prefixes into one (B, 252) matrix
            mat = np.stack(
                [
                    np.frombuffer(p, dtype=np.uint8)[:n_bytes]
                    for p in pdf["payload"]
                ]
            ).astype(np.int64)
            cells = mat.reshape(-1, PHASH_ROWS, PHASH_COLS, PHASH_BLOCK).sum(
                axis=3
            )
            bits = cells[:, :, :-1] > cells[:, :, 1:]  # (B, 7, 8)
            hashes = (bits * pow2).sum(axis=(1, 2))
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "phash": hashes}
            )

    return media.mapInPandas(kernel, _PHASH_SCHEMA)


_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win", IntegerType()),
        StructField("energy", LongType()),
    ]
)

AUDIO_WIN = 32  # samples per energy window


def audio_energy(media: DataFrame) -> DataFrame:
    """payload as centered 8-bit PCM -> per-window sum-of-squares energy
    (the silence-detection primitive).  Exact integers; one Arrow stage;
    a real decoder replaces the payload, not the kernel shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "win": [], "energy": []}
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                s = np.frombuffer(p, dtype=np.uint8).astype(np.int64) - 128
                n_win = s.size // AUDIO_WIN
                e = (
                    (s[: n_win * AUDIO_WIN] ** 2)
                    .reshape(n_win, AUDIO_WIN)
                    .sum(axis=1)
                )
                rows["doc_id"] += [did] * n_win
                rows["win"] += list(range(n_win))
                rows["energy"] += e.tolist()
            out = pd.DataFrame(rows)
            out["win"] = out["win"].astype("int32")
            out["energy"] = out["energy"].astype("int64")
            yield out

    return media.mapInPandas(kernel, _ENERGY_SCHEMA)


_SCENE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("l1_diff", LongType()),
    ]
)

SCENE_FRAME_BYTES = 32


def scene_diffs(media: DataFrame) -> DataFrame:
    """payload as fixed-size frames -> per-frame L1 distance to the
    previous frame (the scene-cut detection primitive; frame 0 has no
    predecessor and emits nothing)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "l1_diff": []}
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                n_f = a.size // SCENE_FRAME_BYTES
                f = a[: n_f * SCENE_FRAME_BYTES].reshape(n_f, SCENE_FRAME_BYTES)
                d = np.abs(f[1:] - f[:-1]).sum(axis=1)
                rows["doc_id"] += [did] * (n_f - 1)
                rows["frame_idx"] += list(range(1, n_f))
                rows["l1_diff"] += d.tolist()
            out = pd.DataFrame(rows)
            out["frame_idx"] = out["frame_idx"].astype("int32")
            out["l1_diff"] = out["l1_diff"].astype("int64")
            yield out

    return media.mapInPandas(kernel, _SCENE_SCHEMA)
