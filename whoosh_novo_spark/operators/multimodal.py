"""Multimodal columns: opaque binary payloads + typed metadata.

Design for image/audio/video in a 100 TB corpus: media stays an opaque
``binary`` column with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched kernels over ``mapInPandas``
(bounded batch size keeps executor memory flat regardless of blob size).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBS behind ``WNS_FAKE_DECODE``:

- default: raise ``NotImplementedError`` naming the needed dependency
- ``fake=True``: a deterministic, content-derived fake (blake2b-seeded)
  with the REAL schema/batching/partitioning — so the Spark-side plumbing
  (UDF signatures, Arrow batch shapes, metadata propagation) is fully
  exercised and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, byte_len long, content_hash string"
)

IMAGE_FEATURES_SCHEMA = (
    "id long, width int, height int, channels int, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "id long, frame_no int, frame_hash string"


def media_metadata(df: DataFrame, id_col: str, bin_col: str, media_type: str) -> DataFrame:
    """Typed metadata for an opaque binary column — pure SQL, no decode."""
    return df.select(
        F.col(id_col).alias("id"),
        F.lit(media_type).alias("media_type"),
        F.length(F.col(bin_col)).cast("long").alias("byte_len"),
        F.sha2(F.col(bin_col), 256).alias("content_hash"),
    )


def _require_decoder(what: str, fake: bool):
    if not fake:
        raise NotImplementedError(
            f"{what} decoding needs an image/av codec (e.g. Pillow/ffmpeg), "
            "which is not installed in this environment. Pass fake=True for "
            "the deterministic stub decode (real plumbing, fake pixels)."
        )


def _fake_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    return np.random.default_rng(seed)


def image_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    feature_dim: int = 16,
    fake: bool = False,
    batch_size: int = 64,
) -> DataFrame:
    """Decode images and emit (dims, feature vector) per row.

    Real pipeline shape: mapInPandas, bounded Arrow batches, feature as
    array<float>.  STUB decode (see module docstring)."""
    _require_decoder("image", fake)

    def kernel(batches):
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                ids, ws, hs, cs, feats = [], [], [], [], []
                for rid, payload in zip(chunk[id_col], chunk[bin_col]):
                    rng = _fake_rng(bytes(payload))
                    ids.append(rid)
                    ws.append(int(rng.integers(16, 4096)))
                    hs.append(int(rng.integers(16, 4096)))
                    cs.append(3)
                    feats.append(rng.standard_normal(feature_dim).astype(np.float32))
                yield pd.DataFrame(
                    {"id": ids, "width": ws, "height": hs, "channels": cs,
                     "feature": feats}
                )

    return df.select(id_col, bin_col).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    every_n: int = 10,
    max_frames: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Sample every-nth frame of a video column. STUB decode."""
    _require_decoder("video", fake)

    def kernel(batches):
        for pdf in batches:
            ids, fnos, hashes = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                rng = _fake_rng(bytes(payload))
                n_frames = int(rng.integers(1, every_n * max_frames))
                for fno in range(0, n_frames, every_n)[:max_frames]:
                    ids.append(rid)
                    fnos.append(fno)
                    hashes.append(
                        hashlib.blake2b(
                            bytes(payload) + fno.to_bytes(4, "big"), digest_size=8
                        ).hexdigest()
                    )
            yield pd.DataFrame({"id": ids, "frame_no": fnos, "frame_hash": hashes})

    return df.select(id_col, bin_col).mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
