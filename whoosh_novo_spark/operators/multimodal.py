"""Multimodal columns: opaque binary payloads + typed metadata.

Design for image/audio/video in a 100 TB corpus: media stays an opaque
``binary`` column with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched kernels over ``mapInPandas``
(bounded batch size keeps executor memory flat regardless of blob size).

Decode support is tiered:

- **real**: header-only formats decodable with pure numpy — PPM (P6),
  PGM (P5) and uncompressed 24-bit BMP (``decode_image``,
  ``resize_image``).  Features/dims from these are actual pixel data.
- **stub**: codec formats (PNG/JPEG/video) need Pillow/ffmpeg, which are
  NOT in this container; those raise ``NotImplementedError`` naming the
  dependency, or produce a deterministic content-derived fake under
  ``fake=True`` with the REAL schema/batching/partitioning — so the
  Spark-side plumbing is fully exercised and tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- decode

def _parse_pnm_header(payload: bytes) -> tuple[str, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) for P5/P6; handles
    whitespace and '#' comments per the netpbm spec."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a P5/P6 netpbm payload")
    magic = payload[:2].decode()
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    i += 1  # single whitespace after maxval
    if len(fields) != 3:
        raise ValueError("truncated netpbm header")
    w, h, maxval = fields
    return magic, w, h, maxval, i


def decode_image(payload: bytes) -> np.ndarray:
    """Pure-numpy image decode -> uint8 array (H, W, C).

    Supports PPM (P6, RGB), PGM (P5, grayscale) and uncompressed 24-bit
    bottom-up BMP.  Codec formats raise NotImplementedError (no
    Pillow/libjpeg in this environment)."""
    payload = bytes(payload)
    if payload[:2] in (b"P5", b"P6"):
        magic, w, h, maxval, off = _parse_pnm_header(payload)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm not supported")
        ch = 3 if magic == "P6" else 1
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
        return arr.reshape(h, w, ch)
    if payload[:2] == b"BM":
        data_off = int.from_bytes(payload[10:14], "little")
        hdr_size = int.from_bytes(payload[14:18], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if hdr_size < 40 or bpp != 24 or comp != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP supported")
        flip = h > 0  # positive height = bottom-up rows
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if flip:
            rows = rows[::-1]
        return rows[..., ::-1].copy()  # BGR -> RGB
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "PNG/JPEG decoding needs a codec (Pillow/libjpeg), not installed here"
        )
    raise NotImplementedError("unrecognized image format")


def resize_image(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index gather)."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[yi][:, xi]


def _real_features(arr: np.ndarray, feature_dim: int) -> np.ndarray:
    """Deterministic pixel features: per-channel mean/std + a coarse
    grid of gray means, truncated/padded to feature_dim."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        a = a[..., None]
    feats = []
    for c in range(a.shape[2]):
        feats.extend([a[..., c].mean() / 255.0, a[..., c].std() / 255.0])
    gray = a.mean(axis=2)
    g = max(1, int(np.sqrt(max(feature_dim - len(feats), 1))))
    small = resize_image(gray, g, g).reshape(-1) / 255.0
    feats.extend(small.tolist())
    out = np.asarray(feats[:feature_dim], dtype=np.float32)
    if len(out) < feature_dim:
        out = np.pad(out, (0, feature_dim - len(out)))
    return out

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
    array<float>.  REAL decode for numpy-decodable formats (PPM/PGM/BMP);
    codec formats raise unless ``fake=True`` (deterministic stub)."""

    def kernel(batches):
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                ids, ws, hs, cs, feats = [], [], [], [], []
                for rid, payload in zip(chunk[id_col], chunk[bin_col]):
                    payload = bytes(payload)
                    try:
                        arr = decode_image(payload)
                        ids.append(rid)
                        hs.append(int(arr.shape[0]))
                        ws.append(int(arr.shape[1]))
                        cs.append(int(arr.shape[2] if arr.ndim == 3 else 1))
                        feats.append(_real_features(arr, feature_dim))
                        continue
                    except NotImplementedError:
                        _require_decoder("image", fake)
                    rng = _fake_rng(payload)
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
