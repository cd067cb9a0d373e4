"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; the Spark
side — schemas, partition-sized Arrow batches, ``mapInPandas`` signatures —
is real and tested. Decode paths:

- ``decode='png'`` — a REAL decoder: the stdlib PNG codec
  (kernels/png.py — zlib inflate, all five scanline filters, gray/RGB/
  palette/alpha, 8/16-bit) with deterministic image-statistics features;
  golden-tested against hand-built and round-tripped images.
- ``decode='jpeg'`` — a REAL baseline-JPEG decoder (kernels/jpeg.py —
  Huffman + dequant + IDCT, 4:4:4/4:2:2/4:2:0, restart markers), same
  feature layout; round-trip and third-party-decode tested.
- ``decode='fake'`` — content-hash-seeded pseudo-features, for exercising
  the distributed plumbing with arbitrary bytes.
- ``decode='stub'`` — raises NotImplementedError: the wiring point for
  heavy codecs (PIL/ffmpeg/librosa) not present in this container.

At 100 TB: media bytes never leave the executor — ``mapInPandas`` streams
Arrow batches; feature vectors (small) are all that shuffles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, duration_ms long, codec string"
)

_FEATURE_DIM = 32


def _fake_features(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """Deterministic unit-norm pseudo-embedding from content bytes."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float64)


def extract_media_features(
    df: DataFrame,
    content_col: str = "html",
    id_col: str = "url",
    decode: str = "fake",
    dim: int = _FEATURE_DIM,
) -> DataFrame:
    """(id, content_sha256, n_bytes, features array<double>) via mapInPandas.

    Decode modes:
    - ``'png'``  — REAL decode via the stdlib PNG codec (kernels/png.py:
      zlib inflate + scanline unfilter), features = deterministic image
      statistics (dims, channel means/stds, 16-bin histogram). Non-PNG
      payloads get null features.
    - ``'jpeg'`` — REAL decode via the stdlib baseline-JPEG codec
      (kernels/jpeg.py), same feature layout; non-JPEG payloads get null
      features.
    - ``'fake'`` — content-hash-seeded pseudo-embedding (plumbing tests).
    - ``'stub'`` — raises: the wiring point for ffmpeg/librosa-class codecs.
    """
    if decode not in ("fake", "stub", "png", "jpeg"):
        raise ValueError(f"unknown decode mode: {decode}")

    schema = f"{id_col} string, content_sha256 string, n_bytes long, features array<double>"

    def run(batches):
        from geo_spark.kernels.jpeg import decode_jpeg
        from geo_spark.kernels.png import decode_png, png_features

        for pdf in batches:
            if decode == "stub":
                raise NotImplementedError(
                    "media decode requires an image/audio codec; install one and "
                    "replace the 'fake' feature extractor (operators/multimodal.py)"
                )
            payloads = pdf[content_col]
            ids = pdf[id_col]
            out = {
                id_col: [],
                "content_sha256": [],
                "n_bytes": [],
                "features": [],
            }
            for i, payload in enumerate(payloads):
                raw = bytes(payload) if payload is not None else b""
                out[id_col].append(ids.iloc[i])
                out["content_sha256"].append(hashlib.sha256(raw).hexdigest())
                out["n_bytes"].append(len(raw))
                if decode == "png":
                    try:
                        feats = png_features(decode_png(raw), dim).tolist()
                    except Exception:
                        feats = None
                elif decode == "jpeg":
                    try:
                        img = decode_jpeg(raw)
                        if img.ndim == 2:  # grayscale → (h, w, 1)
                            img = img[:, :, None]
                        feats = png_features(img, dim).tolist()
                    except Exception:
                        feats = None
                else:
                    feats = _fake_features(raw, dim).tolist()
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


def frame_sample_plan(
    df: DataFrame,
    duration_col: str = "duration_ms",
    every_ms: int = 1000,
    max_frames: int = 16,
) -> DataFrame:
    """One row per planned sample timestamp — pure SQL (sequence + explode).

    The decode of each frame is the stubbed step; the *plan* (which
    timestamps each executor would decode, bounded per row) is the part with
    distributed semantics, and it is fully testable.
    """
    n = F.least(
        (F.col(duration_col) / F.lit(every_ms)).cast("int") + 1, F.lit(max_frames)
    )
    ts = F.transform(
        F.sequence(F.lit(0), n - 1), lambda i: i * F.lit(every_ms)
    )
    return df.withColumn("sample_ts_ms", F.explode(ts))


def media_dedup_exact(df: DataFrame, content_col: str = "html", id_col: str = "url") -> DataFrame:
    """Exact media dedup by content hash — one shuffle on sha2 (JVM-side)."""
    return (
        df.groupBy(F.sha2(F.col(content_col), 256).alias("content_sha256"))
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id"))
    )


def resize_media(
    df: DataFrame,
    content_col: str = "html",
    id_col: str = "url",
    width: int = 64,
    height: int = 64,
    method: str = "box",
) -> DataFrame:
    """(id, content binary, width, height, ok) — decode → resize → re-encode.

    REAL path end-to-end: the payload is sniffed by magic bytes (PNG/JPEG —
    the two stdlib codecs), resized in numpy (``'box'`` average for integer
    downscales, ``'nearest'`` otherwise/upscale), and re-encoded as PNG
    (lossless, so resize arithmetic is exactly testable). Undecodable
    payloads pass through with ``ok=false``. Media bytes never shuffle:
    ``mapInPandas`` streams Arrow batches executor-side, mirroring
    ``extract_media_features``.
    """

    def _resize(img: np.ndarray, w: int, h: int, method: str) -> np.ndarray:
        if img.ndim == 2:
            img = img[:, :, None]
        ih, iw, nch = img.shape
        if method == "box" and ih % h == 0 and iw % w == 0:
            fy, fx = ih // h, iw // w
            out = (
                img.reshape(h, fy, w, fx, nch)
                .mean(axis=(1, 3))
                .round()
                .astype(img.dtype)
            )
        else:  # nearest
            yi = (np.arange(h) * ih // h).clip(0, ih - 1)
            xi = (np.arange(w) * iw // w).clip(0, iw - 1)
            out = img[yi][:, xi]
        return out

    def run(batches):
        from geo_spark.kernels.jpeg import decode_jpeg
        from geo_spark.kernels.png import decode_png, encode_png

        for pdf in batches:
            out = {id_col: [], "content": [], "width": [], "height": [], "ok": []}
            for i in range(len(pdf)):
                raw = bytes(pdf[content_col].iloc[i] or b"")
                out[id_col].append(pdf[id_col].iloc[i])
                img = None
                try:
                    if raw[:8] == b"\x89PNG\r\n\x1a\n":
                        img = decode_png(raw)
                    elif raw[:2] == b"\xff\xd8":
                        img = decode_jpeg(raw)
                except Exception:
                    img = None
                if img is None:
                    out["content"].append(raw)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["ok"].append(False)
                    continue
                r = _resize(np.asarray(img), width, height, method)
                out["content"].append(bytearray(encode_png(r)))
                out["width"].append(width)
                out["height"].append(height)
                out["ok"].append(True)
            yield pd.DataFrame(out)

    schema = f"{id_col} string, content binary, width int, height int, ok boolean"
    return df.select(id_col, content_col).mapInPandas(run, schema=schema)
