"""Multimodal binary-column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The Spark-side plumbing — schemas, column pruning before the Arrow
exchange, batch shapes, partitioning — is real and tested. The actual
image/video DECODE step is stubbed (the sandbox has no PIL/opencv/ffmpeg):
``decode_image_stub`` produces a deterministic fake pixel tensor derived
from the payload hash, clearly marked, so pipelines exercise realistic
data volumes end-to-end; swap ``_decode_rgb`` for a real decoder when the
libs exist. Audio is NOT stubbed — see :mod:`jio_spark.audio`.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = ("id string, n_bytes long, crc32 long, magic string, "
                     "kind string")

_MAGIC = [
    (b"\xFF\xD8\xFF", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"RIFF", "audio/wav"),
    (b"\x1A\x45\xDF\xA3", "video/webm"),
    (b"GIF8", "image/gif"),
]


def media_metadata(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Cheap payload metadata as pure Column expressions: size, crc32,
    magic-byte sniffing → media kind. No Python in the loop."""
    b = F.col(bytes_col)
    kind = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        hexpfx = magic.hex()
        kind = F.when(F.hex(F.substring(b, 1, len(magic)))
                      == F.lit(hexpfx.upper()), F.lit(name)).otherwise(kind)
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.octet_length(b).alias("n_bytes"),
        F.crc32(b).alias("crc32"),
        F.hex(F.substring(b, 1, 4)).alias("magic"),
        kind.alias("kind"))


def _decode_rgb(payload: bytes, h: int, w: int) -> np.ndarray:
    """STUB DECODER — deterministic fake pixels from the payload digest.

    Raises NotImplementedError for empty payloads to exercise the error
    path. Replace with PIL/cv2 when available; the calling plumbing
    (batching, schema, pruning) does not change."""
    if not payload:
        raise NotImplementedError("real image decode requires PIL/cv2")
    seed = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    reps = int(np.ceil(h * w * 3 / len(seed)))
    return np.tile(seed, reps)[: h * w * 3].reshape(h, w, 3)


DECODED_SCHEMA = ("id string, height int, width int, channels int, "
                  "mean_pixel double, ok boolean, error string")


def decode_image_stub(df: DataFrame, id_col: str, bytes_col: str,
                      height: int = 32, width: int = 32) -> DataFrame:
    """Arrow-batched decode → per-image stats. Columns are pruned to
    (id, bytes) before the exchange so parquet reads only the payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {"id": pdf["id"].astype(str).values,
                   "height": np.full(n, height, dtype=np.int32),
                   "width": np.full(n, width, dtype=np.int32),
                   "channels": np.full(n, 3, dtype=np.int32),
                   "mean_pixel": np.full(n, np.nan),
                   "ok": np.zeros(n, dtype=bool),
                   "error": np.array([None] * n, dtype=object)}
            for j in range(n):
                try:
                    img = _decode_rgb(bytes(pdf["bytes"].iloc[j]),
                                      height, width)
                    out["mean_pixel"][j] = float(img.mean())
                    out["ok"][j] = True
                except NotImplementedError as e:
                    out["error"][j] = str(e)
            yield pd.DataFrame(out)

    slim = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(bytes_col).alias("bytes"))
    return slim.mapInPandas(run, DECODED_SCHEMA)


def resize_stub(df: DataFrame, id_col: str, bytes_col: str,
                target_h: int, target_w: int) -> DataFrame:
    """Resize plumbing: decode-stub → nearest-neighbor resample → re-emit
    byte payload. Demonstrates binary-in/binary-out batch shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for j in range(len(pdf)):
                try:
                    img = _decode_rgb(bytes(pdf["bytes"].iloc[j]), 32, 32)
                except NotImplementedError:
                    continue
                ys = (np.arange(target_h) * 32 // target_h)
                xs = (np.arange(target_w) * 32 // target_w)
                resized = img[np.ix_(ys, xs)]
                ids.append(str(pdf["id"].iloc[j]))
                payloads.append(resized.tobytes())
            yield pd.DataFrame({"id": ids, "resized": payloads})

    slim = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(bytes_col).alias("bytes"))
    return slim.mapInPandas(run, "id string, resized binary")


def extract_features(df: DataFrame, id_col: str, bytes_col: str,
                     dim: int = 64) -> DataFrame:
    """Feature-extraction plumbing: payload → fixed-dim float vector
    (deterministic digest-fold stand-in for a real encoder). The output
    shape (id, array<float>) feeds the similarity operators directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for j in range(len(pdf)):
                payload = bytes(pdf["bytes"].iloc[j])
                digest = hashlib.sha512(payload).digest() * (
                    (dim * 4) // 64 + 1)
                v = (np.frombuffer(digest[: dim * 4], dtype=np.uint32)
                     .astype(np.float32) / np.float32(2**32))
                ids.append(str(pdf["id"].iloc[j]))
                vecs.append(v.tolist())
            yield pd.DataFrame({"id": ids, "features": vecs})

    slim = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(bytes_col).alias("bytes"))
    return slim.mapInPandas(run, "id string, features array<float>")


def frame_sample(df: DataFrame, id_col: str, bytes_col: str,
                 every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled "frame"
    (fixed-stride byte windows standing in for ffmpeg keyframes) —
    demonstrates the 1→N explode shape of frame extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for j in range(len(pdf)):
                payload = bytes(pdf["bytes"].iloc[j])
                for fi in range(min(max_frames,
                                    max(1, len(payload) // every_n_bytes))):
                    ids.append(str(pdf["id"].iloc[j]))
                    idxs.append(fi)
                    frames.append(
                        payload[fi * every_n_bytes:(fi + 1) * every_n_bytes])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs,
                                "frame": frames})

    slim = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(bytes_col).alias("bytes"))
    return slim.mapInPandas(run, "id string, frame_idx int, frame binary")
