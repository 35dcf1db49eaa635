"""Multimodal binary-column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The Spark-side plumbing — schemas, column pruning before the Arrow
exchange, batch shapes, partitioning — is real and tested. Two decode
paths:

* ``decode_image`` — a REAL stdlib+numpy decoder for uncompressed
  formats: 24-bit BI_RGB Windows BMP (bottom-up or top-down, 4-byte row
  padding, BGR→RGB) and binary PPM (P6, maxval≤255, '#' comments).
  Compressed formats (JPEG/PNG/…) report ``ok=false`` with an explicit
  error — the sandbox has no PIL/opencv/ffmpeg, and pretending otherwise
  would be a silent lie.
* ``decode_image_stub`` — the deterministic fake-pixel path for
  compressed payloads, clearly marked, so pipelines can exercise
  realistic data volumes end-to-end regardless of format.

Deterministic fixture generators (``synth_bmp``/``synth_ppm``) mirror
:mod:`jio_spark.audio.synth`: tests and the driver query decode REAL
bytes and pin exact pixel statistics. Audio is NOT stubbed — see
:mod:`jio_spark.audio`.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = ("id string, n_bytes long, crc32 long, magic string, "
                     "kind string")

_MAGIC = [
    (b"\xFF\xD8\xFF", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"\x1A\x45\xDF\xA3", "video/webm"),
    (b"GIF8", "image/gif"),
    (b"BM", "image/bmp"),
    (b"P6", "image/ppm"),
]

# RIFF is a CONTAINER: the form type at bytes 9-12 says what's inside
# (WAVE audio, WEBP images, 'AVI ' video) — sniffing the outer magic
# alone routed WebP/AVI payloads to the audio decode path
_RIFF_FORMS = [(b"WAVE", "audio/wav"), (b"WEBP", "image/webp"),
               (b"AVI ", "video/avi")]


def media_metadata(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Cheap payload metadata as pure Column expressions: size, crc32,
    magic-byte sniffing → media kind. No Python in the loop."""
    b = F.col(bytes_col)
    kind = F.lit("unknown")                 # real bytes, unrecognized format
    for magic, name in reversed(_MAGIC):
        hexpfx = magic.hex()
        kind = F.when(F.hex(F.substring(b, 1, len(magic)))
                      == F.lit(hexpfx.upper()), F.lit(name)).otherwise(kind)
    riff_kind = F.lit("application/riff")  # unknown form type
    for form, name in reversed(_RIFF_FORMS):
        riff_kind = F.when(F.hex(F.substring(b, 9, 4))
                           == F.lit(form.hex().upper()),
                           F.lit(name)).otherwise(riff_kind)
    kind = F.when(F.hex(F.substring(b, 1, 4))
                  == F.lit(b"RIFF".hex().upper()), riff_kind).otherwise(kind)
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.octet_length(b).alias("n_bytes"),
        F.crc32(b).alias("crc32"),
        F.hex(F.substring(b, 1, 4)).alias("magic"),
        # a NULL payload has no kind — 'unknown' would conflate missing
        # payloads with real-but-unrecognized formats in any GROUP BY
        # kind breakdown, and the sibling columns already stay NULL
        F.when(b.isNotNull(), kind).alias("kind"))


# -- real stdlib-only decoders ----------------------------------------------


def parse_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed (BI_RGB) Windows BMP to an RGB
    uint8 array of shape (h, w, 3). Pure numpy: the pixel block is one
    frombuffer + reshape + stride slice — no per-pixel Python. Handles
    bottom-up (positive height) and top-down rows and the 4-byte row
    padding mandated by the format."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("degenerate BMP dimensions")
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < off + stride * h:
        raise ValueError("truncated BMP pixel block")
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off)
    img = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[..., ::-1]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def parse_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval <= 255, '#' comments allowed in
    the header) to an RGB uint8 array of shape (h, w, 3)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos:pos + 1]
        if c == b"#":                       # comment to end of line
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end:end + 1].isspace():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ValueError("degenerate PPM dimensions")
    if maxval <= 0:
        raise ValueError("degenerate PPM maxval")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    # exactly ONE whitespace byte separates maxval from the raster (PPM
    # spec) — but it must actually BE whitespace, and a text-mode writer
    # turns it into CRLF; skipping one byte blindly would decode every
    # pixel shifted by one, ok=true with corrupt data (every other
    # malformation in this decoder raises)
    sep = payload[pos:pos + 1]
    if not sep.isspace():
        raise ValueError("PPM header: maxval not followed by whitespace")
    pos += 1
    if sep == b"\r" and payload[pos:pos + 1] == b"\n":
        pos += 1
    need = w * h * 3
    if len(payload) < pos + need:
        raise ValueError("truncated PPM pixel block")
    return np.frombuffer(payload, dtype=np.uint8, count=need,
                         offset=pos).reshape(h, w, 3).copy()


def decode_payload(payload: bytes) -> np.ndarray:
    """Real decode of an uncompressed image payload (BMP / P6 PPM).
    Compressed formats raise NotImplementedError — the honest boundary:
    this sandbox has no PIL/cv2, and the calling plumbing is identical
    whichever decoder backs this function."""
    if payload[:2] == b"BM":
        return parse_bmp(payload)
    if payload[:2] == b"P6":
        return parse_ppm(payload)
    raise NotImplementedError(
        "compressed image decode requires PIL/cv2 (payload magic: "
        f"{payload[:4].hex() if payload else '<empty>'})")


def synth_bmp(seed: int, h: int = 12, w: int = 9) -> bytes:
    """Deterministic valid bottom-up 24-bit BMP fixture: pixel (y, x, c)
    = (seed*7 + y*5 + x*3 + c*11) mod 256. Same formula as
    :func:`synth_pixels`, so tests pin exact decode output."""
    img = synth_pixels(seed, h, w)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    off = 14 + 40
    header = (b"BM" + (off + len(pix)).to_bytes(4, "little")
              + b"\x00\x00\x00\x00" + off.to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little")
              + len(pix).to_bytes(4, "little")
              + (2835).to_bytes(4, "little") * 2
              + (0).to_bytes(4, "little") * 2)
    return header + pix


def synth_ppm(seed: int, h: int = 10, w: int = 7) -> bytes:
    """Deterministic valid P6 PPM fixture with a header comment."""
    img = synth_pixels(seed, h, w)
    return (f"P6\n# jio_spark fixture {seed}\n{w} {h}\n255\n"
            .encode("ascii") + img.tobytes())


def synth_pixels(seed: int, h: int, w: int) -> np.ndarray:
    """The shared fixture pixel formula (uint8, shape (h, w, 3))."""
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                          indexing="ij")
    return ((seed * 7 + y * 5 + x * 3 + c * 11) % 256).astype(np.uint8)


def _id_obj(series: pd.Series) -> np.ndarray:
    """String-or-None id array: pandas astype(str) renders a SQL NULL as
    the literal 'None', silently conflating every null-id row under one
    fake id — preserve the null instead (media_metadata's pure-expr path
    keeps it NULL, and the two frames must agree)."""
    return np.array([None if pd.isna(v) else str(v) for v in series],
                    dtype=object)


def decode_image(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Arrow-batched REAL decode (BMP/PPM) → per-image stats with actual
    header dimensions. Columns are pruned to (id, bytes) before the
    exchange so parquet reads only the payload; unknown/compressed
    formats come back ``ok=false`` with the error string."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {"id": _id_obj(pdf["id"]),
                   "height": np.zeros(n, dtype=np.int32),
                   "width": np.zeros(n, dtype=np.int32),
                   "channels": np.full(n, 3, dtype=np.int32),
                   "mean_pixel": np.full(n, np.nan),
                   "ok": np.zeros(n, dtype=bool),
                   "error": np.array([None] * n, dtype=object)}
            for j in range(n):
                payload = pdf["bytes"].iloc[j]
                if payload is None:
                    out["error"][j] = "null payload"
                    continue
                try:
                    img = decode_payload(bytes(payload))
                    out["height"][j] = img.shape[0]
                    out["width"][j] = img.shape[1]
                    out["mean_pixel"][j] = float(img.mean())
                    out["ok"][j] = True
                except (NotImplementedError, ValueError) as e:
                    out["error"][j] = str(e)
            yield pd.DataFrame(out)

    slim = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(bytes_col).alias("bytes"))
    return slim.mapInPandas(run, DECODED_SCHEMA)


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
            out = {"id": _id_obj(pdf["id"]),
                   "height": np.full(n, height, dtype=np.int32),
                   "width": np.full(n, width, dtype=np.int32),
                   "channels": np.full(n, 3, dtype=np.int32),
                   "mean_pixel": np.full(n, np.nan),
                   "ok": np.zeros(n, dtype=bool),
                   "error": np.array([None] * n, dtype=object)}
            for j in range(n):
                payload = pdf["bytes"].iloc[j]
                if payload is None:
                    # bad data, not a task-killing bytes(None) crash —
                    # same rule as decode_image's real path
                    out["error"][j] = "null payload"
                    continue
                try:
                    img = _decode_rgb(bytes(payload), height, width)
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
        # the resample index arrays depend only on the fixed target
        # dims — built once per task, not once per image
        ys = np.arange(target_h) * 32 // target_h
        xs = np.arange(target_w) * 32 // target_w
        for pdf in batches:
            ids, payloads = [], []
            for j in range(len(pdf)):
                payload = pdf["bytes"].iloc[j]
                if payload is None:
                    continue  # undecodable rows are skipped, not crashes
                try:
                    img = _decode_rgb(bytes(payload), 32, 32)
                except NotImplementedError:
                    continue
                resized = img[np.ix_(ys, xs)]
                iv = pdf["id"].iloc[j]
                ids.append(None if pd.isna(iv) else str(iv))
                payloads.append(resized.tobytes())
            # object dtype explicitly: an all-skipped batch would yield
            # empty float64 columns Arrow can't cast to binary
            yield pd.DataFrame({"id": pd.Series(ids, dtype=object),
                                "resized": pd.Series(payloads,
                                                     dtype=object)})

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
                raw = pdf["bytes"].iloc[j]
                if raw is None:
                    continue  # no features for a null payload, no crash
                payload = bytes(raw)
                digest = hashlib.sha512(payload).digest() * (
                    (dim * 4) // 64 + 1)
                v = (np.frombuffer(digest[: dim * 4], dtype=np.uint32)
                     .astype(np.float32) / np.float32(2**32))
                iv = pdf["id"].iloc[j]
                ids.append(None if pd.isna(iv) else str(iv))
                vecs.append(v.tolist())
            # object dtype explicitly: an all-skipped batch would yield
            # empty float64 columns Arrow can't cast to list<float>
            yield pd.DataFrame({"id": pd.Series(ids, dtype=object),
                                "features": pd.Series(vecs,
                                                      dtype=object)})

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
                raw = pdf["bytes"].iloc[j]
                if raw is None:
                    continue  # no frames from a null payload, no crash
                payload = bytes(raw)
                if not payload:
                    continue  # a zero-length payload has no frames —
                    # the max(1, …) floor is for short-but-nonempty ones
                iv = pdf["id"].iloc[j]
                sid = None if pd.isna(iv) else str(iv)
                for fi in range(min(max_frames,
                                    max(1, len(payload) // every_n_bytes))):
                    ids.append(sid)
                    idxs.append(fi)
                    frames.append(
                        payload[fi * every_n_bytes:(fi + 1) * every_n_bytes])
            # object/int dtypes explicitly: an all-skipped batch would
            # yield empty float64 columns Arrow can't cast
            yield pd.DataFrame({"id": pd.Series(ids, dtype=object),
                                "frame_idx": pd.Series(idxs,
                                                       dtype="int64"),
                                "frame": pd.Series(frames,
                                                   dtype=object)})

    slim = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(bytes_col).alias("bytes"))
    return slim.mapInPandas(run, "id string, frame_idx int, frame binary")
