"""Minimal RIFF/WAVE codecs in pure numpy + struct — the sandbox has no
soundfile/librosa/scipy (SURVEY.md §7 environment facts), and the reference
has no audio at all; formats follow the public RIFF/WAVE and ITU-T G.711
specifications.

Supported WAVE format tags:
* 1  — PCM signed 16-bit little-endian (``pcm_s16le``)
* 6  — ITU-T G.711 A-law
* 7  — ITU-T G.711 μ-law

G.711 companding is implemented as vectorized numpy over int16 arrays
(standard bias-133/segment encoding for μ-law, 13-bit segment encoding for
A-law) — decode is exact table lookup, encode matches the canonical
reference tables.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

# ---------------------------------------------------------------------------
# G.711 μ-law

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM → uint8 μ-law (ITU-T G.711)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    x = np.abs(x)
    x = np.minimum(x, _ULAW_CLIP) + _ULAW_BIAS
    exp = (np.floor(np.log2(x)) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = (x >> (exp + 3)) & 0x0F
    u = ~(sign | (exp << 4) | mant) & 0xFF
    return u.astype(np.uint8)


def _ulaw_decode_arith(u: np.ndarray) -> np.ndarray:
    """uint8 μ-law → int16 PCM (reference arithmetic form; used to build
    the 256-entry LUT below)."""
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = ((mant << 3) + _ULAW_BIAS) << exp
    x = x - _ULAW_BIAS
    return np.where(sign, -x, x).astype(np.int16)


_ULAW_LUT = _ulaw_decode_arith(np.arange(256, dtype=np.uint8))


def ulaw_decode(u: np.ndarray) -> np.ndarray:
    """uint8 μ-law → int16 PCM via 256-entry table lookup — one gather per
    sample instead of ~8 int32 array ops; the decode hot path is
    memory-bandwidth-bound at high core counts (BENCH/BASELINE.md)."""
    return _ULAW_LUT[u]


# ---------------------------------------------------------------------------
# G.711 A-law

_ALAW_CLIP = 32635


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM → uint8 A-law (ITU-T G.711)."""
    x = pcm.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    x = np.minimum(np.abs(x), _ALAW_CLIP)
    big = x >= 256
    exp = np.where(big,
                   np.floor(np.log2(np.maximum(x >> 8, 1))).astype(np.int32)
                   + 1, 0)
    exp = np.clip(exp, 0, 7)
    mant = np.where(exp == 0, x >> 4, (x >> (exp + 3)) & 0x0F)
    a = (sign | (exp << 4) | mant) ^ 0x55
    return a.astype(np.uint8)


def _alaw_decode_arith(a: np.ndarray) -> np.ndarray:
    """uint8 A-law → int16 PCM (reference arithmetic form; LUT source)."""
    a = a.astype(np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    x = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, x, -x).astype(np.int16)


_ALAW_LUT = _alaw_decode_arith(np.arange(256, dtype=np.uint8))


def alaw_decode(a: np.ndarray) -> np.ndarray:
    """uint8 A-law → int16 PCM via 256-entry table lookup (see
    ulaw_decode)."""
    return _ALAW_LUT[a]


# ---------------------------------------------------------------------------
# RIFF/WAVE container

_FMT_PCM16 = 1
_FMT_ALAW = 6
_FMT_ULAW = 7

_CODEC_FMT = {"pcm_s16le": _FMT_PCM16, "alaw": _FMT_ALAW, "ulaw": _FMT_ULAW}
_FMT_CODEC = {v: k for k, v in _CODEC_FMT.items()}


def _wav_bytes(payload: bytes, fmt: int, sr: int, bits: int) -> bytes:
    block = bits // 8
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(payload), b"WAVE",
        b"fmt ", 16, fmt, 1, sr, sr * block, block, bits,
        b"data", len(payload))
    return header + payload


def encode_pcm16_wav(pcm: np.ndarray, sr: int) -> bytes:
    """int16 samples → WAV (format tag 1)."""
    return _wav_bytes(pcm.astype("<i2").tobytes(), _FMT_PCM16, sr, 16)


def encode_ulaw_wav(pcm: np.ndarray, sr: int) -> bytes:
    """int16 samples → μ-law WAV (format tag 7)."""
    return _wav_bytes(ulaw_encode(pcm).tobytes(), _FMT_ULAW, sr, 8)


def encode_alaw_wav(pcm: np.ndarray, sr: int) -> bytes:
    """int16 samples → A-law WAV (format tag 6)."""
    return _wav_bytes(alaw_encode(pcm).tobytes(), _FMT_ALAW, sr, 8)


def parse_wav(raw: bytes) -> Tuple[np.ndarray, int, str]:
    """WAV bytes → (coded samples as a ZERO-COPY view, sample rate, codec
    name) without decoding: int16 view for pcm_s16le, uint8 view of the
    companded bytes for G.711. One sample per element either way, so
    ``len()`` is the decoded sample count.

    Raises ValueError on malformed/truncated input (drives the corrupt-
    payload violations in FIXTURES.md §1).

    The RIFF chunk list is WALKED per spec, not assumed canonical: a
    valid WAV may carry an 18/40-byte fmt chunk (WAVEFORMATEX/EXTENSIBLE)
    or fact/LIST chunks before data — the table's bytes come from
    arbitrary encoders, not just this module's 44-byte writer — and a
    buffer whose fmt fields are garbage must be rejected, not unpacked
    from a fixed offset."""
    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = channels = sr = bits = None
    payload = None
    pos = 12
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        (clen,) = struct.unpack("<I", raw[pos + 4:pos + 8])
        body = raw[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16 or len(body) < 16:
                raise ValueError("malformed fmt chunk")
            (fmt, channels, sr, _, _, bits) = struct.unpack(
                "<HHIIHH", body[:16])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            if len(body) < clen:
                raise ValueError("truncated data chunk")
            payload = body
            break
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if payload is None:
        raise ValueError("missing data chunk")
    dlen = len(payload)
    if channels != 1:
        raise ValueError(f"unsupported channel count {channels}")
    if fmt == _FMT_PCM16:
        if bits != 16 or dlen % 2:
            raise ValueError("malformed pcm16 payload")
        return np.frombuffer(payload, dtype="<i2"), sr, _FMT_CODEC[fmt]
    if fmt in (_FMT_ULAW, _FMT_ALAW):
        # G.711 is 8-bit by definition: a fmt chunk declaring 16-bit
        # A-law/mu-law is malformed and must surface as ONE decode
        # violation, not be read one-sample-per-byte (doubling
        # n_samples and misattributing the defect to dur/snr)
        if bits != 8:
            raise ValueError("malformed g711 payload")
        return np.frombuffer(payload, dtype=np.uint8), sr, _FMT_CODEC[fmt]
    raise ValueError(f"unsupported format tag {fmt}")


def decode_coded(samples: np.ndarray, codec: str) -> np.ndarray:
    """Coded-sample view from :func:`parse_wav` → int16 PCM."""
    if codec == "ulaw":
        return ulaw_decode(samples)
    if codec == "alaw":
        return alaw_decode(samples)
    return samples


def decode_wav(raw: bytes) -> Tuple[np.ndarray, int, str]:
    """WAV bytes → (int16 PCM, sample rate, codec name). Delegates header
    and payload validation to :func:`parse_wav` so the malformed-input
    behavior (which drives the corrupt-payload violations, FIXTURES.md §1)
    cannot drift between the parse-only and full-decode paths."""
    coded, sr, codec = parse_wav(raw)
    return decode_coded(coded, codec), sr, codec


ENCODERS = {"pcm_s16le": encode_pcm16_wav, "ulaw": encode_ulaw_wav,
            "alaw": encode_alaw_wav}


_PERIOD_CACHE: dict = {}


def _one_period(freq_hz: float, sr: int, amplitude: float) -> np.ndarray:
    """One exact period of the quantized sine. sin(2π f n/sr) repeats
    exactly every L = sr/gcd(f, sr) samples (f·L/sr is an integer), so a
    clip of any duration is np.tile of this — ~40× cheaper than evaluating
    np.sin per sample, and still a pure function of (f, sr, dur)."""
    import math
    key = (freq_hz, sr, amplitude)
    p = _PERIOD_CACHE.get(key)
    if p is None:
        g = math.gcd(int(round(freq_hz)), sr)
        L = sr // g if g else sr
        t = np.arange(L, dtype=np.float64) / sr
        x = amplitude * np.sin(2.0 * np.pi * freq_hz * t)
        p = np.round(x * 32767.0).astype(np.int16)
        _PERIOD_CACHE[key] = p
    return p


#: fixture sine amplitude — shared by synth_wave's default and the fused
#: SNR check's reference period (synth.expected_period), so the two can't
#: silently diverge and fail every clip against the 30 dB threshold
DEFAULT_AMPLITUDE = 0.5


def synth_wave(freq_hz: float, dur_ms: int, sr: int,
               amplitude: float = DEFAULT_AMPLITUDE) -> np.ndarray:
    """Deterministic sine clip as int16 PCM (FIXTURES.md §1 `bytes` spec).
    Integral frequencies take the exact tiled-period fast path."""
    n = int(round(sr * dur_ms / 1000.0))
    if float(freq_hz).is_integer():
        p = _one_period(freq_hz, sr, amplitude)
        reps = n // len(p) + 1
        return np.tile(p, reps)[:n]
    t = np.arange(n, dtype=np.float64) / sr
    x = amplitude * np.sin(2.0 * np.pi * freq_hz * t)
    return np.round(x * 32767.0).astype(np.int16)


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of decoded vs reference (float domain).

    Computed in float32 with BLAS dot products: int16 inputs are exact in
    float32, and pairwise-summed sdot keeps the relative error ~1e-7 —
    irrelevant against a 30 dB threshold — while halving the memory
    traffic of the float64 form (this is the hottest loop of the decode
    stage; see BENCH/BASELINE.md bandwidth note)."""
    n = min(len(reference), len(decoded))
    if n == 0:
        return float("-inf")
    ref = reference[:n].astype(np.float32)
    noise = ref - decoded[:n].astype(np.float32)
    p_sig = float(np.dot(ref, ref))
    p_noise = float(np.dot(noise, noise))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * float(np.log10(p_sig / p_noise))


_SNR_BLOCK = 1 << 17  # samples per block: f32 temporaries stay ~1.5 MB


def snr_db_vs_period(coded: np.ndarray, codec: str,
                     period: np.ndarray, n_ref: int) -> float:
    """SNR of ``decode(coded)`` against a periodic reference, equivalent
    to ``snr_db(np.tile(period, ...)[:n_ref], decode_coded(coded, codec))``
    but FUSED and cache-blocked: the decoded clip and the tiled reference
    are never materialized — each ≤128k-sample block is decoded, cast, and
    dot-producted while resident in L2. At 32 cores on one socket the
    unfused form is DRAM-bandwidth-bound (~24 bytes/sample of temporary
    traffic vs ~3 here); this is what keeps the decode stage scaling with
    cores (BENCH/BASELINE.md)."""
    n = min(n_ref, len(coded))
    if n == 0:
        return float("-inf")
    lut = {"ulaw": _ULAW_LUT, "alaw": _ALAW_LUT}.get(codec)
    plen = len(period)
    blk = min(_SNR_BLOCK, n)
    reps = (blk + plen) // plen + 1
    buf = np.tile(period, reps)[:blk + plen].astype(np.float32)
    p_sig = p_noise = 0.0
    off = 0
    while off < n:
        m = min(blk, n - off)
        d = coded[off:off + m]
        d = (d if lut is None else lut[d]).astype(np.float32)
        r = buf[off % plen:off % plen + m]
        nz = r - d
        p_sig += float(np.dot(r, r))
        p_noise += float(np.dot(nz, nz))
        off += m
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * float(np.log10(p_sig / p_noise))
