"""Deterministic synthetic clips table — the north-star input shape
(BASELINE.json input_hint: clip_id string, bytes binary, sr_hz int,
dur_ms int, codec string, transcript string), generated exactly per
FIXTURES.md §1, fully distributed (each row derives from its index alone
via integer hashing — no driver-side data, no shared RNG state, so the
same table materializes identically at any partitioning and any scale).

Anomaly injection rates (FIXTURES.md §1): duplicates 0.1%, corrupt payload
0.5%, sr mismatch 0.5%, dur mismatch 0.5%, unknown codec 0.2%, mutated
transcript 0.5%, empty transcript 1%, NULL transcript 0.5%.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .codecs import (DEFAULT_AMPLITUDE, ENCODERS, _one_period,
                     encode_stereo_wav, synth_wave, wrap_extensible)

CLIPS_SCHEMA = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
                "codec string, transcript string, bucket_id int")

_SR_CHOICES = np.array([8000, 16000, 22050, 44100])
_SR_CUM = np.array([0.2, 0.7, 0.9, 1.0])          # p=[.2,.5,.2,.1]
_CODECS = np.array(["pcm_s16le", "ulaw", "alaw"])
_CODEC_CUM = np.array([0.7, 0.9, 1.0])            # p=[.7,.2,.1]

_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "zero", "one", "two",
    "three", "four", "five", "six", "seven", "eight", "nine", "red",
    "green", "blue", "amber", "coral", "ivory", "jade", "onyx", "pearl",
    "ruby", "slate", "topaz", "north", "south", "east", "west", "river",
    "ridge", "valley", "summit", "harbor", "meadow", "forest", "prairie",
    "canyon", "mesa", "tundra", "atoll",
]  # 64 words


def _mix(i: int, salt: int) -> int:
    """splitmix64-style integer hash: the per-row deterministic RNG."""
    z = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
    return z ^ (z >> 31)


def _u(i: int, salt: int) -> float:
    """uniform [0,1) keyed by (row index, salt)."""
    return (_mix(i, salt) >> 11) / float(1 << 53)


def expected_transcript(i: int) -> str:
    """Reference transcript for clip index i (2-12 words from the vocab)."""
    n_words = 2 + _mix(i, 100) % 11
    return " ".join(_VOCAB[_mix(i, 101 + w) % 64] for w in range(n_words))


def _row_params(i: int, clean: bool):
    """All deterministic parameters for clip i; ``clean=True`` suppresses
    anomaly injection (the drift-baseline generation, FIXTURES.md §3)."""
    freq = 220.0 + (i % 16) * 55.0
    sr = int(_SR_CHOICES[int(np.searchsorted(_SR_CUM, _u(i, 1)))])
    # lognormal(mu=ln 3000, sigma=0.6) via Box-Muller on two hash uniforms
    u1 = max(_u(i, 2), 1e-12)
    u2 = _u(i, 3)
    gauss = math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.pi * u2)
    dur = int(min(max(math.exp(math.log(3000.0) + 0.6 * gauss), 200), 30000))
    codec = str(_CODECS[int(np.searchsorted(_CODEC_CUM, _u(i, 4)))])
    clip_id = f"clip_{i:012d}"
    transcript = expected_transcript(i)

    if not clean:
        if _u(i, 10) < 0.001 and i >= 7:                 # duplicate id
            clip_id = f"clip_{i - 7:012d}"
        if _u(i, 14) < 0.002:                            # unknown codec
            codec = "opus"
    return clip_id, freq, sr, dur, codec, transcript


def expected_signal(i: int, clean: bool = False) -> np.ndarray:
    """Reference PCM for clip i — the per-row invariant's oracle
    (input_hint: decoded-PCM allclose at SNR>=30dB vs the reference)."""
    _, freq, sr, dur, _, _ = _row_params(i, clean)
    return synth_wave(freq, dur, sr)


def expected_period(i: int, clean: bool = False):
    """(one exact reference period, expected sample count) for clip i —
    the compact form of :func:`expected_signal` consumed by the fused
    blocked SNR check (codecs.snr_db_vs_period): the reference is never
    tiled to full length. Falls back to the full signal as a length-n
    'period' if the frequency were ever non-integral."""
    _, freq, sr, dur, _, _ = _row_params(i, clean)
    n = int(round(sr * dur / 1000.0))
    if float(freq).is_integer():
        return _one_period(freq, sr, DEFAULT_AMPLITUDE), n
    return synth_wave(freq, dur, sr), n


def make_row(i: int, clean: bool = False):
    """One clip row (FIXTURES.md §1), anomalies injected unless clean."""
    clip_id, freq, sr, dur, codec, transcript = _row_params(i, clean)
    pcm = synth_wave(freq, dur, sr)
    enc = ENCODERS.get(codec, ENCODERS["pcm_s16le"])
    raw = enc(pcm, sr)

    decl_sr, decl_dur = sr, dur
    if not clean:
        if _u(i, 11) < 0.005:                            # corrupt payload
            raw = raw[:max(8, len(raw) // 3)]
        if _u(i, 12) < 0.005:                            # sr mismatch
            decl_sr = int(_SR_CHOICES[(int(np.searchsorted(
                _SR_CUM, _u(i, 1))) + 1) % 4])
        if _u(i, 13) < 0.005:                            # dur mismatch
            decl_dur = dur + 500
        tu = _u(i, 15)
        if tu < 0.005:                                   # mutated transcript
            # the replacement draw is uniform over the SAME vocab, so
            # ~1/64 of this bucket replaces a word with itself (no-op):
            # the effective mutation rate is 0.5%·63/64 ≈ 0.492%.
            # Deliberately left as-is — fixture bytes are pinned across
            # rounds (oracle VALUES tables + recorded violation counts
            # derive from them); rate-derived expectations must use the
            # effective rate (FIXTURES.md documents this corner).
            words = transcript.split(" ")
            words[_mix(i, 16) % len(words)] = _VOCAB[_mix(i, 17) % 64]
            transcript = " ".join(words)
        elif tu < 0.015:                                 # empty
            transcript = ""
        elif tu < 0.020:                                 # NULL
            transcript = None
    return (clip_id, bytearray(raw), decl_sr, decl_dur, codec, transcript,
            i % 16)


#: extended-corpus codec mix (FIXTURES.md §1b): every codec family the
#: engine decodes, ADPCM deliberately heavy (20%) so its block-stacked
#: cost is visible in the mixed-codec bench arm round-over-round
_MIX_CODECS = np.array(["pcm_s16le", "ulaw", "alaw", "adpcm_ima",
                        "pcm_u8", "pcm_s24le", "pcm_f32le"])
_MIX_CUM = np.array([0.25, 0.40, 0.50, 0.70, 0.80, 0.90, 1.0])
# p = [.25,.15,.10,.20,.10,.10,.10]

#: §1b layout rates: stereo (dual-mono) on 25% of ALL rows — including
#: ADPCM, whose stereo block layout decodes for real since round 5 —
#: and a WAVE_FORMAT_EXTENSIBLE rewrap on 20% of per-sample-codec rows
#: (ADPCM rows stay canonical: its 20-byte WAVEFORMATEX fmt chunk is
#: not the 16-byte form wrap_extensible rewraps)
_MIX_STEREO_P = 0.25
_MIX_EXT_P = 0.20

#: per-codec SNR gates for runs over the §1b mixed corpus: the honest
#: IMA ADPCM floor across the fixture (freq 220-1045 Hz × sr 8-44.1 kHz)
#: grid is 21.1 dB (high-slew sines at 8 kHz — codec physics, measured
#: over the full grid in tests), so the blanket 30 dB gate would flag
#: healthy clips; every other codec's clean floor is ≥35.9 dB (G.711)
#: and the PCM widths round-trip exactly
MIX_SNR_GATES = {"adpcm_ima": 20.0, "default": 30.0}


def make_row_mixed(i: int):
    """One clip row of the EXTENDED codec corpus (FIXTURES.md §1b):
    same deterministic signal/sr/dur/transcript parameters as
    :func:`make_row` (so the decode reference lookup keyed off the id
    index works unchanged), but the codec drawn from the FULL decode
    surface — all four PCM widths, G.711, IMA ADPCM — with dual-mono
    stereo and WAVE_FORMAT_EXTENSIBLE container variants, and the same
    anomaly-injection rates as §1. Ids carry the ``mix_`` prefix so an
    extended corpus can sit beside the pinned §1 corpus without id
    collisions (and without touching the §1 bytes, which are pinned
    across rounds). Salts 20-22 are §1b's own draws; every §1 salt keeps
    its meaning."""
    _, freq, sr, dur, _, transcript = _row_params(i, clean=False)
    clip_id = f"mix_{i:012d}"
    codec = str(_MIX_CODECS[int(np.searchsorted(_MIX_CUM, _u(i, 20)))])
    pcm = synth_wave(freq, dur, sr)
    stereo = _u(i, 21) < _MIX_STEREO_P
    raw = (encode_stereo_wav(pcm, sr, codec) if stereo
           else ENCODERS[codec](pcm, sr))
    if codec != "adpcm_ima" and _u(i, 22) < _MIX_EXT_P:
        # ADPCM stays canonical: its 20-byte WAVEFORMATEX fmt chunk is
        # not the 16-byte form wrap_extensible rewraps
        raw = wrap_extensible(raw)
    # §1 anomaly injections, same salts and rates as make_row
    if _u(i, 10) < 0.001 and i >= 7:                     # duplicate id
        clip_id = f"mix_{i - 7:012d}"
    if _u(i, 14) < 0.002:                                # unknown codec
        codec = "opus"
    decl_sr, decl_dur = sr, dur
    if _u(i, 11) < 0.005:                                # corrupt payload
        raw = raw[:max(8, len(raw) // 3)]
    if _u(i, 12) < 0.005:                                # sr mismatch
        decl_sr = int(_SR_CHOICES[(int(np.searchsorted(
            _SR_CUM, _u(i, 1))) + 1) % 4])
    if _u(i, 13) < 0.005:                                # dur mismatch
        decl_dur = dur + 500
    tu = _u(i, 15)
    if tu < 0.005:                                       # mutated transcript
        words = transcript.split(" ")
        words[_mix(i, 16) % len(words)] = _VOCAB[_mix(i, 17) % 64]
        transcript = " ".join(words)
    elif tu < 0.015:                                     # empty
        transcript = ""
    elif tu < 0.020:                                     # NULL
        transcript = None
    return (clip_id, bytearray(raw), decl_sr, decl_dur, codec, transcript,
            i % 16)


def mixed_clips_frame(spark: SparkSession, n_rows: int,
                      partitions: Optional[int] = None) -> DataFrame:
    """Distributed §1b extended-codec clips table — same mapInPandas
    chunked generation discipline as :func:`clips_frame`."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].values
            for j in range(0, len(ids), 2048):
                rows = [make_row_mixed(int(i)) for i in ids[j:j + 2048]]
                yield pd.DataFrame(
                    rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms",
                                   "codec", "transcript", "bucket_id"])

    return (spark.range(0, n_rows, numPartitions=parts)
            .mapInPandas(gen, CLIPS_SCHEMA))


def clips_frame(spark: SparkSession, n_rows: int, clean: bool = False,
                partitions: Optional[int] = None) -> DataFrame:
    """Distributed clips table: ``spark.range`` drives per-index generation
    inside ``mapInPandas`` — rows never touch the driver, generation scales
    with executors, and the same (i → row) mapping holds at any scale."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Emit ≤2048-row frames instead of one frame per 10k-row Arrow
        # batch: a worker's peak RSS is O(chunk payload), not O(batch).
        # At 4M-clip generation the unchunked version peaked ~3 GB per
        # worker (32 workers + the JVM OOM'd a 125 GiB box); chunked,
        # workers stay <1 GB at any table size.
        for pdf in batches:
            ids = pdf["id"].values
            for j in range(0, len(ids), 2048):
                rows = [make_row(int(i), clean) for i in ids[j:j + 2048]]
                yield pd.DataFrame(
                    rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms",
                                   "codec", "transcript", "bucket_id"])

    return (spark.range(0, n_rows, numPartitions=parts)
            .mapInPandas(gen, CLIPS_SCHEMA))


def write_clips(spark: SparkSession, n_rows: int, path: str,
                clean: bool = False, partitions: Optional[int] = None
                ) -> None:
    """Materialize a clips table as parquet partitioned by bucket_id —
    the local stand-in for the Iceberg partition layout (SURVEY.md §1.2)."""
    (clips_frame(spark, n_rows, clean, partitions)
     .write.mode("overwrite").partitionBy("bucket_id").parquet(path))
