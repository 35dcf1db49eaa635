"""Adversarial end-to-end corruption ACCOUNTING: every injected defect is
attributed to exactly the right clip and rule family, and no clean clip is
ever flagged — zero false positives AND zero false negatives over the full
``ClipsValidationJob`` (rules + decode/SNR + referential + uniqueness).

Existing tests verify anomaly *rates* (test_audio.py) and resume semantics
(test_runner_resume.py); this suite pins exact per-clip attribution: a
randomized corruption plan is applied to a provably-clean corpus
(test_clean_generation_all_pass), the full job runs end-to-end through the
sink, and the read-back violation frames must partition EXACTLY into the
plan. Reference semantics being mirrored: jio reports one structured error
per failed rule with the failing path (/root/reference/error.go:9-31,
object.go:139-169); here that contract is extended to the audio/table
checks the north rule adds.
"""

import random

import pytest

from jio_spark.audio.codecs import ENCODERS
from jio_spark.audio.synth import CLIPS_SCHEMA, make_row
from jio_spark.runner import (ClipsJobConfig, ClipsValidationJob,
                              default_codec_dim)

N = 360  # clean corpus size; big enough for every corruption class x seeds

# corruption -> the EXACT set of (rule_path, rule_name) violations it must
# produce, and no others. Derived from the engine's documented semantics:
#  * a truncated payload is ONE defect and asserts exactly the decode
#    violation — the downstream decode-derived checks never ran, so
#    their flags carry the not-asserted value (one-violation-per-defect,
#    decode.py:_decode_batches matching files.py:_corrupt_frame)
#  * an unparseable clip_id fails the id regex rule AND the reference
#    checks that need the id to locate the oracle (snr, transcript)
DECODE_CASCADE = {("bytes", "decode")}
EXPECT = {
    "truncate_payload": DECODE_CASCADE,
    "zero_body": {("bytes", "snr")},
    "swap_declared_sr": {("sr_hz", "sr_consistency")},
    "invalid_declared_sr": {("sr_hz", "valid"), ("sr_hz", "sr_consistency")},
    "inflate_declared_dur": {("dur_ms", "dur_consistency")},
    "bad_clip_id": {("clip_id", "regex"), ("bytes", "snr"),
                    ("transcript", "transcript_equality")},
    "unknown_codec": {("codec", "referential"),
                      ("codec", "codec_consistency")},
    "mutated_transcript": {("transcript", "transcript_equality")},
    "null_transcript": {("transcript", "transcript_equality")},
    "empty_transcript": {("transcript", "min"),
                         ("transcript", "transcript_equality")},
    "duplicate_row": set(),  # full-row copy: only uniqueness fires (below)
}
KINDS = list(EXPECT)


def _corrupt(row, kind, rng):
    """Apply one corruption to a clean make_row tuple; returns the new row
    (clip_id, bytes, sr_hz, dur_ms, codec, transcript, bucket_id)."""
    clip_id, raw, sr, dur, codec, transcript, bucket = row
    raw = bytearray(raw)
    if kind == "truncate_payload":
        raw = raw[: max(8, len(raw) // 3)]
    elif kind == "zero_body":
        # wreck half the samples: the WAV header survives (decode ok) but
        # SNR collapses far below the 30 dB threshold
        body = 44 + (len(raw) - 44) // 4
        raw[body: body + (len(raw) - body) // 2] = bytes(
            (len(raw) - body) // 2)
    elif kind == "swap_declared_sr":
        sr = {8000: 16000, 16000: 22050, 22050: 44100, 44100: 8000}[sr]
    elif kind == "invalid_declared_sr":
        sr = 12345
    elif kind == "inflate_declared_dur":
        # stay inside the rule's [200, 30000] range so ONLY the decode
        # consistency check fires, never the range rule
        dur = dur + 500 if dur + 500 <= 29999 else dur - 500
    elif kind == "bad_clip_id":
        clip_id = f"CLIP-{rng.randrange(10**6)}"
    elif kind == "unknown_codec":
        codec = "opus"
    elif kind == "mutated_transcript":
        words = transcript.split(" ")
        words[rng.randrange(len(words))] = "xxcorruptxx"
        transcript = " ".join(words)
    elif kind == "null_transcript":
        transcript = None
    elif kind == "empty_transcript":
        transcript = ""
    elif kind == "duplicate_row":
        pass  # handled by the caller (emits a second copy of the row)
    return (clip_id, raw, sr, dur, codec, transcript, bucket)


def _build_corpus(seed):
    """Clean corpus + randomized corruption plan. Returns (rows, plan)
    where plan maps clip_id -> corruption kind (duplicate targets keep
    their original id — the uniqueness check reports the id itself)."""
    rng = random.Random(seed)
    # ≥2 victims per corruption class, disjoint targets
    victims = rng.sample(range(N), len(KINDS) * 3)
    plan = {}
    rows = []
    vi = 0
    assignments = {}
    for kind in KINDS:
        for _ in range(3):
            assignments[victims[vi]] = kind
            vi += 1
    for i in range(N):
        row = make_row(i, clean=True)
        kind = assignments.get(i)
        if kind is None:
            rows.append(row)
            continue
        if kind == "duplicate_row":
            rows.append(row)
            rows.append(row)  # exact copy: decode/rules pass, id duplicated
            plan[row[0]] = kind
        else:
            new = _corrupt(row, kind, rng)
            rows.append(new)
            plan[new[0]] = kind
    return rows, plan


@pytest.mark.parametrize("seed,decode_source", [
    (11, "dataframe"), (202, "dataframe"),
    # the payload-local production path must attribute identically:
    # workers re-read the bytes column from parquet row groups, so its
    # failure mode is missing/duplicated CLIPS, not wrong rules
    (11, "files"),
])
def test_exact_corruption_attribution(spark, tmp_path, seed, decode_source):
    rows, plan = _build_corpus(seed)
    src = str(tmp_path / f"adv_{seed}_{decode_source}")
    out = str(tmp_path / f"adv_out_{seed}_{decode_source}")
    (spark.createDataFrame(rows, CLIPS_SCHEMA)
     .write.mode("overwrite").partitionBy("bucket_id").parquet(src))
    df = spark.read.parquet(src)

    job = ClipsValidationJob(
        spark, ClipsJobConfig(group_size=16, uniqueness_layout="any",
                              decode_source=decode_source),
        codec_dim=default_codec_dim(spark))
    metrics = job.run(df, output_root=out, table_root=src)
    assert metrics["rows"] == len(rows)

    got = {}
    for r in (spark.read.parquet(f"{out}/violations")
              .select("clip_id", "rule_path", "rule_name").collect()):
        got.setdefault(r["clip_id"], set()).add(
            (r["rule_path"], r["rule_name"]))

    # 1) zero false positives: every flagged clip is in the plan
    flagged_not_planned = set(got) - set(plan)
    assert flagged_not_planned == set(), flagged_not_planned
    # 2) zero false negatives + exact rule attribution
    for cid, kind in plan.items():
        want = EXPECT[kind]
        if not want:
            assert cid not in got, (cid, kind, got.get(cid))
        else:
            assert got.get(cid, set()) == want, (cid, kind, got.get(cid))

    # 3) uniqueness: exactly the duplicated ids, nothing else
    uniq = {r["clip_id"]
            for r in spark.read.parquet(f"{out}/uniqueness_violations")
            .select("clip_id").collect()}
    dup_ids = {cid for cid, k in plan.items() if k == "duplicate_row"}
    assert uniq == dup_ids


def test_clean_corpus_zero_violations_end_to_end(spark, tmp_path):
    """The no-corruption control: the full job through the sink reports
    nothing at all (the group-level assertion exists in test_audio; this
    pins the whole pipeline including referential + uniqueness + sink)."""
    rows = [make_row(i, clean=True) for i in range(200)]
    src = str(tmp_path / "clean_src")
    (spark.createDataFrame(rows, CLIPS_SCHEMA)
     .write.mode("overwrite").partitionBy("bucket_id").parquet(src))
    df = spark.read.parquet(src)
    job = ClipsValidationJob(
        spark, ClipsJobConfig(group_size=16, uniqueness_layout="any"),
        codec_dim=default_codec_dim(spark))
    # no sink: a zero-violation run writes no parquet files (dynamic
    # partition overwrite of an empty frame), so assert via the counted
    # metrics path instead of a read-back
    metrics = job.run(df, table_root=src)
    assert metrics["rows"] == 200
    assert metrics["violations"] == 0
    assert metrics["uniqueness_violations"] == 0
