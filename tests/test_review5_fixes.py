"""Regression pins for the session-7 review findings (round 4).

Each test reproduces the exact failure shape a code-review pass found and
the fix closed; references name the fixed site. The findings, in the
order reviewed:

1.  stats.py — quantile slack derived from TOTAL rows false-flags a
    healthy sketch on a high-null column (both percentile functions are
    non-null-only).
2.  files.py — a wanted-set built from the runner's string-typed
    ``distinct()`` fallback never matched integral-parsing hive dirs, so
    the decode silently covered zero files.
3.  writers.py — ``Decimal`` partition values (beyond ±2^63) crashed the
    manifest/run.json dump AFTER the group's work committed.
4.  runner.py — the drift step was never manifest-recorded, so every
    resume repeated both whole-table snapshot scans.
5.  schema.py — contract/actual type strings differing only in cosmetic
    whitespace or nested aliases ("decimal(10, 0)", "array<long>") were
    flagged as contract breaks.
6.  stats.py — string-column min/max/mean length aggregates were paid
    for in the scan and silently dropped from ``column_stats`` output.
7.  audio/decode.py — the decode error string was coalesced into EVERY
    co-failing check's ``actual``, hiding the measured SNR dB and
    misattributing parse errors to codec/sr/dur checks.
8.  audio/files.py — the split listing and the footer row audit each
    read every surviving file's footer (two remote round-trips per file
    on object storage).
"""

import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from jio_spark.audio.synth import clips_frame, write_clips
from jio_spark.operators.stats import column_stats, column_stats_bounds
from jio_spark.operators.schema import schema_contract_violations
from jio_spark.sinks.writers import Manifest


# ---------------------------------------------------------------- 1
def test_quantile_bound_uses_nonnull_count(spark):
    """2000 rows, 4 non-null values far apart: slack from the TOTAL row
    count (3/2000) puts the sketch's actual-data-value answer outside
    the exact interpolated band at every interior percentile; slack from
    the non-null count (3/4) is the rank width the sketch actually
    guarantees."""
    rows = [(float(i) * 1000.0,) for i in range(4)]
    rows += [(None,)] * 1996
    df = spark.createDataFrame(rows, "x double")
    out = {r["col_name"]: r for r in column_stats_bounds(df).collect()}
    assert out["x"]["quantiles_ok"] is True
    assert out["x"]["distinct_ok"] is True


def test_stats_bounds_strings_only_frame(spark):
    """Zero numeric columns → zero non-null-count aggregates; the guard
    must skip the empty ``agg()`` (which raises) and still emit the
    vacuous quantile booleans."""
    df = spark.createDataFrame([("a",), ("b",)], "s string")
    out = {r["col_name"]: r for r in column_stats_bounds(df).collect()}
    assert out["s"]["quantiles_ok"] is True


# ---------------------------------------------------------------- 2
def test_split_listing_matches_string_form_of_int_dirs(spark, tmp_path):
    """The runner's distinct() fallback reads partition values from the
    DataFrame column with partition type inference disabled → strings.
    The dirs (bucket_id=0/) parse integral. Both forms must match, and
    the matched (string) form must be carried back as the split's pval
    so the decode output's partition column equals the real values."""
    from jio_spark.audio.files import list_row_group_splits
    root = str(tmp_path / "clips.parquet")
    write_clips(spark, 120, root, partitions=3)

    by_int = list_row_group_splits(root, partition_filter=[0, 1])
    by_str = list_row_group_splits(root, partition_filter=["0", "1"])
    assert len(by_int) > 0
    assert len(by_str) == len(by_int)
    assert sorted(p for p, _, _ in by_str) == sorted(
        p for p, _, _ in by_int)
    # pval carries the MATCHED form: ints for the int filter, the raw
    # string form for the string filter
    assert {pv for _, _, pv in by_int} == {0, 1}
    assert {pv for _, _, pv in by_str} == {"0", "1"}


# ---------------------------------------------------------------- 3
def test_manifest_serializes_integral_decimal(tmp_path):
    """Partition values parsed beyond ±2^63 are Decimal (mirroring
    Spark's decimal(p,0) hive inference); the manifest dump must accept
    them — and a resumed run's set-membership must match, so they
    round-trip as ints."""
    m = Manifest(str(tmp_path))
    big = Decimal(2) ** 64
    m.mark("g_big", [big], {"rows": 1})
    rec = m.completed()["g_big"]
    assert rec["partitions"] == [2 ** 64]
    assert big in m.completed_partitions()  # Decimal(n) == int(n)

    # non-integral Decimals are NOT silently stringified: that would
    # corrupt resume matching — they raise exactly as before
    with pytest.raises(TypeError):
        m.mark("g_frac", [Decimal("1.5")], {})


# ---------------------------------------------------------------- 4
def test_drift_step_is_manifest_recorded_and_resume_skips(
        spark, tmp_path, monkeypatch):
    """A fully-completed run's resume must not repeat the drift
    snapshot scans: the step's RESULT rows ride the manifest record.
    The skip is proven by poisoning the snapshot function — the resume
    passes only if it never calls it."""
    import jio_spark.runner as runner_mod
    from jio_spark.operators.drift import snapshot
    from jio_spark.runner import (ClipsJobConfig, ClipsValidationJob,
                                  DRIFT_SPECS)

    path = str(tmp_path / "clips.parquet")
    write_clips(spark, 400, path, partitions=4)
    df = spark.read.parquet(path)
    baseline = snapshot(clips_frame(spark, 400, clean=True, partitions=4),
                        DRIFT_SPECS)
    out = str(tmp_path / "out")
    cfg = ClipsJobConfig(group_size=16, audio_check=False, drift=True)
    job = ClipsValidationJob(spark, cfg, baseline_snapshot=baseline)
    m1 = job.run(df, output_root=out)
    assert "_global_drift" in Manifest(out).completed()

    def boom(*a, **k):
        raise AssertionError("resume re-ran the drift snapshot scan")

    monkeypatch.setattr(runner_mod, "snapshot", boom)
    m2 = job.run(df, output_root=out, resume=True)
    assert m2["drift"] == m1["drift"]
    assert len(m1["drift"]) > 0


def test_drift_without_baseline_recorded_for_resume(
        spark, tmp_path, monkeypatch):
    """Baseline-less runs still pay the snapshot scan — the (empty)
    result must be recorded so resume skips the scan too."""
    import jio_spark.runner as runner_mod
    from jio_spark.runner import ClipsJobConfig, ClipsValidationJob

    path = str(tmp_path / "clips.parquet")
    write_clips(spark, 200, path, partitions=2)
    df = spark.read.parquet(path)
    out = str(tmp_path / "out")
    cfg = ClipsJobConfig(group_size=16, audio_check=False, drift=True)
    job = ClipsValidationJob(spark, cfg)
    m1 = job.run(df, output_root=out)
    assert m1["drift"] == []
    assert "_global_drift" in Manifest(out).completed()

    def boom(*a, **k):
        raise AssertionError("resume re-ran the drift snapshot scan")

    monkeypatch.setattr(runner_mod, "snapshot", boom)
    m2 = job.run(df, output_root=out, resume=True)
    assert m2["drift"] == []


# ---------------------------------------------------------------- 5
def test_schema_contract_equates_cosmetic_type_spellings(spark):
    df = spark.createDataFrame(
        [(Decimal(1), [2])], "a decimal(10,0), b array<bigint>")
    # whitespace + nested alias: both satisfied contracts
    assert schema_contract_violations(
        df, {"a": "decimal(10, 0)", "b": "array<long>"}) == []
    # a REAL mismatch still flags
    viols = schema_contract_violations(df, {"a": "decimal(12,0)"})
    assert [v["rule_name"] for v in viols] == ["schema_type"]


def test_schema_contract_unparseable_type_flags_loudly(spark):
    """A contract type Spark cannot parse must surface as a violation
    naming both sides — never crash, never silently pass."""
    df = spark.createDataFrame([("x",)], "a string")
    viols = schema_contract_violations(df, {"a": "no_such_type!!"})
    assert [v["rule_name"] for v in viols] == ["schema_type"]
    assert viols[0]["expected"] == "no_such_type!!"


# ---------------------------------------------------------------- 6
def test_column_stats_surfaces_string_length_stats(spark):
    df = spark.createDataFrame(
        [("abc", 1, b"xy"), ("hello", 2, b"z"), (None, 3, None)],
        "s string, n int, p binary")
    out = {r["col_name"]: r for r in column_stats(df).collect()}
    assert out["s"]["min_len"] == 3
    assert out["s"]["max_len"] == 5
    assert out["s"]["mean_len"] == 4.0
    # the length stats are string-only; other types stay null there
    assert out["n"]["min_len"] is None and out["p"]["min_len"] is None
    # and the binary byte stats still ride along
    assert out["p"]["total_bytes"] == 3


# ---------------------------------------------------------------- 7
def test_decode_violation_actuals_are_per_check(spark):
    """`actual` is the engine's Go-%v "the value" contract: the measured
    dB for a measured-SNR failure, the parser error only for the checks
    it belongs to, static text for codec/sr/dur (the error string is
    never about them)."""
    from jio_spark.audio.decode import DECODE_RESULT_SCHEMA, \
        decode_violations
    nan = float("nan")
    rows = [
        # measured SNR below threshold — everything else fine
        ("c1", True, True, True, True, 12.5, False, True, 100, None),
        # parse failure: every check fails, error carries the detail
        ("c2", False, False, False, False, nan, False, False, 0,
         "RIFF header truncated"),
        # transcript mismatch only, reference located (no error string)
        ("c3", True, True, True, True, 35.0, True, False, 100, None),
    ]
    res = spark.createDataFrame(rows, DECODE_RESULT_SCHEMA)
    v = {(r["clip_id"], r["rule_name"]): r["actual"]
         for r in decode_violations(res).collect()}

    assert v[("c1", "snr")] == "12.50dB"                  # measured dB
    assert v[("c2", "decode")] == "RIFF header truncated"
    # unmeasured SNR / unlocatable reference → the error explains why
    assert v[("c2", "snr")] == "RIFF header truncated"
    assert v[("c2", "transcript_equality")] == "RIFF header truncated"
    # the parse error must NOT be misattributed to the metadata checks
    assert v[("c2", "codec_consistency")] == \
        "declared codec != container format"
    assert v[("c2", "sr_consistency")] == \
        "declared sr_hz != decoded sample rate"
    assert v[("c3", "transcript_equality")] == "transcript != reference"
    assert ("c1", "transcript_equality") not in v
    assert ("c3", "snr") not in v


# ---------------------------------------------------------------- 8
def test_footer_cache_shares_one_read_per_file(spark, tmp_path,
                                               monkeypatch):
    """The split listing and the row-integrity audit over the same
    partition group must read each surviving footer ONCE when the
    runner threads its per-group cache through both."""
    import pyarrow.parquet as pq
    from jio_spark.audio.files import (footer_row_counts,
                                       list_row_group_splits)
    root = str(tmp_path / "clips.parquet")
    write_clips(spark, 120, root, partitions=2)

    real = pq.ParquetFile
    calls = []

    def counting(path, *a, **k):
        calls.append(path)
        return real(path, *a, **k)

    monkeypatch.setattr(pq, "ParquetFile", counting)
    cache = {}
    splits = list_row_group_splits(root, footer_cache=cache)
    total, unreadable = footer_row_counts(root, footer_cache=cache)
    assert splits and total == 120 and unreadable == 0
    n_files = len({p for p, _, _ in splits})
    assert len(calls) == n_files                 # once per file, not twice
    assert len(set(calls)) == n_files


# ----------------------------------------------------------------
# second review sweep (synth/codecs/vectors/engine/multimodal/dedup)
# ----------------------------------------------------------------

def test_parse_ppm_crlf_separator_and_garbage_header():
    """A P6 header whose maxval separator came out as CRLF (text-mode
    writer) must decode the raster unshifted, and a non-whitespace byte
    after maxval must raise — blind single-byte skipping decoded every
    pixel shifted by one with ok=true."""
    import numpy as np
    from jio_spark.multimodal.binary import parse_ppm, synth_pixels

    img = synth_pixels(3, 4, 5)
    good = b"P6\n5 4\n255\n" + img.tobytes()
    crlf = b"P6\n5 4\n255\r\n" + img.tobytes()
    assert np.array_equal(parse_ppm(good), img)
    assert np.array_equal(parse_ppm(crlf), img)
    # lone \r separator (old-Mac text mode) still decodes unshifted
    assert np.array_equal(parse_ppm(b"P6\n5 4\n255\r" + img.tobytes()),
                          img)
    # payload ending right after maxval: the "separator" is empty, not
    # whitespace — must raise, not read a raster from nothing
    with pytest.raises(ValueError, match="whitespace"):
        parse_ppm(b"P6\n5 4\n255")
    # garbage glued to maxval is absorbed into the int token and raises
    # there — either way, never a silent shifted decode
    with pytest.raises(ValueError):
        parse_ppm(b"P6\n5 4\n255x" + img.tobytes())


def test_media_metadata_null_payload_kind_is_null(spark):
    """A NULL payload has no kind: 'unknown' conflated missing payloads
    with real-but-unrecognized formats; the sibling columns already
    stay NULL."""
    from jio_spark.multimodal import media_metadata
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01\x02junk")), (2, None)],
        "id int, p binary")
    rows = {r["id"]: r for r in media_metadata(df, "id", "p").collect()}
    assert rows["1"]["kind"] == "unknown"       # real bytes, no known magic
    assert rows["2"]["kind"] is None
    assert rows["2"]["n_bytes"] is None and rows["2"]["crc32"] is None


def test_exact_duplicates_null_id_invariant(spark):
    """n_docs counts every row of the group; doc_ids lists only the
    non-null ids — the documented reconciliation rule is n_docs, never
    len(doc_ids)."""
    from jio_spark.operators import exact_duplicates
    df = spark.createDataFrame(
        [("a", "same text"), ("b", "same text"), (None, "same text")],
        "doc_id string, text string")
    rows = exact_duplicates(df).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 3
    assert rows[0]["doc_ids"] == ["a", "b"]
