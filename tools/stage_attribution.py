"""Per-stage attribution of the 8→32 scaling gap (VERDICT r3 task #3).

The full `ClipsValidationJob` measures ~0.58 scaling efficiency from
local[8] to local[32] on this single-socket host, against a 0.88 ceiling
measured for the bare decode kernel under multiprocessing (BENCH/
BASELINE.md round 1). This tool decomposes the gap: each stage of the job
is timed ALONE at both levels — same input, same session protocol as
tools/scaling_bench.py (warm-up + R timed runs, median) — so the lost
efficiency can be attributed per stage instead of guessed.

Stages (matching runner.ClipsValidationJob.run):
  scan      — raw parquet scan + count (pure IO/codegen floor)
  rules     — rule chain + referential + explode + count, audio off
              (the single-scan violations path, group_violations)
  decode    — payload-local decode+SNR via decode_check_files
  uniq      — uniqueness_check groupBy path
  drift     — snapshot(df, DRIFT_SPECS)

Tuning experiments (local[32] only, full job): shuffle.partitions at
1×/2×/4× cores and Arrow maxRecordsPerBatch 2k/10k (decode batch shape).

Usage: python tools/stage_attribution.py [n_clips] [repeats]
Prints one JSON line per (level, config); aggregate table goes to
BENCH/BASELINE.md.
"""

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, statistics, sys, time
os.environ["JIO_PIN_ARROW_CPU"] = "1"
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
cpus = {cpus}
shuffle_parts = {shuffle_parts}
arrow_batch = {arrow_batch}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(shuffle_parts))
         .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                 str(arrow_batch))
         .config("spark.driver.memory", "24g")
         .config("spark.locality.wait", "0")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
E._ensure_workers(spark)
from jio_spark.runner import (ClipsJobConfig, ClipsValidationJob,
                              default_codec_dim)
from jio_spark.audio.files import decode_check_files
from jio_spark.operators.uniqueness import uniqueness_check
from jio_spark.operators.drift import snapshot
from jio_spark.runner import DRIFT_SPECS

cache = {cache!r}
repeats = {repeats}
clips = spark.read.parquet(cache)
codec_dim = default_codec_dim(spark)

job_no_audio = ClipsValidationJob(
    spark, ClipsJobConfig(group_size=16, drift=False, audio_check=False,
                          observe_stats=False, group_concurrency=1),
    codec_dim=codec_dim)

def t_scan():
    clips.agg(F.sum("dur_ms")).collect()

def t_rules():
    job_no_audio.group_violations(clips).count()

def t_decode():
    decode_check_files(spark, cache).agg(
        F.sum(F.col("decode_ok").cast("long"))).collect()

def t_uniq():
    uniqueness_check(clips, "clip_id", layout="any").count()

def t_drift():
    snapshot(clips, DRIFT_SPECS).collect()

def t_full():
    job = ClipsValidationJob(
        spark, ClipsJobConfig(group_size=16, drift=True,
                              decode_source="files",
                              group_concurrency=4),
        codec_dim=codec_dim)
    job.run(clips, table_root=cache)

stages = {stages}
out = {{"cpus": cpus, "shuffle_parts": shuffle_parts,
        "arrow_batch": arrow_batch}}
fns = {{"scan": t_scan, "rules": t_rules, "decode": t_decode,
        "uniq": t_uniq, "drift": t_drift, "full": t_full}}
for name in stages:
    fn = fns[name]
    fn()  # warm-up
    runs = []
    for _ in range(repeats):
        t0 = time.time(); fn(); runs.append(time.time() - t0)
    out[name] = {{"runs": [round(x, 2) for x in runs],
                  "median": round(statistics.median(runs), 2)}}
print(json.dumps(out))
spark.stop()
"""


def run_level(cpus, cache, repeats, stages, shuffle_parts=None,
              arrow_batch=10000):
    code = RUNNER.format(root=ROOT, cpus=cpus, cache=cache,
                         repeats=repeats, stages=stages,
                         shuffle_parts=shuffle_parts or cpus,
                         arrow_batch=arrow_batch)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, check=True)
    line = out.stdout.strip().splitlines()[-1]
    print(line, flush=True)
    return json.loads(line)


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # bench.py keys its cache clips_{n}_p{parts}_v{hash} (partition count
    # + synth-source hash); accept any complete layout for this N, newest
    # first — same resolution as tools/scaling_bench.py. Explicit raise,
    # not assert: the no-data gate must survive `python -O`.
    import glob
    candidates = [
        c for c in [f"/tmp/jio_spark_bench/clips_{n_clips}"]
        + glob.glob(f"/tmp/jio_spark_bench/clips_{n_clips}_p*")
        if os.path.exists(os.path.join(c, "_SUCCESS"))]
    cache = max(candidates, default=None,
                key=lambda c: os.path.getmtime(
                    os.path.join(c, "_SUCCESS")))
    if cache is None:
        raise SystemExit(
            f"no /tmp/jio_spark_bench/clips_{n_clips}[_p*] with _SUCCESS "
            f"— generate first (JIO_BENCH_CLIPS={n_clips} python bench.py)")

    stages = ["scan", "rules", "decode", "uniq", "drift", "full"]
    r8 = run_level(8, cache, repeats, stages)
    r32 = run_level(32, cache, repeats, stages)

    eff = {s: round((r8[s]["median"] / r32[s]["median"]) / 4.0, 3)
           for s in stages if r32[s]["median"] > 0}
    print(json.dumps({"n_clips": n_clips, "efficiency_8_to_32": eff}))

    # tuning experiments at 32 cores, full job only
    for label, kw in [
        ("shuffle_2x", {"shuffle_parts": 64}),
        ("shuffle_4x", {"shuffle_parts": 128}),
        ("arrow_2k", {"arrow_batch": 2000}),
    ]:
        r = run_level(32, cache, repeats, ["full"], **kw)
        print(json.dumps({"experiment": label,
                          "full_median": r["full"]["median"]}))


if __name__ == "__main__":
    main()
