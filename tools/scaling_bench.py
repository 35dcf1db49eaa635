"""Two-parallelism scaling evidence (BASELINE.json north_rule: throughput
scaling efficiency >= 0.8 between N and 4N executors; sandbox proxy is
local[8] vs local[32] on the same input).

Protocol: for each parallelism level, one Spark session runs the full
rule-set pass R times after a warm-up; the MEDIAN wall time is recorded
(the sandbox host shows 30-50% run-to-run variance under contention). The
decode stage — the dominant CPU consumer — is also measured alone.

Usage: python tools/scaling_bench.py [n_clips] [repeats]
Writes one JSON line per level to stdout; aggregate with the BENCH doc.
"""

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, statistics, sys, time
# fixed-core measurement: stop pyarrow's implicit per-worker thread pool
# from borrowing cores (opt-in clamp in audio/files.py)
os.environ["JIO_PIN_ARROW_CPU"] = "1"
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.driver.memory", "24g")
         .config("spark.locality.wait", "0")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
E._ensure_workers(spark)
from jio_spark.runner import (ClipsJobConfig, ClipsValidationJob,
                              default_codec_dim)
from jio_spark.audio.files import decode_check_files
import pyspark.sql.functions as F

cache = {cache!r}
clips = spark.read.parquet(cache)
job = ClipsValidationJob(
    spark, ClipsJobConfig(group_size=16, drift=True,
                          decode_source="files",
                          group_concurrency=4),
    codec_dim=default_codec_dim(spark))

job.run(clips, table_root=cache)  # warm-up
full, dec = [], []
for _ in range({repeats}):
    t0 = time.time(); job.run(clips, table_root=cache)
    full.append(time.time() - t0)
    t0 = time.time()
    decode_check_files(spark, cache).agg(
        F.sum(F.col("decode_ok").cast("long"))).collect()
    dec.append(time.time() - t0)
print(json.dumps({{"cpus": cpus,
                   "full_runs": [round(x, 2) for x in full],
                   "full_median": round(statistics.median(full), 2),
                   "decode_runs": [round(x, 2) for x in dec],
                   "decode_median": round(statistics.median(dec), 2)}}))
spark.stop()
"""


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    # bench.py keys the cache by partition count and synth-source hash
    # (clips_{n}_p{parts}_v{hash}); accept any complete layout for this
    # N — the scaling pair reads ONE table at both levels, so which
    # layout was cached doesn't matter — but prefer the most recently
    # generated so a corpus from an edited generator wins over a stale
    # sibling version
    import glob
    candidates = [
        c for c in [f"/tmp/jio_spark_bench/clips_{n_clips}"]
        + glob.glob(f"/tmp/jio_spark_bench/clips_{n_clips}_p*")
        if os.path.exists(os.path.join(c, "_SUCCESS"))]
    cache = max(candidates, default=None,
                key=lambda c: os.path.getmtime(
                    os.path.join(c, "_SUCCESS")))
    if cache is None:
        # explicit raise, not assert: the no-data gate must survive -O
        raise SystemExit(
            f"no /tmp/jio_spark_bench/clips_{n_clips}[_p*] with _SUCCESS "
            f"— generate first (JIO_BENCH_CLIPS={n_clips} python bench.py)")
    results = {}
    levels = (n_small, n_small * 4)
    for cpus in levels:
        code = RUNNER.format(root=ROOT, cpus=cpus, cache=cache,
                             repeats=repeats)
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, check=True)
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(line, flush=True)
    lo, hi = levels
    f8, f32 = results[lo]["full_median"], results[hi]["full_median"]
    d8, d32 = results[lo]["decode_median"], results[hi]["decode_median"]
    print(json.dumps({
        "n_clips": n_clips,
        "levels": list(levels),
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        "full_clips_per_sec": {str(lo): round(n_clips / f8, 1),
                               str(hi): round(n_clips / f32, 1)},
        "full_efficiency": round((f8 / f32) / 4.0, 3),
        "decode_efficiency": round((d8 / d32) / 4.0, 3),
    }))


if __name__ == "__main__":
    main()
