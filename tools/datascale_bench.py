"""Data-scale probe: the full ClipsValidationJob at N clips (VERDICT r3
task #5 runs it at 4,000,000 ≈ 52 GB parquet — past page-cache comfort
on this 128 GiB host).

Records per run: wall seconds, clips/sec, rule + uniqueness violation
counts (for linearity vs the 100k-clip baseline: 7,475 rule / 95
uniqueness per 100k, up to injected-rate jitter), and PEAK RSS sampled
across the JVM + pyspark worker processes every 2 s (a /proc walk — no
psutil in the sandbox).

Generation (excluded from timing) uses the same deterministic
integer-hash synth as bench.py, so counts at any N are reproducible.

Usage: python tools/datascale_bench.py [n_clips] [repeats] [--keep]
                                       [--coldcache]
The generated table lands in /tmp/jio_spark_bench/clips_<N> and is
DELETED afterwards unless --keep (a 4M table is ~52 GB of /tmp).

``--coldcache`` drops the OS page cache (sync; echo 3 >
/proc/sys/vm/drop_caches — root-only) before every timed run, forcing
the decode scan into DISK-BOUND steady state. This is the sandbox's
honest stand-in for the "10M clips / 130 GB, past RAM" notch: the
bench host has 125 GiB RAM but only ~70 GB of free disk, so a table
that genuinely exceeds RAM cannot be materialized — evicting the cache
measures the same thing (every payload byte read from storage) at a
size that fits."""

import json
import os
import shutil
import statistics
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GEN_RUNNER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[{cpus}]")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from jio_spark.audio.synth import write_clips
t0 = time.time()
write_clips(spark, {n_clips}, {cache!r}, partitions={parts})
print(json.dumps({{"generated": {n_clips},
                   "gen_sec": round(time.time() - t0, 1)}}), flush=True)
spark.stop()
"""


def _proc_rss_kb() -> int:
    """Total RSS (kB) of THIS process tree — driver python, its JVM
    child, the JVM's pyspark.daemon workers. Membership is by PPID
    ancestry (a /proc walk), NOT by cmdline substring: on this shared
    bench host a foreign JVM or a concurrently running pyspark session
    would otherwise be summed into the recorded peak with no indication
    in the output. Best-effort (processes may exit mid-walk)."""
    ppid = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                # "pid (comm) state ppid ..." — comm may itself contain
                # spaces/parens, so split on the LAST ')'
                rest = f.read().rsplit(")", 1)[1].split()
            ppid[int(pid)] = int(rest[1])
        except (OSError, IndexError, ValueError):
            continue
    me = os.getpid()

    def in_tree(p: int) -> bool:
        seen = set()
        while p > 0 and p not in seen:
            if p == me:
                return True
            seen.add(p)
            p = ppid.get(p, 0)
        return False

    total = 0
    for pid in ppid:
        if not in_tree(pid):
            continue
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            continue
    return total


class PeakSampler:
    def __init__(self, interval=2.0):
        self.peak_kb = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, args=(interval,),
                                   daemon=True)

    def _loop(self, interval):
        while not self._stop.is_set():
            self.peak_kb = max(self.peak_kb, _proc_rss_kb())
            self._stop.wait(interval)

    def take(self) -> int:
        """Current peak (kB), then reset — gives each timed run ITS OWN
        peak instead of the cumulative max since run 0 (which made
        'did RSS grow across repeats?' unanswerable from the output).
        Best-effort vs the 2 s sampling thread: a sample spanning the
        reset instant lands in the next run's window, fine for a bench."""
        p, self.peak_kb = self.peak_kb, 0
        return p

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 4000000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    keep = "--keep" in sys.argv
    coldcache = "--coldcache" in sys.argv
    cache = f"/tmp/jio_spark_bench/clips_{n_clips}"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        # Generation runs in its OWN subprocess/session: its Python
        # workers' RSS high-water (payload synthesis) dies with it
        # instead of squatting under the timed runs, and a modest 16g
        # driver heap leaves the box to the workers.
        # Range-partition count scales with data (×16 bucket files each)
        # so row-group splits stay plentiful without drowning in tiny
        # files: 4M → 256 ranges → 4,096 files ≈ 13 MB / ~1k rows each.
        code = GEN_RUNNER.format(
            root=ROOT, cpus=cpus, n_clips=n_clips, cache=cache,
            parts=max(cpus * 2, n_clips // 15625))
        gen = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, check=True)
        print(gen.stdout.strip().splitlines()[-1], flush=True)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus * 2))
             .config("spark.driver.memory", "24g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.locality.wait", "0")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    E._ensure_workers(spark)
    from jio_spark.runner import (ClipsJobConfig, ClipsValidationJob,
                                  default_codec_dim)

    clips = spark.read.parquet(cache)
    job = ClipsValidationJob(
        spark, ClipsJobConfig(group_size=16, drift=True,
                              decode_source="files",
                              group_concurrency=4),
        codec_dim=default_codec_dim(spark))

    runs = []
    overall_peak_kb = 0
    with PeakSampler() as sampler:
        for i in range(repeats):
            sampler.take()  # drop anything sampled between runs
            if coldcache:
                # evict every cached page of the table (and everything
                # else — clean pages only, nothing is lost) so this
                # run's scan is storage-bound end to end
                subprocess.run(["sync"], check=True)
                try:
                    with open("/proc/sys/vm/drop_caches", "w") as f:
                        f.write("3\n")
                except OSError as e:
                    raise SystemExit(
                        f"--coldcache needs root (drop_caches): {e}")
            t0 = time.time()
            m = job.run(clips, table_root=cache)
            wall = time.time() - t0
            runs.append(wall)
            run_peak_kb = sampler.take()
            overall_peak_kb = max(overall_peak_kb, run_peak_kb)
            print(json.dumps({
                "run": i, "wall_sec": round(wall, 1),
                "clips_per_sec": round(n_clips / wall, 1),
                "rows": m["rows"],
                "violations": m["violations"],
                "uniqueness_violations": m["uniqueness_violations"],
                "peak_rss_gb": round(run_peak_kb / 1048576, 1),
            }), flush=True)

    med = statistics.median(runs)
    print(json.dumps({
        "n_clips": n_clips, "cpus": cpus, "coldcache": coldcache,
        "median_wall_sec": round(med, 1),
        "median_clips_per_sec": round(n_clips / med, 1),
        "peak_rss_gb": round(overall_peak_kb / 1048576, 1),
        "expected_linear_rule_viols_per_100k": 7475,
        "expected_linear_uniq_viols_per_100k": 95,
    }), flush=True)
    spark.stop()
    if not keep:
        shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
