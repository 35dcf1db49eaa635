"""ADPCM decode-stage throughput evidence (round-4 codec addition).

Generates an all-ADPCM variant of the FIXTURES.md §1 clips table (same
deterministic per-index signal/sr/dur/transcript, codec forced to
``adpcm_ima``) plus a same-shape all-μ-law control, then times the full
``decode_check`` stage over each at ``local[cpus]``. The comparison
isolates what the stateful codec costs relative to the LUT codecs in the
REAL Arrow path (stacked per-batch recurrence, salting, SNR, transcript),
not in a numpy microbench.

Usage: python tools/adpcm_bench.py [n_clips=100000] [repeats=3] [cpus=32]
Prints one JSON line per codec arm.
"""

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
# no JIO_PIN_ARROW_CPU here: that flag is read only inside
# decode_check_files' worker closure; this bench drives the in-memory
# decode_check path, where it would be a silent no-op


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.memory", "24g")
             .config("spark.locality.wait", "0")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from jio_spark.audio.decode import decode_check

    def gen(codec: str, path: str) -> None:
        """Chunked distributed generation (≤2048-row frames — the same
        worker-memory bound datascale_bench learned the hard way)."""
        import pandas as pd

        def rows(batches):
            from jio_spark.audio.codecs import ENCODERS
            from jio_spark.audio.synth import (_row_params,
                                               expected_signal,
                                               expected_transcript)
            enc = ENCODERS[codec]
            for pdf in batches:
                ids = pdf["id"].tolist()
                for lo in range(0, len(ids), 2048):
                    chunk = ids[lo:lo + 2048]
                    out = {"clip_id": [], "bytes": [], "sr_hz": [],
                           "dur_ms": [], "codec": [], "transcript": []}
                    for i in chunk:
                        _, _, sr, dur, _, _ = _row_params(i, clean=True)
                        out["clip_id"].append(f"clip_{i:012d}")
                        out["bytes"].append(
                            bytes(enc(expected_signal(i, clean=True), sr)))
                        out["sr_hz"].append(sr)
                        out["dur_ms"].append(dur)
                        out["codec"].append(codec)
                        out["transcript"].append(expected_transcript(i))
                    yield pd.DataFrame(out)

        (spark.range(n).repartition(cpus * 4)
         .mapInPandas(rows, "clip_id string, bytes binary, sr_hz int, "
                            "dur_ms int, codec string, transcript string")
         .write.mode("overwrite").parquet(path))

    for codec in ("adpcm_ima", "ulaw"):
        path = f"/tmp/adpcm_bench_{codec}_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            t0 = time.time()
            gen(codec, path)
            print(f"# generated {codec} n={n} in {time.time() - t0:.1f}s",
                  file=sys.stderr)
        clips = spark.read.parquet(path)
        agg = [F.sum(F.col("decode_ok").cast("long")).alias("ok"),
               F.sum(F.col("snr_ok").cast("long")).alias("snr_ok")]
        decode_check(clips).agg(*agg).collect()          # warm-up
        walls, counts = [], None
        for _ in range(repeats):
            t0 = time.time()
            counts = decode_check(clips).agg(*agg).collect()[0]
            walls.append(time.time() - t0)
        med = statistics.median(walls)
        print(json.dumps({
            "codec": codec, "clips": n, "cpus": cpus,
            "wall_sec_median": round(med, 3),
            "runs": [round(w, 3) for w in walls],
            "clips_per_sec": round(n / med, 1),
            "decode_ok": counts["ok"], "snr_ok": counts["snr_ok"],
        }))


if __name__ == "__main__":
    main()
