"""spark-submit entry point for the full validation job (north_rule:
"ships as spark-submit --py-files modules").

Package + submit:

    python tools/make_pyfiles.py                 # -> dist/jio_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/jio_spark.zip \\
        tools/submit_job.py \\
        --input /path/clips_parquet --output /path/run_out \\
        [--resume] [--no-audio] [--baseline /path/snapshot]

The job reads the clips table (parquet locally, Iceberg via --format
iceberg on a cluster with the runtime jars), runs the full rule set, and
writes violations / metrics / manifest under --output; --resume re-runs
only partition groups missing from the manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python tools/submit_job.py` runs (arg validation, local dev)
# see only the script dir on sys.path; APPEND the repo root as a
# fallback so the --py-files zip still wins on a real cluster
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-audio", action="store_true")
    ap.add_argument("--no-reference", action="store_true",
                    help="skip SNR/transcript checks vs the synth oracle")
    ap.add_argument("--baseline", default=None,
                    help="drift baseline snapshot parquet")
    ap.add_argument("--group-size", type=int, default=8)
    ap.add_argument("--decode-source", default="dataframe",
                    choices=["dataframe", "files"],
                    help="'files' = payload-local decode: workers read the "
                         "bytes column straight from parquet row groups "
                         "instead of shipping payloads through a shuffle "
                         "(parquet tables only; the measured-fast path)")
    ap.add_argument("--on-corrupt", default="fail",
                    choices=["fail", "violation"],
                    help="'violation': an unreadable file/row group in the "
                         "files-mode decode becomes ONE structured decode "
                         "violation instead of failing the job (pair with "
                         "spark.sql.files.ignoreCorruptFiles on the scan "
                         "side; the runner's row_integrity audit flags the "
                         "rows that setting silently drops)")
    ap.add_argument("--schema-contract", default="clips",
                    choices=["clips", "off"],
                    help="preflight the table schema against the clips "
                         "contract on the driver (metadata-only) before "
                         "any job launches")
    ap.add_argument("--schema-warn", action="store_true",
                    help="record schema-contract breaks as metrics instead "
                         "of failing the run")
    ap.add_argument("--rule-counts", action="store_true",
                    help="carry per-rule evaluated/passed/failed tallies "
                         "in the run metrics (rides the stats observe — "
                         "no extra scan; measured +9%% full-job wall at "
                         "sf0.1, so opt-in)")
    ap.add_argument("--violations-sink", default="full",
                    choices=["full", "exemplars"],
                    help="'exemplars': bound the persisted violations at "
                         "10^12-row scale — keep K smallest-clip_id rows "
                         "per (partition, rule_path, rule_name), each "
                         "carrying the group's EXACT total (one window "
                         "pass over the violation rows; no second scan)")
    ap.add_argument("--violations-exemplars", type=int, default=20,
                    help="exemplar rows kept per group in exemplars mode")
    ap.add_argument("--uniqueness-layout", default="any",
                    choices=["any", "clustered"],
                    help="'clustered' = shuffle-free boundary-exchange "
                         "uniqueness for clip_id-sort-ordered tables "
                         "(Iceberg sort order); 'any' = exact groupBy")
    ap.add_argument("--on-unclustered", default="fallback",
                    choices=["warn", "error", "trust", "fallback"],
                    help="what to do when the clustered path's free "
                         "runtime range certificate finds the layout not "
                         "key-clustered: 'fallback' (default here) reruns "
                         "via the exact groupBy — always exact; 'trust' "
                         "for layouts exact by construction (hash-bucketed "
                         "or equal-keys-colocated writes)")
    ap.add_argument("--snr-threshold", default="30.0",
                    help="SNR gate in dB: a number, or a JSON object of "
                         "per-codec gates with a 'default' fallback, "
                         "e.g. '{\"adpcm_ima\": 26, \"default\": 30}' — "
                         "lossy codecs have different honest floors")
    args = ap.parse_args(argv)
    try:
        snr_threshold = json.loads(args.snr_threshold)
    except json.JSONDecodeError:
        ap.error(f"--snr-threshold is neither a number nor JSON: "
                 f"{args.snr_threshold!r}")
    # one validator for CLI and library (bool-as-int trap, non-number
    # dict values, typo'd codec keys) — fail at parse time, not inside
    # an executor task
    from jio_spark.audio.decode import validate_gates
    try:
        validate_gates(snr_threshold)
    except ValueError as exc:
        ap.error(f"--snr-threshold: {exc}")
    if args.decode_source == "files" and args.format != "parquet":
        # the runner would silently route to the dataframe decode (an
        # Iceberg location is a catalog name, not a listable dir), which
        # also makes --on-corrupt violation inert — the same loud-knob
        # rule as the mode validations: a config that cannot mean what
        # it says is an error, not a silent downgrade
        ap.error("--decode-source files requires --format parquet "
                 "(payload-local decode reads parquet row groups; with "
                 "--format iceberg it would silently fall back to the "
                 "dataframe decode and --on-corrupt would have no "
                 "effect)")

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("jio_spark-validate").getOrCreate()

    from jio_spark.runner import (ClipsJobConfig, ClipsValidationJob,
                                  default_codec_dim)
    from jio_spark.sources.tables import TableAdapter

    adapter = TableAdapter(fmt=args.format)
    df = adapter.read(spark, args.input)
    baseline = (spark.read.parquet(args.baseline)
                if args.baseline else None)
    from jio_spark.operators.schema import CLIPS_SCHEMA_CONTRACT
    contract = None
    if args.schema_contract == "clips":
        contract = dict(CLIPS_SCHEMA_CONTRACT)
        if args.no_audio:
            # metadata-only runs legitimately target tables without the
            # payload column; don't fail the preflight over a column the
            # run never reads
            contract.pop("bytes")
    cfg = ClipsJobConfig(group_size=args.group_size,
                         audio_check=not args.no_audio,
                         check_reference=not args.no_reference,
                         decode_source=args.decode_source,
                         decode_on_corrupt=args.on_corrupt,
                         schema_contract=contract,
                         schema_contract_mode=("warn" if args.schema_warn
                                               else "fail"),
                         table_format=args.format,
                         uniqueness_layout=args.uniqueness_layout,
                         uniqueness_on_unclustered=args.on_unclustered,
                         observe_rule_counts=args.rule_counts,
                         violations_sink=args.violations_sink,
                         violations_exemplars=args.violations_exemplars,
                         snr_threshold=snr_threshold,
                         drift=baseline is not None)
    job = ClipsValidationJob(spark, cfg,
                             codec_dim=default_codec_dim(spark),
                             baseline_snapshot=baseline)
    # table_root enables metadata-only partition discovery (hive dir /
    # Iceberg .partitions listing — never a distinct() table scan) and
    # payload-local decode; args.input spans the full table per run()'s
    # contract (this entry point reads df from it directly above)
    metrics = job.run(df, output_root=args.output, resume=args.resume,
                      table_root=args.input)
    print(json.dumps({k: v for k, v in metrics.items() if k != "drift"}))
    spark.stop()


if __name__ == "__main__":
    main()
