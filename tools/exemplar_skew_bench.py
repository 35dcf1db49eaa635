"""Measured evidence for the exemplar-cap salt guard (SCALE.md
"violations output" row): build a violations frame with one HOT group —
one rule failing on every row, the shape a naive
Window.partitionBy(bucket_id, rule_path, rule_name) serializes onto a
single task — and time the shipped salted two-phase cap against the
naive single-window plan on the same input.

Usage: python tools/exemplar_skew_bench.py [rows] [reps]
Prints one JSON line with medians for both plans plus the max rows any
single phase-1 window group held (the bound the guard exists to enforce).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from jio_spark.sinks.writers import exemplar_cap, exemplar_order_key


def naive_cap(viols, k):
    """The pre-guard single-window plan (what e1932d5 replaced)."""
    keys = ["bucket_id", "rule_path", "rule_name"]
    wp = Window.partitionBy(*keys)
    wo = wp.orderBy("clip_id", "message")
    return (viols
            .withColumn("exemplar_rank", F.row_number().over(wo))
            .withColumn("group_violations", F.count(F.lit(1)).over(wp))
            .where(F.col("exemplar_rank") <= int(k)))


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # one hot group: every row fails the same rule in the same partition
    # (plus a sprinkle of small groups so the plan isn't degenerate)
    viols = (spark.range(rows)
             .select(F.format_string("c%012d", F.col("id")).alias("clip_id"),
                     F.when(F.col("id") % 100 < 97, "dur_ms")
                      .otherwise(F.format_string("p%d", F.col("id") % 3))
                      .alias("rule_path"),
                     F.lit("min").alias("rule_name"),
                     F.lit("x").alias("expected"),
                     F.lit("y").alias("actual"),
                     F.format_string("m%d", F.col("id") % 7).alias("message"),
                     F.lit(0).alias("bucket_id"))
             .persist())
    viols.count()  # materialize outside the timed region

    # interleave the arms round-robin so host contention hits both alike
    # (BENCH/BASELINE.md host-contention protocol)
    ts = {"salted": [], "naive": []}
    counts = {}
    for _ in range(reps):
        for name, fn in (("salted", lambda: exemplar_cap(viols, 20)),
                         ("naive", lambda: naive_cap(viols, 20))):
            t0 = time.monotonic()
            counts[name] = fn().count()
            ts[name].append(time.monotonic() - t0)
    salted_s, n1 = statistics.median(ts["salted"]), counts["salted"]
    naive_s, n2 = statistics.median(ts["naive"]), counts["naive"]
    if n1 != n2:
        # explicit raise, not assert: the salted/naive exactness gate
        # must survive `python -O` (bench.py convention)
        raise AssertionError(f"salted/naive row counts diverge: {n1} vs {n2}")
    # equivalence on this input (order-insensitive full-row compare)
    same = (exemplar_cap(viols, 20).exceptAll(naive_cap(viols, 20)).count() == 0
            and naive_cap(viols, 20).exceptAll(exemplar_cap(viols, 20)).count() == 0)

    # the guard's bound: max rows any phase-1 window group holds —
    # salted by xxhash64 over the guard's ACTUAL order key (shared
    # derivation, writers.exemplar_order_key: here it extends
    # (clip_id, message) with the remaining atomics actual/expected),
    # so this records the bound on the groups production code forms
    keys = ["bucket_id", "rule_path", "rule_name"]
    order = exemplar_order_key(viols)
    hot = (viols.withColumn(
        "_s", F.pmod(F.xxhash64(*order), F.lit(256)))
        .groupBy(*keys, "_s").count().agg(F.max("count")).first()[0])
    naive_hot = viols.groupBy(*keys).count().agg(F.max("count")).first()[0]

    print(json.dumps({
        "rows": rows, "reps": reps, "out_rows": n1,
        "salted_median_s": round(salted_s, 2),
        "naive_median_s": round(naive_s, 2),
        "outputs_identical": same,
        "max_window_group_rows_salted": hot,
        "max_window_group_rows_naive": naive_hot,
        "load_avg": os.getloadavg()}))
    spark.stop()


if __name__ == "__main__":
    main()
