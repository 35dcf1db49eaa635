"""Uniqueness check on an id column without a full-table shuffle.

The north-star check (BASELINE.json: "uniqueness on clip_id
(sort-within-partition + boundary exchange to avoid full shuffle)"):

1. ``sortWithinPartitions(key)`` — local sort, NO exchange.
2. an Arrow-batched ``mapInPandas`` scan finds duplicate runs inside each
   partition and emits each partition's first/last run (the only runs that
   can continue into a neighboring partition),
3. the boundary runs — exactly two tiny rows per partition — are exchanged
   to the driver and merged across consecutive partitions.

This is exact whenever each key's occurrences are confined to one
partition or to a consecutive partition range — i.e. the table layout is
key-clustered: Iceberg tables bucketed or sort-ordered on clip_id, or any
globally-sorted write. That is the intended 10^12-row layout. For arbitrary
layouts use ``uniqueness_check(df, key, layout="any")``, which falls back to
``groupBy(key)`` — still cheap when duplicates are rare because Spark's
partial aggregation collapses unique keys map-side, but it shuffles the
key column.

Only duplicate *candidates* ever leave their partition; for a
99.9%-unique table the exchanged data is ~0.1% of keys + 2 rows/partition.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scan_schema(df: DataFrame, key: str) -> str:
    key_type = df.schema[key].dataType.simpleString()
    return (f"pid long, key {key_type}, cnt long, kind string")


def _adjacent_scan(key: str):
    """Per-partition generator: emits interior duplicate runs (kind='dup')
    and the partition's first and last runs (kind='first'/'last'/'whole')
    for the boundary merge."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        first_key = None
        first_cnt = 0
        first_open = True     # still extending the partition-initial run
        cur_key = None
        cur_cnt = 0
        out_keys: List = []
        out_cnts: List[int] = []
        out_kinds: List[str] = []
        saw_any = False

        def close_run():
            nonlocal first_open, first_key, first_cnt
            if first_open:
                first_key, first_cnt = cur_key, cur_cnt
                first_open = False
            elif cur_cnt > 1:
                out_keys.append(cur_key)
                out_cnts.append(cur_cnt)
                out_kinds.append("dup")

        for pdf in batches:
            vals = pdf[key].values
            saw_any = saw_any or len(vals) > 0
            for v in vals:
                if cur_key is not None and v == cur_key:
                    cur_cnt += 1
                else:
                    if cur_key is not None:
                        close_run()
                    cur_key, cur_cnt = v, 1
        if saw_any:
            # the final run is the partition's last run; if it is also the
            # first run the whole partition is one key
            if first_open:
                out_keys.append(cur_key)
                out_cnts.append(cur_cnt)
                out_kinds.append("whole")
            else:
                out_keys.append(first_key)
                out_cnts.append(first_cnt)
                out_kinds.append("first")
                out_keys.append(cur_key)
                out_cnts.append(cur_cnt)
                out_kinds.append("last")
        yield pd.DataFrame({"pid": [pid] * len(out_keys), "key": out_keys,
                            "cnt": out_cnts, "kind": out_kinds})

    return scan


def duplicate_ids(df: DataFrame, key: str) -> DataFrame:
    """Keys appearing more than once, with their counts — exact for
    key-clustered layouts (see module docstring). Returns a DataFrame
    ``(key, cnt)``."""
    spark = df.sparkSession
    scan = (df.select(key)
              .sortWithinPartitions(key)
              .mapInPandas(_adjacent_scan(key), _scan_schema(df, key)))
    # eager localCheckpoint: the (tiny) scan result materializes ONCE and
    # serves both the boundary collect below and the interior branch the
    # caller later consumes — a cache() + finally-unpersist() here would
    # drop the blocks before the caller ran, recomputing the sorted scan
    scan = scan.where(F.col("key").isNotNull()).localCheckpoint(eager=True)
    interior = scan.where(F.col("kind") == "dup") \
                   .select(F.col("key"), F.col("cnt"))

    # boundary exchange: ≤2 rows per partition
    boundary = sorted(
        (r["pid"], r["kind"], r["key"], r["cnt"])
        for r in scan.where(F.col("kind") != "dup").collect())
    by_pid = {}
    for pid, kind, k, cnt in boundary:
        by_pid.setdefault(pid, {})[kind] = (k, cnt)

    merged = {}

    def add(k, c):
        merged[k] = merged.get(k, 0) + c

    pids = sorted(by_pid)
    # chain runs across consecutive partitions: a key continues from
    # partition i into i+1 only if i's last == (i+1)'s first
    open_key, open_cnt = None, 0
    for pid in pids:
        runs = by_pid[pid]
        if "whole" in runs:
            k, c = runs["whole"]
            if open_key is not None and k == open_key:
                open_cnt += c
            else:
                if open_key is not None:
                    add(open_key, open_cnt)
                open_key, open_cnt = k, c
            continue
        fk, fc = runs["first"]
        lk, lc = runs["last"]
        if open_key is not None and fk == open_key:
            open_cnt += fc
        else:
            if open_key is not None:
                add(open_key, open_cnt)
            add(fk, fc)
        open_key, open_cnt = lk, lc
    if open_key is not None:
        add(open_key, open_cnt)

    bdup = [(k, c) for k, c in merged.items() if c > 1]
    key_type = df.schema[key].dataType.simpleString()
    if bdup:
        bdf = spark.createDataFrame(bdup, f"key {key_type}, cnt long")
    else:
        bdf = spark.createDataFrame([], f"key {key_type}, cnt long")
    return interior.unionByName(bdf) \
                   .groupBy("key").agg(F.sum("cnt").alias("cnt"))


def uniqueness_check(df: DataFrame, key: str, layout: str = "clustered",
                     id_alias: Optional[str] = None) -> DataFrame:
    """Violation rows for duplicated keys, in the engine's standard shape.

    ``layout='clustered'`` uses the shuffle-free boundary-exchange path;
    ``layout='any'`` uses the exact groupBy fallback (key-column shuffle,
    map-side combined)."""
    if layout == "any":
        dups = (df.groupBy(F.col(key).alias("key"))
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .where(F.col("cnt") > 1))
    else:
        dups = duplicate_ids(df, key)
    out_key = id_alias or key
    return dups.select(
        F.col("key").cast("string").alias(out_key),
        F.lit(key).alias("rule_path"),
        F.lit("unique").alias("rule_name"),
        F.lit("unique").alias("expected"),
        F.concat(F.lit("count="), F.col("cnt").cast("string"))
         .alias("actual"),
        F.concat(F.lit(f"field `{key}` value "), F.col("key").cast("string"),
                 F.lit(" is duplicated "), F.col("cnt").cast("string"),
                 F.lit(" times")).alias("message"))
