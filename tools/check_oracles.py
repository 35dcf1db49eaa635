"""Local stand-in for the driver's correctness harness: runs every
``queries()`` entry at a given sf dir, runs the matching ``oracle_sql()``
in DuckDB, and compares row count, column names, and order-insensitive
values (NaN-safe, float-rounded the same way the outputs already are).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def frame_key(rows, cols):
    return sorted("|".join(canon(r[c]) for c in cols) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs, oracles = E.queries(), E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name in the only-filter must not skip every query and
        # still print the green line — a gate that verified nothing
        # (checked before the Spark session: fail in milliseconds)
        raise SystemExit(f"unknown query name(s) {sorted(unknown)}; "
                         f"known: {sorted(qs)}")
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:28s} SPARK-ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf)} rows, "
                  f"cols={list(sdf.columns)}")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:28s} DUCKDB-ERROR {e}")
            continue
        s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
        if s_cols != d_cols:
            failures.append((name, f"cols {s_cols} vs {d_cols}"))
            print(f"{name:28s} COLS-MISMATCH {s_cols} vs {d_cols}")
            continue
        if len(sdf) != len(ddf):
            failures.append((name, f"rows {len(sdf)} vs {len(ddf)}"))
            print(f"{name:28s} ROWS-MISMATCH {len(sdf)} vs {len(ddf)}")
            continue
        sk = frame_key(sdf.to_dict("records"), s_cols)
        dk = frame_key(ddf.to_dict("records"), s_cols)
        if sk != dk:
            diff = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"{name:28s} VALUES-MISMATCH e.g. {diff}")
        else:
            print(f"{name:28s} OK ({len(sdf)} rows)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
