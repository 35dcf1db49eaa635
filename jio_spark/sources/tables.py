"""Source adapter: the engine targets Iceberg tables (north_rule), but the
sandbox Spark install carries no Iceberg jars (SURVEY.md §7 — verified
0/287 jars), so partitioned Parquet is the local stand-in. The adapter
keeps the switch to ``format("iceberg")`` one line, preserving predicate
pushdown and partition pruning either way."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class TableAdapter:
    """``fmt='parquet'`` reads a path; ``fmt='iceberg'`` reads a catalog
    table name. Partition column defaults to the clips layout
    (FIXTURES.md §1: bucket_id)."""

    fmt: str = "parquet"
    partition_col: str = "bucket_id"

    def read(self, spark: SparkSession, location: str) -> DataFrame:
        if self.fmt == "iceberg":
            return spark.read.format("iceberg").load(location)
        return spark.read.parquet(location)

    def write(self, df: DataFrame, location: str,
              mode: str = "overwrite") -> None:
        w = df.write.mode(mode)
        if self.partition_col and self.partition_col in df.columns:
            w = w.partitionBy(self.partition_col)
        if self.fmt == "iceberg":
            w.format("iceberg").saveAsTable(location)
        else:
            w.parquet(location)

    def partitions(self, spark: SparkSession, location: str) -> List:
        """Distinct partition values — drives the checkpoint manifest.
        For parquet this is a metadata-only listing of partition dirs."""
        df = self.read(spark, location)
        return sorted(r[0] for r in
                      df.select(self.partition_col).distinct().collect())


def read_table(spark: SparkSession, location: str,
               fmt: str = "parquet") -> DataFrame:
    return TableAdapter(fmt=fmt).read(spark, location)
