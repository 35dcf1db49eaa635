"""Referential-integrity checks (SURVEY.md §2.3 "joins" row).

The engine's only join need: values of a foreign-key column must exist in a
dimension table. Compiled as a LEFT ANTI join with an explicit
``F.broadcast`` on the dimension — at 10^12 fact rows vs a small dim
(codec registry, source registry) the anti join runs map-side with zero
shuffle of the fact table. For large dims pass ``broadcast=False`` and
Spark plans a shuffled hash join (AQE may still convert it back).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler import type_tag
from ..gofmt import fmt_col


def referential_check(df: DataFrame, fk: str, dim: DataFrame, pk: str,
                      id_cols: Optional[Sequence[str]] = None,
                      broadcast: bool = True,
                      nulls_violate: bool = False) -> DataFrame:
    """Violation rows for fact rows whose ``fk`` has no match in
    ``dim.pk``. NULL fks are skipped by default (jio's Optional semantics;
    set ``nulls_violate=True`` for Required semantics)."""
    ids = list(id_cols) if id_cols else [df.columns[0]]
    dimk = dim.select(F.col(pk).alias(fk)).dropDuplicates([fk])
    if broadcast:
        dimk = F.broadcast(dimk)
    probe = df.select(*dict.fromkeys(ids + [fk]))
    if not nulls_violate:
        probe = probe.where(F.col(fk).isNotNull())
    missing = probe.join(dimk, on=fk, how="left_anti")
    # Go-%v rendering via the engine's ONE formatter: a numeric fk of
    # 12.0 must read '12' here exactly as it does in the rule-chain
    # violations it gets unioned with (fmt_col also supplies the
    # NULL→'<nil>' rendering)
    shown = fmt_col(F.col(fk), type_tag(df.schema[fk].dataType),
                    df.schema[fk].dataType)
    return missing.select(
        *ids,
        F.lit(fk).alias("rule_path"),
        F.lit("referential").alias("rule_name"),
        F.lit(f"exists in dim.{pk}").alias("expected"),
        shown.alias("actual"),
        F.concat(F.lit(f"field `{fk}` value "), shown,
                 F.lit(f" not found in dimension `{pk}`")).alias("message"))
