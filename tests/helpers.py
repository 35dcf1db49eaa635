"""Shared helpers for the jio conformance corpus.

Each reference test drives ``schema.Validate(NewContext(value))`` on one
value; here we pack the case values into a one-column DataFrame and run the
compiled rule set once, asserting per-row (err, mutated value, message) —
the vectorized equivalent of the reference's table-driven cases.
"""

from typing import Any, List, Optional, Sequence, Tuple

from pyspark.sql import functions as F

from jio_spark import K, validate


def run_leaf(spark, schema, values: Sequence[Any], dtype: str,
             ids: Optional[Sequence[int]] = None):
    """Validate ``values`` (one column ``v`` of Spark type ``dtype``) against
    ``schema``. Returns rows of (id, passed, normalized_value, message)."""
    ids = ids or list(range(len(values)))
    df = spark.createDataFrame(list(zip(ids, values)),
                               f"id int, v {dtype}")
    res = validate(df, K.object({"v": schema.clone()}), id_cols=["id"])
    norm_v = res.compiled.normalized.get("v")
    if norm_v is None:
        norm_v = F.col("v")
    rows = (res.prepared.select(
        "id",
        res.compiled.row_pass.alias("_pass"),
        norm_v.alias("norm_v"),
        F.try_element_at(res.compiled.violations_array, F.lit(1))
         .getField("message").alias("message"))
        .orderBy("id").collect())
    return [(r["id"], r["_pass"], r["norm_v"], r["message"]) for r in rows]


def passes(spark, schema, value, dtype: str) -> bool:
    """ctx.Err == nil for a single value — the reference's usual assert."""
    return run_leaf(spark, schema, [value], dtype)[0][1]


def mutated(spark, schema, value, dtype: str):
    """ctx.Value after Validate (the reference's mutation asserts)."""
    return run_leaf(spark, schema, [value], dtype)[0][2]


def message(spark, schema, value, dtype: str):
    return run_leaf(spark, schema, [value], dtype)[0][3]
