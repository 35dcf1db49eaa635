"""Vector math over ``array<float>`` embedding columns as pure Column
expressions (``F.zip_with`` + ``F.aggregate``) — JVM-side, no UDFs, usable
inside joins and groupBys at corpus scale."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # multiply in double, not float: cross-engine reproducibility (the
    # DuckDB oracle computes in double; float32 products diverge at ~1e-7)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def normalize(a: Column) -> Column:
    """Unit-normalize. CAUTION: as a single expression the norm
    subexpression is inlined into the per-element lambda (O(d²) work per
    row — lambda scoping defeats codegen CSE). For hot paths, materialize
    ``l2_norm`` in its own projection and divide by the column instead."""
    n = l2_norm(a)
    return F.transform(a, lambda v: v / n)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
