"""Vector math over ``array<float>`` embedding columns as pure Column
expressions (``F.zip_with`` + ``F.aggregate``) — JVM-side, no UDFs, usable
inside joins and groupBys at corpus scale."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # multiply in double, not float: cross-engine reproducibility (the
    # DuckDB oracle computes in double; float32 products diverge at ~1e-7).
    # CONTRACT: length-mismatched inputs yield NULL (zip_with pads the
    # shorter array with NULLs, which poison the sum) — "undefined", not
    # an error; callers that must catch dimension drift compare size().
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def normalize(a: Column) -> Column:
    """Unit-normalize; an all-zero/empty vector yields NULL elements
    (``try_divide``) rather than a job-killing ANSI DIVIDE_BY_ZERO.
    CAUTION: as a single expression the norm subexpression is inlined
    into the per-element lambda (O(d²) work per row — lambda scoping
    defeats codegen CSE). For hot paths, materialize ``l2_norm`` in its
    own projection and divide by the column instead."""
    n = l2_norm(a)
    return F.transform(a, lambda v: F.try_divide(v, n))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over the double-cast inputs; NULL (undefined) when either
    vector has zero norm — under Spark 4's default ANSI mode a plain
    division would abort the whole job on one degenerate row (the
    operators' pre-filtered ``_with_norm`` paths keep the raw-division
    expression shape for oracle bit-parity)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
