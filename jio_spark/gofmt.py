"""Go ``%v`` style value rendering, for jio-shaped violation messages.

The reference formats every error with ``fmt.Errorf("field `%s` value %v
...")`` (e.g. number.go:103, string.go:102). Go's ``%v`` prints float64 with
the shortest decimal repr — ``12.0`` → ``"12"``, ``3.1`` → ``"3.1"`` — and
slices space-separated in brackets — ``[]float64{1,2}`` → ``"[1 2]"``. These
helpers reproduce that for the common (test-corpus) cases, both for Python
literals (compile-time "expected" strings) and for Spark Columns (runtime
"actual" strings). Exotic corners (scientific notation beyond 1e15) are
documented non-goals.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def go_repr(v: Any) -> str:
    """Render a Python literal the way Go ``%v`` would."""
    if v is None:
        return "<nil>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # Go %v: strconv.FormatFloat prints the special values as
        # NaN / +Inf / -Inf (int(v) would raise on them anyway)
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "+Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            # Go %v prints -0.0 as '-0' (int(-0.0) loses the sign)
            if v == 0 and math.copysign(1.0, v) < 0:
                return "-0"
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + " ".join(go_repr(x) for x in v) + "]"
    return str(v)


def go_repr_list(values: Sequence[Any]) -> str:
    """Go %v of a slice: ``[a b c]`` (any.go:115 Valid error)."""
    return "[" + " ".join(go_repr(v) for v in values) + "]"


def fmt_col(col: Column, vtype: str) -> Column:
    """Column → string Column rendered Go-%v style.

    ``vtype`` is the compiler's logical type tag ('double', 'string',
    'boolean', 'array', ...). NULL renders as ``<nil>`` (Go prints untyped
    nil that way).
    """
    if vtype == "double":
        # Go %v prints integral float64 as plain integers at ANY
        # magnitude; Java's double→string switches to E-notation at 1e7
        # (12345678.0 → '1.2345678E7'), so the '\.0$' strip alone
        # diverged from Go AND from the oracle's go_num CASE for
        # |v| ≥ 1e7. Integral values inside go_repr's 1e15 boundary now
        # render via a decimal cast; ±Inf maps to Go's +Inf/-Inf
        # ('NaN' already matches). Remaining documented non-goal:
        # non-integral |v| < 1e-3 (Java '1.0E-4' vs Go '0.0001').
        integral = (~F.isnan(col)) & (col == F.floor(col)) \
            & (F.abs(col) < F.lit(1e15))
        rendered = (
            F.when(col == F.lit(float("inf")), F.lit("+Inf"))
             .when(col == F.lit(float("-inf")), F.lit("-Inf"))
             # zeros via the string strip, not the decimal cast: Go
             # prints -0.0 as '-0' and the cast would lose the sign
             .when(col == F.lit(0.0),
                   F.regexp_replace(col.cast("string"), r"\.0$", ""))
             .when(integral, col.cast("decimal(17,0)").cast("string"))
             .otherwise(F.regexp_replace(col.cast("string"),
                                         r"\.0$", "")))
    elif vtype == "boolean":
        rendered = col.cast("string")  # 'true'/'false' like Go
    elif vtype == "array":
        # the '.0' strip applies only to integer-looking numerics — a
        # STRING element 'v1.0' must survive — and NULL elements render
        # '<nil>' like Go's nil (array_join drops them by default)
        rendered = F.concat(
            F.lit("["),
            F.array_join(
                F.transform(col, lambda e: F.regexp_replace(
                    e.cast("string"), r"^(-?\d+)\.0$", "$1")),
                " ", "<nil>"),
            F.lit("]"),
        )
    elif vtype in ("struct", "map"):
        rendered = F.to_json(col)
    else:
        rendered = col.cast("string")
    return F.coalesce(rendered, F.lit("<nil>"))
