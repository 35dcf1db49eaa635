"""Pure-Python interpreter of jio leaf-chain semantics — the property-test
oracle (SURVEY.md §5.2 item 4). Mirrors the reference's Validate loop
(any.go:122-132): ordered rules with Skip/Abort, value mutation, then the
final type assertion. One value per call, like the reference."""

from __future__ import annotations

import math
import re
from typing import Any, Optional, Tuple

from jio_spark.dsl import BaseSchema

# Go strconv.ParseFloat decimal syntax (mirrors compiler._GO_FLOAT_NUM).
# re.ASCII: Python's default \d matches non-ASCII decimal digits (e.g.
# '١٢') that float() happily parses, while both Go strconv and the Spark
# side's Java rlike \d are ASCII-only — without the flag the oracle would
# accept strings the engine (correctly) rejects.
_GO_D = r"\d+(?:_\d+)*"
_GO_NUM = re.compile(
    rf"^[+-]?({_GO_D}(\.(?:{_GO_D})?)?|\.{_GO_D})([eE][+-]?{_GO_D})?$",
    re.ASCII)
_GO_INF = re.compile(r"^[+-]?inf(inity)?$", re.IGNORECASE | re.ASCII)

# the Unicode White_Space=yes set (what Go strings.TrimSpace trims)
_GO_WHITESPACE = (
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008"
    "\u2009\u200a\u2028\u2029\u202f\u205f\u3000")


def _is_number(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def jio_validate(schema: BaseSchema, value: Any) -> Tuple[Optional[str], Any]:
    """Returns (err, final_value); err is the failing rule name or None."""
    v = value
    for spec in schema._ordered_rules():
        name, p = spec.name, spec.params
        if name == "optional":
            if v is None:
                return None, value  # skip: jio keeps value (nil)
        elif name == "required":
            if v is None:
                return "required", value
        elif name == "default":
            if v is None:
                v = p["value"]
        elif name == "set":
            v = float(p["value"]) if schema.TYPE == "double" else p["value"]
        elif name == "equal":
            if schema.TYPE in ("double", "string"):
                if schema.TYPE == "double" and not _is_number(v):
                    return "type", value
                if schema.TYPE == "string" and not isinstance(v, str):
                    return "type", value
                if v != p["value"]:
                    return "equal", value
            else:
                if v != p["value"] or (isinstance(v, bool) !=
                                       isinstance(p["value"], bool)):
                    return "equal", value
        elif name == "valid":
            vals = p["values"]
            if schema.TYPE == "double":
                if not _is_number(v):
                    return "type", value
                if not any(float(v) == float(x) for x in vals):
                    return "valid", value
            elif schema.TYPE == "string":
                if not isinstance(v, str):
                    return "type", value
                if v not in vals:
                    return "valid", value
            else:
                if not any(v == x and isinstance(v, bool) ==
                           isinstance(x, bool) for x in vals):
                    return "valid", value
        elif name == "nmin":
            if not _is_number(v):
                return "type", value
            if v < p["value"]:
                return "min", value
        elif name == "nmax":
            if not _is_number(v):
                return "type", value
            if v > p["value"]:
                return "max", value
        elif name == "integer":
            if not _is_number(v):
                return "type", value
            if float(v) != math.trunc(float(v)):
                return "integer", value
        elif name == "ceil":
            if not _is_number(v):
                return "type", value
            v = float(math.ceil(v))
        elif name == "floor":
            if not _is_number(v):
                return "type", value
            v = float(math.floor(v))
        elif name == "round":
            if not _is_number(v):
                return "type", value
            # Go math.Round: half away from zero. Not floor(abs+0.5):
            # that addition rounds up across integer boundaries whenever
            # abs+0.5 is unrepresentable (odd ints in [2^52,2^53),
            # fractions one ulp below .5) — compare the exact fraction
            a = abs(v)
            fl = math.floor(a)
            v = float(fl + (1 if a - fl >= 0.5 else 0)) \
                * (1 if v >= 0 else -1)
        elif name == "parse_string":
            # Go strconv.ParseFloat, not Python float(): no surrounding
            # whitespace, Go-literal underscores only between digits,
            # inf/infinity/nan forms, and ErrRange (an abort,
            # number.go:193-197) for out-of-range magnitudes
            if isinstance(v, str):
                if _GO_NUM.match(v):
                    f = float(v.replace("_", ""))
                    if math.isinf(f):
                        return "parse_string", value   # ErrRange
                    v = f
                elif _GO_INF.match(v):
                    v = float("-inf") if v.startswith("-") \
                        else float("inf")
                elif v.lower() == "nan":
                    v = float("nan")
                else:
                    return "parse_string", value
        elif name == "smin":
            if not isinstance(v, str):
                return "type", value
            if len(v.encode()) < p["value"]:
                return "min", value
        elif name == "smax":
            if not isinstance(v, str):
                return "type", value
            if len(v.encode()) > p["value"]:
                return "max", value
        elif name == "slength":
            if not isinstance(v, str):
                return "type", value
            if len(v.encode()) != p["value"]:
                return "length", value
        elif name == "regex":
            if not isinstance(v, str):
                return "type", value
            if not re.search(p["pattern"], v):
                return "regex", value
        elif name == "lowercase":
            if not isinstance(v, str):
                return "type", value
            v = v.lower()
        elif name == "uppercase":
            if not isinstance(v, str):
                return "type", value
            v = v.upper()
        elif name == "strim":
            if not isinstance(v, str):
                return "type", value
            # Go strings.TrimSpace trims the Unicode White_Space set —
            # NOT Python str.strip(), which additionally trims the
            # \x1c-\x1f separator controls (not White_Space in Unicode)
            v = v.strip(_GO_WHITESPACE)
        elif name == "truthy":
            if any(v == x and type(v) is type(x) for x in p["values"]):
                v = True
        elif name == "falsy":
            if any(v == x and type(v) is type(x) for x in p["values"]):
                v = False
        else:
            raise NotImplementedError(name)

    # final type assertion
    t = schema.TYPE
    if t == "double" and not _is_number(v):
        return "type", v
    if t == "string" and not isinstance(v, str):
        return "type", v
    if t == "boolean" and not isinstance(v, bool):
        return "type", v
    return None, v
