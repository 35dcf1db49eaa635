"""Chainable rule DSL with the semantics of faceair/jio, re-expressed for tables.

The reference builds a runtime tree of schema nodes, each holding an ordered
list of rule closures (``/root/reference/any.go:17-22``); ``Required`` /
``Optional`` / ``Default`` *prepend* so null handling runs first
(``any.go:45-74``), everything else appends. We reproduce exactly that
ordering discipline here, but the nodes are pure-Python dataclass specs — the
compiler (:mod:`jio_spark.compiler`) later folds them into Spark ``Column``
expressions. Nothing in this module touches Spark.

Schema types mirror the reference's six files: Any (``any.go``), Bool
(``bool.go``), Number (``number.go``), String (``string.go``), Array
(``array.go``), Object (``object.go``).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Union


@dataclass
class RuleSpec:
    """One rule in a schema node's ordered rule list.

    Mirrors one closure appended by a chainable call in the reference
    (e.g. ``Min`` at ``number.go:130-137``).
    """

    name: str
    params: Dict[str, Any] = field(default_factory=dict)


class BaseSchema:
    """Shared combinator surface (reference: ``schema.go:13-37`` + the
    identical blocks in each of the six schema files)."""

    #: logical type tag; overridden per subclass
    TYPE = "any"

    def __init__(self) -> None:
        self.rules: List[RuleSpec] = []
        self.priority: int = 0
        # tri-state like the reference's ``required *bool`` (any.go:20)
        self._required: Optional[bool] = None

    # -- ordering / plumbing ------------------------------------------------
    def set_priority(self, priority: int):
        """``SetPriority`` (any.go:26-29): higher-priority siblings validate
        first inside an object walk — and are therefore visible, already
        normalized, to lower-priority ``when`` references."""
        self.priority = priority
        return self

    def _prepend(self, name: str, **params):
        self.rules.insert(0, RuleSpec(name, params))
        return self

    def _append(self, name: str, **params):
        self.rules.append(RuleSpec(name, params))
        return self

    def prepend_transform(self, f: Callable):
        """``PrependTransform`` (any.go:32-35). ``f`` is either a
        ``Column -> Column`` builder (vectorized, preferred) or a pandas
        ``Series -> Series`` function (Arrow-batched ``pandas_udf``)."""
        return self._prepend("transform", fn=f)

    def transform(self, f: Callable):
        """``Transform`` (any.go:38-41) — custom rule escape hatch."""
        return self._append("transform", fn=f)

    # -- null handling (prepended, like any.go:45-74) -----------------------
    def required(self):
        """Abort when the value is NULL (``Required``, any.go:45-52)."""
        self._required = True
        return self._prepend("required")

    def optional(self):
        """Skip remaining rules when NULL (``Optional``, any.go:57-64).
        This is also the implicit default (any.go:123-125)."""
        self._required = False
        return self._prepend("optional")

    def default(self, value):
        """Substitute ``value`` when NULL (``Default``, any.go:67-74)."""
        self._required = False
        return self._prepend("default", value=value)

    # -- generic rules -------------------------------------------------------
    def set(self, value):
        """Unconditionally replace the value (``Set``, any.go:77-81)."""
        return self._append("set", value=value)

    def equal(self, value):
        """Fail unless value == v (``Equal``, any.go:84-91; typed variants
        route through Check so a type mismatch errors first)."""
        return self._append("equal", value=value)

    def valid(self, *values):
        """Whitelist membership (``Valid``, any.go:105-119)."""
        return self._append("valid", values=list(values))

    def when(self, ref_path: str, condition, then: "BaseSchema"):
        """Cross-field conditional (``When``, any.go:100-102 +
        ``baseSchema.when`` schema.go:21-37). ``condition`` is either a
        plain value (equality against the referenced field) or a schema
        (the referenced value must pass it); when true, ``then`` is applied
        to the *current* field's value."""
        return self._append("when", ref_path=ref_path, condition=condition,
                            then=then)

    def check(self, f: Callable, message: str = "check failed"):
        """Custom predicate with the type gate of the schema type
        (``Check``: number.go:99-110, string.go:98-109, array.go:81-91).
        ``f`` is a ``Column -> Column(Boolean)`` builder or a pandas
        ``Series -> Series[bool]`` function."""
        return self._append("check", fn=f, message=message)

    # -- helpers -------------------------------------------------------------
    def clone(self):
        return copy.deepcopy(self)

    def _ordered_rules(self) -> List[RuleSpec]:
        """Rule list with the implicit Optional applied when neither
        required() nor optional()/default() was called (any.go:123-125 —
        but compile-time, so schema reuse is safe, unlike the reference's
        lazily-mutating Validate)."""
        if self._required is None:
            return [RuleSpec("optional")] + self.rules
        return list(self.rules)

    def __repr__(self) -> str:  # pragma: no cover
        return f"{type(self).__name__}({[r.name for r in self.rules]})"


class AnySchema(BaseSchema):
    """``Any()`` — matches any type, no final type assertion
    (any.go:122-132 has no type check)."""

    TYPE = "any"


class BoolSchema(BaseSchema):
    """``Bool()`` (bool.go) — final assertion: value is boolean
    (bool.go:126-130)."""

    TYPE = "boolean"

    def truthy(self, *values):
        """Coerce listed values to ``true`` (bool.go:94-102)."""
        return self._append("truthy", values=list(values))

    def falsy(self, *values):
        """Coerce listed values to ``false`` (bool.go:105-113)."""
        return self._append("falsy", values=list(values))


class NumberSchema(BaseSchema):
    """``Number()`` (number.go) — jio numbers are float64-only; Spark-side we
    keep native numeric types and treat "number" as any numeric column
    (matching the int→float64 coercion at number.go:208-210)."""

    TYPE = "double"

    def min(self, value: float):
        """value >= min (number.go:130-137)."""
        return self._append("nmin", value=float(value))

    def max(self, value: float):
        """value <= max (number.go:140-147)."""
        return self._append("nmax", value=float(value))

    def integer(self):
        """value == trunc(value) (number.go:150-157)."""
        return self._append("integer")

    def convert(self, f: Callable):
        """Map number→number (number.go:161-170)."""
        return self._append("convert", fn=f)

    def ceil(self):
        """value := ceil(value) (number.go:173-175)."""
        return self._append("ceil")

    def floor(self):
        """value := floor(value) (number.go:178-180)."""
        return self._append("floor")

    def round(self):
        """Round half away from zero, like Go ``math.Round``
        (number.go:183-185). NOT Spark's HALF_EVEN-on-decimal ``bround``."""
        return self._append("round")

    def parse_string(self):
        """If the value is a string, parse to double; abort when unparseable;
        non-strings pass through (number.go:190-201)."""
        return self._append("parse_string")


class StringSchema(BaseSchema):
    """``String()`` (string.go). NOTE the reference measures length in BYTES
    (``len(ctxValue)``, string.go:131); we compile to ``octet_length`` for
    jio-exact semantics (UTF-8 bytes)."""

    TYPE = "string"

    def min(self, n: int):
        """byte-length >= n (string.go:129-136)."""
        return self._append("smin", value=int(n))

    def max(self, n: int):
        """byte-length <= n (string.go:139-146)."""
        return self._append("smax", value=int(n))

    def length(self, n: int):
        """byte-length == n (string.go:149-156)."""
        return self._append("slength", value=int(n))

    def regex(self, pattern: str):
        """Must match the (unanchored) regex (string.go:159-167). Java regex
        dialect; the conformance corpus pins the RE2∩Java shared subset."""
        return self._append("regex", pattern=pattern)

    def alphanum(self):
        """``^[a-zA-Z0-9]+$`` (string.go:170-172)."""
        return self._append("regex", pattern="^[a-zA-Z0-9]+$",
                            display="alphanum")

    def token(self):
        """``^\\w+$`` (string.go:175-177)."""
        return self._append("regex", pattern="^\\w+$", display="token")

    def convert(self, f: Callable):
        """Map string→string (string.go:181-190)."""
        return self._append("convert", fn=f)

    def lowercase(self):
        """(string.go:193-196)."""
        return self._append("lowercase")

    def uppercase(self):
        """(string.go:199-201)."""
        return self._append("uppercase")

    def trim(self):
        """Strip Unicode whitespace both sides, like Go ``strings.TrimSpace``
        (string.go:204-206) — compiled as a regexp_replace, not ``F.trim``
        (which strips ASCII space only)."""
        return self._append("strim")


class ArraySchema(BaseSchema):
    """``Array()`` (array.go) — final assertion: value is a slice
    (array.go:157-161)."""

    TYPE = "array"

    def items(self, *schemas: BaseSchema):
        """Every element must pass at least one of the given schemas — OR
        across schemas, AND across elements (array.go:94-114)."""
        return self._append("items", schemas=list(schemas))

    def min(self, n: int):
        """len >= n (array.go:117-124)."""
        return self._append("amin", value=int(n))

    def max(self, n: int):
        """len <= n (array.go:127-134)."""
        return self._append("amax", value=int(n))

    def length(self, n: int):
        """len == n (array.go:137-144)."""
        return self._append("alength", value=int(n))


class ObjectSchema(BaseSchema):
    """``Object()`` (object.go) — children walk in descending priority with
    first-error abort of the remaining walk (object.go:139-169)."""

    TYPE = "struct"

    def keys(self, children: Dict[str, BaseSchema]):
        """(object.go:139-169). ``children`` insertion order breaks priority
        ties deterministically (the reference iterates a Go map — random —
        then stable-sorts by priority: object.go:17-26)."""
        return self._append("keys", children=dict(children))

    def with_keys(self, *keys: str):
        """All listed keys must be present (object.go:94-109). On fixed
        (struct) schemas presence means IS NOT NULL — see FIXTURES.md §4."""
        return self._append("with", keys=list(keys))

    def without_keys(self, *keys: str):
        """None of the listed keys may be present (object.go:112-131)."""
        return self._append("without", keys=list(keys))


class K:
    """Factory namespace, standing in for the reference's package-level
    constructors (``jio.Any()``, ``jio.Number()``, …) and the ``K`` keys-map
    alias (object.go:15)."""

    @staticmethod
    def any() -> AnySchema:
        return AnySchema()

    @staticmethod
    def bool() -> BoolSchema:
        return BoolSchema()

    @staticmethod
    def number() -> NumberSchema:
        return NumberSchema()

    @staticmethod
    def string() -> StringSchema:
        return StringSchema()

    @staticmethod
    def array() -> ArraySchema:
        return ArraySchema()

    @staticmethod
    def object(children: Optional[Dict[str, BaseSchema]] = None) -> ObjectSchema:
        s = ObjectSchema()
        if children is not None:
            s.keys(children)
        return s
