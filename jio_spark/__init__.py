"""jio_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the rule semantics of faceair/jio (reference, read-only at
/root/reference) as a declarative DSL compiled into Spark Column expressions
and Arrow-batched pandas UDFs, extended with the table-level checks a
10^12-row audio+transcript corpus needs: single-pass column stats, uniqueness
without a full shuffle, broadcast referential checks, KS/PSI drift, audio
decode conformance, dedup / similarity / text-quality operators, and
checkpoint/resume.
"""

from .dsl import (AnySchema, ArraySchema, BaseSchema, BoolSchema, K,
                  NumberSchema, ObjectSchema, StringSchema)
from .engine import ValidationResult, validate
from .compiler import compile_ruleset

__version__ = "0.1.0"

__all__ = [
    "K", "validate", "ValidationResult", "compile_ruleset",
    "AnySchema", "ArraySchema", "BaseSchema", "BoolSchema",
    "NumberSchema", "ObjectSchema", "StringSchema",
]
