"""Table-schema contract: the "schema" half of "schema + constraint
validation" applied at TABLE granularity, before any data moves.

The per-row rule compiler already types every VALUE (jio semantics:
a number rule over a string column parses-or-fails per row,
`/root/reference/any.go:14-28` type gates). What it cannot catch ahead
of time is a writer-side contract break — a column renamed, re-typed
(sr_hz int→long after a rewrite), or dropped. At 10^12 rows that must
fail from the DRIVER in milliseconds (``df.schema`` is metadata-only:
no job, no scan), not 40 minutes into a cluster-wide pass — or, in
warn mode, be recorded as structured violations alongside the row-level
ones.

Contract form: ``{column: spark-sql simple type string}`` — e.g. the
north-star clips shape (BASELINE.json input_hint) in
``CLIPS_SCHEMA_CONTRACT``.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

from pyspark.sql import DataFrame

#: BASELINE.json input_hint: (clip_id:string, bytes:binary, sr_hz:int32,
#: dur_ms:int32, codec:string, transcript:string)
CLIPS_SCHEMA_CONTRACT: Dict[str, str] = {
    "clip_id": "string",
    "bytes": "binary",
    "sr_hz": "int",
    "dur_ms": "int",
    "codec": "string",
    "transcript": "string",
}


#: Spark SQL type-name aliases: the parser accepts either form, and
#: ``simpleString()`` picks one ("bigint" for LongType) — a contract
#: written with the other must still match. Fallback table for when no
#: session is active; with one, ``_norm`` canonicalizes through Spark's
#: own DDL parser, which also equates cosmetic whitespace and nested
#: aliases ("decimal(10, 0)" ≡ "decimal(10,0)", "array<long>" ≡
#: "array<bigint>") — string comparison alone false-flagged those as
#: contract breaks and, in the default 'fail' mode, refused a table
#: that satisfies the contract.
_TYPE_ALIASES = {"integer": "int", "long": "bigint", "short": "smallint",
                 "byte": "tinyint", "bool": "boolean",
                 "character varying": "string"}


def _norm(t: str) -> str:
    t = t.strip().lower()
    t = _TYPE_ALIASES.get(t, t)
    try:
        from pyspark.sql.types import _parse_datatype_string
        return _parse_datatype_string(t).simpleString()
    except Exception:
        # no active session, or a type string Spark cannot parse: fall
        # back to the alias-table form — an unparseable contract type
        # then surfaces as a loud schema_type violation naming both
        # sides, never a silent pass
        return t


def schema_contract_violations(df: DataFrame,
                               expected: Mapping[str, str],
                               allow_extra: bool = True) -> List[Dict]:
    """Structured violations for every way ``df``'s physical schema
    breaks the contract. Driver-side and metadata-only — O(columns),
    zero Spark jobs.

    - missing column → ``schema_missing``
    - type mismatch (simpleString inequality; int vs long IS a
      mismatch — silent widening is exactly the writer drift this
      exists to catch) → ``schema_type``
    - column present but not in the contract → ``schema_extra``
      (only when ``allow_extra=False``; partition/lineage columns
      riding along is the common benign case, so extras are allowed
      by default)

    Violation dicts carry the engine's standard keys (rule_path,
    rule_name, expected, actual, message) so they can sit next to
    row-level violations in metrics and sinks."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out: List[Dict] = []
    for col, want in expected.items():
        if col not in actual:
            out.append({
                "rule_path": col, "rule_name": "schema_missing",
                "expected": want, "actual": None,
                "message": f"column `{col}` ({want}) missing from table"})
        elif _norm(actual[col]) != _norm(want):
            out.append({
                "rule_path": col, "rule_name": "schema_type",
                "expected": want, "actual": actual[col],
                "message": (f"column `{col}` is {actual[col]}, "
                            f"contract says {want}")})
    if not allow_extra:
        for col, got in actual.items():
            if col not in expected:
                out.append({
                    "rule_path": col, "rule_name": "schema_extra",
                    "expected": None, "actual": got,
                    "message": f"unexpected column `{col}` ({got})"})
    return out


def raise_schema_violations(viols: List[Dict]) -> None:
    """The one place the contract-break error is formatted — listing
    every break, not just the first (a renamed table usually breaks
    several)."""
    lines = "; ".join(v["message"] for v in viols)
    raise ValueError(f"table schema breaks contract: {lines}")


def assert_schema_contract(df: DataFrame,
                           expected: Mapping[str, str],
                           allow_extra: bool = True) -> None:
    """Raise ``ValueError`` listing every contract break."""
    viols = schema_contract_violations(df, expected, allow_extra)
    if viols:
        raise_schema_violations(viols)
