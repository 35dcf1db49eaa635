"""Reference-semantics corners pinned after the round-4 compiler review:
cross-type Set (any.go:77-81 + per-type final type gates), Go NaN
semantics on Integer/Max/Equal/Valid, When with a nil condition literal
(schema.go:35-37), condition schemas over non-scalar refs
(schema.go:26-33), Any `then` continuation seeding (schema.go:34-36),
and the loud refusal of when() inside Items/condition sub-schemas."""

import math

import pyspark.sql.functions as F
import pytest

from jio_spark import K, validate
from helpers import mutated, passes, run_leaf


# -- cross-type Set (any.go:77-81: substitute, then the chain judges) ----


def test_set_same_type_still_mutates(spark):
    assert mutated(spark, K.number().set(5), 1.0, "double") == 5.0
    assert passes(spark, K.string().set("x").equal("x"), "orig", "string")


def test_set_cross_type_fails_final_type_gate(spark):
    """K.string().set(5): the reference substitutes 5 and the string
    type switch fails per-row (string.go type gate) — it does NOT error
    at schema-build time, and it does NOT pass."""
    rid, ok, norm, msg = run_leaf(spark, K.string().set(5),
                                  ["hello"], "string")[0]
    assert ok is False
    assert "is not string" in msg
    assert norm == "hello"      # failed chain: no write-back

    # number chain fed a non-numeric string: reference keeps the string
    # and fails type:double; float("abc") must not crash compilation
    rid, ok, norm, msg = run_leaf(spark, K.number().set("abc"),
                                  [1.0], "double")[0]
    assert ok is False and "is not number" in msg

    # numeric-LOOKING string is still a string to the type switch
    assert not passes(spark, K.number().set("5"), 1.0, "double")
    assert not passes(spark, K.bool().set("x"), True, "boolean")


def test_set_retags_any_chain(spark):
    """Any().Set(5) over a string column: the dynamic value is now a
    number for every row — Equal(5) passes via interface equality and
    Equal("5") does not (no implicit cast)."""
    assert passes(spark, K.any().set(5).equal(5), "orig", "string")
    assert not passes(spark, K.any().set(5).equal("5"), "orig", "string")


def test_set_nil(spark):
    # set(nil) then required: Required sees nil (any.go:48) and fails
    assert not passes(spark, K.string().set(None).required(),
                      "present", "string")
    # required first passes on the original, then set(nil) fails the
    # final type gate (type switch on nil)
    assert not passes(spark, K.string().required().set(None),
                      "present", "string")
    # Any has no final gate: set(nil) then equal(None) is nil == nil
    assert passes(spark, K.any().set(None).equal(None), "x", "string")


# -- Go NaN semantics ------------------------------------------------------


def test_nan_integer_fails(spark):
    """Go: math.Trunc(NaN) != NaN fails Integer; Spark's NaN == NaN
    would pass without the explicit reject."""
    assert not passes(spark, K.number().integer(), float("nan"), "double")
    assert passes(spark, K.number().integer(), 3.0, "double")


def test_nan_passes_max_like_go(spark):
    """Go aborts Max on `value > max`; NaN > max is false in Go, so NaN
    passes BOTH Min and Max (number.go:128-134)."""
    assert passes(spark, K.number().max(10), float("nan"), "double")
    assert passes(spark, K.number().min(0), float("nan"), "double")
    assert not passes(spark, K.number().max(10), 11.0, "double")


def test_nan_never_equal(spark):
    """Go == never matches NaN (also via reflect.DeepEqual on float64)."""
    assert not passes(spark, K.number().equal(float("nan")),
                      float("nan"), "double")
    assert not passes(spark, K.number().valid(float("nan"), 5.0),
                      float("nan"), "double")
    assert passes(spark, K.number().valid(float("nan"), 5.0),
                  5.0, "double")
    assert not passes(spark, K.any().equal(float("nan")),
                      float("nan"), "double")


# -- When corners ----------------------------------------------------------


def test_when_nil_condition_matches_nil_ref(spark):
    """schema.go:35-37 via Go interface equality: nil == nil is true, so
    when(ref, None, then) fires exactly where the ref value is nil."""
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", "set")],
        "id int, v string, x string")
    schema = K.object({
        "v": K.string().when("x", None, K.string().set("was-null"))})
    res = validate(df, schema, id_cols=["id"])
    norm = {r["id"]: r["v"]
            for r in res.normalized.select("id", "v").collect()}
    assert norm == {1: "was-null", 2: "b"}


def test_when_condition_schema_over_array_ref(spark):
    """schema.go:26-33: a condition schema validates the REF value in a
    fresh context — here K.array().min(1) over an array column, which
    previously compiled against a type-mismatched placeholder and was
    constant false."""
    df = spark.createDataFrame(
        [(1, "a", [1.0]), (2, "b", []), (3, "c", None)],
        "id int, v string, arr array<double>")
    schema = K.object({
        "v": K.string().when("arr", K.array().min(1),
                             K.string().set("has-items"))})
    res = validate(df, schema, id_cols=["id"])
    norm = {r["id"]: r["v"]
            for r in res.normalized.select("id", "v").collect()}
    # row 3 (arr NULL): jio auto-applies Optional, a nil value SKIPS the
    # condition chain without error, and skip-without-error counts as a
    # condition pass (schema.go:26-33) — so `then` fires there too
    assert norm == {1: "has-items", 2: "b", 3: "has-items"}
    # an explicitly required condition schema rejects the nil ref
    strict = K.object({
        "v": K.string().when("arr", K.array().required().min(1),
                             K.string().set("has-items"))})
    res2 = validate(df, strict, id_cols=["id"])
    norm2 = {r["id"]: r["v"]
             for r in res2.normalized.select("id", "v").collect()}
    assert norm2 == {1: "has-items", 2: "b", 3: "c"}


def test_when_any_then_continues_from_coerced_value(spark):
    """schema.go:34-36: `then` judges the CURRENT ctx.Value. An Any
    `then` is not type-changing — it must see the parsed number, not the
    raw string column."""
    df = spark.createDataFrame(
        [(1, "5", True), (2, "6", True), (3, "6", False)],
        "id int, v string, flag boolean")
    schema = K.object({
        "v": K.number().parse_string().when("flag", True,
                                            K.any().equal(5))})
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: True}


def test_when_inside_condition_or_items_refused(spark):
    """The reference roots condition/Items sub-contexts at the ref/
    element value; this compiler cannot rebase refs, so a when() inside
    them must refuse at compile time instead of silently resolving
    against the document root."""
    df = spark.createDataFrame([(1, [1.0], 2.0)],
                               "id int, arr array<double>, x double")
    with pytest.raises(NotImplementedError, match="lift the when"):
        validate(df, K.object({
            "arr": K.array().items(
                K.number().when("x", 2.0, K.number().min(0)))}),
            id_cols=["id"])
    with pytest.raises(NotImplementedError, match="lift the when"):
        validate(df, K.object({
            "x": K.number().when(
                "arr", K.array().when("x", 2.0, K.array()),
                K.number().min(0))}), id_cols=["id"])
