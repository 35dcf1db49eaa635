"""Compiler-core divergences pinned after the round-4 core review:
nested-object write-back when a coercing child rebuilds the struct type
(no implicit hard cast under ANSI), the stale integral spark_type after
Set/Default of a float (number.go integer gate), cross-typed literals in
Number/String Equal/Valid (Go interface equality — '5' != 5), DecimalType
message rendering (Go %v of float64 prints the shortest form), and the
compile-time refusal of literal-dot column names."""

import pytest

from jio_spark import K, validate
from helpers import message, passes, run_leaf


# -- nested object with a coercing child (object.go:139-169 walk +
#    ParseString write-back) — the parent-level otherwise(original) must
#    not insert an implicit hard cast of the original struct ------------


def test_nested_coercing_child_no_ansi_crash(spark):
    """K.object({'o': {'n': parse_string}}) over struct<n:string> rows
    ['12', 'abc']: the inner rebuilt struct is struct<n:double>; the
    parent write-back must try_cast, not hard-cast, the original (an
    implicit Cast crashes with CAST_INVALID_INPUT on 'abc' under ANSI)."""
    df = spark.createDataFrame(
        [(0, ("12",)), (1, ("abc",))], "id int, o struct<n:string>")
    res = validate(
        df, K.object({"o": K.object({"n": K.number().parse_string()})}),
        id_cols=["id"])
    rows = (res.prepared.select(
        "id", res.compiled.row_pass.alias("p"),
        res.compiled.normalized["o"].alias("o"))
        .orderBy("id").collect())          # must not raise
    assert rows[0]["p"] is True
    assert rows[0]["o"]["n"] == 12.0       # coerced write-back
    assert rows[1]["p"] is False
    # failed parse: reference keeps the original string; the typed
    # output column is struct<n:double> so the kept value rides a
    # try_cast (documented typed-table deviation) -> null, not a crash
    assert rows[1]["o"]["n"] is None


def test_nested_coercing_child_three_levels(spark):
    """Same class one level deeper: the rebuilt type must propagate so
    EVERY enclosing when/otherwise agrees on the struct type."""
    df = spark.createDataFrame(
        [(0, (("7",),)), (1, (("x",),))],
        "id int, a struct<b:struct<n:string>>")
    res = validate(
        df,
        K.object({"a": K.object(
            {"b": K.object({"n": K.number().parse_string()})})}),
        id_cols=["id"])
    rows = (res.prepared.select(
        "id", res.compiled.row_pass.alias("p"),
        res.compiled.normalized["a"].alias("a"))
        .orderBy("id").collect())
    assert rows[0]["p"] is True and rows[0]["a"]["b"]["n"] == 7.0
    assert rows[1]["p"] is False


# -- Set/Default of a float literal over an integral column: the carrier
#    is now a double, so Integer must really check (number.go:71-76) ----


def test_set_float_then_integer_fails_on_int_column(spark):
    assert not passes(spark, K.number().set(5.5).integer(), 3, "int")
    assert not passes(spark, K.number().set(5.5).integer(), 3, "bigint")
    # sanity: an integral float literal still passes, on both carriers
    assert passes(spark, K.number().set(5.0).integer(), 3, "int")
    assert passes(spark, K.number().set(5.0).integer(), 3.3, "double")


def test_default_float_then_integer_fails_on_null_int(spark):
    rows = run_leaf(spark, K.number().default(5.5).integer(),
                    [None, 3], "int")
    assert rows[0][1] is False      # null -> 5.5 -> integer() aborts
    assert rows[1][1] is True       # 3 untouched, integral
    # the substituted value is written back even though integer() then
    # fails? No: failed chain => no write-back (any.go:48 + first-error)
    assert rows[0][2] is None or rows[0][2] == 5.5


def test_set_float_then_min_uses_double(spark):
    # the retagged carrier must feed comparisons as a double
    assert passes(spark, K.number().set(5.5).min(5.2), 1, "int")
    assert not passes(spark, K.number().set(5.5).max(5.2), 9, "int")


# -- cross-typed literals in Equal/Valid: Go interface equality is
#    always false across types; Spark's implicit string<->double cast
#    must not leak through (number.go:83-90, string.go) -----------------


def test_number_equal_string_literal_never_matches(spark):
    assert not passes(spark, K.number().equal("5"), 5.0, "double")
    assert not passes(spark, K.number().equal("5"), 5, "int")
    assert passes(spark, K.number().equal(5), 5.0, "double")


def test_number_valid_mixed_literals(spark):
    # "5" can never match; 7.0 still can (the one real member)
    assert not passes(spark, K.number().valid("5", 7.0), 5.0, "double")
    assert passes(spark, K.number().valid("5", 7.0), 7.0, "double")
    # all members cross-typed -> compiled to constant-false, not a crash
    assert not passes(spark, K.number().valid("5", "7"), 5.0, "double")


def test_string_equal_number_literal_never_matches(spark):
    assert not passes(spark, K.string().equal(5), "5", "string")
    assert not passes(spark, K.string().valid(5, True), "5", "string")
    assert passes(spark, K.string().valid(5, "5"), "5", "string")


# -- DecimalType message rendering: type_tag says 'double', so the
#    message must print Go %v of the float64 — shortest form, not the
#    decimal's full scale ------------------------------------------------


def test_decimal_message_shortest_form(spark):
    from decimal import Decimal
    msg = message(spark, K.number().min(100),
                  Decimal("12.5"), "decimal(20,10)")
    assert "12.5 " in msg and "12.5000000000" not in msg


def test_decimal_integral_message_no_trailing_zeros(spark):
    from decimal import Decimal
    msg = message(spark, K.number().min(100),
                  Decimal("42"), "decimal(20,10)")
    assert "42 " in msg and "42.0000000000" not in msg


# -- literal-dot column names are unaddressable by the dot-delimited
#    path conventions: refuse loudly at compile time ---------------------


def test_dotted_column_name_refused(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "a.b"])
    with pytest.raises(ValueError, match=r"a\.b"):
        validate(df, {"a.b": K.string().lowercase()}, id_cols=["id"])


def test_undotted_names_still_compile(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "ab"])
    res = validate(df, {"ab": K.string().uppercase()}, id_cols=["id"])
    rows = res.prepared.select(
        res.compiled.normalized["ab"].alias("v")).collect()
    assert rows[0]["v"] == "X"
