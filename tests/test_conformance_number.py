"""Ported NumberSchema conformance cases (reference: number_test.go)."""

from pyspark.sql import functions as F

from jio_spark import K
from helpers import message, mutated, passes, run_leaf


def test_required(spark):
    # number_test.go:39-46
    assert not passes(spark, K.number().required(), None, "double")
    assert message(spark, K.number().required(), None, "double") \
        == "field `v` is required"


def test_optional(spark):
    # number_test.go:48-55
    assert passes(spark, K.number().optional(), None, "double")


def test_default(spark):
    # number_test.go:57-65
    assert mutated(spark, K.number().default(1.0), None, "double") == 1.0


def test_set(spark):
    # number_test.go:67-75
    assert mutated(spark, K.number().set(1.2), 2.3, "double") == 1.2


def test_equal(spark):
    # number_test.go:77-90
    s = K.number().equal(3)
    assert passes(spark, s, 3.0, "double")
    assert not passes(spark, s, 5.0, "double")
    assert message(spark, s, 5.0, "double") == "field `v` value 5 is not 3"


def test_check(spark):
    # number_test.go:121-145
    s = K.number().check(lambda c: c == 1.0, "not equal to 1.0")
    assert passes(spark, s, 1.0, "double")
    assert not passes(spark, s, 2.0, "double")
    # non-number input ("???" as a string column): type gate fires
    assert not passes(spark, s, "???", "string")
    assert message(spark, s, "???", "string") \
        == "field `v` value ??? is not number"


def test_valid(spark):
    # number_test.go:147-161
    s = K.number().valid(1)
    assert passes(spark, s, 1.0, "double")
    assert not passes(spark, s, 2.0, "double")
    assert message(spark, s, 2.0, "double") \
        == "field `v` value 2 not in [1]"


def test_min(spark):
    # number_test.go:163-176
    s = K.number().min(3)
    assert not passes(spark, s, 2.0, "double")
    assert passes(spark, s, 5.0, "double")
    assert message(spark, s, 2.0, "double") \
        == "field `v` value 2 less than 3"


def test_max(spark):
    # number_test.go:178-191
    s = K.number().max(3)
    assert passes(spark, s, 2.0, "double")
    assert not passes(spark, s, 5.0, "double")
    assert message(spark, s, 5.0, "double") \
        == "field `v` value 5 exceeded 3"


def test_integer(spark):
    # number_test.go:193-206
    s = K.number().integer()
    assert not passes(spark, s, 3.1, "double")
    assert passes(spark, s, 5.0, "double")
    # integral Spark types pass trivially
    assert passes(spark, s, 5, "long")


def test_convert(spark):
    # number_test.go:208-223
    s = K.number().convert(lambda c: c + 1)
    assert mutated(spark, s, 1.0, "double") == 2.0
    assert not passes(spark, s, "??", "string")


def test_ceil(spark):
    # number_test.go:225-237
    assert mutated(spark, K.number().ceil(), 1.1, "double") == 2.0
    assert mutated(spark, K.number().ceil(), 1.9, "double") == 2.0


def test_floor(spark):
    # number_test.go:239-251
    assert mutated(spark, K.number().floor(), 1.1, "double") == 1.0
    assert mutated(spark, K.number().floor(), 1.9, "double") == 1.0


def test_round(spark):
    # number_test.go:253-265 (+ half-away-from-zero on negatives,
    # Go math.Round semantics)
    assert mutated(spark, K.number().round(), 1.1, "double") == 1.0
    assert mutated(spark, K.number().round(), 1.9, "double") == 2.0
    assert mutated(spark, K.number().round(), -1.5, "double") == -2.0
    assert mutated(spark, K.number().round(), 1.5, "double") == 2.0


def test_validate_default_optional_and_type(spark):
    # number_test.go:267-280
    assert passes(spark, K.number(), None, "double")
    assert not passes(spark, K.number(), "hhh", "string")
    assert message(spark, K.number(), "hhh", "string") \
        == "field `v` value hhh is not number"


def test_parse_string(spark):
    # number_test.go:282-294
    s = K.number().parse_string()
    assert mutated(spark, s, "1.1", "string") == 1.1
    assert not passes(spark, s, "hi1.1", "string")
    assert message(spark, s, "hi1.1", "string") \
        == "field `v` value hi1.1 corvert to float64 failed"
    # non-strings pass through untouched (number.go:188-189)
    assert mutated(spark, s, 2.5, "double") == 2.5


def test_parse_string_then_range(spark):
    # composition: ParseString feeding Min/Max (README query-param idiom)
    s = K.number().parse_string().min(1).max(100)
    rows = run_leaf(spark, s, ["50", "101", "x", None], "string")
    assert [r[1] for r in rows] == [True, False, False, True]
    assert rows[0][2] == 50.0


def test_when(spark):
    # number_test.go:92-119: value-conditions, schema-conditions, ref miss
    schema = K.object({
        "name": K.any().required(),
        "age": K.number()
            .when("name", "youth", K.number().min(12))
            .when("name", "adult", K.number().min(18))
            .when("name", K.string(), K.number().min(0)),
    })
    from jio_spark import validate
    df = spark.createDataFrame(
        [(1, "teenagers", 12.0), (2, "adult", 2.0), (3, "badcase", -3.0)],
        "id int, name string, age double")
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: False}
