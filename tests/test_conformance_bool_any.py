"""Ported Bool + Any conformance cases (bool_test.go, any_test.go)."""

from jio_spark import K, validate
from helpers import message, mutated, passes, run_leaf


# --- Bool (bool_test.go) ---------------------------------------------------

def test_bool_required_optional_default(spark):
    assert not passes(spark, K.bool().required(), None, "boolean")
    assert passes(spark, K.bool().optional(), None, "boolean")
    assert mutated(spark, K.bool().default(True), None, "boolean") is True


def test_bool_set_equal(spark):
    assert mutated(spark, K.bool().set(False), True, "boolean") is False
    s = K.bool().equal(True)
    assert passes(spark, s, True, "boolean")
    assert not passes(spark, s, False, "boolean")
    assert message(spark, s, False, "boolean") \
        == "field `v` value false is not true"
    # Bool.Equal is an ungated interface comparison (bool.go:80-86):
    # a string value fails with "is not true", not "is not boolean"
    assert message(spark, s, "x", "string") \
        == "field `v` value x is not true"


def test_bool_truthy_falsy(spark):
    # bool_test.go:118-134
    assert mutated(spark, K.bool().truthy("yes"), "yes", "string") is True
    assert mutated(spark, K.bool().falsy("no"), "no", "string") is False
    # unmatched strings remain non-bool → final type check fails
    assert not passes(spark, K.bool().truthy("yes"), "maybe", "string")
    assert message(spark, K.bool().truthy("yes"), "maybe", "string") \
        == "field `v` value maybe is not boolean"


def test_bool_validate(spark):
    # bool_test.go:136-142
    assert passes(spark, K.bool(), None, "boolean")
    assert not passes(spark, K.bool(), "hhh", "string")


def test_bool_when(spark):
    # bool_test.go:91-116 (schema condition + value condition)
    schema = K.object({
        "bool1": K.bool().required(),
        "bool2": K.bool()
            .when("bool1", K.bool().equal(True), K.bool().equal(True))
            .when("bool1", False, K.bool().equal(False)),
    })
    df = spark.createDataFrame(
        [(1, True, True), (2, False, True), (3, False, False)],
        "id int, bool1 boolean, bool2 boolean")
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: True}


# --- Any (any_test.go) -----------------------------------------------------

def test_any_required_optional_default(spark):
    assert not passes(spark, K.any().required(), None, "string")
    assert passes(spark, K.any().optional(), None, "string")
    assert mutated(spark, K.any().default("default_value"), None,
                   "string") == "default_value"


def test_any_set(spark):
    assert mutated(spark, K.any().set("default_value"), "othor_value",
                   "string") == "default_value"


def test_any_equal(spark):
    # any_test.go:77-91
    s = K.any().equal("hi")
    assert passes(spark, s, "hi", "string")
    assert not passes(spark, s, "???", "string")
    assert message(spark, s, "???", "string") \
        == "field `v` value ??? is not hi"


def test_any_valid(spark):
    # any_test.go:122-136
    s = K.any().valid("hi")
    assert passes(spark, s, "hi", "string")
    assert not passes(spark, s, "???", "string")
    assert message(spark, s, "???", "string") \
        == "field `v` value ??? is not in [hi]"


def test_any_validate(spark):
    # any_test.go:138-145: Any passes anything, including nil
    assert passes(spark, K.any(), None, "string")
    assert passes(spark, K.any(), 3.14, "double")


def test_any_when(spark):
    # any_test.go:93-120 — Any + number-schema `then`s; the typed column is
    # double so Number().Min applies directly
    schema = K.object({
        "name": K.any().required(),
        "age": K.any()
            .when("name", "youth", K.number().min(12))
            .when("name", "adult", K.number().min(18))
            .when("name", K.string(), K.number().min(0)),
    })
    df = spark.createDataFrame(
        [(1, "teenagers", 12.0), (2, "adult", 2.0), (3, "badcase", -3.0)],
        "id int, name string, age double")
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: False}


def test_null_handling_prepend_order(spark):
    """Required/Optional/Default all PREPEND (any.go:45-74), so the LAST
    call in the chain runs FIRST on validate — the combinations are
    asymmetric in call order. run_leaf/oracle agreement for each corner:

      .required().default(5)  → rules [default, required]: a nil value is
                                substituted BEFORE required looks, passes
      .default(5).required()  → [required, default]: required aborts first
      .optional().required()  → [required, optional]: aborts
      .required().optional()  → [optional, required]: skip wins, passes
    """
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from jio_oracle import jio_validate
    cases = [
        (K.number().required().default(5.0), True, 5.0),
        (K.number().default(5.0).required(), False, None),
        (K.number().optional().required(), False, None),
        (K.number().required().optional(), True, None),
        # the substituted default still runs the REST of the chain
        (K.number().required().default(5.0).min(10.0), False, None),
        (K.number().required().default(15.0).min(10.0), True, 15.0),
    ]
    for sch, want_pass, want_val in cases:
        assert passes(spark, sch.clone(), None, "double") == want_pass
        if want_pass:
            assert mutated(spark, sch.clone(), None, "double") == want_val
        err, val = jio_validate(sch, None)
        assert (err is None) == want_pass
        if want_pass:
            assert val == want_val
