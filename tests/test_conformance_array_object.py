"""Ported Array + Object conformance cases (array_test.go, object_test.go,
jio_test.go e2e)."""

from pyspark.sql import functions as F

from jio_spark import K, validate
from helpers import message, mutated, passes, run_leaf


# --- Array (array_test.go) ---------------------------------------------

def test_array_required_optional_default(spark):
    assert not passes(spark, K.array().required(), None, "array<double>")
    assert passes(spark, K.array().optional(), None, "array<double>")
    assert mutated(spark, K.array().default([1.0, 2.0, 3.0, 4.0]), None,
                   "array<double>") == [1.0, 2.0, 3.0, 4.0]


def test_array_min_max_length(spark):
    # array_test.go:141-184
    assert passes(spark, K.array().min(3), [0.0, 1.0, 2.0, 3.0],
                  "array<double>")
    assert not passes(spark, K.array().min(3), [0.0], "array<double>")
    assert message(spark, K.array().min(3), [0.0], "array<double>") \
        == "field `v` value [0] length less than 3"
    assert not passes(spark, K.array().max(3), [0.0, 1.0, 2.0, 3.0],
                      "array<double>")
    assert passes(spark, K.array().max(3), [0.0], "array<double>")
    assert passes(spark, K.array().length(2), [1.0, 2.0], "array<double>")
    assert not passes(spark, K.array().length(2), [1.0], "array<double>")
    assert message(spark, K.array().length(2), [1.0], "array<double>") \
        == "field `v` value [1] length not equal to 2"


def test_array_check(spark):
    # array_test.go:96-118
    s = K.array().check(lambda c: F.size(c) == 2, "length not equal 2")
    assert passes(spark, s, [1.0, 2.0], "array<double>")
    assert not passes(spark, s, [1.0], "array<double>")
    assert not passes(spark, s, "???", "string")  # type gate
    assert message(spark, s, "???", "string") \
        == "field `v` value ??? is not array"


def test_array_items(spark):
    # array_test.go:120-139 — OR across schemas, AND across elements.
    # Typed-table adaptation: over array<double>, String() never matches,
    # so Items(Number().Integer(), String()) ⇔ every element integral.
    s = K.array().items(K.number().integer(), K.string())
    assert passes(spark, s, [1.0, 2.0], "array<double>")
    assert not passes(spark, s, [1.0, 3.1], "array<double>")
    assert message(spark, s, [1.0, 3.1], "array<double>") \
        == "field `v` value [1 3.1] not valid type"
    # over array<string> every element passes String()
    assert passes(spark, s, ["valid string", "x"], "array<string>")


def test_array_items_nested_rules(spark):
    # engine extension of the same operator: element-level rule chains
    s = K.array().items(K.number().min(0).max(10))
    assert passes(spark, s, [0.0, 5.0, 10.0], "array<double>")
    assert not passes(spark, s, [0.0, 11.0], "array<double>")


def test_array_validate(spark):
    # array_test.go:186-193
    assert passes(spark, K.array(), None, "array<double>")
    assert not passes(spark, K.array(), "???", "string")


def test_array_when(spark):
    # array_test.go:68-94
    schema = K.object({
        "length": K.string().required(),
        "list": K.array()
            .when("length", "2", K.array().length(2))
            .when("length", "3", K.array().length(3))
            .when("length", K.string(), K.array().min(1)),
    })
    df = spark.createDataFrame(
        [(1, "2", [1.0, 2.0]), (2, "3", [1.0, 2.0]), (3, None, [])],
        "id int, length string, list array<double>")
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    # row 3: `length` required fails (the reference's badcase omits the key)
    assert got == {1: True, 2: False, 3: False}


# --- Object (object_test.go) -------------------------------------------

def test_object_with(spark):
    # object_test.go:96-116, presence ⇔ IS NOT NULL on fixed schemas
    schema = K.object({}).with_keys("hi", "faceair")
    df = spark.createDataFrame(
        [(1, "11", "111"), (2, "11", None)],
        "id int, hi string, faceair string")
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}
    v = res.violations.collect()
    assert v[0]["message"] == "field `` not contains faceair"


def test_object_without(spark):
    # object_test.go:118-138
    schema = K.object({}).without_keys("hi", "faceair")
    df = spark.createDataFrame(
        [(1, "11", "111"), (2, None, None)],
        "id int, hi string, faceair string")
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: False, 2: True}
    v = res.violations.collect()
    assert v[0]["message"] == "field `` contains hi,faceair"


def test_object_keys_walk_stops_on_first_error(spark):
    # object.go:160-162: first child error stops the walk; later children
    # report NULL verdicts (not evaluated)
    schema = K.object({
        "a": K.number().min(10),
        "b": K.string().min(100),  # would fail, but must not be evaluated
    })
    df = spark.createDataFrame([(1, 5.0, "x")], "id int, a double, b string")
    res = validate(df, schema, id_cols=["id"])
    viols = res.violations.collect()
    assert len(viols) == 1 and viols[0]["rule_path"] == "a"


def test_object_when_with_schema_condition(spark):
    # object_test.go:140-165, FIXTURES conf_object2
    schema = K.object({
        "exist": K.bool().required(),
        "obj": K.object({})
            .when("exist", True, K.object({}).required())
            .when("exist", False, K.object({}).optional()),
    })
    df = spark.createDataFrame(
        [(1, True, {"k": "2"}), (2, False, None), (3, True, None)],
        "id int, exist boolean, obj struct<k:string>")
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    # row 3: jio's implicit Optional (object.go:74-81, auto-applied at
    # any.go:123-125) SKIPS the nil value before the When rules run, so
    # (exist=true, obj=nil) passes — faithfully reproduced
    assert got == {1: True, 2: True, 3: True}

    # the reference badcase: exist is not a boolean → required passes
    # (non-null) but the final bool type check aborts (bool.go:126-130)
    df2 = spark.createDataFrame([(4, "badcase", None)],
                                "id int, exist string, obj struct<k:string>")
    res2 = validate(df2, schema, id_cols=["id"])
    rows = res2.violations.collect()
    assert len(rows) == 1
    assert rows[0]["message"] == "field `exist` value badcase is not boolean"


def test_nested_keys_and_violation_paths(spark):
    # jio_test.go:43-98 ≙ README example: nested object + array length
    schema = K.object({
        "debug": K.string().required().valid("on", "off"),
        "window": K.object({
            "title": K.string().min(3).max(18),
            "size": K.array().length(2),
        }).required(),
    })
    df = spark.createDataFrame(
        [(1, "on", ("Conf", [500, 300])),
         (2, "on", ("Conf", [500])),
         (3, "hmm", ("Conf", [500, 300])),
         (4, "on", None)],
        "id int, debug string, "
        "window struct<title:string, size:array<int>>")
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}
    v = {r["id"]: (r["rule_path"], r["message"])
         for r in res.violations.collect()}
    assert v[2] == ("window.size",
                    "field `window.size` value [500] length not equal to 2")
    assert v[3][0] == "debug"
    assert v[4] == ("window", "field `window` is required")


def test_priority_order(spark):
    # object.go:17-26 (TestK_sort): higher priority validates first — check
    # via first_violations: both fields fail; the reported one must be the
    # higher-priority field
    schema = K.object({
        "a": K.number().min(100),
        "b": K.number().min(100).set_priority(5),
    })
    df = spark.createDataFrame([(1, 1.0, 2.0)],
                               "id int, a double, b double")
    res = validate(df, schema, id_cols=["id"])
    fv = res.first_violations.collect()[0]
    assert fv["rule_path"] == "b"


def test_missing_key_in_condition_or_items_schema_is_nil(spark):
    """Go reads object keys dynamically: a Keys child the object lacks
    validates NIL (object.go:156 `value, _ := ctxValue[obj.key]`). For
    the compiler, a top-level document schema still fails loudly on a
    missing COLUMN (schema-on-write config error, pinned elsewhere), but
    inside a When condition schema or an Items element schema — compiled
    as pure predicates over the ref/element value — a struct field the
    type lacks behaves as an always-nil child: Optional (implicit)
    skips, Required fails, exactly like a nil value."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from jio_oracle import jio_validate_tree

    df = spark.createDataFrame(
        [(1, 5.0, (1.0,)), (2, 5.0, None)],
        "id int, a double, o struct<x: double>")

    def run(tree):
        res = validate(df, dict(tree), id_cols=["id"])
        got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
        docs = [{"a": 5.0, "o": {"x": 1.0}}, {"a": 5.0, "o": None}]
        want = {}
        for i, d in enumerate(docs, 1):
            err, _ = jio_validate_tree(dict(tree), d)
            want[i] = err is None
        return got, want

    # optional missing key -> condition schema SKIPS clean -> then fires
    got, want = run({
        "a": K.number().when("o", K.object({"w": K.number()}),
                             K.number().min(10.0)),
        "o": K.object({"x": K.number()})})
    assert got == want == {1: False, 2: False}

    # required missing key -> condition fails -> then never fires
    got, want = run({
        "a": K.number().when("o", K.object({"w": K.number().required()}),
                             K.number().min(10.0)),
        "o": K.object({"x": K.number()})})
    assert got == want == {1: True, 2: False}
    # (row 2: ref o is nil -> condition K.object auto-optional SKIPS on
    #  nil with Err nil -> then applies -> min fails; Go gives the same)

    # Items element object schema with a missing required key: every
    # element fails; optional missing key: every element passes
    df2 = spark.createDataFrame(
        [(1, [(1.0,)]), (2, [])],
        "id int, arr array<struct<p: double>>")
    for child, want_row1 in ((K.number().required(), False),
                             (K.number(), True)):
        tree = {"arr": K.array().items(K.object({"w": child.clone()}))}
        res = validate(df2, dict(tree), id_cols=["id"])
        got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
        assert got == {1: want_row1, 2: True}
        for i, d in enumerate([{"arr": [{"p": 1.0}]}, {"arr": []}], 1):
            err, _ = jio_validate_tree(dict(tree), d)
            assert (err is None) == got[i]


def test_items_over_map_elements(spark):
    """Items element schemas over MAP-typed elements (free-form docs in
    an array): With uses REAL key presence (present-with-null passes,
    object.go:101-104 `_, ok := ctxValue[key]`), the Keys walk validates
    the nil value of a present key (optional → skip), and a missing key
    fails With before Keys runs."""
    tree = {"arr": K.array().items(
        K.object({"k": K.string().min(1)}).with_keys("k"))}
    df = spark.createDataFrame(
        [(1, [{"k": "ab"}]),     # present, min ok        → pass
         (2, [{"k": ""}]),       # min(1) on byte length  → fail
         (3, [{"other": "x"}]),  # With: k absent         → fail
         (4, [{"k": None}]),     # present-with-null: With ok, chain skips
         (5, [])],               # empty array: vacuous   → pass
        "id int, arr array<map<string,string>>")
    res = validate(df, dict(tree), id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: False, 4: True, 5: True}
