"""Reference-semantics edge cases pinned after the round-2 compiler
review: map-backed keys() walks, `when` as a continuation of the coerced
value, Transform over untyped values, float-domain number mutations,
Unicode trim, Go ParseFloat syntax, empty Items, and With/Without type
gating. Each cites the reference behavior it reproduces."""

import math

import pyspark.sql.functions as F
import pytest

from jio_spark import K, validate
from helpers import message, mutated, passes, run_leaf


def test_keys_walk_over_map_column(spark):
    """object.go:139-169 over a map document: children validate the value
    at each key; a missing key is nil (Required fails, Optional skips)."""
    df = spark.createDataFrame(
        [(1, {"hi": "abcdef", "n": "x"}),
         (2, {"hi": "x", "n": "x"}),          # hi too short
         (3, {"n": "x"})],                    # hi absent -> required fails
        "id int, m map<string,string>")
    schema = K.object({"m": K.object().keys({
        "hi": K.string().required().min(5)})})
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: False}
    msgs = {r["id"]: r["message"] for r in res.violations.collect()}
    assert "length less than 5" in msgs[2]
    assert msgs[3] == "field `m.hi` is required"
    # optional absent key passes
    opt = validate(df, K.object({"m": K.object().keys({
        "absent": K.string().min(2)})}), id_cols=["id"])
    assert all(r["_pass"] for r in opt.annotated.collect())


def test_when_continues_from_coerced_value(spark):
    """schema.go:34-36: `then` validates the CURRENT ctx.Value — here a
    string already parsed to a number by ParseString — not the raw
    column."""
    df = spark.createDataFrame(
        [(1, "10", "strict"), (2, "3", "strict"), (3, "3", "lax")],
        "id int, v string, mode string")
    schema = K.object({
        "mode": K.string().required(),
        "v": K.number().parse_string()
              .when("mode", "strict", K.number().min(5)),
    })
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    # parsed 10 >= 5 passes; parsed 3 fails ONLY under strict
    assert got == {1: True, 2: False, 3: True}


def test_when_equality_is_type_strict(spark):
    """schema.go:35-37 is Go interface equality: a string '5' does NOT
    equal the number 5, so the conditional never fires."""
    df = spark.createDataFrame([(1, "5", "x")],
                               "id int, status string, v string")
    schema = K.object({
        "status": K.string(),
        "v": K.string().when("status", 5, K.string().min(10)),
    })
    res = validate(df, schema, id_cols=["id"])
    assert res.annotated.collect()[0]["_pass"]   # then never applied


def test_when_ref_through_map(spark):
    """context.go:29-44: Ref walks map documents; m.mode resolves."""
    df = spark.createDataFrame(
        [(1, {"mode": "strict"}, "ab"), (2, {"mode": "lax"}, "ab")],
        "id int, m map<string,string>, v string")
    schema = K.object({
        "m": K.object(),
        "v": K.string().when("m.mode", "strict", K.string().min(5)),
    })
    # m under K.object() (no keys) is a map -> passes the type check;
    # the ref resolves through the map for the sibling's when
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: False, 2: True}


def test_prepend_transform_on_untyped_value(spark):
    """any.go:32-41: Transform receives the raw value whatever its type —
    stripping '$' from a string column under a Number schema before
    ParseString."""
    s = (K.number()
         .prepend_transform(lambda c: F.regexp_replace(c, r"[$]", ""))
         .parse_string().min(2))
    rows = run_leaf(spark, s, ["$5", "5", "$1", "x"], "string")
    assert [r[1] for r in rows] == [True, True, False, False]
    assert rows[0][2] == 5.0


def test_number_mutations_beyond_long_range(spark):
    """Go math.Trunc/Ceil/Floor/Round operate in the float domain: any
    |v| >= 2^53 is already integral and maps to itself (no int64 clamp)."""
    big = 1e19
    assert mutated(spark, K.number().floor(), big, "double") == big
    assert mutated(spark, K.number().ceil(), -big, "double") == -big
    assert mutated(spark, K.number().round(), big, "double") == big
    assert passes(spark, K.number().integer(), big, "double")


def test_trim_unicode_whitespace(spark):
    """strings.TrimSpace trims the Unicode White_Space set: NBSP, NEL,
    EM SPACE, IDEOGRAPHIC SPACE — not just ASCII."""
    v = "  a　"
    assert mutated(spark, K.string().trim(), v, "string") == "a"
    assert passes(spark, K.string().trim().length(1), v, "string")


def test_parse_string_go_float_syntax(spark):
    """strconv.ParseFloat: no surrounding whitespace, but inf/infinity/
    nan forms parse (number.go:190-201)."""
    s = K.number().parse_string()
    assert not passes(spark, s, " 1 ", "string")     # Go rejects padding
    assert not passes(spark, s, "1 2", "string")
    assert mutated(spark, s, "+inf", "string") == float("inf")
    assert mutated(spark, s, "-Infinity", "string") == float("-inf")
    assert math.isnan(mutated(spark, s, "NaN", "string"))
    assert mutated(spark, s, "-1.5e2", "string") == -150.0


def test_items_with_no_schemas(spark):
    """array.go:95-113 with zero Items schemas: no schema can validate an
    element, so empty arrays pass and non-empty arrays abort."""
    df = spark.createDataFrame([(1, []), (2, ["x"])],
                               "id int, v array<string>")
    res = validate(df, K.object({"v": K.array().items()}), id_cols=["id"])
    got = {r["id"]: r["_pass"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}


def test_with_on_non_object_aborts_per_row(spark):
    """object.go:96-99: With on a non-object value is a per-row
    `is not object` abort, not a compile error."""
    rows = run_leaf(spark, K.object().with_keys("a"), ["x", None],
                    "string")
    assert rows[0][1] is False
    assert rows[0][3] == "field `v` value x is not object"
    assert rows[1][1] is True     # null skips via implicit Optional


# -- round-3 advisory fixes --------------------------------------------------


def test_round_ulp_boundaries(spark):
    """Go math.Round is exact everywhere; the naive floor(abs+0.5)
    translation rounds up across integer boundaries whenever abs+0.5 is
    unrepresentable — odd integral v in [2^52, 2^53) AND fractions one
    ulp below .5. The exact-fraction form handles both."""
    odd = float(2**52 + 1)            # representable, odd, in the window
    assert mutated(spark, K.number().round(), odd, "double") == odd
    assert mutated(spark, K.number().round(), -odd, "double") == -odd
    # largest double < 0.5: Go math.Round returns 0, floor(abs+0.5)=1
    ulp = 0.49999999999999994
    assert mutated(spark, K.number().round(), ulp, "double") == 0.0
    assert mutated(spark, K.number().round(), -ulp, "double") == -0.0
    assert mutated(spark, K.number().round(), 2.5, "double") == 3.0
    assert mutated(spark, K.number().round(), -2.5, "double") == -3.0
    assert mutated(spark, K.number().round(), 2.4999999999999996,
                   "double") == 2.0
    # floor/ceil unchanged in the window (exact below 2^53)
    assert mutated(spark, K.number().floor(), odd + 0.0, "double") == odd


def test_parse_string_underscores_and_range(spark):
    """strconv.ParseFloat accepts Go-literal underscores (single, strictly
    between digits) and returns ErrRange — an abort in number.go:193-197 —
    for out-of-range magnitudes like 1e309."""
    s = K.number().parse_string()
    assert mutated(spark, s, "1_000.5", "string") == 1000.5
    assert mutated(spark, s, "1_000", "string") == 1000.0
    assert mutated(spark, s, "1e1_0", "string") == 1e10
    for bad in ["_1", "1_", "1__0", "1_.5", "1._5", "1.5_", "1e_1"]:
        assert not passes(spark, s, bad, "string"), bad
    # overflow: syntactically valid but ErrRange in Go -> abort, not +Inf
    assert not passes(spark, s, "1e309", "string")
    assert not passes(spark, s, "-1e309", "string")
    assert mutated(spark, s, "1e308", "string") == 1e308
    # explicit inf forms still parse (they are not range errors)
    assert mutated(spark, s, "+inf", "string") == float("inf")


def test_when_then_mutations_write_back(spark):
    """schema.go:34-36 mutates ctx.Value in place: Set/Transform/
    ParseString inside a `when` branch are visible to later rules and in
    the normalized output — including mutations on the UNTYPED branch
    (a string being coerced under a Number schema)."""
    df = spark.createDataFrame(
        [(1, "strict", "$5"), (2, "lax", "$5")],
        "id int, mode string, v string")
    schema = K.object({
        "mode": K.string().required(),
        "v": K.number().when(
            "mode", "strict",
            K.number()
             .prepend_transform(lambda c: F.regexp_replace(c, r"[$]", ""))
             .parse_string().min(2)),
    })
    res = validate(df, schema, id_cols=["id"])
    rows = {r["id"]: r for r in res.prepared.withColumn(
        "v_norm", res.compiled.normalized["v"]).collect()}
    assert rows[1]["v_norm"] == 5.0        # then-branch coercion lands
    assert rows[2]["v_norm"] is None       # '$5' never became a number
    # same-type Set under when
    df2 = spark.createDataFrame([(1, "ERROR", "x"), (2, "OK", "y")],
                                "id int, t string, v string")
    res2 = validate(df2, K.object({
        "t": K.string().required(),
        "v": K.string().when("t", "ERROR", K.string().set("MUT")),
    }), id_cols=["id"])
    got = {r["id"]: r["v"] for r in res2.normalized.collect()}
    assert got == {1: "MUT", 2: "y"}


def test_transform_probe_keeps_plan_runnable(spark):
    """A Transform fn that cannot analyze against the untyped column's
    type (sort_array over a string) must not poison the whole plan with
    an action-time AnalysisException: the eager probe skips the untyped
    branch and the per-row type check reports normally."""
    rows = run_leaf(spark, K.array().transform(F.sort_array),
                    ["x", None], "string")
    assert rows[0][1] is False             # 'x' is not array
    assert rows[1][1] is True              # null skips


def test_chained_validates_are_independent(spark):
    """Two compiled rule sets stack over one scan: validate() over a
    prior result's prepared frame must leave the first result's
    expressions intact (collision-free SSA prefixes) and produce the
    same verdicts as two independent runs."""
    df = spark.createDataFrame(
        [(1, 5.0, "A"), (2, 99.0, "B"), (3, None, "A")],
        "id int, v double, t string")
    r1 = validate(df, K.object({"v": K.number().required().max(50)}),
                  id_cols=["id"])
    r2 = validate(r1.prepared, K.object({"t": K.string().equal("A")}),
                  id_cols=["id"])
    rows = {r["id"]: (r["p1"], r["p2"]) for r in r2.prepared.select(
        "id", r1.compiled.row_pass.alias("p1"),
        r2.compiled.row_pass.alias("p2")).collect()}
    assert rows == {1: (True, True), 2: (False, False), 3: (False, True)}
    # equal to the independent runs
    solo1 = {r["id"]: r["_pass"] for r in validate(
        df, K.object({"v": K.number().required().max(50)}),
        id_cols=["id"]).annotated.collect()}
    solo2 = {r["id"]: r["_pass"] for r in validate(
        df, K.object({"t": K.string().equal("A")}),
        id_cols=["id"]).annotated.collect()}
    assert all(rows[i] == (solo1[i], solo2[i]) for i in rows)


def test_driver_registry_contract():
    """The driver harness records at most a 50-entry prefix of queries()
    (observed in round 2): the registry must stay EXACTLY 50 entries, and
    since round 4 EVERY query carries a DuckDB oracle (the former
    rows-only four got independently-derived VALUES-literal / bounds
    oracles — tools/derive_rows_only_oracles.py)."""
    import __spark_entry__ as E
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) == 50
    assert set(os_) == set(qs)


def test_when_ref_unresolvable_is_noop(spark):
    """context.go:36-42: ctx.Ref returns ok=false — and the When becomes a
    per-document NO-OP (schema.go:23-25) — when an intermediate on the
    dotted path is nil (not an object) or a MAP key is absent. This
    differs observably from a PRESENT ref holding nil: there ok=true and a
    condition schema still validates the nil (implicit Optional ⇒ pass ⇒
    `then` runs)."""
    df = spark.createDataFrame(
        [(1, None, "keep"),                       # o nil → ref unresolvable
         (2, (None, "y"), "keep")],               # o.x present-but-nil
        "id int, o struct<x: double, y: string>, v string")
    schema = K.object({
        "o": K.object(),
        # condition K.number() passes on nil (Optional skip, no error)
        "v": K.string().when("o.x", K.number(), K.string().set("GATED")),
    })
    res = validate(df, schema, id_cols=["id"])
    got = {r["id"]: r["v"] for r in res.normalized.collect()}
    assert got == {1: "keep", 2: "GATED"}

    # absent MAP key vs present-with-value: same ok=false distinction
    dfm = spark.createDataFrame(
        [(1, {"other": "x"}, "keep"), (2, {"mode": None}, "keep"),
         (3, {"mode": "on"}, "keep")],
        "id int, m map<string,string>, v string")
    schema_m = K.object({
        "m": K.object(),
        "v": K.string().when("m.mode", K.string().optional(),
                             K.string().set("GATED")),
    })
    resm = validate(dfm, schema_m, id_cols=["id"])
    gotm = {r["id"]: r["v"] for r in resm.normalized.collect()}
    # absent key (1) → no-op; present-nil (2) and present (3) → then runs
    assert gotm == {1: "keep", 2: "GATED", 3: "GATED"}


def test_annotated_refuses_reserved_column_clash(spark):
    """Feeding a prior run's annotated frame (or any input carrying
    _pass/_violations/_first_violation) back into validate(...).annotated
    must refuse loudly: withColumn would silently REPLACE the user's
    column with this run's verdicts. Same reserved-name contract as
    sinks.writers.exemplar_cap. The other faces (violations, normalized,
    verdicts) don't add these columns and still work."""
    df = spark.createDataFrame([(1, 5)], "id int, q int")
    first = validate(df, {"q": K.number().min(1)}, id_cols=["id"])
    ann = first.annotated            # ok: no clash on the raw input
    assert ann.collect()[0]["_pass"]

    again = validate(ann, {"q": K.number().min(99)}, id_cols=["id"])
    with pytest.raises(ValueError, match="_pass"):
        _ = again.annotated
    # non-clobbering faces still usable on the same input
    assert again.violations.count() == 1
    assert again.normalized.columns == ann.columns
