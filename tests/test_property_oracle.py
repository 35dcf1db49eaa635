"""Property tests: compiled Column verdicts vs the pure-Python jio oracle
(SURVEY.md §5.2 item 4 — the reference has no property tests; we add them).

Each Hypothesis example is a BATCH of values packed into one DataFrame so
a whole example costs one Spark job, keeping runtime sane."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jio_spark import K, validate
from jio_oracle import jio_validate

SETTINGS = dict(max_examples=6, deadline=None,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.function_scoped_fixture])

finite_doubles = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    st.integers(min_value=-10**6, max_value=10**6).map(float))

safe_text = st.one_of(
    st.none(),
    st.text(alphabet="abcXYZ019 _\t.é\xa0\u3000\u2028\x1c",
            min_size=0, max_size=12))


def run_chain(spark, schema, values, dtype):
    df = spark.createDataFrame(
        list(zip(range(len(values)), values)), f"id int, v {dtype}")
    res = validate(df, K.object({"v": schema.clone()}), id_cols=["id"])
    norm = res.compiled.normalized["v"]
    rows = (res.prepared
            .select("id", res.compiled.row_pass.alias("p"),
                    norm.alias("n"))
            .orderBy("id").collect())
    return [(r["p"], r["n"]) for r in rows]


def check(spark, schema, values, dtype):
    got = run_chain(spark, schema, values, dtype)
    for val, (g_pass, g_norm) in zip(values, got):
        err, o_val = jio_validate(schema, val)
        assert g_pass == (err is None), \
            f"value={val!r}: spark pass={g_pass}, oracle err={err}"
        if err is None and isinstance(o_val, float) and g_norm is not None:
            if math.isnan(o_val):
                assert math.isnan(float(g_norm)), (val, g_norm, o_val)
            else:
                assert math.isclose(float(g_norm), o_val, rel_tol=1e-9,
                                    abs_tol=1e-9), (val, g_norm, o_val)


@settings(**SETTINGS)
@given(st.lists(finite_doubles, min_size=1, max_size=40),
       st.floats(-100, 100, allow_nan=False),
       st.floats(-100, 100, allow_nan=False),
       st.booleans())
def test_number_chains(spark, values, lo, hi, req):
    s = K.number()
    s = s.required() if req else s.optional()
    s = s.min(min(lo, hi)).max(max(lo, hi))
    check(spark, s, values, "double")


@settings(**SETTINGS)
@given(st.lists(finite_doubles, min_size=1, max_size=40),
       st.sampled_from(["ceil", "floor", "round", "integer"]))
def test_number_mutations(spark, values, op):
    s = getattr(K.number(), op)()
    check(spark, s, values, "double")


@settings(**SETTINGS)
@given(st.lists(safe_text, min_size=1, max_size=40),
       st.integers(0, 8), st.integers(0, 16),
       st.sampled_from(["lowercase", "uppercase", "trim", "none"]))
def test_string_chains(spark, values, lo, hi, op):
    """The safe_text alphabet includes NBSP / ideographic space / LS
    (White_Space: trimmed) and \\x1c (NOT White_Space: kept) so `trim`
    is differentially checked against the Go-exact oracle set."""
    s = K.string().min(min(lo, hi)).max(max(lo, hi))
    if op == "lowercase":
        s = s.lowercase()
    elif op == "uppercase":
        s = s.uppercase()
    elif op == "trim":
        s = s.trim()
    check(spark, s, values, "string")


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.text(alphabet="0123456789.xab", min_size=0,
                                  max_size=8)),
                min_size=1, max_size=40))
def test_parse_string_chain(spark, values):
    s = K.number().parse_string().min(-1e9).max(1e9)
    # Go ParseFloat and Spark try_cast diverge on corner spellings like
    # "." or "0x1p3"; restrict to plain decimal-ish inputs (dialect note
    # in SURVEY.md §7 "exactness corners")
    check(spark, s, values, "string")


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.sampled_from(
    ["on", "off", "yes", "no", "maybe", ""])), min_size=1, max_size=30))
def test_bool_coercions(spark, values):
    s = K.bool().truthy("on", "yes").falsy("off", "no")
    check(spark, s, values, "string")


_MEMBER_POOL = ["a", "bc", "", "é9", "X _"]


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.sampled_from(_MEMBER_POOL),
                          safe_text),
                min_size=1, max_size=30),
       st.lists(st.sampled_from(_MEMBER_POOL), min_size=1, max_size=4,
                unique=True),
       st.sampled_from(["valid", "equal", "set_then_equal"]))
def test_string_membership_chains(spark, values, members, op):
    """Valid / Equal / Set against the pure-Python oracle — including
    Set's unconditional replacement being visible to a later Equal."""
    if op == "valid":
        s = K.string().valid(*members)
    elif op == "equal":
        s = K.string().equal(members[0])
    else:
        s = K.string().set(members[0]).equal(members[0])
    check(spark, s, values, "string")


@settings(**SETTINGS)
@given(st.lists(finite_doubles, min_size=1, max_size=30),
       st.lists(st.integers(-3, 3).map(float), min_size=1, max_size=4,
                unique=True))
def test_number_membership_chains(spark, values, members):
    check(spark, K.number().valid(*members), values, "double")


@settings(**SETTINGS)
@given(st.lists(safe_text, min_size=1, max_size=30),
       st.sampled_from([r"^a", r"[0-9]", r"c$", r"a.c", r"^[abc]+$",
                        r"\d\d"]))
def test_regex_chain(spark, values, pattern):
    """Unanchored must-match regex — patterns restricted to the
    RE2∩Java∩Python shared dialect (SURVEY.md conformance corpus
    note)."""
    check(spark, K.string().regex(pattern), values, "string")


_GOISH_CORNERS = [
    "1_000.5", "1_000", "1e1_0", "_1", "1_", "1__0", "1_.5", "1._5",
    "1.5_", "1e_1", "1e309", "-1e309", "1e308", "1e-400", " 1", "1 ",
    "+inf", "-Infinity", "NaN", "nan", "INF", ".5", "5.", "+.5e-2",
    "0x1p-3", "1e", "e1", ".", "+", "-", "", "1..2", "1e+.2",
    # non-ASCII decimal digits: Python's default \d matches them and
    # float() parses them, but Go strconv and Java rlike \d are
    # ASCII-only — the oracle compiles with re.ASCII to agree (r3 ADVICE)
    "١٢", "1٢", "٣.5", "۴۵",
]

goish_literals = st.one_of(
    st.sampled_from(_GOISH_CORNERS),
    st.text(alphabet="0123456789_.eE+- ", min_size=0, max_size=12))


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), goish_literals),
                min_size=1, max_size=40))
def test_parse_string_go_syntax_differential(spark, values):
    """Differential fuzz of the Go ParseFloat translation: random
    digit/underscore/exponent/sign/space strings (plus a corner pool:
    underscore placements, ErrRange magnitudes, padding, inf/nan forms,
    hex floats) must get the same verdict and parsed value from the
    compiled regex+cast path and the pure-Python Go-syntax oracle.

    Documented exactness corners excluded: extreme underflow ('1e-400'
    and random tiny exponents parse to 0.0 here but ErrRange in Go —
    compiler.py documents this), so magnitude-underflow strings are
    filtered from the random pool."""
    def underflows(x):
        if x is None or not any(ch.isdigit() for ch in x):
            return False
        try:
            return float(x.replace("_", "")) == 0.0 \
                and not all(c in "0.+-_eE " for c in x)
        except ValueError:
            return False
    vals = [x for x in values if not underflows(x)]
    if not vals:
        vals = ["1"]
    check(spark, K.number().parse_string(), vals, "string")
