"""Messy-JSON content injection: the events.props-consuming queries
parse with Spark's JSON machinery (from_json / get_json_object), while
their DuckDB oracles replay with json_extract_string — two different
JSON parsers. The shipped testdata only carries clean '{"k": <int>}'
objects, so the driver's hash gate never exercises the parsers'
disagreement surface. This suite injects a corpus of messy-but-realistic
props shapes (doubles, quoted numbers, bools, nulls, missing keys,
nested values, int32 overflow, malformed JSON, non-object roots, Go
float spellings incl. NaN/Inf) and asserts engine and oracle still agree
row-for-row.

Replication contract pinned here (each probed shape-by-shape):
- get_json_object ≡ json_valid-guarded json_extract_string: NULL for
  malformed JSON and for non-object roots, raw scalar text otherwise.
- from_json('k int') accepts ONLY integral JSON tokens fitting int32 —
  never quoted strings, doubles, bools, or overflowing ints; malformed
  input still yields a NON-null struct (permissive mode) whose fields
  are null, so only NULL/empty props skip the un-required outer object.
- from_json('map<string,string>') is NULL (→ skip) for malformed input
  and non-object roots, including the JSON 'null' root (whose
  json_type is SQL NULL, hence IS DISTINCT FROM in the oracle).
- Go ParseFloat ≡ TRY_CAST(DOUBLE) with two exceptions the oracle
  encodes: whitespace padding (SQL casts trim, Go errors) and NaN
  (fails no min/max bound in Go; DuckDB sorts NaN above everything).

Out of contract, excluded from the corpus (divergence by design, the
first pinned below): trailing-comma JSON (DuckDB's yyjson accepts it,
Spark rejects), Go-only float spellings (underscores '1_0', hex
'0x1p4'), raw-text fidelity of over-2^53 integer tokens (DuckDB
re-renders via double), and whitespace inside nested raw values.
"""

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as E

SRC = "/root/testdata/sf0.001"

CORPUS = [
    '{"k": 12.5}', '{"k": "55"}', '{"k": true}', '{"k": null}',
    '{"k": 1e2}', '{"k": -0.0}', '{"k": 50}', '{"k": 2147483648}',
    '{"K": 5}', '{"k": [1,2]}', '{"k": {"x":1}}',
    'not json', '', '[5]', 'null', '55',
    '{"k": "abc"}', '{"k": "12.5"}', '{"k": "1e1"}', '{"k": "-3"}',
    '{"k": "NaN"}', '{"k": "Inf"}', '{"k": "+40"}', '{"k": ".5"}',
    '{"k": "5."}', '{"k": 90}', '{"k": 10}', '{"k": 9}', '{"k": 91}',
    '{"k": -7}', '{"k": " 55 "}',
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = ["rule_nested_json", "rule_parse_string", "rule_with_without",
           "rule_regex", "rule_when_priority"]


@pytest.fixture(scope="module")
def messy_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("contentdata")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        if t != "events":
            os.symlink(src, out / f"{t}.parquet")
            continue
        tab = pq.read_table(src)
        eid = tab.column("event_id").to_numpy()
        props = tab.column("props").to_pylist()
        # prime stride so successive injected rows cycle the whole
        # corpus (a divisor of the row spacing would pin every injected
        # row to one shape)
        new = [CORPUS[(e * 7 + 3) % len(CORPUS)] if e % 4 == 1 else p
               for e, p in zip(eid, props)]
        idx = tab.schema.get_field_index("props")
        tab = tab.set_column(idx, tab.schema.field(idx),
                             pa.array(new, type=pa.string()))
        pq.write_table(tab, out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(messy_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{messy_dir}/{t}.parquet'")
    yield con
    con.close()


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _key(rows, cols):
    return sorted("|".join(_canon(r[c]) for c in cols) for r in rows)


def test_corpus_fully_cycled(messy_dir):
    got = set(pq.read_table(f"{messy_dir}/events.parquet")
              .column("props").to_pylist())
    missing = [c for c in CORPUS if c not in got]
    assert not missing, f"shapes never injected: {missing}"


@pytest.mark.parametrize("name", QUERIES)
def test_engine_matches_oracle_on_messy_props(spark, duck, messy_dir,
                                              name):
    sdf = E.queries()[name](spark, messy_dir).toPandas()
    ddf = duck.execute(E.oracle_sql()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    sk = _key(sdf.to_dict("records"), cols)
    dk = _key(ddf.to_dict("records"), cols)
    diff = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
    assert sk == dk, f"{name}: engine vs oracle rows differ, e.g. {diff}"


def test_trailing_comma_is_out_of_contract(spark, duck):
    """Why trailing commas are excluded: the two parsers genuinely
    disagree — Spark's from_json rejects '{"k": 50,}' (null field)
    while DuckDB's yyjson accepts it (json_valid true, k extracted).
    If either side ever changes, this pin fails and the corpus (and
    the oracles' json_valid guard) must be revisited."""
    import pyspark.sql.functions as F
    row = (spark.createDataFrame([('{"k": 50,}',)], "props string")
           .select(F.from_json("props", "k int").alias("st"))
           .select(F.col("st.k").alias("k")).collect()[0])
    assert row["k"] is None
    dv, dk = duck.execute(
        """SELECT json_valid('{"k": 50,}'),
                  json_extract_string('{"k": 50,}', '$.k')""").fetchone()
    assert dv is True and dk == "50"
