"""NULL-injection differential: the driver's hash gate only proves the
Spark queries and the DuckDB oracles agree on the SHIPPED testdata, where
many columns happen to be NULL-free. This suite copies the sf0.001 tables
with NULLs deterministically injected into every column the rule queries
consume, then asserts engine and oracle still agree row-for-row — pinning
the reference's nil-walk semantics (a nil field SKIPS its chain without
error, any.go:123-125; only a NON-nil failing value aborts the sibling
walk, object.go:160-162; Default fires on any nil, any.go:67-74; a nil
under an un-required Object/When schema skips, any.go:57-64) into the
oracle SQL, not just the engine.

Divergences this suite originally caught (all oracle-side, fixed in
__spark_entry__.py): rule_default keyed nil-substitution off the
synthesized %7 mask instead of `value IS NULL`; rule_equal_set_integer
emitted 'checked' for a reached-but-NULL Set field; violations_shape
omitted the required-violation rows for NULL quantities; plus the six
guards added in the same change (rule_nested_json, rule_array_items,
rule_items_or, rule_with_without, rule_custom_transform,
rule_equal_set_integer, rule_when_priority).
"""

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as E

SRC = "/root/testdata/sf0.001"

# table -> [(column, key_col_or_None_for_lineitem_key, modulus, residue)]
INJECTIONS = {
    "events": [("props", "event_id", 5, 0),
               ("event_type", "event_id", 7, 0),
               ("value", "event_id", 11, 0)],
    "documents": [("text", "doc_id", 6, 0)],
    "customer": [("c_mktsegment", "c_custkey", 4, 0)],
    "orders": [("o_orderstatus", "o_orderkey", 5, 0),
               ("o_orderpriority", "o_orderkey", 6, 0),
               ("o_totalprice", "o_orderkey", 7, 0)],
    # NULL list (whole vector), the shape a 100 TB corpus actually has;
    # the engine's _with_norm excludes these, and DuckDB 1.0's
    # list_inner_product ERRORS on a NULL list from a scan, so the
    # oracles must drop them before any dot product
    "embeddings": [("embedding", "vec_id", 9, 3)],
    "lineitem": [("l_linestatus", None, 5, 0),
                 ("l_quantity", None, 7, 1),
                 ("l_returnflag", None, 9, 2),
                 ("l_discount", None, 11, 3),
                 ("l_extendedprice", None, 13, 4),
                 # NULL id/uniqueness KEY: excluded from duplicate
                 # groups in both layouts (NULL ≠ NULL), carried
                 # verbatim through violation-frame id columns, and
                 # survives the clustered repartitionByRange (Spark
                 # sorts NULLs first)
                 ("l_orderkey", None, 17, 5)],
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# every oracled query whose input table gets an injected column
QUERIES = [
    "rule_nested_json", "rule_with_without", "rule_when_priority",
    "rule_regex", "rule_parse_string", "rule_number_mutations",
    "rule_default",
    "rule_array_items", "rule_items_or", "text_quality", "text_lang_fp",
    "rule_custom_transform", "rule_prepend_transform",
    "rule_bool_truthy", "rule_string_normalize", "rule_when_cross_field",
    "rule_number_range", "rule_valid_set", "rule_all_strings",
    "rule_number_check", "rule_equal_set_integer", "first_violation",
    "violations_shape", "summary_counts", "agg_pricing_summary",
    # table-level checks + dedup families over the injected tables —
    # proves the shared shingle CTE and the operator SQL replays agree
    # with the engine on NULL-text/NULL-measure rows too
    "drift_psi", "agg_stats_exact", "uniqueness", "uniqueness_clustered",
    "topk_window", "referential",
    "dedup_exact", "dedup_prefix_groups", "dedup_ngram_jaccard",
    "dedup_ngram_capped", "dedup_minhash_capped", "corpus_pipeline",
    "dedup_minhash_lsh", "dedup_simhash", "stats_profile",
    "embed_cosine_pairs", "ann_bruteforce", "ann_lsh", "dedup_embed_lsh",
    "ann_ivf",
    # streaming: the injected NULL values must surface as required-rule
    # violations through the AvailableNow ledger, same as batch
    "stream_validate",
]


@pytest.fixture(scope="module")
def nulled_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("nulldata")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        if t not in INJECTIONS:
            os.symlink(src, out / f"{t}.parquet")
            continue
        tab = pq.read_table(src)
        li_key = None
        if t == "lineitem":
            li_key = (tab.column("l_orderkey").to_numpy() * 8
                      + tab.column("l_linenumber").to_numpy())
        for (col, keycol, mod, res) in INJECTIONS[t]:
            k = li_key if keycol is None else tab.column(keycol).to_numpy()
            mask = pa.array((k % mod) == res)
            idx = tab.schema.get_field_index(col)
            old = tab.column(col).combine_chunks()
            new = pc.if_else(mask, pa.nulls(len(tab), type=old.type), old)
            tab = tab.set_column(idx, tab.schema.field(idx), new)
        pq.write_table(tab, out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(nulled_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{nulled_dir}/{t}.parquet'")
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


def test_injection_actually_nulled(nulled_dir):
    # guard against the fixture silently injecting nothing (a mask bug
    # would turn every differential case into a vacuous pass)
    for t, specs in INJECTIONS.items():
        tab = pq.read_table(f"{nulled_dir}/{t}.parquet")
        for (col, _, _, _) in specs:
            assert tab.column(col).null_count > 0, (t, col)


@pytest.mark.parametrize("name", QUERIES)
def test_engine_matches_oracle_under_nulls(spark, duck, nulled_dir, name):
    sdf = E.queries()[name](spark, nulled_dir).toPandas()
    ddf = duck.execute(E.oracle_sql()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    sk = _key(sdf.to_dict("records"), cols)
    dk = _key(ddf.to_dict("records"), cols)
    diff = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
    assert sk == dk, f"{name}: engine vs oracle rows differ, e.g. {diff}"
