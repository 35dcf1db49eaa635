"""Unicode/odd-whitespace content injection into documents.text: the
text and dedup oracles replay the engine's tokenization, casing, and
fingerprint normalization in DuckDB, and the shipped testdata is
ASCII-only — so the cross-dialect surface (Java regex vs RE2, JDK vs
utf8proc casing, Spark vs DuckDB trim/join corners) was never
exercised by the driver's hash gate. This suite injects a corpus of
multilingual / oddly-spaced texts and asserts all twelve
documents-reading queries still agree row-for-row.

Divergences this suite caught (fixed alongside it):
- DuckDB's one-arg trim() strips Unicode spaces (NBSP), Spark's F.trim
  strips ASCII spaces only → the fingerprint oracles now pass trim an
  explicit ' ' charset.
- F.lower uses the JDK FULL case mapping ('İ' → 'i' + combining dot,
  two code points) which DuckDB's lower does not reproduce →
  doc_fingerprint now case-folds with the repo's Go SIMPLE mapping
  (go_lower), one rune to one rune, matching DuckDB on this corpus.
  Contextual full-mapping corners (final sigma) stay out of contract.
- DuckDB array_to_string([], ' ') is NULL where Spark array_join is ''
  → the prefix-group key oracle coalesces, so empty-text docs form a
  real md5('') group instead of silently vanishing into a NULL key.

Deliberately in-corpus and AGREEING (the contract, not accidents):
ASCII-only \\s in both Java and RE2 (NBSP and U+3000 are word
characters, not separators), byte-based strlen/octet_length for string
bounds, astral-plane emoji, RTL scripts, and non-ASCII digits (\\d is
ASCII in both dialects).
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
    "café au lait très bon café",
    "日本語の文書 desu yo ne",
    "naïve résumés große straße",
    "العربية text here",
    "éléphant combining acute marks here",
    "tab\tseparated\twords\there now",
    "ideo　graphic space　here now",
    "double  space   runs    here ok",
    " nbsp lead and inner words",
    "emoji \U0001f600 mixed \U0001f680 text here",
    "İstanbul Iı dotted undotted",
    "١٢٣ arabic digits २३ devan",
    "ends with trailing spaces   ",
    "   starts with leading spaces",
    "one",
    "s-words start s1 s2 s3 same",
    "",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = ["rule_array_items", "rule_items_or", "text_quality",
           "text_lang_fp", "dedup_exact", "dedup_prefix_groups",
           "dedup_ngram_jaccard", "dedup_ngram_capped",
           "dedup_minhash_capped", "dedup_minhash_lsh", "dedup_simhash",
           "corpus_pipeline"]


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("unidata")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        if t != "documents":
            os.symlink(src, out / f"{t}.parquet")
            continue
        tab = pq.read_table(src)
        did = tab.column("doc_id").to_numpy()
        text = tab.column("text").to_pylist()
        new = [CORPUS[(d * 5 + 1) % len(CORPUS)] if d % 3 == 1 else x
               for d, x in zip(did, text)]
        idx = tab.schema.get_field_index("text")
        tab = tab.set_column(idx, tab.schema.field(idx),
                             pa.array(new, type=pa.string()))
        pq.write_table(tab, out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(uni_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{uni_dir}/{t}.parquet'")
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


def test_corpus_fully_cycled(uni_dir):
    got = set(pq.read_table(f"{uni_dir}/documents.parquet")
              .column("text").to_pylist())
    missing = [c for c in CORPUS if c not in got]
    assert not missing, f"shapes never injected: {missing}"


@pytest.mark.parametrize("name", QUERIES)
def test_engine_matches_oracle_on_unicode_text(spark, duck, uni_dir,
                                               name):
    sdf = E.queries()[name](spark, uni_dir).toPandas()
    ddf = duck.execute(E.oracle_sql()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    sk = _key(sdf.to_dict("records"), cols)
    dk = _key(ddf.to_dict("records"), cols)
    diff = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
    assert sk == dk, f"{name}: engine vs oracle rows differ, e.g. {diff}"


def test_empty_text_docs_form_a_real_group(spark, duck, uni_dir):
    """The empty-text docs must appear as an md5('') prefix group on
    BOTH sides — the DuckDB NULL-key vanishing act this suite caught
    would otherwise return (a NULL group key drops the group from the
    equality check silently)."""
    empty_fp = "d41d8cd98f00b204e9800998ecf8427e"
    sdf = E.queries()["dedup_prefix_groups"](spark, uni_dir).toPandas()
    assert empty_fp in set(sdf["gk"]), "engine lost the empty-text group"
