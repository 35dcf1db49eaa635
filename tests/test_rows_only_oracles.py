"""Differential evidence behind the VALUES-literal DuckDB oracles for the
formerly rows-only queries (r3 VERDICT task 1): the independent
numpy/pure-Python derivations in ``tools/derive_rows_only_oracles.py``
must agree with the live Spark queries row-for-row, and with the literals
embedded in ``__spark_entry__.oracle_sql()``."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.derive_rows_only_oracles import (N_CLIPS, N_MIXED,
                                            derive_audio_checks,
                                            derive_audio_decode,
                                            derive_multimodal)
from jio_spark.audio.synth import make_row, make_row_mixed


@pytest.fixture(scope="module")
def fixture_rows():
    return ([make_row(i) for i in range(N_CLIPS)],
            [make_row(i, clean=True) for i in range(N_CLIPS)])


def test_audio_decode_matches_independent_derivation(spark, fixture_rows):
    """audio_decode's corpus is the pinned §1 corpus + the §1b extended
    codec mix (stereo / float32 / ADPCM / EXTENSIBLE) — the independent
    derivation decodes every codec with its own formulations."""
    import __spark_entry__ as e
    rows, _ = fixture_rows
    want = derive_audio_decode(
        rows + [make_row_mixed(i) for i in range(N_MIXED)])
    got = e.queries()["audio_decode"](spark, "unused").collect()[0].asDict()
    assert got == want


def test_audio_checks_matches_independent_derivation(spark, fixture_rows):
    import __spark_entry__ as e
    rows, clean = fixture_rows
    want = derive_audio_checks(rows, clean)
    got = [(r["component"], r["name"], r["value"])
           for r in e.queries()["audio_checks"](spark, "unused").collect()]
    assert sorted(got) == sorted(want)
    assert len(got) == len(want) == 22


def test_multimodal_matches_independent_derivation(spark, fixture_rows):
    import __spark_entry__ as e
    want = derive_multimodal()
    got = [tuple(r) for r in
           e.queries()["multimodal"](spark, "unused").collect()]
    assert got == want


def test_embedded_literals_match_derivation(fixture_rows):
    """The VALUES literals in oracle_sql() are exactly what the
    independent derivation produces — rerunning the script can never
    silently diverge from what the driver checks."""
    import duckdb
    import __spark_entry__ as e
    rows, clean = fixture_rows
    con = duckdb.connect()
    lit = con.execute(e.oracle_sql()["audio_decode"]).fetchone()
    d = derive_audio_decode(
        rows + [make_row_mixed(i) for i in range(N_MIXED)])
    assert lit == (d["clips"], d["decoded"], d["sr_mismatch"],
                   d["codec_mismatch"], d["bad_transcript"], d["snr_ok"],
                   d["total_samples"])
    lit_rows = con.execute(e.oracle_sql()["audio_checks"]).fetchall()
    assert sorted(lit_rows) == sorted(derive_audio_checks(rows, clean))
    lit_mm = con.execute(e.oracle_sql()["multimodal"]).fetchall()
    assert lit_mm == derive_multimodal()


def test_stats_profile_approx_bounds(spark):
    """The bounds-boolean frame is all-true on the driver testdata and
    matches its literal-TRUE oracle shape."""
    import __spark_entry__ as e
    got = e.queries()["stats_profile_approx"](
        spark, "/root/testdata/sf0.001").collect()
    assert sorted((r["col_name"], r["distinct_ok"], r["quantiles_ok"])
                  for r in got) == [
        ("l_extendedprice", True, True),
        ("l_quantity", True, True),
        ("l_returnflag", True, True)]
