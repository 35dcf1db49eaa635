"""Table-level checks: stats, uniqueness, referential, drift
(SURVEY.md §7 milestones 4-7)."""

import pyspark.sql.functions as F
import pytest

from jio_spark.operators import (column_profile_exact, column_stats,
                                 drift_check, duplicate_ids,
                                 referential_check, snapshot,
                                 uniqueness_check)
from jio_spark.operators.drift import (HistSpec, ks_from_quantiles,
                                       psi_from_histograms)


def test_column_stats_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "a"), (4, 40.0, None)],
        "id int, x double, s string")
    stats = {r["col_name"]: r for r in column_stats(df).collect()}
    assert stats["x"]["count"] == 4
    assert stats["x"]["nulls"] == 1
    assert stats["x"]["null_rate"] == 0.25
    assert stats["x"]["min"] == 10.0 and stats["x"]["max"] == 40.0
    assert abs(stats["x"]["mean"] - 70.0 / 3) < 1e-9
    assert stats["x"]["quantiles"][0] == 10.0
    assert stats["s"]["nulls"] == 1
    assert stats["s"]["approx_distinct"] == 2


def test_column_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "a"), (4, 40.0, None)],
        "id int, x double, s string")
    prof = {r["col_name"]: r for r in column_profile_exact(df).collect()}
    assert prof["x"]["count"] == 4 and prof["x"]["nulls"] == 1
    assert prof["x"]["null_rate"] == 0.25
    assert prof["x"]["min"] == 10.0 and prof["x"]["max"] == 40.0
    assert prof["x"]["mean"] == round(70.0 / 3, 4)
    # string columns carry only count/null stats in the exact profile
    assert prof["s"]["nulls"] == 1 and prof["s"]["min"] is None


def test_duplicate_ids_clustered(spark):
    # key-clustered layout: repartitionByRange + sortWithinPartitions makes
    # each key's occurrences contiguous across partition boundaries
    rows = [(f"k{i:04d}",) for i in range(500)]
    rows += [("k0100",), ("k0100",), ("k0499",)]   # k0100 x3, k0499 x2
    df = (spark.createDataFrame(rows, "clip_id string")
          .repartitionByRange(4, "clip_id"))
    dups = {r["key"]: r["cnt"] for r in duplicate_ids(df, "clip_id")
            .collect()}
    assert dups == {"k0100": 3, "k0499": 2}


def test_duplicate_ids_boundary_spanning(spark):
    # one key filling entire middle partitions: the boundary-exchange chain
    # must merge counts across >2 partitions
    data = [("a",)] * 3 + [("b",)] * 40 + [("c",)] * 3
    df = (spark.createDataFrame(data, "clip_id string")
          .repartitionByRange(5, "clip_id"))
    dups = {r["key"]: r["cnt"] for r in duplicate_ids(df, "clip_id")
            .collect()}
    assert dups == {"a": 3, "b": 40, "c": 3}

    # cross-check vs the groupBy fallback path
    v2 = uniqueness_check(df, "clip_id", layout="any").collect()
    assert {r["clip_id"] for r in v2} == {"a", "b", "c"}


def test_duplicate_ids_randomized_vs_counter(spark):
    """Randomized stress of the boundary-exchange path: random key
    multisets (heavy duplication, runs spanning many partitions, empty
    partitions) under random range-partition fan-outs must always agree
    with a plain Python Counter."""
    import random
    from collections import Counter

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        keys = []
        for _ in range(rng.randint(5, 40)):
            k = f"k{rng.randint(0, 30):03d}"
            keys += [k] * rng.randint(1, 12)
        rng.shuffle(keys)
        expect = {k: c for k, c in Counter(keys).items() if c > 1}
        for parts in (1, 3, 8, 17):
            df = (spark.createDataFrame([(k,) for k in keys],
                                        "clip_id string")
                  .repartitionByRange(parts, "clip_id"))
            got = {r["key"]: r["cnt"]
                   for r in duplicate_ids(df, "clip_id").collect()}
            assert got == expect, (seed, parts)


def test_uniqueness_no_dups(spark):
    df = (spark.createDataFrame([(f"k{i}",) for i in range(100)],
                                "clip_id string")
          .repartitionByRange(4, "clip_id"))
    assert duplicate_ids(df, "clip_id").count() == 0


def test_clustered_certificate_on_sorted_layout(spark):
    """Range-partitioned layout: the free exactness certificate passes
    (consecutive partition key ranges are monotone) and the result is
    exact — with no warning emitted."""
    import warnings as _w
    rows = [(f"k{i:03d}",) for i in range(60)] + [("k010",)]
    df = (spark.createDataFrame(rows, "clip_id string")
          .repartitionByRange(4, "clip_id"))
    cert = {}
    with _w.catch_warnings():
        _w.simplefilter("error")    # any RuntimeWarning fails the test
        dups = {r["key"]: r["cnt"]
                for r in duplicate_ids(df, "clip_id",
                                       certificate=cert).collect()}
    assert dups == {"k010": 2}
    assert cert["clustered_certified"] is True
    assert cert["overlap_count"] == 0 and cert["partitions"] >= 2


def test_clustered_certificate_refuses_unclustered_layout(spark):
    """The trap the certificate exists for: a key duplicated in NON-
    adjacent partitions is silently undercounted by the boundary chain.
    Boundary (first/last) runs merge by KEY across all partitions, so
    the loss needs an INTERIOR single occurrence: pinned via
    sc.parallelize slice boundaries ([0,2) [2,4) [4,7) for 7 rows /
    3 slices): pid0=['a','b'], pid1=['m','x'], pid2=['k','m','z1'] —
    pid2's 'm' is an interior count-1 run (emitted nowhere), so 'm' x2
    is undercounted to 1; and pid1's max 'x' > pid2's min 'k' breaks
    range monotonicity, which is exactly what the certificate sees."""
    rows = [("a",), ("b",), ("m",), ("x",), ("k",), ("m",), ("z1",)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), "clip_id string")
    cert = {}
    with pytest.warns(RuntimeWarning, match="not key-clustered"):
        got = {r["key"]: r["cnt"]
               for r in duplicate_ids(df, "clip_id",
                                      certificate=cert).collect()}
    assert got == {}                       # the real undercount, flagged
    assert cert["clustered_certified"] is False
    assert cert["overlap_count"] >= 1
    ov = cert["overlaps"][0]
    assert ov["max_a"] > ov["min_b"]
    # JSON-safe: the certificate travels into run.json metrics
    import json
    json.dumps(cert)

    # the exact fallback path sees the duplicate the clustered path missed
    truth = {r["clip_id"]
             for r in uniqueness_check(df, "clip_id",
                                       layout="any").collect()}
    assert truth == {"m"}

    # 'error' escalates, 'trust' silences (the hash-bucketed contract)
    with pytest.raises(ValueError, match="not key-clustered"):
        duplicate_ids(df, "clip_id", on_unclustered="error").collect()
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        duplicate_ids(df, "clip_id", on_unclustered="trust").collect()
    with pytest.raises(ValueError, match="on_unclustered"):
        duplicate_ids(df, "clip_id", on_unclustered="typo")

    # 'fallback' (check level): refusal reruns via the exact groupBy
    cert2 = {}
    v = {r["clip_id"] for r in
         uniqueness_check(df, "clip_id", layout="clustered",
                          on_unclustered="fallback",
                          certificate=cert2).collect()}
    assert v == {"m"} and cert2["fallback_used"] is True


def test_clustered_chain_runs_in_range_order(spark):
    """Spark schedules splits by size, so a sorted table read back
    arrives with its (disjoint) ranges scrambled across pids — the chain
    sorts partitions by (min, max) key, so such layouts stay certified
    AND exact. Pinned via parallelize slices ([0,2) [2,4) [4,7)):
    pid0=['m','m'], pid1=['a','b'], pid2=['x','x','n'] — range order is
    pid1 < pid0 < pid2."""
    rows = [("m",), ("m",), ("a",), ("b",), ("x",), ("x",), ("n",)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), "clip_id string")
    cert = {}
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        got = {r["key"]: r["cnt"]
               for r in duplicate_ids(df, "clip_id",
                                      certificate=cert).collect()}
    assert got == {"m": 2, "x": 2}
    assert cert["clustered_certified"] is True

    # boundary chaining across scrambled order: pid0=['z','z'],
    # pid1=['a','z'] — range-sorted pid1 (a..z) precedes pid0 (z..z),
    # max 'z' == min 'z' is the boundary the chain merges: z x3
    rows2 = [("z",), ("z",), ("a",), ("z",)]
    df2 = spark.createDataFrame(
        spark.sparkContext.parallelize(rows2, 2), "clip_id string")
    cert2 = {}
    got2 = {r["key"]: r["cnt"]
            for r in duplicate_ids(df2, "clip_id",
                                   certificate=cert2).collect()}
    assert got2 == {"z": 3}
    assert cert2["clustered_certified"] is True


def test_clustered_certificate_soundness_fuzz(spark):
    """The certificate's core claim, fuzzed: over random key multisets
    scattered into random partition layouts (sorted runs, scrambled
    ranges, duplicates split across arbitrary partitions, empty
    partitions), certified ⇒ the clustered result equals the Counter
    truth, and the 'fallback' mode is exact ALWAYS."""
    import random
    from collections import Counter

    for seed in (3, 11, 29, 101):
        rng = random.Random(seed)
        keys = []
        for _ in range(rng.randint(4, 25)):
            keys += [f"k{rng.randint(0, 20):03d}"] * rng.randint(1, 6)
        expect = {k: c for k, c in Counter(keys).items() if c > 1}
        layouts = ["scatter", "sorted_chunks", "hash"]
        for layout in layouts:
            n_parts = rng.randint(1, 6)
            if layout == "scatter":
                rng.shuffle(keys)
                rows = [(k,) for k in keys]
            elif layout == "sorted_chunks":
                # globally sorted, then chunk order scrambled — the
                # scrambled-but-disjoint read the range-order chain fixes
                srt = sorted(keys)
                cut = sorted(rng.sample(range(len(srt) + 1),
                                        min(n_parts - 1, len(srt))))
                chunks = [srt[a:b]
                          for a, b in zip([0] + cut, cut + [len(srt)])]
                rng.shuffle(chunks)
                rows = [(k,) for ch in chunks for k in ch]
            else:
                rows = sorted(((k,) for k in keys),
                              key=lambda r: hash((seed, r[0])))
            df = spark.createDataFrame(
                spark.sparkContext.parallelize(rows, n_parts),
                "clip_id string")
            cert = {}
            got = {r["key"]: r["cnt"]
                   for r in duplicate_ids(df, "clip_id",
                                          on_unclustered="trust",
                                          certificate=cert).collect()}
            if cert["clustered_certified"]:
                assert got == expect, (seed, layout, n_parts)
            cert2 = {}
            v = {r["clip_id"]: r for r in
                 uniqueness_check(df, "clip_id", layout="clustered",
                                  on_unclustered="fallback",
                                  certificate=cert2).collect()}
            assert set(v) == set(expect), (seed, layout, n_parts, cert2)


def test_referential_check_broadcast(spark):
    fact = spark.createDataFrame(
        [(1, "pcm_s16le"), (2, "ulaw"), (3, "opus"), (4, None)],
        "id int, codec string")
    dim = spark.createDataFrame(
        [("pcm_s16le",), ("ulaw",), ("alaw",)], "codec string")
    v = referential_check(fact, "codec", dim, "codec", id_cols=["id"])
    rows = v.collect()
    assert [r["id"] for r in rows] == [3]
    assert rows[0]["message"] == \
        "field `codec` value opus not found in dimension `codec`"
    # plan check: dimension side must be broadcast
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_referential_nulls(spark):
    fact = spark.createDataFrame([(1, None)], "id int, codec string")
    dim = spark.createDataFrame([("x",)], "codec string")
    assert referential_check(fact, "codec", dim, "codec").count() == 0
    assert referential_check(fact, "codec", dim, "codec",
                             nulls_violate=True).count() == 1


def test_ks_psi_pure():
    q = [float(i) for i in range(101)]
    assert ks_from_quantiles(q, q) == 0.0
    shifted = [x + 30.0 for x in q]
    assert ks_from_quantiles(q, shifted) > 0.2
    h = [10] * 32
    assert psi_from_histograms(h, h) == 0.0
    hs = [0] * 16 + [20] * 16
    assert psi_from_histograms(h, hs) > 0.25


def test_drift_check_end_to_end(spark):
    import math
    base = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("dur_ms"))
    same = spark.range(0, 2000).select(
        ((F.col("id") * 7) % 100).cast("double").alias("dur_ms"))
    shifted = spark.range(0, 2000).select(
        ((F.col("id") % 100) * 1.5).alias("dur_ms"))
    spec = {"dur_ms": HistSpec(0.0, 160.0, 32)}
    snap_b = snapshot(base, spec)
    assert snap_b.count() == 1
    ok = drift_check(snapshot(same, spec), snap_b).collect()[0]
    assert ok["pass"], ok
    bad = drift_check(snapshot(shifted, spec), snap_b).collect()[0]
    assert not bad["pass"], bad


def test_drift_check_refuses_mismatched_bin_specs(spark):
    """PSI over misaligned bins is a meaningless number: a baseline
    built with a different HistSpec (range or bin count) must fail
    loudly, not return a garbage statistic."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 100).cast("double").alias("dur_ms"))
    snap_a = snapshot(df, {"dur_ms": HistSpec(0.0, 160.0, 32)})
    snap_bins = snapshot(df, {"dur_ms": HistSpec(0.0, 160.0, 16)})
    snap_range = snapshot(df, {"dur_ms": HistSpec(0.0, 320.0, 32)})
    with pytest.raises(ValueError, match="histogram spec"):
        drift_check(snap_a, snap_bins)
    with pytest.raises(ValueError, match="histogram spec"):
        drift_check(snap_a, snap_range)


def test_drift_baseline_preflight_fails_before_scans(spark):
    """The runner must reject a stale-spec baseline at submit time
    (driver-side, before any group scan), mirroring the schema-contract
    fail-in-milliseconds rule."""
    from jio_spark.audio.synth import clips_frame
    from jio_spark.operators.drift import assert_baseline_spec_compatible
    from jio_spark.runner import (DRIFT_SPECS, ClipsJobConfig,
                                  ClipsValidationJob, default_codec_dim)

    clean = clips_frame(spark, 50, clean=True, partitions=2)
    stale = snapshot(clean, {"dur_ms": HistSpec(0.0, 99.0, 8),
                             "sr_hz": DRIFT_SPECS["sr_hz"]})
    with pytest.raises(ValueError, match="rebuild the baseline"):
        assert_baseline_spec_compatible(stale, DRIFT_SPECS)
    job = ClipsValidationJob(spark, ClipsJobConfig(audio_check=False),
                             codec_dim=default_codec_dim(spark),
                             baseline_snapshot=stale)
    with pytest.raises(ValueError, match="rebuild the baseline"):
        job.run(clean)
    # matching specs pass the preflight
    good = snapshot(clean, DRIFT_SPECS)
    assert_baseline_spec_compatible(good, DRIFT_SPECS)


def test_drift_check_reports_missing_baseline_column(spark):
    """A column monitored now but absent from the baseline must surface
    as an explicit not-evaluated row (pass=True), not vanish silently —
    the stale-baseline signal when DRIFT_SPECS grows."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 100).cast("double").alias("dur_ms"),
        (F.col("id") % 50).cast("double").alias("sr_hz"))
    base = snapshot(df, {"dur_ms": HistSpec(0.0, 160.0, 32)})
    cur = snapshot(df, {"dur_ms": HistSpec(0.0, 160.0, 32),
                        "sr_hz": HistSpec(0.0, 64.0, 16)})
    rows = {r["col_name"]: r for r in drift_check(cur, base).collect()}
    assert rows["dur_ms"]["pass"] and rows["dur_ms"]["psi"] is not None
    nb = rows["sr_hz"]
    assert nb["pass"] and nb["ks"] is None and nb["psi"] is None
    assert "no baseline" in nb["message"]

    # the mirror direction: a baseline column that vanished from the
    # current snapshot surfaces too (monitoring stopped ≠ silence)
    rows2 = {r["col_name"]: r for r in drift_check(base, cur).collect()}
    gone = rows2["sr_hz"]
    assert gone["pass"] and gone["psi"] is None
    assert "no longer evaluated" in gone["message"]


def test_snapshot_roundtrip(spark, tmp_path):
    df = spark.range(0, 500).select(
        (F.col("id") % 50).cast("double").alias("x"))
    snap = snapshot(df, {"x": HistSpec(0, 64, 16)})
    p = str(tmp_path / "snap.parquet")
    snap.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    res = drift_check(back, snap).collect()[0]
    assert res["pass"] and res["ks"] == 0.0


def test_drift_empty_current_is_outage_not_pass(spark):
    """An all-NULL/empty current column must FAIL drift — a total data
    outage is the most drifted state possible, but the zero-histogram
    PSI shortcut (0.0) and the null-quantiles KS skip would otherwise
    report it green. A data-less BASELINE, by contrast, can't support a
    verdict either way and surfaces as an explicit not-evaluated row."""
    spec = {"dur_ms": HistSpec(0.0, 160.0, 32)}
    full = spark.range(0, 500).select(
        (F.col("id") % 100).cast("double").alias("dur_ms"))
    nulls = spark.range(0, 500).select(
        F.lit(None).cast("double").alias("dur_ms"))
    outage = drift_check(snapshot(nulls, spec),
                         snapshot(full, spec)).collect()[0]
    assert not outage["pass"] and not outage["ks_pass"]
    assert "no data in the current" in outage["message"]
    noeval = drift_check(snapshot(full, spec),
                         snapshot(nulls, spec)).collect()[0]
    assert noeval["pass"] and "baseline" in noeval["message"]
    both = drift_check(snapshot(nulls, spec),
                       snapshot(nulls, spec)).collect()[0]
    assert both["pass"] and "not evaluated" in both["message"]


def test_column_stats_binary_bytes_and_all_null_bounds(spark):
    """Binary columns surface the total/avg byte sizes the scan paid to
    compute (null for other types), and column_stats_bounds must treat
    an all-NULL numeric column as vacuously in-bound instead of
    crashing on the null percentile_approx array."""
    from jio_spark.operators.stats import column_stats_bounds
    df = spark.createDataFrame(
        [(1, bytearray(b"abc"), None), (2, bytearray(b"defgh"), None),
         (3, None, None)],
        "id int, payload binary, y double")
    stats = {r["col_name"]: r for r in column_stats(df).collect()}
    assert stats["payload"]["total_bytes"] == 8
    assert abs(stats["payload"]["avg_bytes"] - 4.0) < 1e-9
    assert stats["id"]["total_bytes"] is None
    assert stats["y"]["total_bytes"] is None
    bounds = {r["col_name"]: r for r in
              column_stats_bounds(df, ["id", "y"]).collect()}
    assert bounds["y"]["distinct_ok"] and bounds["y"]["quantiles_ok"]
    assert bounds["id"]["distinct_ok"] and bounds["id"]["quantiles_ok"]


def test_boundary_chain_flushes_mid_partition_merge(spark):
    """[[a,a,b],[b,b,c,d]] is certified key-clustered (ranges touch at
    b); b's three copies span the boundary and its run ends at
    partition 1's FIRST run — the merged count must be flushed, not
    silently overwritten by the partition's last run."""
    d1 = spark.createDataFrame([("a",), ("a",), ("b",)],
                               "clip_id string").coalesce(1)
    d2 = spark.createDataFrame([("b",), ("b",), ("c",), ("d",)],
                               "clip_id string").coalesce(1)
    df = d1.union(d2)
    cert = {}
    got = {r["key"]: r["cnt"] for r in
           duplicate_ids(df, "clip_id", certificate=cert).collect()}
    assert cert["clustered_certified"]
    assert got == {"a": 2, "b": 3}


def test_uniqueness_null_keys_and_layout_knob(spark):
    """NULL keys are `required` failures, not duplicates — BOTH layouts
    (and therefore the fallback rerun) must agree; and a typo'd layout
    fails loudly instead of silently selecting the clustered path."""
    df = spark.createDataFrame([("x",), ("x",), (None,), (None,)],
                               "clip_id string")
    for layout in ("any", "clustered"):
        got = {r["clip_id"] for r in
               uniqueness_check(df, "clip_id", layout=layout,
                                on_unclustered="trust").collect()}
        assert got == {"x"}, layout
    with pytest.raises(ValueError, match="layout"):
        uniqueness_check(df, "clip_id", layout="clusterd")


def test_certified_even_splits_of_sorted_duplicates_fuzz(spark):
    """Globally sorted data split EVENLY across partitions certifies by
    construction, and even splits routinely cut a duplicate's run at a
    partition boundary — exactly the case the original soundness fuzz
    under-sampled (its certified layouts rarely split runs). Certified
    ⇒ exact, over many split points."""
    import random
    from collections import Counter

    for seed in (5, 17, 43, 97):
        rng = random.Random(seed)
        keys = []
        for _ in range(rng.randint(5, 20)):
            keys += [f"k{rng.randint(0, 8):02d}"] * rng.randint(1, 5)
        srt = sorted(keys)
        expect = {k: c for k, c in Counter(srt).items() if c > 1}
        for n_parts in (2, 3, 5):
            df = spark.createDataFrame(
                spark.sparkContext.parallelize([(k,) for k in srt],
                                               n_parts),
                "clip_id string")
            cert = {}
            got = {r["key"]: r["cnt"] for r in
                   duplicate_ids(df, "clip_id",
                                 certificate=cert).collect()}
            assert cert["clustered_certified"], (seed, n_parts)
            assert got == expect, (seed, n_parts)


def test_gofmt_double_rendering_matches_go(spark):
    """Go %v prints integral float64 as plain digits up to 1e21 (Java
    switches to E-notation at 1e7), non-integral values decimal-style
    from 1e-4 to 1e16, ±Inf as +Inf/-Inf, -0.0 as -0, e-notation with
    a sign and two exponent digits elsewhere; array rendering follows
    the element type when known and renders NULL elements '<nil>'."""
    from jio_spark.gofmt import fmt_col, go_repr
    df = spark.createDataFrame(
        [(12345678.0, ["v1.0", None, "x"], [1.0, None, 2.5])],
        "d double, sa array<string>, da array<double>")
    # value → exact Go fmt.Sprintf("%v") output
    go_cases = [
        (12345678.0, "12345678"), (12345678.5, "12345678.5"),
        (-123456789.25, "-123456789.25"),
        (1000000000000000.5, "1000000000000000.5"),
        (1.5e16, "15000000000000000"), (1e19, "10000000000000000000"),
        (1.2345678e21, "1.2345678e+21"),
        (0.0001, "0.0001"), (0.00012345, "0.00012345"),
        (1e-05, "1e-05"), (1e-12, "1e-12"), (3.1, "3.1"),
        (float("inf"), "+Inf"), (float("nan"), "NaN"),
    ]
    row = df.select(
        fmt_col(F.lit(-0.0), "double").alias("nzero"),
        fmt_col(F.col("sa"), "array").alias("strs"),
        fmt_col(F.col("da"), "array").alias("nums"),
        fmt_col(F.col("sa"), "array",
                df.schema["sa"].dataType).alias("strs_typed"),
        fmt_col(F.col("da"), "array",
                df.schema["da"].dataType).alias("nums_typed"),
        *[fmt_col(F.lit(v), "double").alias(f"v{i}")
          for i, (v, _) in enumerate(go_cases)],
    ).first()
    for i, (v, want) in enumerate(go_cases):
        assert row[f"v{i}"] == want, (v, row[f"v{i}"], want)
        assert go_repr(v) == want, (v, go_repr(v), want)
    assert row["nzero"] == "-0" and go_repr(-0.0) == "-0"
    # untyped arrays keep the string-level heuristic ('.0' strip on
    # numeric-looking elements only); typed string arrays go verbatim,
    # typed double arrays ride the scalar Go chain per element
    assert row["strs"] == "[v1.0 <nil> x]"
    assert row["nums"] == "[1 <nil> 2.5]"
    assert row["strs_typed"] == "[v1.0 <nil> x]"
    assert row["nums_typed"] == "[1 <nil> 2.5]"
    big = spark.createDataFrame(
        [([12345678.0, float("inf"), None],)], "a array<double>")
    assert big.select(fmt_col(F.col("a"), "array",
                              big.schema["a"].dataType)).first()[0] \
        == "[12345678 +Inf <nil>]"
    # literal-side large-integer digits follow Go's shortest-repr form,
    # not the double's exact integer expansion
    assert go_repr(float(2 ** 63 - 2048)) == "9223372036854774000"


def test_public_vector_functions_null_not_ansi_crash(spark):
    """The exported cosine_similarity/normalize must yield NULL for
    zero-norm vectors, not an ANSI DIVIDE_BY_ZERO that kills the job."""
    from jio_spark.functions import cosine_similarity, normalize
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 0.0])], "a array<double>, b array<double>")
    row = df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("c"),
        normalize(F.col("b")).alias("nb"),
        cosine_similarity(F.col("a"), F.col("a")).alias("self")).first()
    assert row["c"] is None
    assert row["nb"] == [None, None]
    assert abs(row["self"] - 1.0) < 1e-12


def test_duplicate_ids_nullable_bigint_keys(spark):
    """A nullable NUMERIC key column: NULLs must be invisible (they are
    not uniqueness violations), never poison the scan as float64 NaN
    (which crashed the integer-typed scan schema or minted a phantom
    -2^63 duplicate), and >2^53 keys sharing a partition with NULLs
    must not lose precision to the float coercion."""
    big_a = (1 << 60) + 1
    big_b = (1 << 60) + 2  # adjacent in float64's gap at 2^60 → equal
                           # if the scan ever coerces to float
    rows = [(None,), (None,), (big_a,), (big_b,), (7,), (7,), (None,)]
    df = (spark.createDataFrame(rows, "k bigint")
          .repartition(2).sortWithinPartitions("k"))
    dups = {r["key"]: r["cnt"]
            for r in duplicate_ids(df, "k", on_unclustered="trust")
            .collect()}
    assert dups == {7: 2}
    # uniqueness_check agrees on both layouts (violation rows carry the
    # key value as string, jio message shape)
    v = uniqueness_check(df, "k", layout="any").collect()
    assert [(r["k"], r["actual"]) for r in v] == [("7", "count=2")]
    v2 = uniqueness_check(df, "k", layout="clustered",
                          on_unclustered="trust").collect()
    assert [(r["k"], r["actual"]) for r in v2] == [("7", "count=2")]
