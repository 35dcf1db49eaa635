"""Deduplication operators for a training-data pipeline over ``documents``.

Five standard strategies, each chosen for its scale profile:

* **exact** — hash-groupBy on normalized content. One shuffle of (hash,
  id); unique texts collapse map-side.
* **n-gram Jaccard (inverted index)** — EXACT near-dup pairs above a
  Jaccard threshold: explode distinct shingles → self-join on shingle
  (the inverted-index trick: only docs sharing ≥1 shingle ever meet) →
  count shared shingles per pair → Jaccard = shared / (|A|+|B|-shared).
  Cost is Σ bucket² over shingle buckets, not n² over docs.
* **MinHash + LSH** — the approximate scale path: k hash-min signatures
  (``xxhash64`` per seed over the shingle array — pure exprs), banded into
  b bands of r rows; docs colliding in any band become candidates, then
  exact-Jaccard verified. Sub-quadratic; recall 1-(1-j^r)^b.
* **SimHash** — 64-bit sign-aggregated shingle hashes; near-dups have
  small Hamming distance; banded by 16-bit chunks for candidate
  generation (any doc pair within Hamming ≤3 shares ≥1 exact chunk).
* **embedding cosine** — near-dup by cosine ≥ threshold; exact
  block-join path here, LSH-bucketed path in
  :mod:`jio_spark.operators.similarity`.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, ngrams_of_words, words
from ..functions.vectors import dot


# ---------------------------------------------------------------------------
# exact


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of identical (normalized) content: (fingerprint, n_docs,
    doc_ids). One row per duplicated group. NULL text is ABSENT content,
    not identical content — md5(NULL) is NULL and groupBy would pool
    every null-text doc into one phantom "duplicate" group, so those
    rows are excluded.

    ``n_docs`` counts EVERY row in the group; ``doc_ids`` lists only the
    non-null ids (``collect_list`` drops nulls — a NULL id has no name
    to list). The difference ``n_docs - size(doc_ids)`` is therefore the
    group's null-id member count, not a bug: reconciling group
    membership must use ``n_docs``, never ``len(doc_ids)``."""
    return (df.select(F.col(id_col),
                      doc_fingerprint(F.col(text_col)).alias("fp"))
            .where(F.col("fp").isNotNull())
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
            .where(F.col("n_docs") > 1))


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical-content group (deterministic
    survivor), implemented as a window-free groupBy + semi join.

    NULL-text rows are each their own group (kept, never collapsed):
    md5(NULL) is NULL, and grouping on it directly would silently DELETE
    all-but-one of the docs whose content is merely missing. The
    coalesce to a per-id sentinel keeps the single-pass shape.

    NULL-id rows are never the survivor of a mixed group (min ignores
    nulls) but are never silently deleted either: the semi join is
    null-safe, so a group whose ids are ALL null (keep key = NULL)
    retains its rows — a plain equi-join on a NULL key matches nothing
    and would delete the whole group's content."""
    fp = F.coalesce(doc_fingerprint(F.col(text_col)),
                    F.concat(F.lit("__null__:"),
                             F.col(id_col).cast("string")))
    keyed = df.withColumn("__fp", fp)
    keep = (keyed.select(F.col("__fp").alias("__keep_fp"),
                         F.col(id_col).alias("__keep_id"))
            .groupBy("__keep_fp")
            .agg(F.min("__keep_id").alias("__keep_id")))
    # null-safe on BOTH keys, scoped to the row's own group: on id alone
    # a null keep-id from ANY group would retain every null-id row
    # everywhere; fp itself is NULL for (null text, null id) rows
    return (keyed.join(
                keep,
                on=[F.col("__fp").eqNullSafe(F.col("__keep_fp")),
                    F.col(id_col).eqNullSafe(F.col("__keep_id"))],
                how="left_semi")
            .drop("__fp"))


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index (exact)


def _shingle_frame(df: DataFrame, text_col: str, id_col: str,
                   n: int) -> DataFrame:
    # tokenize in its own projection so the ngram fold references the
    # words ARRAY, not the tokenizer expression (see ngrams_of_words)
    ws = df.select(F.col(id_col).alias("did"),
                   words(F.col(text_col)).alias("ws"))
    return (ws.select("did",
                      F.array_distinct(ngrams_of_words(F.col("ws"), n))
                      .alias("sh"))
            .where(F.size("sh") > 0))


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.5, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_doc_freq: Optional[int] = None) -> DataFrame:
    """EXACT document pairs with shingle-set Jaccard >= threshold.

    ``max_doc_freq`` drops shingles appearing in more than that many docs
    (stopword shingles) — the standard skew guard: a shingle shared by f
    docs contributes f² join pairs. Dropping them makes the result a
    (documented) lower bound on Jaccard; leave None for exactness."""
    sh = _shingle_frame(df, text_col, id_col, n)
    sizes = sh.select("did", F.size("sh").alias("n_sh"))
    inv = sh.select("did", F.explode("sh").alias("shingle"))
    if max_doc_freq is not None:
        hot = (inv.groupBy("shingle").count()
               .where(F.col("count") > max_doc_freq).select("shingle"))
        inv = inv.join(F.broadcast(hot), "shingle", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    shared = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a.did") < F.col("b.did")))
              .groupBy(F.col("a.did").alias("id_a"),
                       F.col("b.did").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("shared")))
    out = (shared
           .join(sizes.withColumnsRenamed({"did": "id_a", "n_sh": "n_a"}),
                 "id_a")
           .join(sizes.withColumnsRenamed({"did": "id_b", "n_sh": "n_b"}),
                 "id_b")
           .withColumn("jaccard",
                       F.col("shared").cast("double")
                       / (F.col("n_a") + F.col("n_b") - F.col("shared")))
           .where(F.col("jaccard") >= threshold)
           .select("id_a", "id_b",
                   F.round("jaccard", 6).alias("jaccard")))
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate scale path)

_MINHASH_SEED_BASE = 0x5EED


def _check_hash_mode(hash_mode: str) -> None:
    """Loud-knob rule (same as uniqueness's on_unclustered check): an
    unknown mode must not silently fall through to the xxhash64 branch —
    an oracle replay built on md5 would then mismatch with no hint the
    knob was ignored."""
    if hash_mode not in ("xxhash64", "md5"):
        raise ValueError(f"hash_mode must be 'xxhash64' or 'md5', "
                         f"got {hash_mode!r}")


def minhash_signature(shingles: Column, k: int,
                      hash_mode: str = "xxhash64") -> Column:
    """k-permutation MinHash signature — one hash pass per permutation
    over the shingle array, all inside codegen.

    ``hash_mode='xxhash64'`` (default): array<long> of xxhash64 mins —
    the fast scale path. ``hash_mode='md5'``: array<string> of
    lexicographic mins of ``md5('<i>:' || shingle)`` — slower, but every
    step is replicable in any SQL engine with ``md5`` (the DuckDB
    correctness oracle), and a min over uniform fixed-length hex strings
    is exactly as much a random-permutation min as a numeric one."""
    # NB: the per-permutation lambdas MUST stay unary — F.transform
    # inspects the callable's arity, and a second (defaulted) parameter
    # flips it into the (element, index) form
    _check_hash_mode(hash_mode)
    if hash_mode == "md5":
        return F.array(*[
            F.array_min(F.transform(
                shingles, _md5_slice(i))) for i in range(k)])
    return F.array(*[
        F.array_min(F.transform(
            shingles, _xxh_seeded(_MINHASH_SEED_BASE + i)))
        for i in range(k)])


def _md5_slice(i: int):
    """Permutation i's hash: an 8-hex-char (32-bit) slice of
    ``md5('<i//4>:' || shingle)`` — one md5 carries FOUR independent
    slices. 32 bits is ample for a min statistic (collision of two
    distinct shingles per slice: 2^-32). NOTE: as a single inline
    expression each slice re-evaluates its group's md5 (lambda scoping
    defeats CSE — the round-1 trap); the k/4 hashing saving is realized
    in :func:`minhash_lsh_pairs`, which materializes one hashed array
    per prefix group in its own projection and slices those."""
    prefix = F.lit(f"{i // 4}:")
    start = 1 + 8 * (i % 4)
    return lambda s: F.substring(F.md5(F.concat(prefix, s)), start, 8)


def _md5_prefix_hash(g: int):
    prefix = F.lit(f"{g}:")
    return lambda s: F.md5(F.concat(prefix, s))


def _hex_slice(j: int):
    start = 1 + 8 * j
    return lambda m: F.substring(m, start, 8)


def _xxh_seeded(seed: int):
    return lambda s: F.xxhash64(s, F.lit(seed))


def _shingle_hash(hash_mode: str):
    """Injective-for-all-practical-purposes shingle fingerprint for the
    verify step: intersecting small long arrays is far cheaper than
    intersecting raw shingle strings, and because BOTH engines (and both
    sides of a pair) hash identically, the verified Jaccard is exact
    w.h.p. (a cross-pair 60-bit collision, p≈2^-60 per pair, is the only
    deviation) and the oracle comparison is exact ALWAYS. md5 mode uses
    the first 15 hex chars as a 60-bit int (DuckDB: CAST('0x'||… AS
    BIGINT)); xxhash64 mode uses the plain 64-bit hash."""
    if hash_mode == "md5":
        return lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10) \
                          .cast("long")
    return lambda s: F.xxhash64(s)


def minhash_lsh_pairs(df: DataFrame, threshold: float = 0.5, n: int = 3,
                      bands: int = 16, rows_per_band: int = 4,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      max_bucket_size: Optional[int] = None,
                      hash_mode: str = "xxhash64",
                      cache_shingles: bool = False) -> DataFrame:
    """Candidate generation by banded MinHash, then exact-Jaccard verify.
    Recall for true Jaccard j is 1-(1-j^r)^b (r=rows_per_band, b=bands);
    with the defaults, j=0.5 → ~0.66, j=0.8 → ~1.0. Only candidates are
    verified, so cost is sub-quadratic in corpus size. MEASURED on a
    planted-pair corpus (tests/test_recall_empirical.py): pair recall
    1.00 at j≈0.8 and 0.68 at j=0.50 vs the formula's 0.64 — within
    binomial noise — with zero false positives (exact verify).

    ``max_bucket_size`` is the mandatory-at-scale hot-bucket guard: a
    band bucket holding f docs contributes f² candidate pairs, so one
    degenerate bucket (boilerplate, empty-ish docs) can dominate the
    join. Oversized buckets are dropped via ONE count-window pass over
    (band, bh) — the window exchange doubles as the self-join's
    partitioning, so the guard adds no extra shuffle — a documented
    recall trade: members of a dropped bucket can still pair through
    their other b-1 bands. Default None keeps exact LSH semantics for
    the small-scale oracle checks.

    ``cache_shingles`` materializes the tokenized shingle frame once
    (localCheckpoint) instead of recomputing it for the signature pass
    and both sides of the verify join — 3× less tokenization/hashing
    work; off by default to keep the operator lazy/composable."""
    _check_hash_mode(hash_mode)
    k = bands * rows_per_band
    sh = _shingle_frame(df, text_col, id_col, n)
    if cache_shingles:
        sh = sh.localCheckpoint(eager=True)
    if hash_mode == "md5":
        # materialize ONE md5 array per 4-slice prefix group, then take
        # mins over cheap substring slices of those arrays — k/4 md5
        # evaluations per shingle (an inline minhash_signature would
        # recompute the md5 inside every slice's lambda; values are
        # identical either way)
        groups = (k + 3) // 4
        hashed = sh.select(
            "did",
            *[F.transform("sh", _md5_prefix_hash(g)).alias(f"_h{g}")
              for g in range(groups)])
        sig = hashed.select("did", F.array(*[
            F.array_min(F.transform(F.col(f"_h{i // 4}"),
                                    _hex_slice(i % 4)))
            for i in range(k)]).alias("sig"))
    else:
        sig = sh.select("did", minhash_signature(F.col("sh"), k,
                                                 hash_mode).alias("sig"))

    def band_hash(b: int) -> Column:
        elems = [F.col("sig")[b * rows_per_band + r]
                 for r in range(rows_per_band)]
        if hash_mode == "md5":
            return F.md5(F.concat_ws("|", *elems))
        return F.xxhash64(*elems)

    bands_df = sig.select(
        "did",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh"))
            for b in range(bands)])).alias("bb")) \
        .select("did", "bb.band", "bb.bh")
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bh")
        bands_df = (bands_df
                    .withColumn("_f", F.count(F.lit(1)).over(w))
                    .where(F.col("_f") <= max_bucket_size).drop("_f"))
    a = bands_df.alias("a")
    b_ = bands_df.alias("b")
    cand = (a.join(b_, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.did") < F.col("b.did")))
            .select(F.col("a.did").alias("id_a"),
                    F.col("b.did").alias("id_b"))
            .distinct())
    # verify over hashed-shingle long arrays (see _shingle_hash): the
    # candidate joins shuffle ~2.4KB/doc of longs instead of raw shingle
    # strings, and array_intersect compares longs, not strings
    hx = _shingle_hash(hash_mode)
    # NOT checkpointed even under cache_shingles: the verify join reads
    # this frame twice, but checkpointing the hashed arrays measured
    # slower (3.70 s vs 3.46 s at sf0.1) — the extra materialization
    # write outweighs the saved hash pass
    shh = sh.select("did",
                    F.array_distinct(F.transform("sh", hx)).alias("sh"))
    sh_a = shh.withColumnsRenamed({"did": "id_a", "sh": "sh_a"})
    sh_b = shh.withColumnsRenamed({"did": "id_b", "sh": "sh_b"})
    return (cand.join(sh_a, "id_a").join(sh_b, "id_b")
            .withColumn("shared",
                        F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn("jaccard",
                        F.col("shared").cast("double")
                        / (F.size("sh_a") + F.size("sh_b")
                           - F.col("shared")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# SimHash


def _pm_bits_long(v: Column) -> Column:
    """array<int> of ±1 for the 64 bits of a long hash (static masks —
    no dynamic shifts, which Spark's shiftright doesn't support)."""
    return F.array(*[
        F.when(v.bitwiseAND(F.lit(1 << b) if b < 63
                            else F.lit(-(2 ** 63))) != 0,
               F.lit(1)).otherwise(F.lit(-1))
        for b in range(64)])


def _pm_bits_md5(m: Column) -> Column:
    """array<int> of ±1 for the 64 bits carried by the first 16 hex chars
    of an md5 string; bit b = (nibble[b//4] >> (3 - b%4)) & 1, the same
    formula the DuckDB oracle uses. The md5 is hashed ONCE per shingle —
    only cheap substring/bit ops happen per bit."""
    nibbles = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: F.conv(F.substring(m, i, F.lit(1)), 16, 10).cast("int"))
    return F.flatten(F.transform(
        nibbles,
        lambda d: F.array(*[
            F.when(d.bitwiseAND(F.lit(mask)) != 0, F.lit(1))
             .otherwise(F.lit(-1))
            for mask in (8, 4, 2, 1)])))


def simhash_bitsums(shingles: Column,
                    hash_mode: str = "xxhash64") -> Column:
    """The SimHash accumulator as ONE fold: array<int> of 64 per-bit sums
    of ±1 contributions. A single pass over the shingle array (the
    earlier form ran 64 separate ``F.aggregate`` folds — 64 re-traversals
    and an unbounded codegen tree). ``hash_mode='md5'`` derives the bits
    from ``md5(shingle)`` hex so a SQL oracle can replicate them."""
    _check_hash_mode(hash_mode)
    if hash_mode == "md5":
        h = F.transform(shingles, lambda s: F.md5(s))
        bits = _pm_bits_md5
    else:
        h = F.transform(shingles, lambda s: F.xxhash64(s))
        bits = _pm_bits_long
    return F.aggregate(
        h, F.array_repeat(F.lit(0), 64),
        lambda acc, hv: F.zip_with(acc, bits(hv),
                                   lambda a, b: a + b))


def pack_sign_bits(bit_sums: Column) -> Column:
    """array<int> of 64 bit-sums → signed 64-bit SimHash (bit b set where
    sum > 0). Reference ``bit_sums`` as a MATERIALIZED column: as an
    inline subtree it would be copied 64×."""
    out = F.lit(0).cast("long")
    for b in range(64):
        bit = F.lit(1 << b) if b < 63 else F.lit(-(2 ** 63))
        out = out + F.when(F.element_at(bit_sums, b + 1) > 0, bit) \
                     .otherwise(F.lit(0))
    return out


def simhash64(shingles: Column, hash_mode: str = "xxhash64") -> Column:
    """64-bit SimHash of a shingle array: per bit, sign of the sum of ±1
    contributions from each shingle's hash — all Column expressions.
    Convenience single-expression form; hot paths should materialize
    :func:`simhash_bitsums` in its own projection first and pack with
    :func:`pack_sign_bits` (codegen CSE computes the duplicated fold
    once, but the optimizer tree stays 64× smaller)."""
    return pack_sign_bits(simhash_bitsums(shingles, hash_mode))


def simhash_pairs(df: DataFrame, max_hamming: int = 3, n: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  hash_mode: str = "xxhash64",
                  max_bucket_size: Optional[int] = None) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming,
    candidates generated by 16-bit chunk equality (pigeonhole: distance
    ≤3 over 4 chunks ⇒ at least one chunk identical; larger max_hamming
    keeps the same candidate rule, trading recall).

    ``max_bucket_size`` is the mandatory-at-scale hot-bucket guard (the
    same one-pass count-window cap as :func:`minhash_lsh_pairs`): a
    degenerate corpus — thousands of near-empty docs all hashing to
    sim=0 — puts f docs in one chunk bucket and the self-join emits f²
    candidate pairs. Oversized (chunk, value) buckets are dropped before
    the join; the window's (chunk, ch) exchange doubles as the join's
    partitioning, so the guard adds no extra shuffle. Documented recall
    trade: members of a dropped bucket can still pair through their
    other 3 chunks. Default None keeps exact pigeonhole semantics for
    the small-scale oracle checks."""
    _check_hash_mode(hash_mode)
    sh = _shingle_frame(df, text_col, id_col, n)
    # bit-sum fold materialized in its own projection; the 64-term pack
    # references it as a named column (CollapseProject keeps expensive
    # producer expressions un-inlined since SPARK-36718)
    sig = sh.select("did",
                    simhash_bitsums(F.col("sh"), hash_mode).alias("bs")) \
            .select("did", pack_sign_bits(F.col("bs")).alias("sim"))
    chunks = sig.select(
        "did", "sim",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("sim", c * 16).bitwiseAND(F.lit(0xFFFF))
                     .alias("ch"))
            for c in range(4)])).alias("cc")) \
        .select("did", "sim", "cc.chunk", "cc.ch")
    if max_bucket_size is not None:
        w = Window.partitionBy("chunk", "ch")
        chunks = (chunks
                  .withColumn("_f", F.count(F.lit(1)).over(w))
                  .where(F.col("_f") <= max_bucket_size).drop("_f"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.ch") == F.col("b.ch"))
                   & (F.col("a.did") < F.col("b.did")))
            .select(F.col("a.did").alias("id_a"),
                    F.col("b.did").alias("id_b"),
                    F.col("a.sim").alias("sim_a"),
                    F.col("b.sim").alias("sim_b"))
            .distinct())
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_dup_pairs(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact cosine-similar pairs (block nested-loop self-join). Quadratic:
    the correctness baseline; the scale path is the LSH-bucketed variant
    in similarity.py."""
    # zero-norm/null exclusion and the (id, vec, norm) projection are
    # similarity._with_norm, REUSED — a norm-convention change must land
    # in this exact baseline and the LSH scale path together or the two
    # silently diverge
    from .similarity import _with_norm
    a = _with_norm(df, id_col, vec_col, "id_a", "v_a", "n_a")
    b = _with_norm(df, id_col, vec_col, "id_b", "v_b", "n_b")
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    # norms precomputed per input row (below the join), not per pair;
    # same dot/(sqrt·sqrt) expression shape → scores bit-identical
    cos = dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    return (pairs.withColumn("cos", cos)
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cos")))
