"""Approximate-nearest-neighbor search over an ``array<float>`` embedding
column.

* ``brute_force_topk`` — the exact baseline: broadcast the (small) query
  set against the corpus, rank by cosine. One pass over the corpus per
  query batch; no corpus shuffle.
* ``lsh_topk`` — the scale path: random-hyperplane LSH. Corpus and queries
  hash to sign-pattern buckets (multiple independent tables to boost
  recall); only same-bucket pairs are scored. Sub-linear scored pairs at
  the cost of approximate recall.
* ``ivf_topk`` — IVF-style: k-means-lite centroids (sampled seeds,
  one refinement pass), corpus assigned to nearest centroid once;
  queries probe the ``nprobe`` nearest centroid lists.

Scores are rounded before ranking so rank order is reproducible across
engines (the DuckDB oracle computes the same rounded scores); ties break
by neighbor id ascending.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm

_HP_SEED = 0xA11CE


def _with_norm(df: DataFrame, id_col: str, vec_col: str, id_alias: str,
               vec_alias: str, n_alias: str) -> DataFrame:
    """Project (id, vec, ||vec||): norms are computed once per INPUT row,
    below the join, so scoring J pairs costs J dots — not J dots + 2J
    norm recomputations (cosine_similarity inlined at the pair level
    re-derives both norms per pair; at corpus scale that triples the
    flops of the scoring stage).

    Zero-norm (all-zero) and null vectors are EXCLUDED: their cosine is
    undefined, and under Spark 4's default ANSI mode the division would
    raise DIVIDE_BY_ZERO and kill the job over one degenerate row."""
    v = F.col(vec_col)
    return (df.select(F.col(id_col).alias(id_alias), v.alias(vec_alias),
                      l2_norm(v).alias(n_alias))
            .where(F.col(n_alias) > 0))


def _cos(va: str, vb: str, na: str, nb: str) -> Column:
    # same expression shape as cosine_similarity (dot / (sqrt*sqrt)) so
    # scores are bit-identical to the unfactored form / the SQL oracle
    return dot(F.col(va), F.col(vb)) / (F.col(na) * F.col(nb))


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_self: bool = True) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast queries × scan corpus.
    At 10^12 corpus rows this is one full scan per query batch — the
    correct baseline and often the right answer when queries are few."""
    q = F.broadcast(_with_norm(queries, id_col, vec_col,
                               "query_id", "q_vec", "q_n"))
    c = _with_norm(corpus, id_col, vec_col, "neighbor_id", "c_vec", "c_n")
    pairs = c.crossJoin(q)
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(_cos("q_vec", "c_vec", "q_n", "c_n"), 6).alias("score"))
    return _rank_topk(scored, k)


def _hyperplane(dim: int, table: int, bit: int) -> List[float]:
    """Deterministic pseudo-random unit-free hyperplane via integer
    hashing (no RNG state — same planes on any executor)."""
    out = []
    z = (table * 1315423911 + bit * 2654435761 + _HP_SEED) & 0xFFFFFFFF
    for i in range(dim):
        z = (z * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((z / 0x7FFFFFFF) * 2.0 - 1.0)
    return out


def _bucket_expr(vec: Column, dim: int, table: int, bits: int) -> Column:
    """Sign pattern of the vector against ``bits`` hyperplanes → int."""
    acc = F.lit(0)
    for b in range(bits):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, table, b)])
        s = dot(vec, plane)
        acc = acc + F.when(s > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return acc


def _with_buckets(base: DataFrame, id_alias: str, vec_alias: str,
                  n_alias: str, dim: int, tables: int,
                  bits: int) -> DataFrame:
    """Explode a normed frame to one row per (vector, LSH table) with its
    sign-bucket — the ONE bucketing projection both lsh_topk and
    lsh_dup_pairs ride (a hashing change lands in both or neither)."""
    v = F.col(vec_alias)

    def bkt(t: int) -> Column:
        # a vector whose length != dim would dot against the padded
        # hyperplane as NULL, fall through `when(s > 0)` to bucket 0 in
        # EVERY table, and silently turn the sub-linear bucket join into
        # the full quadratic cross product — raise mid-job instead
        # (nulls/zero-norm rows were already excluded by _with_norm)
        return (F.when(F.size(v) == dim, _bucket_expr(v, dim, t, bits))
                .otherwise(F.raise_error(F.format_string(
                    f"lsh: embedding length %s != dim={dim} — pass the "
                    f"real dimension", F.size(v))).cast("int")))

    b = F.explode(F.array(*[
        F.struct(F.lit(t).alias("tbl"), bkt(t).alias("bkt"))
        for t in range(tables)])).alias("tb")
    return (base.select(id_alias, vec_alias, n_alias, b)
            .select(id_alias, vec_alias, n_alias, "tb.tbl", "tb.bkt"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             dim: int = 64, tables: int = 4, bits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True) -> DataFrame:
    """Random-hyperplane LSH top-k: join corpus and queries on
    (table, sign-bucket); score only collisions. Expected candidate
    fraction ≈ tables × 2^-bits of the corpus per query.

    Recall is measured, not just formula-claimed
    (tests/test_recall_empirical.py): on the seeded 60-cluster corpus,
    recall@5 = 1.00 at bits=6/tables=4 (per-pair angle formula predicts
    0.98) and tracks the `1-(1-(1-θ/π)^bits)^tables` prediction within
    binomial noise at the deliberately mid-recall bits=10 setting."""
    c = _with_buckets(_with_norm(corpus, id_col, vec_col,
                                 "neighbor_id", "c_vec", "c_n"),
                      "neighbor_id", "c_vec", "c_n", dim, tables, bits)
    q = F.broadcast(_with_buckets(_with_norm(queries, id_col, vec_col,
                                             "query_id", "q_vec", "q_n"),
                                  "query_id", "q_vec", "q_n",
                                  dim, tables, bits))
    cand = (c.join(q, ["tbl", "bkt"])
            .select("query_id", "neighbor_id", "q_vec", "c_vec",
                    "q_n", "c_n")
            .dropDuplicates(["query_id", "neighbor_id"]))
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(_cos("q_vec", "c_vec", "q_n", "c_n"), 6).alias("score"))
    return _rank_topk(scored, k)


def _cent_structs(vec_col: Column, norm_col: Column,
                  cents: List[tuple]) -> List[Column]:
    """Per-centroid ``struct(cos, -cid)`` literals — the ONE place the
    literal-centroid scoring shape lives (assign argmax and probe sort
    both consume it, so they can't drift). A zero-norm centroid (the
    mean of a degenerate cluster) scores as a constant 0 instead of
    raising ANSI DIVIDE_BY_ZERO. ``cents`` = [(cid, vector, norm)]."""
    structs = []
    for cid, vec, cn in cents:
        c_arr = F.array(*[F.lit(float(x)) for x in vec])
        cos = dot(vec_col, c_arr) / (norm_col * F.lit(cn if cn > 0
                                                      else 1.0))
        structs.append(F.struct(cos.alias("cos"),
                                F.lit(-cid).alias("ncid")))
    return structs


def _assign_expr(vec_col: Column, norm_col: Column,
                 cents: List[tuple]) -> Column:
    """Nearest-centroid id as a PURE column expression over literal
    centroid arrays: argmax cosine via ``array_max`` of
    ``struct(cos, -cid)`` (ties → smallest cid). Zero shuffle, zero row
    expansion — the scan stays one codegen'd pass however large the
    corpus."""
    structs = _cent_structs(vec_col, norm_col, cents)
    return (-F.array_max(F.array(*structs))["ncid"]).cast("int")


def _probe_expr(vec_col: Column, norm_col: Column, cents: List[tuple],
                nprobe: int) -> Column:
    """Top-``nprobe`` centroid ids by cosine (desc, cid asc) as a pure
    expression: sort the literal struct array descending and slice."""
    ranked = F.sort_array(
        F.array(*_cent_structs(vec_col, norm_col, cents)), asc=False)
    return F.transform(F.slice(ranked, 1, nprobe),
                       lambda s: (-s.getField("ncid")).cast("int"))


def _with_norms_py(rows: List[tuple]) -> List[tuple]:
    """[(cid, vec)] → [(cid, vec, ||vec||)]; the sequential Python sum
    matches the engines' left-to-right fold bit-for-bit."""
    out = []
    for cid, vec in rows:
        acc = 0.0
        for x in vec:
            acc += float(x) * float(x)
        out.append((cid, [float(x) for x in vec], acc ** 0.5))
    return out


def lsh_dup_pairs(df: DataFrame, threshold: float = 0.95,
                  dim: int = 64, tables: int = 4, bits: int = 8,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup PAIRS via random-hyperplane LSH — the scale
    path for :func:`jio_spark.operators.dedup.embedding_dup_pairs`
    (which is an exact but quadratic self-join). Vectors meet only when
    they share a sign-bucket in at least one table: expected scored
    pairs ≈ Σ bucket² per table instead of n²; recall for cosine c is
    1-(1-(1-θ/π)^bits)^tables with θ=arccos(c) (near-dups at c≥0.95
    collide with high probability). Same deterministic hyperplanes as
    lsh_topk, so a SQL oracle replays bucketing exactly."""
    base = _with_norm(df, id_col, vec_col, "vid", "v", "n")
    buckets = _with_buckets(base, "vid", "v", "n", dim, tables, bits)
    a = buckets.alias("a")
    bb = buckets.alias("b")
    cand = (a.join(bb, (F.col("a.tbl") == F.col("b.tbl"))
                   & (F.col("a.bkt") == F.col("b.bkt"))
                   & (F.col("a.vid") < F.col("b.vid")))
            .select(F.col("a.vid").alias("id_a"),
                    F.col("b.vid").alias("id_b"),
                    F.col("a.v").alias("v_a"), F.col("b.v").alias("v_b"),
                    F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"))
            .dropDuplicates(["id_a", "id_b"]))
    cos = dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    # filter on the RAW cosine, round only for output — the same order
    # as the exact embedding_dup_pairs baseline, so the LSH result is a
    # strict subset of the exact result even at the rounding boundary
    return (cand.withColumn("_cos", cos)
            .where(F.col("_cos") >= threshold)
            .select("id_a", "id_b", F.round("_cos", 6).alias("cos")))


def _centroid_frame(spark, cents: List[tuple]) -> DataFrame:
    """[(cid, vec, norm)] → broadcast-ready centroid table. The floats
    are the same Python doubles the literal-expression path embeds —
    including the zero-norm→1.0 guard of ``_cent_structs`` — so both
    assignment paths score bit-identically."""
    return spark.createDataFrame(
        [(int(cid), [float(x) for x in vec],
          float(n) if n > 0 else 1.0)
         for cid, vec, n in cents],
        "cid int, cv array<double>, cn double")


def _assign_join(c: DataFrame, cents: List[tuple]) -> DataFrame:
    """Nearest-centroid assignment via broadcast join — the documented
    >10²-centroid variant (the literal-expression path embeds
    n_centroids × dim literals in the plan, fine to a few hundred
    centroids; beyond that the plan itself becomes the bottleneck).

    corpus × broadcast(centroids) expands k× but flows straight into a
    map-side-combined ``max(struct(cos, -cid))`` groupBy — ONE shuffle of
    one row per corpus id (vec and norm ride along with ``first``, values
    identical within a group), and no Window over the expanded corpus.
    Tie-break matches ``_assign_expr``: max of (cos, -cid) ⇒ smallest cid
    on equal cosine.

    CONTRACT: corpus ids must be unique (the standard ANN corpus shape —
    vec_id keyed). The groupBy collapses duplicate ids to one row, so on
    a corpus with repeated ids this path and the expr path diverge; the
    bit-identical claim and its pinning test hold for unique-id corpora."""
    cdf = F.broadcast(_centroid_frame(c.sparkSession, cents))
    cos = dot(F.col("c_vec"), F.col("cv")) / (F.col("c_n") * F.col("cn"))
    scored = c.crossJoin(cdf).select(
        "neighbor_id", "c_vec", "c_n",
        F.struct(cos.alias("cos"),
                 (-F.col("cid")).alias("ncid")).alias("sc"))
    return (scored.groupBy("neighbor_id")
            .agg(F.first("c_vec").alias("c_vec"),
                 F.first("c_n").alias("c_n"),
                 (-F.max("sc")["ncid"]).cast("int").alias("cid")))


def _probe_join(q: DataFrame, cents: List[tuple], nprobe: int) -> DataFrame:
    """Top-``nprobe`` probe list via broadcast join + row_number — the
    query side is tiny, so the Window is over a broadcast-size frame."""
    cdf = F.broadcast(_centroid_frame(q.sparkSession, cents))
    cos = dot(F.col("q_vec"), F.col("cv")) / (F.col("q_n") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("cid").asc())
    return (q.crossJoin(cdf)
            .select("query_id", "q_vec", "q_n", "cid", cos.alias("_cos"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= nprobe)
            .select("query_id", "q_vec", "q_n", "cid"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True,
             assign: str = "expr") -> DataFrame:
    """IVF-style ANN with shuffle-free centroid assignment.

    Recall evidence (tests/test_recall_empirical.py): on the seeded
    60-cluster corpus, recall@5 = 1.00 at nprobe=3 of 12 centroids
    (documented floor 0.8), and nprobe == n_centroids reproduces
    brute_force_topk EXACTLY (ids and scores) — the candidate set is
    the whole corpus, pinned as the formula's boundary case.

    1. Seeds: the ``n_centroids`` corpus rows with lexicographically
       smallest ``md5(id)`` — a deterministic sample any SQL engine can
       reproduce — collected to the driver (≤ a few KB: the one
       legitimate driver-side step; everything row-scale stays
       distributed).
    2. Assignment is a pure column expression against the LITERAL
       centroids (``_assign_expr``) — the earlier form crossJoined the
       corpus with the centroid table (n_centroids× row expansion) and
       ranked through ``Window.partitionBy(id)``, a full shuffle of the
       expanded corpus, twice; now the corpus is never shuffled at all.
    3. One Lloyd refinement: ``groupBy(cid).agg(avg(v[i]) …)`` —
       map-side combinable, reduced state = n_centroids × dim doubles.
       Means are rounded to 6 decimals so the refined centroids are
       identical across engines (partial-agg summation order).
    4. Queries (tiny) compute their ``nprobe`` probe lists as a pure
       expression too; the only joins are candidate-list joins keyed on
       cid with the broadcast query side.

    Sizing: the literal-centroid expression is n_centroids × dim
    literals in the plan — comfortable to a few hundred centroids at
    dim≈10². ``assign='join'`` switches steps 2 and 4 to the
    broadcast-join variant for thousands of centroids
    (:func:`_assign_join` / :func:`_probe_join`: centroid table
    broadcast, argmax via map-side-combined ``max(struct(cos, -cid))``
    — one corpus shuffle, no Window over the expanded corpus). Both
    paths score with identical double arithmetic, so their outputs are
    bit-identical (pinned by test_ivf_join_assignment_matches_expr)."""
    # 2+3's corpus frame, built first so seeding draws from the SAME
    # zero-norm/null-excluded population (the oracle seeds from its
    # guarded CTE; a zero-norm seed here would desynchronize them)
    c = _with_norm(corpus, id_col, vec_col, "neighbor_id", "c_vec", "c_n")

    # 1. deterministic driver-side seeds
    seed_rows = (c
                 .select(F.col("neighbor_id").alias("sid"),
                         F.col("c_vec").alias("v"))
                 .orderBy(F.md5(F.col("sid").cast("string")))
                 .limit(n_centroids)
                 .collect())
    if not seed_rows:   # empty corpus → empty result, not an IndexError
        # same schema as the non-empty path: id types follow the inputs
        # (a hardcoded `long` would make the empty case union-incompatible
        # with a string-keyed corpus's results)
        q_t = queries.schema[id_col].dataType.simpleString()
        c_t = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"query_id {q_t}, rank int, neighbor_id {c_t}, "
                "score double")
    seeds = _with_norms_py([(cid, list(r["v"]))
                            for cid, r in enumerate(seed_rows)])
    dim = len(seeds[0][1])

    # 2+3. assign to seed centroids, refine by per-dim mean
    if assign == "join":
        asg1 = _assign_join(c, seeds)
    else:
        asg1 = c.withColumn("cid", _assign_expr(F.col("c_vec"),
                                                F.col("c_n"), seeds))
    mean_rows = (asg1.groupBy("cid")
                 .agg(*[F.round(F.avg(F.col("c_vec")[i]), 6).alias(f"m{i}")
                        for i in range(dim)])
                 .collect())
    refined = _with_norms_py(
        [(int(r["cid"]), [r[f"m{i}"] for i in range(dim)])
         for r in sorted(mean_rows, key=lambda r: r["cid"])])

    # 4. final assignment + probe lists against the refined centroids
    q = _with_norm(queries, id_col, vec_col, "query_id", "q_vec", "q_n")
    if assign == "join":
        corp = _assign_join(c, refined)
        qs = _probe_join(q, refined, nprobe)
    else:
        corp = c.withColumn("cid", _assign_expr(F.col("c_vec"),
                                                F.col("c_n"), refined))
        qs = (q.withColumn("probe",
                           _probe_expr(F.col("q_vec"), F.col("q_n"),
                                       refined, nprobe))
              .select("query_id", "q_vec", "q_n",
                      F.explode("probe").alias("cid")))

    cand = corp.join(F.broadcast(qs), "cid")
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(_cos("q_vec", "c_vec", "q_n", "c_n"), 6).alias("score"))
    return _rank_topk(scored, k)
