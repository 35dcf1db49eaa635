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
    flops of the scoring stage)."""
    v = F.col(vec_col)
    return df.select(F.col(id_col).alias(id_alias), v.alias(vec_alias),
                     l2_norm(v).alias(n_alias))


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


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             dim: int = 64, tables: int = 4, bits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True) -> DataFrame:
    """Random-hyperplane LSH top-k: join corpus and queries on
    (table, sign-bucket); score only collisions. Expected candidate
    fraction ≈ tables × 2^-bits of the corpus per query."""
    def with_buckets(df, id_alias, vec_alias, n_alias):
        base = _with_norm(df, id_col, vec_col, id_alias, vec_alias,
                          n_alias)
        v = F.col(vec_alias)
        b = F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     _bucket_expr(v, dim, t, bits).alias("bkt"))
            for t in range(tables)])).alias("tb")
        return (base.select(id_alias, vec_alias, n_alias, b)
                .select(id_alias, vec_alias, n_alias, "tb.tbl", "tb.bkt"))

    c = with_buckets(corpus, "neighbor_id", "c_vec", "c_n")
    q = F.broadcast(with_buckets(queries, "query_id", "q_vec", "q_n"))
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


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True) -> DataFrame:
    """IVF-style ANN: centroids = deterministic corpus sample refined by
    one Lloyd step (both as DataFrame aggs), corpus partitioned by nearest
    centroid, queries probe the ``nprobe`` nearest lists."""
    # deterministic seed sample: lowest xxhash64(id) rows
    seeds = (corpus
             .select(F.col(id_col), F.col(vec_col))
             .orderBy(F.xxhash64(F.col(id_col)))
             .limit(n_centroids)
             .select(F.monotonically_increasing_id().alias("cid"),
                     F.col(vec_col).alias("centroid")))
    seeds = seeds.select("cid", "centroid",
                         l2_norm(F.col("centroid")).alias("cent_n"))
    seeds_b = F.broadcast(seeds)

    # one refinement pass: mean of members (element-wise via posexplode)
    assigned = (_with_norm(corpus, id_col, vec_col, "nid", "v", "v_n")
                .crossJoin(seeds_b)
                .withColumn("_r", F.row_number().over(
                    Window.partitionBy("nid").orderBy(
                        F.desc(_cos("v", "centroid", "v_n", "cent_n")),
                        F.asc("cid"))))
                .where(F.col("_r") == 1).select("nid", "v", "cid"))
    refined = (assigned
               .select("cid", F.posexplode("v").alias("pos", "x"))
               .groupBy("cid", "pos").agg(F.avg("x").alias("m"))
               .groupBy("cid")
               .agg(F.array_sort(
                   F.collect_list(F.struct("pos", "m"))).alias("pm"))
               .select("cid", F.transform(
                   "pm", lambda s: s.getField("m").cast("float"))
                   .alias("centroid")))
    refined = refined.select("cid", "centroid",
                             l2_norm(F.col("centroid")).alias("cent_n"))
    refined_b = F.broadcast(refined)

    corp = (_with_norm(corpus, id_col, vec_col,
                       "neighbor_id", "c_vec", "c_n")
            .crossJoin(refined_b))
    w = Window.partitionBy("neighbor_id").orderBy(
        F.desc(_cos("c_vec", "centroid", "c_n", "cent_n")), F.asc("cid"))
    corp = (corp.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("neighbor_id", "c_vec", "c_n", "cid"))

    qs = (_with_norm(queries, id_col, vec_col, "query_id", "q_vec", "q_n")
          .crossJoin(refined_b))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(_cos("q_vec", "centroid", "q_n", "cent_n")), F.asc("cid"))
    qs = (qs.withColumn("_r", F.row_number().over(wq))
          .where(F.col("_r") <= nprobe)
          .select("query_id", "q_vec", "q_n", "cid"))

    cand = corp.join(F.broadcast(qs), "cid")
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(_cos("q_vec", "c_vec", "q_n", "c_n"), 6).alias("score"))
    return _rank_topk(scored, k)
