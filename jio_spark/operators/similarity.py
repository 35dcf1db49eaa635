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

from ..functions.vectors import cosine_similarity, dot, l2_norm

_HP_SEED = 0xA11CE


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
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("q_vec")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    pairs = c.crossJoin(q)
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6)
         .alias("score"))
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
    def with_buckets(df, id_alias, vec_alias):
        v = F.col(vec_col)
        b = F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     _bucket_expr(v, dim, t, bits).alias("bkt"))
            for t in range(tables)])).alias("tb")
        return (df.select(F.col(id_col).alias(id_alias),
                          v.alias(vec_alias), b)
                  .select(id_alias, vec_alias, "tb.tbl", "tb.bkt"))

    c = with_buckets(corpus, "neighbor_id", "c_vec")
    q = F.broadcast(with_buckets(queries, "query_id", "q_vec"))
    cand = (c.join(q, ["tbl", "bkt"])
            .select("query_id", "neighbor_id", "q_vec", "c_vec")
            .dropDuplicates(["query_id", "neighbor_id"]))
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6)
         .alias("score"))
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
    seeds_b = F.broadcast(seeds)

    def nearest_cid(df, vec_alias):
        joined = df.crossJoin(seeds_b)
        sim = cosine_similarity(F.col(vec_alias), F.col("centroid"))
        w = Window.partitionBy(df.columns[0]).orderBy(
            F.desc(sim), F.asc("cid"))
        return joined.withColumn("_r", F.row_number().over(w))

    # one refinement pass: mean of members (element-wise via posexplode)
    assigned = (nearest_cid(
        corpus.select(F.col(id_col).alias("nid"),
                      F.col(vec_col).alias("v")), "v")
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
    refined_b = F.broadcast(refined)

    corp = (corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("c_vec"))
            .crossJoin(refined_b))
    w = Window.partitionBy("neighbor_id").orderBy(
        F.desc(cosine_similarity(F.col("c_vec"), F.col("centroid"))),
        F.asc("cid"))
    corp = (corp.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1).select("neighbor_id", "c_vec", "cid"))

    qs = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).alias("q_vec"))
          .crossJoin(refined_b))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(cosine_similarity(F.col("q_vec"), F.col("centroid"))),
        F.asc("cid"))
    qs = (qs.withColumn("_r", F.row_number().over(wq))
          .where(F.col("_r") <= nprobe)
          .select("query_id", "q_vec", "cid"))

    cand = corp.join(F.broadcast(qs), "cid")
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6)
         .alias("score"))
    return _rank_topk(scored, k)
