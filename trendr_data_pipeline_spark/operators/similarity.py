"""Similarity search over embedding columns (north-star LLM-pipeline op).

Two paths:

- :func:`cosine_topk_bruteforce` — exact top-k: broadcast the query
  set, score every (query, candidate) with JVM-side higher-order
  functions (``zip_with`` dot product — no Python, no shuffle beyond
  the final top-k window). The right baseline at any scale where the
  query set is small.
- :func:`lsh_bucketed_topk` — random-hyperplane LSH variant: both
  sides are bucketed by sign-bit sketches, candidates come from an
  equi-join on (table, bucket), then exact rescoring. Sub-linear
  candidate generation for large query sets; recall is tunable via
  number of tables/bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (double accumulation,
    left-to-right — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``.

    Returns (query_id, neighbor_id, cosine_sim, rk). Self-matches are
    excluded. Ties broken by neighbor id (determinism, reference W4
    discipline)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


def hyperplane_sketch(vec: Column, dim: int, bits: int, seed: int) -> Column:
    """Sign-bit sketch: bit j = sign(Σᵢ vᵢ · rand(i,j)), with the
    pseudo-random hyperplane derived from xxhash64(i, j, seed) mapped
    to [-1, 1). Fully deterministic, JVM-side."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def bit(j: int) -> Column:
        comp = F.zip_with(
            vec,
            idx,
            lambda v, i: v.cast("double")
            * ((F.xxhash64(i, F.lit(j), F.lit(seed)) % 10000).cast("double") / 5000.0),
        )
        s = F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))

    out = F.lit(0)
    for j in range(bits):
        out = out * 2 + bit(j)
    return out


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 4,
    tables: int = 16,
) -> DataFrame:
    """Approximate cosine top-k: equi-join on (table, bucket) sketches,
    exact rescoring of candidates, top-k window. Candidate volume is
    O(n/2^bits) per table per query instead of O(n)."""

    def sketched(df: DataFrame, name: str) -> DataFrame:
        rows = []
        for t in range(tables):
            rows.append(
                df.select(
                    F.col(id_col).alias(f"{name}_id"),
                    F.col(vec_col).alias(f"{name}_v"),
                    F.lit(t).alias("tbl"),
                    hyperplane_sketch(F.col(vec_col), dim, bits, seed=t).alias("bucket"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    qs = sketched(queries, "q")
    cs = sketched(corpus, "c")
    cands = (
        cs.join(F.broadcast(qs), ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select(F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"), "q_v", "c_v")
        .distinct()
    )
    scored = cands.withColumn("cosine_sim", F.round(cosine(F.col("q_v"), F.col("c_v")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )
