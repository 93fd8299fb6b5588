"""Similarity-search queries over ``embeddings`` (north-star ANN ops).

The brute-force top-k is the exactness baseline; the LSH variant is
the scale path (bucketed candidate generation). Query set = every
100th vector — a small broadcast side, as in real ANN serving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..operators.similarity import cosine_topk_bruteforce, lsh_bucketed_topk
from .registry import register

_ORACLE_TOPK = """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id % 100 = 0
    ), c AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               ROUND(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
                 AS cosine_sim
        FROM q JOIN c ON query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id ASC) AS rk
        FROM scored
    ) WHERE rk <= 10
"""


@register("m01_cosine_topk", _ORACLE_TOPK)
def m01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for each query vector: broadcast queries,
    JVM-side zip_with dot products, one top-k window."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return cosine_topk_bruteforce(queries, emb, k=10)


@register(
    "m02_ann_lsh_topk",
    None,  # approximate by construction — rows-only check; pytest measures recall vs m01
)
def m02_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-10: candidates from (table, bucket)
    equi-join, exact rescoring. Recall vs the brute-force baseline is
    asserted in tests, not by the SQL oracle."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return lsh_bucketed_topk(queries, emb, k=10, dim=64, bits=4, tables=16)


@register(
    "m03_ivf_topk",
    None,  # approximate by construction — rows-only; recall asserted in tests
)
def m03_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means(16) coarse quantizer, 4-cell probe, exact
    rescoring — the inverted-file scale path beside the LSH one."""
    from ..operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(queries, emb, k=10, nlist=16, nprobe=4)
