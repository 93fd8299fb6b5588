"""Deduplication queries over ``documents`` (⊕J13 + north-star dedup
suite). The Spark plans are the scalable forms (hash-groupBy, prefix-
filtered inverted index, MinHash-LSH banding); the DuckDB oracles are
brute-force O(n²) ground truth — tractable at sf0.01 where the oracle
runs, while the Spark side stays 100 TB-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_table
from ..operators.dedup import (
    exact_duplicate_groups,
    jaccard_similarity_pairs,
    minhash_lsh_pairs,
    simhash_fingerprints,
)
from .registry import register

_SQL_TOKSET = (
    "list_sort(list_distinct(list_filter("
    "regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)))"
)

_SQL_EXACT_PAIRS = f"""
    WITH t AS (
        SELECT doc_id AS id, {_SQL_TOKSET} AS toks FROM documents
        WHERE len({_SQL_TOKSET}) > 0
    )
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND(len(list_intersect(a.toks, b.toks)) * 1.0
                 / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
    FROM t a JOIN t b ON a.id < b.id
    WHERE len(list_intersect(a.toks, b.toks)) * 1.0
          / len(list_distinct(list_concat(a.toks, b.toks))) >= {{thr}}
"""


@register(
    "d01_exact_dedup_groups",
    f"""
    WITH f AS (
        SELECT doc_id, md5(array_to_string({_SQL_TOKSET}, ' ')) AS fingerprint
        FROM documents
    )
    SELECT fingerprint, MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
    FROM f GROUP BY fingerprint HAVING COUNT(*) > 1
    """,
)
def d01_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on a 128-bit content fingerprint."""
    return exact_duplicate_groups(read_table(spark, sf_dir, "documents"))


@register(
    "d02_jaccard_pairs",
    _SQL_EXACT_PAIRS.format(thr=0.8),
)
def d02_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard ≥0.8 pairs via prefix-filtered inverted
    index (no O(n²) anywhere in the Spark plan)."""
    return jaccard_similarity_pairs(read_table(spark, sf_dir, "documents"), threshold=0.8)


@register(
    "d03_minhash_lsh_pairs",
    _SQL_EXACT_PAIRS.format(thr=0.8),
    doc="""MinHash(128)+LSH(32 bands) candidates, exact-verified at
    Jaccard ≥0.8. Oracle is the brute-force ground truth: banding
    recall at 0.8 is 1−(1−0.8⁴)³² ≈ 1−5e-8, so results must match.""",
)
def d03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(read_table(spark, sf_dir, "documents"), threshold=0.8)


@register(
    "d04_simhash_buckets",
    None,  # bit-vote fingerprint is not SQL-expressible; pytest holds the Python oracle
)
def d04_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 fingerprints with 16-bit bands for hamming-bucketed
    near-dup candidate generation."""
    return simhash_fingerprints(read_table(spark, sf_dir, "documents"))
