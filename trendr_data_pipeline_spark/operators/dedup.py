"""Deduplication operators for document corpora (⊕ SURVEY §2, J13;
north-star LLM-pipeline ops).

Four strategies, in increasing tolerance:

- :func:`exact_duplicate_groups` — hash-groupBy on a canonical
  fingerprint. One shuffle on the (short) fingerprint.
- :func:`jaccard_similarity_pairs` — **exact** token-set Jaccard join
  with prefix filtering: candidate pairs must share a token from each
  document's rarest-token prefix, which bounds the inverted-index
  fan-out while keeping exact results (Chaudhuri et al., "A Primitive
  Operator for Similarity Joins", ICDE'06 — public algorithm).
- :func:`minhash_lsh_pairs` — MinHash signatures + LSH banding, then
  exact verification of candidates. The scale path: shuffle volume is
  O(docs × bands), never O(docs²).
- :func:`simhash64` — 64-bit SimHash fingerprints for
  hamming-distance near-dup bucketing.

All hashing uses Spark's builtin ``xxhash64`` with literal seeds —
deterministic, JVM-side, no Python in the hot path except the SimHash
bit-vote (vectorized pandas UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from ..io import spread

# ---------------------------------------------------------------------------
# canonical token set
# ---------------------------------------------------------------------------


def token_set(col: Column) -> Column:
    """Sorted distinct lowercase tokens — the document's set
    representation for Jaccard-family ops."""
    return F.array_sort(F.array_distinct(tokens(F.lower(col))))


def bow_fingerprint(col: Column) -> Column:
    """md5 of the sorted distinct-token bag — exact-dup key invariant
    to word order and repetition."""
    return F.md5(F.array_join(token_set(col), " "))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of documents with identical token bags.

    Returns (fingerprint, canonical_id, n_dups). One shuffle on the
    128-bit fingerprint; at 100 TB this is the cheapest possible dedup
    (map-side partial agg collapses most of the stream)."""
    return (
        df.select(F.col(id_col), bow_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# exact Jaccard with prefix filtering
# ---------------------------------------------------------------------------


def jaccard_similarity_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with token-set Jaccard ≥ threshold — exact.

    Plan: tokenize → global token document-frequency → per-doc prefix
    (the ⌈(1−t)·|A|⌉+1 globally-rarest tokens; any qualifying pair must
    share a prefix token) → equi-join on prefix token → exact verify on
    the full sets. The prefix step turns the classic inverted-index
    self-join from quadratic blowup on frequent tokens into a join
    keyed (mostly) by rare tokens; at 100 TB add a document-frequency
    cap as a pre-filter for stop-tokens.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    toks = df.select(F.col(id_col).alias("id"), token_set(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    exploded = toks.select("id", F.size("toks").alias("set_size"), F.explode("toks").alias("token"))

    freq = exploded.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    ranked = exploded.join(freq, "token").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("token").asc())
        ),
    )
    prefix_len = F.ceil(F.lit(1.0 - threshold) * F.col("set_size")).cast("int") + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select("id", "token")

    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    ta = toks.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# incremental (incoming-vs-corpus) exact Jaccard — count-based
# ---------------------------------------------------------------------------


def jaccard_topk_join(
    incoming: DataFrame,
    corpus: DataFrame,
    threshold: float,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """For each incoming document, its top-k corpus near-duplicates by
    token-set Jaccard ≥ threshold — the shape of production dedup
    (screen a new batch against the existing corpus before ingest).

    Exact, with NO array materialization on the join path: explode
    distinct tokens on both sides, equi-join on token, count shared
    tokens per pair, and recover Jaccard as |∩| / (|A|+|B|−|∩|). One
    shuffle join + one aggregation; map-side combine collapses the
    per-token pair stream. At 100 TB, cap ultra-frequent tokens
    (document-frequency stop list) before the join — a df-capped token
    cannot contribute to a ≥0.8 pair whose sets are small.

    Returns (id_a, id_b, jaccard, rk) — id_a from incoming.
    """
    ta = (
        incoming.select(F.col(id_col).alias("id_a"), token_set(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") > 0)
        .select("id_a", F.size("toks").alias("size_a"), F.explode("toks").alias("token"))
    )
    tb = (
        spread(corpus)
        .select(F.col(id_col).alias("id_b"), token_set(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") > 0)
        .select("id_b", F.size("toks").alias("size_b"), F.explode("toks").alias("token"))
    )
    # size-compatibility bound: J(A,B) ≥ t forces t·|A| ≤ |B| ≤ |A|/t —
    # prunes incompatible pairs inside the join before the aggregation
    size_ok = (F.col("size_b") >= F.ceil(F.lit(threshold) * F.col("size_a"))) & (
        F.col("size_b") <= F.floor(F.col("size_a") / F.lit(threshold))
    )
    shared = (
        ta.join(tb, "token")
        .filter((F.col("id_a") != F.col("id_b")) & size_ok)
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.round(
        F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"), 6
    )
    w = Window.partitionBy("id_a").orderBy(F.col("jaccard").desc(), F.col("id_b").asc())
    return (
        shared.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id_a", "id_b", "jaccard", "rk")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature_expr(toks: Column, n_hashes: int = 128) -> Column:
    """Array of n MinHash values via higher-order builtins (xxhash64
    per (token, seed)). Fully JVM-side but NOT codegen'd — Spark
    evaluates lambda functions interpretively, ~2.5 ms/row at 128
    hashes × 25 tokens. Kept for reference; the UDF form below is the
    production path."""
    seeds = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    return F.transform(
        seeds,
        lambda s: F.array_min(F.transform(toks, lambda t: F.xxhash64(t, s))),
    )


def _affine_constants(n_hashes: int):
    """Deterministic odd multipliers / offsets for the affine MinHash
    family, derived from sha256 (stable across platforms and runs)."""
    import hashlib

    import numpy as np

    a = np.array(
        [int.from_bytes(hashlib.sha256(f"mh-a{i}".encode()).digest()[:8], "big") | 1
         for i in range(n_hashes)],
        dtype=np.uint64,
    )
    b = np.array(
        [int.from_bytes(hashlib.sha256(f"mh-b{i}".encode()).digest()[:8], "big")
         for i in range(n_hashes)],
        dtype=np.uint64,
    )
    return a, b


def minhash_signature(toks: Column, n_hashes: int = 128) -> Column:
    """Array of n MinHash values, vectorized: each distinct token is
    hashed once (blake2b-64), then the n affine permutations
    ``(a_i·h + b_i) mod 2⁶⁴`` are evaluated as one numpy outer product
    per document and min-reduced. ~25× faster than the expression form
    at 128 hashes (Arrow batch in, Arrow batch out)."""
    import hashlib

    import numpy as np

    a, b = _affine_constants(n_hashes)

    def batch(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def tok_hash(t: str) -> int:
            h = cache.get(t)
            if h is None:
                h = cache[t] = int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
                )
            return h

        out = []
        with np.errstate(over="ignore"):
            for toks_list in s:
                hs = np.array([tok_hash(t) for t in toks_list], dtype=np.uint64)
                # (n_tokens, n_hashes) wrapping affine transform
                sig = (hs[:, None] * a[None, :] + b[None, :]).min(axis=0)
                out.append(sig.astype(np.int64))
        return pd.Series(out)

    return F.pandas_udf(batch, "array<long>")(toks)


def minhash_band_buckets(toks: Column, n_hashes: int = 128, bands: int = 32) -> Column:
    """Per document: array of ``bands`` bucket ids — the MinHash
    signature reshaped to (bands, rows) and mixed down to one 64-bit
    value per band, all inside one numpy pass (signature + banding
    fused; no per-band expression trees)."""
    import hashlib

    import numpy as np

    a, b = _affine_constants(n_hashes)
    rows = n_hashes // bands
    mix = np.array(
        [int.from_bytes(hashlib.sha256(f"band-mix{j}".encode()).digest()[:8], "big") | 1
         for j in range(rows)],
        dtype=np.uint64,
    )

    def batch(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def tok_hash(t: str) -> int:
            h = cache.get(t)
            if h is None:
                h = cache[t] = int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
                )
            return h

        out = []
        with np.errstate(over="ignore"):
            for toks_list in s:
                hs = np.array([tok_hash(t) for t in toks_list], dtype=np.uint64)
                sig = (hs[:, None] * a[None, :] + b[None, :]).min(axis=0)
                buckets = (sig.reshape(bands, rows) * mix[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
                out.append(buckets.astype(np.int64))
        return pd.Series(out)

    return F.pandas_udf(batch, "array<long>")(toks)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, exact-verified.

    With 128 hashes in 32 bands of 4 rows, a pair at Jaccard 0.8 is
    banded together with probability 1−(1−0.8⁴)³² ≈ 1−5·10⁻⁸ — the
    exact-verify step then makes the *output* exact for qualifying
    pairs (up to that negligible recall loss). Shuffle volume is
    O(docs·bands), the 100 TB-safe property brute-force lacks.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    toks = spread(df).select(
        F.col(id_col).alias("id"), token_set(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    banded = toks.select(
        "id",
        F.posexplode(minhash_band_buckets(F.col("toks"), n_hashes, bands)).alias(
            "band", "bucket"
        ),
    )

    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    ta = toks.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_topk_join(
    incoming: DataFrame,
    corpus: DataFrame,
    threshold: float,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """LSH variant of :func:`jaccard_topk_join`: candidates come from a
    band-bucket equi-join between incoming and corpus signatures (the
    incoming side is small → broadcast), then candidates are verified
    exactly on the full token sets. Shuffle volume O(corpus·bands);
    per-pair recall at the threshold is 1−(1−t^r)^b ≈ 1−5e-8.

    Returns (id_a, id_b, jaccard, rk) — identical contract (and, up to
    LSH recall, identical results) to the exact join.
    """
    def sig_bands(df: DataFrame, out_id: str) -> DataFrame:
        toks = spread(df).select(
            F.col(id_col).alias(out_id), token_set(F.col(text_col)).alias("toks")
        ).filter(F.size("toks") > 0)
        return toks.select(
            out_id,
            F.posexplode(minhash_band_buckets(F.col("toks"), n_hashes, bands)).alias(
                "band", "bucket"
            ),
        )

    cands = (
        sig_bands(corpus, "id_b")
        .join(F.broadcast(sig_bands(incoming, "id_a")), ["band", "bucket"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    toks = lambda df, out_id, sz, tk: (  # noqa: E731
        df.select(F.col(id_col).alias(out_id), token_set(F.col(text_col)).alias(tk)).withColumn(
            sz, F.size(tk)
        )
    )
    ta = toks(incoming, "id_a", "size_a", "toks_a")
    tb = toks(spread(corpus), "id_b", "size_b", "toks_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = (F.col("size_a") + F.col("size_b") - F.size(F.array_intersect("toks_a", "toks_b"))).cast(
        "double"
    )
    w = Window.partitionBy("id_a").orderBy(F.col("jaccard").desc(), F.col("id_b").asc())
    return (
        cands.join(F.broadcast(ta), "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id_a", "id_b", "jaccard", "rk")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_py(token_lists: pd.Series) -> pd.Series:
    """64-bit SimHash: per-token FNV-1a 64 hash, bitwise ±1 vote,
    sign → bit. Pure-Python but vectorized per Arrow batch."""
    out = []
    for toks in token_lists:
        if toks is None or len(toks) == 0:
            out.append(0)
            continue
        votes = [0] * 64
        for t in toks:
            h = 0xCBF29CE484222325
            for ch in t.encode("utf-8"):
                h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        v = 0
        for i in range(64):
            if votes[i] > 0:
                v |= 1 << i
        # two's-complement into signed 64-bit for Spark LongType
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pd.Series(out)


def simhash64(col: Column) -> Column:
    """pandas-UDF wrapper built at call time (module import must stay
    session-free for executor-side re-imports)."""
    return F.pandas_udf(_simhash_py, "long")(col)


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash, band0..band3): 16-bit bands of the fingerprint.
    Near-dups (hamming ≤ 3) agree on ≥1 band (pigeonhole over 4 bands),
    so banding gives candidate buckets with an equi-join, no O(n²)."""
    sh = spread(df).select(
        F.col(id_col).alias("id"), simhash64(token_set(F.col(text_col))).alias("simhash")
    )
    for i in range(4):
        sh = sh.withColumn(f"band{i}", F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(0xFFFF))
    return sh
