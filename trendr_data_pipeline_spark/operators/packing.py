"""Sequence packing: lay a corpus out as one contiguous token stream
and chunk it into fixed-length training sequences (the GPT-style
concat-and-chunk step every LLM data pipeline ends with; documents
may straddle chunk boundaries).

The defining primitive is a GLOBAL running token offset under a
total document order. The naive Spark form —
``sum(w) over (order by k)`` with no partition — collapses the whole
corpus into ONE window partition and is the canonical 100 TB
scale-killer. This module implements the two-phase form instead:

1. cumulative sum WITHIN each bucket of the order's leading column
   (one shuffle, parallel across buckets);
2. bucket totals (tiny — one row per bucket) get their own running
   total on a single partition, which is fine BECAUSE it is tiny;
3. broadcast-join the bucket base offsets back and add.

The result is bit-identical to the global window (the x04 gate
hash-checks it against a DuckDB global-window oracle) while keeping
every big shuffle keyed and parallel. Requirement: the bucket column
must be the leading column of the total order — (bucket, order_col)
IS the global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "global_running_offsets",
    "chunk_spans",
    "pack_sequences",
    "chunk_documents",
]


def global_running_offsets(
    df: DataFrame,
    weight_col: str,
    bucket_col: str,
    order_col: str | list[str],
    out_col: str = "offset",
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` under the total order
    (bucket_col, *order_cols), without a global window.

    ``(bucket_col, *order_cols)`` must be unique per row (it defines
    where each row starts in the stream). Two valid contracts for the
    bucket column:

    - the intended total order IS (bucket_col, *order_cols) — any
      bucket works (x04's (source, doc_id) layout); or
    - the intended order is (*order_cols) alone — then bucket_col
      must be a MONOTONE function of order_cols[0] (e.g. its floor,
      x06's quality buckets) so bucket boundaries cannot interleave
      the order.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    within = Window.partitionBy(bucket_col).orderBy(
        *[F.col(c).asc_nulls_last() for c in order_cols]
    )
    with_cum = df.withColumn(
        "_cum_incl", F.sum(F.col(weight_col).cast("long")).over(within)
    )

    # one row per bucket — a single-partition running total over THIS
    # frame is deliberate and safe (|buckets| rows, not |corpus|).
    # NULL buckets are a real group: the running total orders them
    # LAST (matching SQL's default ORDER BY semantics) and the
    # add-back join is null-safe so their rows are not dropped.
    totals = df.groupBy(bucket_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("_bucket_total")
    )
    base_w = Window.orderBy(F.col(bucket_col).asc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = totals.withColumn(
        "_base", F.coalesce(F.sum("_bucket_total").over(base_w), F.lit(0))
    ).select(F.col(bucket_col).alias("_bucket_key"), "_base")

    return (
        with_cum.join(
            F.broadcast(bases),
            F.col(bucket_col).eqNullSafe(F.col("_bucket_key")),
        )
        .withColumn(
            out_col, F.col("_base") + F.col("_cum_incl") - F.col(weight_col).cast("long")
        )
        .drop("_cum_incl", "_base", "_bucket_key")
    )


def chunk_spans(df: DataFrame, seq_len: int, weight_col: str = "n_tok") -> DataFrame:
    """Chunk-span columns from an existing ``tok_offset``:
    ``first_seq`` / ``last_seq`` (chunk ids the document touches,
    straddling allowed) and ``n_seqs``. Zero-weight documents occupy
    no tokens: NULL seq ids, ``n_seqs = 0``. Single home of the span
    semantics — used by :func:`pack_sequences` and the composed
    corpus pipeline (which filters on a budget between offsets and
    spans)."""
    w = F.col(weight_col).cast("long")
    nonzero = w > 0
    first = F.floor(F.col("tok_offset") / seq_len).cast("long")
    last = F.floor((F.col("tok_offset") + w - 1) / seq_len).cast("long")
    return (
        df.withColumn("first_seq", F.when(nonzero, first))
        .withColumn("last_seq", F.when(nonzero, last))
        .withColumn(
            "n_seqs",
            F.when(nonzero, F.col("last_seq") - F.col("first_seq") + 1).otherwise(
                F.lit(0)
            ).cast("long"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    weight_col: str = "n_tok",
    bucket_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document its span of fixed-length training
    sequences: ``tok_offset`` (global stream position) plus the
    :func:`chunk_spans` columns.
    """
    out = global_running_offsets(
        df, weight_col, bucket_col, order_col, out_col="tok_offset"
    )
    return chunk_spans(out, seq_len, weight_col)


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-DOCUMENT sliding-window chunking with overlap — the
    RAG/long-context sibling of :func:`pack_sequences` (which chunks
    the CONCATENATED stream; this op never crosses a document
    boundary — the HuggingFace ``return_overflowing_tokens`` shape).

    Window starts are ``1, 1+stride, …`` up to
    ``max(n_tok − overlap, 1)`` where ``overlap = chunk_size −
    stride``. That start rule gives (provable, and pinned in
    tests): (a) every token is covered by ≥ 1 chunk, (b) no chunk is
    fully contained in its predecessor (no degenerate tail chunks),
    (c) a document with ≤ chunk_size tokens yields exactly one
    chunk. Token-less documents yield no rows (doc grain = tokenful
    docs, the x08 convention).

    Scale shape: a single JVM projection — tokenize, ``sequence()``
    for the starts, ``explode``, ``slice`` — NO shuffle and no
    Python; output rows ≈ input tokens / stride. At 100 TB this is
    embarrassingly parallel and whole-stage-codegen'd end to end.
    """
    if not (0 < stride <= chunk_size):
        raise ValueError(f"need 0 < stride <= chunk_size, got {stride}/{chunk_size}")
    from ..functions.text import tokens

    overlap = chunk_size - stride
    # bind the token array BEFORE the generator: referencing the
    # tokenize tree in the sequence bound would re-tokenize each row
    # a second time inside the Generate node (the winnowing
    # lambda-binding lesson, same cure)
    bound = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("ws")
    ).where(F.size("ws") >= 1)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("ws") - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    t = bound.select(id_col, "ws", F.explode(starts).alias("start_pos"))
    chunk = F.slice(F.col("ws"), F.col("start_pos"), chunk_size)
    return t.select(
        id_col,
        (((F.col("start_pos") - 1) / stride).cast("long")).alias("chunk_id"),
        F.col("start_pos").cast("long").alias("start_pos"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
