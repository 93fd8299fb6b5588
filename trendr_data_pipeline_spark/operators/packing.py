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


# ---------------------------------------------------------------------------
# ⊕T25 — SPFHP bin packing (r10): histogram-based sequence packing
# ---------------------------------------------------------------------------


def _spfhp_plan(hist: dict[int, int], max_len: int):
    """Pure-Python SPFHP (shortest-pack-first histogram-packing,
    Krell et al. 2021 "Efficient Sequence Packing" — public) over the
    LENGTH HISTOGRAM, batched but per-doc-FAITHFUL: each document of
    length l (processed longest length first, docs in within-length
    rank order) is placed into the open pack with the SMALLEST
    remaining space ≥ l, opening a new pack when none fits. The
    batching invariants that keep count-level events equal to the
    per-doc simulation:

    - packs created by one event move through remaining-space classes
      TOGETHER (same composition), so a class holds FIFO runs of
      interchangeable packs and one event can consume min(h, run)
      packs at once;
    - when a placement leaves remaining ≥ l, that pack becomes the
      new strictly-smallest fitting pack, so the NEXT doc of the same
      length lands in the SAME pack — absorbed as one stride-0 event
      of min(h, ⌊r/l⌋) docs.

    Returns (events, n_packs): each event is
    ``(length, rank_start, take, pack_start, stride, pos_start)`` —
    docs of ``length`` with within-length rank in
    [rank_start, rank_start+take) map to pack
    ``pack_start + stride·(rank − rank_start)`` at in-pack position
    ``pos_start + (1 − stride)·(rank − rank_start)``. Driver-side
    cost is O(max_len · events) on the ≤ max_len-bin histogram —
    never touches corpus-cardinality data.
    """
    from collections import deque

    classes: dict[int, deque] = {}  # remaining -> FIFO of [pack_start, count, n_docs]
    events = []
    next_pack = 0

    def push(rem, start, count, n_docs):
        if rem >= 1 and count > 0:
            classes.setdefault(rem, deque()).append([start, count, n_docs])

    for length in sorted((l for l, c in hist.items() if c > 0), reverse=True):
        if length > max_len:
            raise ValueError(f"doc length {length} exceeds max_len {max_len} — chunk first")
        h = hist[length]
        cursor = 0
        while h > 0:
            fits = sorted(r for r, q in classes.items() if r >= length and q)
            if fits:
                r = fits[0]
                run = classes[r].popleft()
                start, count, n_docs = run
                if r - length >= length:
                    # one pack absorbs consecutive docs of this length
                    m = min(h, r // length)
                    events.append((length, cursor, m, start, 0, n_docs))
                    if count > 1:
                        classes[r].appendleft([start + 1, count - 1, n_docs])
                    push(r - m * length, start, 1, n_docs + m)
                else:
                    take = min(h, count)
                    events.append((length, cursor, take, start, 1, n_docs))
                    if count > take:
                        classes[r].appendleft([start + take, count - take, n_docs])
                    push(r - length, start, take, n_docs + 1)
                    m = take
            else:
                if max_len - length >= length:
                    m = min(h, max_len // length)
                    events.append((length, cursor, m, next_pack, 0, 0))
                    push(max_len - m * length, next_pack, 1, m)
                    next_pack += 1
                else:
                    m = h
                    events.append((length, cursor, m, next_pack, 1, 0))
                    push(max_len - length, next_pack, m, 1)
                    next_pack += m
            cursor += m
            h -= m
    return events, next_pack


def spfhp_pack_assignments(
    df: DataFrame,
    max_len: int,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    k_sub: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """⊕T25 (r10) — SPFHP document→pack assignment: the packing-
    EFFICIENCY upgrade over the concat-and-chunk layout (x04, which
    splits documents across sequence boundaries) and greedy budget
    fills — whole documents are binned into fixed-capacity packs with
    near-optimal occupancy, so padding (dead compute at training
    time: a 10 % padding rate on 100 TB is 10 TB of wasted work)
    approaches the histogram-optimal rate.

    Division of labor at 100 TB: the STRATEGY runs on the driver over
    the ≤ max_len-bin length histogram (a bounded collect — the A7
    bucket-totals contract), the ASSIGNMENT is a broadcast join of
    the tiny event table against per-doc within-length ranks. Ranks
    come from the two-phase device (sub-bucketed md5-hash order:
    window bounded to one (length, hash-sub-bucket), per-length
    running offsets over ≤ k_sub rows) — no corpus-fraction window.
    Deterministic: the rank order is a pure function of (salt, id),
    so reruns and retries agree row-for-row.

    Returns (id, n_tok, pack_id, pack_pos): pack ids dense in
    [0, n_packs); every pack's Σ n_tok ≤ max_len by construction
    (pytest-pinned against a per-doc reference simulation). Docs
    longer than max_len raise — chunk first (⊕T19).
    """
    from .sampling import hash_fraction

    hist = {
        int(r["l"]): int(r["c"])
        for r in df.groupBy(F.col(len_col).alias("l"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    events, n_packs = _spfhp_plan(hist, max_len)
    spark = df.sparkSession
    ev = spark.createDataFrame(
        events,
        "length long, rank_start long, take long, pack_start long, stride long, pos_start long",
    )

    h = hash_fraction(F.col(id_col), salt=salt)
    base = df.select(F.col(id_col), F.col(len_col).cast("long").alias("_len")).withColumn(
        "_h", h
    )
    sub = F.floor(F.col("_h") * k_sub).cast("long")
    w_in = Window.partitionBy("_len", "_sub").orderBy("_h", id_col)
    ranked = base.withColumn("_sub", sub).withColumn(
        "_rwithin", F.row_number().over(w_in) - 1
    )
    subtot = ranked.groupBy("_len", "_sub").agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        Window.partitionBy("_len").orderBy("_sub").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = subtot.withColumn("_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0))).select(
        "_len", "_sub", "_off"
    )
    ranked = ranked.join(offs, ["_len", "_sub"]).withColumn(
        "_rank", F.col("_rwithin") + F.col("_off")
    )
    j = ranked.join(
        F.broadcast(ev),
        (F.col("_len") == F.col("length"))
        & (F.col("_rank") >= F.col("rank_start"))
        & (F.col("_rank") < F.col("rank_start") + F.col("take")),
    )
    d = F.col("_rank") - F.col("rank_start")
    return j.select(
        F.col(id_col),
        F.col("_len").alias(len_col),
        (F.col("pack_start") + F.col("stride") * d).alias("pack_id"),
        (F.col("pos_start") + (1 - F.col("stride")) * d).alias("pack_pos"),
    )
