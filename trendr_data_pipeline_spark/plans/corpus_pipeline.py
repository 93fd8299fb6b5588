"""The composed end-to-end training-corpus pipeline — every
north-star stage chained the way a real pre-training data build runs
them (the individual stages are each hash-gated; this module is the
user-facing composition, invariant-tested in
tests/test_corpus_pipeline.py):

1. corpus clean (t05 ladder: exact-dup flag, benchmark
   decontamination, language ID, Gopher repetition, quality) — keep
   only 'keep' decisions;
2. PII redaction over the survivors' text (scan-local regexp);
3. near-dup cluster canonicalization: exact Jaccard pairs →
   connected components → component-minimum survives (removes the
   TRANSITIVE near-dups the per-doc ladder cannot see);
   3b. optional CCNet-style perplexity tail-drop (x08 scoring);
   3c. optional trained-classifier floor (x16, the fastText-model
   practice);
   3d. optional α=1/2 temperature source mixing (x10) — the mixture
   decides the source composition the budget greedy selects from;
4. greedy quality-budget selection (best documents first until the
   token budget is exhausted);
5. sequence packing (global token offsets + fixed-length chunk
   spans via the two-phase prefix sum).

Shuffle inventory at 100 TB: the t05 fingerprint window + gram
semi-join, the pair join + O(log² n) component rounds (both bounded
by near-dup density), and one keyed window per prefix-sum bucket —
redaction, quality, and selection predicates all ride existing
scans.

Fixture caveat (measured): 71 s end-to-end at sf0.1, ~90% of it the
exact pair join + component rounds over the ~1.5 M qualifying pairs
the 24%-density fixture produces among survivors (SCALING.md's
standing density artifact). At real corpus density (<1% pairs) stage
3 is the cheap stage; swap `jaccard_similarity_pairs` for
`minhash_lsh_pairs` when the corpus outgrows the exact path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pii import redact_pii
from ..io import read_table
from ..operators.dedup import jaccard_similarity_pairs
from ..operators.graph import canonicalize_components, connected_components
from ..operators.packing import chunk_spans, global_running_offsets
from .text_ops import budget_scored, t05_corpus_clean


def corpus_survivors(
    spark: SparkSession,
    sf_dir: str,
    near_dup_threshold: float = 0.8,
    ppl_cap: float | None = None,
    quality_prob_floor: float | None = None,
) -> DataFrame:
    """Stages 1-3c of the pipeline: per-doc clean ladder, PII
    redaction, transitive near-dup canonicalization, and the optional
    perplexity / trained-classifier filters. Returns the survivor
    frame (documents schema + ``component``) the mixing and budget
    stages select from — exposed so tests and callers can audit the
    pre-mix population (e.g. recompute the temperature rates the mix
    stage filtered with)."""
    docs = read_table(spark, sf_dir, "documents")

    # 1. per-doc ladder (dup/contamination/language/repetition/quality)
    kept_ids = (
        t05_corpus_clean(spark, sf_dir)
        .filter(F.col("decision") == "keep")
        .select("doc_id")
    )
    kept = docs.join(kept_ids, "doc_id")

    # 2. PII redaction (fixture contains none; the stage still runs)
    kept = kept.withColumn("text", redact_pii(F.col("text")))

    # 3. transitive near-dup canonicalization
    pairs = jaccard_similarity_pairs(kept, threshold=near_dup_threshold)
    labels = connected_components(pairs, nodes=kept, node_col="doc_id")
    canonical = canonicalize_components(labels).filter("is_canonical")
    survivors = kept.join(
        canonical.select(F.col("node").alias("doc_id"), "component"), "doc_id"
    )

    # 3b. optional perplexity tail-drop (CCNet practice; x08 scoring)
    if ppl_cap is not None:
        from .text_ops import x08_unigram_perplexity

        ok = (
            x08_unigram_perplexity(spark, sf_dir)
            .filter(F.col("ppl") <= ppl_cap)
            .select("doc_id")
        )
        survivors = survivors.join(ok, "doc_id")

    # 3c. optional trained-classifier floor (x16 practice): scores
    # come from the model fit on the FULL corpus (same no-drift
    # posture as the perplexity stage). The model only scores LABELED
    # docs (token-less docs have NULL quality and no label), so the
    # stage removes explicit BELOW-FLOOR docs via anti-join instead of
    # inner-joining on the scored set — an unscored doc is "unscored",
    # not "low-quality", and must pass through (today the t05 ladder
    # has already dropped token-less docs, but this stage must not
    # silently start dropping them if earlier stages change).
    if quality_prob_floor is not None:
        from ..operators.quality_model import train_and_score_quality

        below = (
            train_and_score_quality(docs)
            .filter(F.col("prob") < quality_prob_floor)
            .select("doc_id")
        )
        survivors = survivors.join(below, "doc_id", "left_anti")

    return survivors


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int = 512,
    token_budget: int = 15000,
    near_dup_threshold: float = 0.8,
    ppl_cap: float | None = None,
    quality_prob_floor: float | None = None,
    mix_target_frac: float | None = None,
) -> DataFrame:
    """Run the full pipeline; returns one row per SELECTED document:
    (doc_id, source, text, n_tok, quality, component, tok_offset,
    first_seq, last_seq, n_seqs), ordered by its position in the
    packed token stream. ``text`` is PII-redacted.

    ``ppl_cap`` optionally inserts the CCNet-style perplexity filter
    between canonicalization and selection: documents whose
    unigram-LM perplexity (x08's scoring, computed against the
    ORIGINAL corpus distribution so the model does not drift with the
    filtering) exceeds the cap are dropped before the budget greedy
    runs.

    ``quality_prob_floor`` optionally inserts the trained-classifier
    filter (x16, the fastText-model practice): documents the model
    scores below the floor are dropped. ``mix_target_frac``
    optionally applies α=1/2 temperature source mixing (x10) after
    all quality filtering — the mixture decides the SOURCE
    composition of what the budget greedy then selects from."""
    survivors = corpus_survivors(
        spark,
        sf_dir,
        near_dup_threshold=near_dup_threshold,
        ppl_cap=ppl_cap,
        quality_prob_floor=quality_prob_floor,
    )

    # 3d. optional temperature source mixing (x10): rebalance the
    # source composition before the budget greedy; rates computed on
    # the current survivor counts so the target fraction refers to
    # what is actually left
    if mix_target_frac is not None:
        from ..operators.sampling import apply_temperature_mix

        survivors = apply_temperature_mix(
            survivors, target_frac=mix_target_frac, salt="corpus-mix"
        )

    # 4. greedy quality-budget selection (x06 semantics, shared
    # scoring helper; composite (quality DESC, doc_id) total order
    # needs the doc_id tie-break, so use the offsets primitive
    # directly rather than pack_sequences' single-order-column
    # convenience wrapper)
    scored = budget_scored(survivors, ["doc_id", "source", "text", "component"])
    offsets = global_running_offsets(
        scored, "n_tok", "_qbucket", ["_sortkey", "doc_id"], out_col="tok_offset"
    )
    selected = offsets.filter(F.col("tok_offset") + F.col("n_tok") <= token_budget)

    # 5. chunk spans over the selected prefix (shared span semantics)
    return (
        chunk_spans(selected, seq_len)
        .select(
            "doc_id",
            "source",
            "text",
            "n_tok",
            "quality",
            "component",
            "tok_offset",
            "first_seq",
            "last_seq",
            "n_seqs",
        )
        .orderBy("tok_offset", "doc_id")
    )


def write_training_shards(
    corpus: DataFrame, out_dir: str, seqs_per_shard: int = 64
) -> None:
    """Land the packed corpus as a partitioned dataset a trainer can
    range-read: each document is written to EVERY shard its sequence
    span [first_seq, last_seq] overlaps (shard id = seq // seqs_per_
    shard), so reading shards ⌊a/sps⌋..⌈b/sps⌉−1 yields every doc
    contributing tokens to sequence range [a, b) — including docs
    that straddle a shard boundary, which keying on first_seq alone
    would silently exclude from the right-hand shard. The duplication
    factor is 1 + span/seqs_per_shard ≈ 1 for any sane shard size
    (the interval-join bucketing trade, operators/temporal.py).
    Zero-token docs (NULL span) land once, in shard 0 (they carry no
    tokens). Round-trip + range-completeness invariants:
    tests/test_corpus_pipeline.py."""
    from ..io import write_partitioned

    first = F.coalesce(F.col("first_seq"), F.lit(0))
    last = F.coalesce(F.col("last_seq"), first)
    sharded = corpus.withColumn(
        "shard",
        F.explode(
            F.sequence(
                F.floor(first / seqs_per_shard).cast("long"),
                F.floor(last / seqs_per_shard).cast("long"),
            )
        ),
    )
    write_partitioned(sharded, out_dir, ["shard"])
