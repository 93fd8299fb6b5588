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
3 is the cheap stage — r6 makes this measured fact, not a docstring
claim: ``pair_backend='lsh'`` swaps in `minhash_lsh_pairs` (a real
parameter on `corpus_survivors`/`build_training_corpus`, output
pinned identical to the exact backend), and
`tools/corpus_density_bench.py` runs the full pipeline on a
synthetic low-density corpus, stage wall-times recorded in
SCALING.md ("corpus pipeline at realistic density").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pii import redact_pii
from ..io import read_table
from ..operators.dedup import jaccard_similarity_pairs, minhash_lsh_pairs
from ..operators.graph import canonicalize_components, connected_components
from ..operators.packing import chunk_spans, global_running_offsets
from .text_ops import budget_scored, clean_ladder

#: stage-3 candidate generators (r6: the backend is a parameter, not a
#: docstring suggestion). Both are exact-verified, so at thresholds
#: where banding recall ≈ 1 (0.8 with 32×4 bands: 1−5e-8 per pair)
#: their OUTPUT is identical — pinned by the cross-backend test — and
#: only the candidate-generation cost differs: "exact" prefix-joins on
#: globally-rare tokens (right when density is pathological or the
#: corpus is small), "lsh" equi-joins on minhash bands (the 100 TB
#: default: candidate volume tracks true-pair volume, not token df).
_PAIR_BACKENDS = {
    "exact": jaccard_similarity_pairs,
    "lsh": minhash_lsh_pairs,
}


def corpus_survivors(
    spark: SparkSession,
    sf_dir: str,
    near_dup_threshold: float = 0.8,
    ppl_cap: float | None = None,
    quality_prob_floor: float | None = None,
    doc_filter=None,
    pair_backend: str = "exact",
) -> DataFrame:
    """Stages 1-3c of the pipeline: per-doc clean ladder, PII
    redaction, transitive near-dup canonicalization, and the optional
    perplexity / trained-classifier filters. Returns the survivor
    frame (documents schema + ``component``) the mixing and budget
    stages select from — exposed so tests and callers can audit the
    pre-mix population (e.g. recompute the temperature rates the mix
    stage filtered with).

    ``doc_filter`` (optional Column predicate) restricts the corpus
    BEFORE every stage — the c23 gate uses it to run the composition
    on the standard 1-in-10 slice (the d02/x03 convention), keeping
    the brute-force oracle tractable. Ladder decisions (dup flags,
    contamination, quality) are computed on the sliced population,
    consistently on both engines. Exception by design: ``ppl_cap``
    scores against the FULL-corpus unigram LM even under a slice
    (the LM is a model of the language, not of the sample — the same
    no-drift posture the unsliced pipeline uses), while the
    classifier floor trains on whatever population ``docs`` holds."""
    docs = read_table(spark, sf_dir, "documents")
    if doc_filter is not None:
        docs = docs.filter(doc_filter)

    # 1. per-doc ladder (dup/contamination/language/repetition/
    # quality). The ladder's dup/contamination flags are relative to
    # the population it sees, so it runs on the (possibly sliced)
    # frame — the slice-only oracle computes the same flags.
    kept_ids = (
        clean_ladder(docs).filter(F.col("decision") == "keep").select("doc_id")
    )
    kept = docs.join(kept_ids, "doc_id")

    # 2. PII redaction (fixture contains none; the stage still runs)
    kept = kept.withColumn("text", redact_pii(F.col("text")))

    # 3. transitive near-dup canonicalization (backend: see
    # _PAIR_BACKENDS — both exact-verified, so the survivor set is
    # backend-independent at banding-recall≈1 thresholds)
    if pair_backend not in _PAIR_BACKENDS:
        raise ValueError(
            f"unknown pair_backend {pair_backend!r}; one of {sorted(_PAIR_BACKENDS)}"
        )
    pairs = _PAIR_BACKENDS[pair_backend](kept, threshold=near_dup_threshold)
    labels = connected_components(pairs, nodes=kept, node_col="doc_id")
    canonical = canonicalize_components(labels).filter("is_canonical")
    survivors = kept.join(
        canonical.select(F.col("node").alias("doc_id"), "component"), "doc_id"
    )

    # 3b. optional perplexity tail-drop (CCNet practice; x08 scoring).
    # Anti-join on the explicit ABOVE-cap set, not inner-join on the
    # scored set: c08's grain is tokenful docs only, and an unscored
    # doc is "unscored", not "high-perplexity" — the same contract as
    # stage 3c below (r5 review: the two stages must fail the same
    # way if an earlier stage ever lets token-less docs through).
    if ppl_cap is not None:
        from .text_ops import x08_unigram_perplexity

        above = (
            x08_unigram_perplexity(spark, sf_dir)
            .filter(F.col("ppl") > ppl_cap)
            .select("doc_id")
        )
        survivors = survivors.join(above, "doc_id", "left_anti")

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
    doc_filter=None,
    span_dedup: bool = False,
    pair_backend: str = "exact",
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
    composition of what the budget greedy then selects from.

    ``span_dedup=True`` inserts the c25 ExactSubstr rewrite (stage
    3e): repeated 8-gram spans are deleted from every survivor except
    each gram's min-id owner. CONTRACT CHANGE when enabled: the
    output ``text`` of EVERY survivor is the rewrite's normalized
    token stream — lowercased, single-spaced — not the original
    casing/whitespace (the rewrite is defined on the same normalized
    tokens every text operator here uses); and because the later mix
    / budget stages can drop a gram's owner doc too, the final
    selection keeps each repeated span AT MOST once, not exactly
    once."""
    survivors = corpus_survivors(
        spark,
        sf_dir,
        near_dup_threshold=near_dup_threshold,
        ppl_cap=ppl_cap,
        quality_prob_floor=quality_prob_floor,
        doc_filter=doc_filter,
        pair_backend=pair_backend,
    )
    # the survivor frame is consumed 2-4× downstream (the mix stage's
    # count + join legs, the prefix sum's per-bucket cumsum + bucket
    # totals) — materialize it ONCE so the ladder/pair/CC lineage
    # doesn't re-execute per consumer (checkpoint storage is
    # ContextCleaner-managed, reclaimed with the returned frame)
    from ..plan_debug import note_subtree

    survivors = note_subtree("c23.survivors", survivors).localCheckpoint(eager=True)

    # 3e. optional span-level dedup (c25, the ExactSubstr rewrite):
    # doc-level canonicalization keeps distinct documents that still
    # SHARE long spans (boilerplate, licenses); this rewrites the
    # survivors so each repeated 8-gram's content exists AT MOST once
    # among the docs entering selection (min-id owner keeps it; the
    # mix/budget stages below may drop the owner as well). Token
    # counts downstream see the CLEANED text — the budget buys
    # deduplicated tokens. See the docstring for the text
    # normalization contract this stage implies.
    if span_dedup:
        from ..operators.dedup import remove_duplicated_spans

        cleaned = remove_duplicated_spans(survivors).select(
            "doc_id", F.col("cleaned_text").alias("text")
        )
        survivors = survivors.drop("text").join(cleaned, "doc_id")

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


# ---------------------------------------------------------------------------
# c23 — the composed pipeline as a driver-gated query (r4 verdict item
# 8): clean ladder → near-dup canonicalization → quality-budget greedy
# → chunk spans, end to end, on the standard 1-in-10 slice (the
# d02/x03 convention — keeps the brute-force oracle tractable and the
# bench cost bounded; every stage is separately gated at full grain by
# t05 / d02 / x03 / x06 / x04). The oracle composes the SAME fragments
# those gates use: the registered t05 ladder SQL (single source of
# truth, sliced by string substitution on its one table scan), the
# brute-force Jaccard pair join, the recursive-CTE closure, the
# global-window budget order and the span arithmetic. ``text`` is
# projected out (PII redaction is identity on the fixture and gated by
# its own pytest oracle vs Python `re`; replaying it in SQL would gate
# the regex engine, not the pipeline).
# ---------------------------------------------------------------------------

from .dedup_ops import _SQL_TOKSET  # noqa: E402
from .registry import _REGISTRY  # noqa: E402
from .text_ops import _SQL_QUALITY, _SQL_STOP, _SQL_TOKS  # noqa: E402

#: mix target + budget for the gated setting, chosen so BOTH stages
#: bite at every fixture SF: α=1/2 mixing at 0.8 drops survivors
#: (13 → 9 docs at sf0.01, 91 → 70 at sf0.1) and the 250-token budget
#: then cuts the mixed stream (~80% of sf0.01's mixed tokens, ~13% at
#: sf0.1) — a vacuous stage would make the gate one stage weaker than
#: it claims
_C23_MIX_FRAC = 0.8
_C23_BUDGET = 250

_SQL_T05_SLICED = _REGISTRY["t05_corpus_clean"].oracle.replace(
    "FROM documents", "FROM documents WHERE doc_id % 10 = 0"
)

_SQL_PIPELINE = f"""
    WITH RECURSIVE kept AS (
        SELECT d.doc_id, d.source, d.text
        FROM documents d
        JOIN ({_SQL_T05_SLICED}) lad ON d.doc_id = lad.doc_id
        WHERE lad.decision = 'keep'
    ), ts AS (
        SELECT doc_id, {_SQL_TOKSET} AS tokset FROM kept
    ), pairs AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM ts a JOIN ts b ON a.doc_id < b.doc_id
        WHERE ROUND(len(list_intersect(a.tokset, b.tokset)) * 1.0
                    / len(list_distinct(list_concat(a.tokset, b.tokset))), 6) >= 0.8
    ), sym AS (
        SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ), reach(u, v) AS (
        SELECT u, v FROM sym
        UNION
        SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
        WHERE s.v <> r.u
    ), comp AS (
        SELECT u AS node, LEAST(u, MIN(v)) AS component
        FROM reach GROUP BY u
    ), surv AS (
        SELECT k.doc_id, k.source, k.text,
               COALESCE(c.component, k.doc_id) AS component
        FROM kept k LEFT JOIN comp c ON k.doc_id = c.node
        WHERE COALESCE(c.component, k.doc_id) = k.doc_id
    ), mcounts AS (
        SELECT source, COUNT(*) AS n_docs FROM surv GROUP BY source
    ), mc2 AS (
        SELECT source, n_docs,
               CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(28,6)) AS w_dec
        FROM mcounts
    ), mtot AS (
        SELECT SUM(w_dec) AS denom_dec, SUM(n_docs) AS total_docs FROM mc2
    ), mrates AS (
        SELECT source,
               least(1.0e0,
                     (CAST(w_dec AS DOUBLE) / CAST(denom_dec AS DOUBLE))
                     * (CAST(total_docs AS DOUBLE) * {_C23_MIX_FRAC}e0)
                     / CAST(n_docs AS DOUBLE)) AS rate
        FROM mc2 CROSS JOIN mtot
    ), mixed AS (
        SELECT s.doc_id, s.source, s.text, s.component
        FROM surv s JOIN mrates r USING (source)
        WHERE (('0x' || substr(md5('corpus-mix' || CAST(s.doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0e0) < r.rate
    ), feats AS (
        SELECT doc_id, source, component,
               CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tok,
               list_aggregate(list_transform({_SQL_TOKS}, x -> len(x)), 'sum')
                 AS tok_chars,
               len(list_filter({_SQL_TOKS},
                   x -> list_contains({_SQL_STOP}, x))) AS stop_hits
        FROM mixed
    ), s AS (
        SELECT doc_id, source, component, n_tok,
               CASE WHEN n_tok > 0 THEN ROUND({_SQL_QUALITY}, 6) END AS quality
        FROM feats
    ), o AS (
        SELECT doc_id, source, component, n_tok, quality,
               CAST(COALESCE(SUM(n_tok) OVER (
                   ORDER BY -quality ASC NULLS LAST, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS tok_offset
        FROM s
    )
    SELECT doc_id, source, n_tok, quality, component, tok_offset,
           tok_offset // 512 AS first_seq,
           (tok_offset + n_tok - 1) // 512 AS last_seq,
           (tok_offset + n_tok - 1) // 512 - tok_offset // 512 + 1 AS n_seqs
    FROM o
    WHERE tok_offset + n_tok <= {_C23_BUDGET}
"""

from .registry import register  # noqa: E402


@register(
    "c23_corpus_pipeline",
    _SQL_PIPELINE,
    doc="""END-TO-END training-corpus pipeline gate (new r5): t05
    clean ladder → exact-Jaccard near-dup pairs → connected-component
    canonicalization → α=1/2 temperature source mixing (c10's rate
    chain over the SURVIVOR counts, md5 keep decision, target 0.8) →
    greedy quality-budget selection → 512-token chunk spans, on the
    1-in-10 corpus slice with a 250-token budget (both stages bite at
    every fixture SF). Hash-checks the
    COMPOSITION of the t05/d02/x03/x10/x06/x04 machinery (each
    separately gated at full grain), not just its stages: the oracle
    re-derives every survivor decision, mix keep, stream offset and
    span from the same SQL fragments those gates use.""",
)
def c23_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_training_corpus(
        spark,
        sf_dir,
        seq_len=512,
        token_budget=_C23_BUDGET,
        mix_target_frac=_C23_MIX_FRAC,
        doc_filter=F.col("doc_id") % 10 == 0,
    ).drop("text")
