"""End-to-end invariants of the composed training-corpus pipeline
(clean → redact → canonicalize → budget-select → pack) at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from trendr_data_pipeline_spark.plans.corpus_pipeline import build_training_corpus

BUDGET = 8000
SEQ = 128


def _run(spark):
    if not hasattr(_run, "rows"):
        _run.rows = build_training_corpus(
            spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET
        ).collect()
    return _run.rows


def test_pair_backend_lsh_equals_exact(spark):
    """r6: the stage-3 candidate generator is a parameter. Both
    backends are exact-verified, so at threshold 0.8 (banding recall
    1−5e-8 per pair with 32×4 bands) the ENTIRE pipeline output must
    be identical — same survivors, same offsets, same spans."""
    import pytest

    exact = _run(spark)
    lsh = build_training_corpus(
        spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET, pair_backend="lsh"
    ).collect()
    assert sorted(map(tuple, lsh)) == sorted(map(tuple, exact))
    with pytest.raises(ValueError, match="pair_backend"):
        build_training_corpus(
            spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET,
            pair_backend="bogus",
        ).collect()


def test_budget_respected(spark):
    rows = _run(spark)
    assert rows, "pipeline selected nothing"
    total = sum(r["n_tok"] for r in rows)
    assert total <= BUDGET
    for r in rows:
        assert r["tok_offset"] + r["n_tok"] <= BUDGET


def test_offsets_contiguous_and_spans_consistent(spark):
    rows = _run(spark)
    # selected docs form one contiguous token stream from 0
    pos = 0
    for r in sorted(rows, key=lambda r: r["tok_offset"]):
        assert r["tok_offset"] == pos
        assert r["first_seq"] == r["tok_offset"] // SEQ
        assert r["last_seq"] == (r["tok_offset"] + r["n_tok"] - 1) // SEQ
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
        pos += r["n_tok"]


def test_quality_greedy_order(spark):
    rows = _run(spark)
    # stream order is quality-descending (doc_id tie-break)
    ordered = sorted(rows, key=lambda r: r["tok_offset"])
    for a, b in zip(ordered, ordered[1:]):
        assert (-a["quality"], a["doc_id"]) < (-b["quality"], b["doc_id"])


def test_no_exact_or_near_dups_survive(spark):
    from trendr_data_pipeline_spark.operators.dedup import (
        bow_fingerprint,
        jaccard_similarity_pairs,
    )

    rows = _run(spark)
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    fps = df.select(bow_fingerprint(F.col("text")).alias("fp")).collect()
    assert len({r["fp"] for r in fps}) == len(fps), "exact dup survived"
    assert jaccard_similarity_pairs(df, threshold=0.8).count() == 0, (
        "near-dup pair survived canonicalization"
    )


def test_one_canonical_per_component(spark):
    rows = _run(spark)
    comps = [r["component"] for r in rows]
    assert len(set(comps)) == len(comps)


def test_ppl_cap_filters_tail(spark):
    from trendr_data_pipeline_spark.plans.text_ops import x08_unigram_perplexity

    # a cap at the corpus median must drop roughly the high-ppl half
    ppl = {r["doc_id"]: r["ppl"] for r in x08_unigram_perplexity(spark, SMOKE_SF).collect()}
    cap = sorted(ppl.values())[len(ppl) // 2]
    rows = build_training_corpus(
        spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET, ppl_cap=cap
    ).collect()
    assert rows
    for r in rows:
        assert ppl[r["doc_id"]] <= cap
    # the cap must actually BITE: the uncapped selection contains
    # above-cap docs (else this test has no power) and none survive
    uncapped_above = {r["doc_id"] for r in _run(spark) if ppl[r["doc_id"]] > cap}
    assert uncapped_above, "fixture gave the cap nothing to drop"
    assert uncapped_above.isdisjoint({r["doc_id"] for r in rows})


def test_write_training_shards_range_reads(spark, tmp_path):
    from trendr_data_pipeline_spark.plans.corpus_pipeline import write_training_shards

    SPS = 4
    corpus = build_training_corpus(spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET)
    out = str(tmp_path / "shards")
    write_training_shards(corpus, out, seqs_per_shard=SPS)
    back = spark.read.parquet(out)

    rows = _run(spark)
    # every doc appears once per overlapped shard — no more, no less
    expected_rows = sum(
        (r["last_seq"] // SPS) - (r["first_seq"] // SPS) + 1 for r in rows
    )
    assert back.count() == expected_rows
    assert back.select("doc_id").distinct().count() == len(rows)

    # range-read completeness: reading the shards covering sequence
    # range [a, b) must yield EVERY doc contributing tokens to it —
    # including docs straddling a shard boundary
    max_seq = max(r["last_seq"] for r in rows)
    assert max_seq >= 2 * SPS, "fixture too small to exercise boundaries"
    for a, b in [(0, SPS), (SPS, 2 * SPS), (SPS - 1, SPS + 1), (0, max_seq + 1)]:
        want = {r["doc_id"] for r in rows if r["first_seq"] < b and r["last_seq"] >= a}
        got = {
            r["doc_id"]
            for r in back.filter(
                (F.col("shard") >= a // SPS) & (F.col("shard") <= (b - 1) // SPS)
            )
            .filter((F.col("first_seq") < b) & (F.col("last_seq") >= a))
            .select("doc_id")
            .collect()
        }
        assert got == want, (a, b)


def test_classifier_floor_and_mix_stages(spark):
    """The two r5 optional stages compose correctly: with a
    quality_prob_floor every selected doc scores at or above the
    floor under the same full-corpus model; with mix_target_frac the
    selection is a subset of the deterministic mix-keep set and the
    stage is reproducible."""
    from trendr_data_pipeline_spark.operators.quality_model import (
        train_and_score_quality,
    )
    from trendr_data_pipeline_spark.operators.sampling import hash_fraction

    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    probs = {r["doc_id"]: r["prob"]
             for r in train_and_score_quality(docs).collect()}
    floored = build_training_corpus(
        spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET, quality_prob_floor=0.5
    ).collect()
    assert floored, "floor dropped everything"
    assert all(probs[r["doc_id"]] >= 0.5 for r in floored)
    # (no subset relation vs the un-floored run: dropping docs frees
    # budget, which can legitimately pull NEW docs into the greedy)

    mixed = build_training_corpus(
        spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET, mix_target_frac=0.5
    ).collect()
    assert mixed
    # every selected doc must have passed the deterministic hash keep
    # decision AGAINST ITS SOURCE'S ACTUAL RATE — recompute the rates
    # the mix stage used (temperature_rates over the pre-mix survivor
    # frame, same target_frac), and require frac < rate per doc. The
    # rates must genuinely bite (some source below 1.0) or the check
    # is vacuous.
    from trendr_data_pipeline_spark.operators.sampling import temperature_rates
    from trendr_data_pipeline_spark.plans.corpus_pipeline import corpus_survivors

    surv = corpus_survivors(spark, SMOKE_SF)
    rates = {
        r["source"]: r["rate"]
        for r in temperature_rates(surv, target_frac=0.5).collect()
    }
    assert any(rate < 1.0 for rate in rates.values()), rates
    fracs = {r["doc_id"]: r["frac"] for r in docs.select(
        "doc_id", hash_fraction(F.col("doc_id"), "corpus-mix").alias("frac")).collect()}
    assert all(fracs[r["doc_id"]] < rates[r["source"]] for r in mixed)
    # and the mix must actually have dropped someone eligible
    surv_rows = surv.select("doc_id", "source").collect()
    dropped = [r for r in surv_rows if fracs[r["doc_id"]] >= rates[r["source"]]]
    assert dropped, "no survivor was filtered by the mix — vacuous run"
    again = build_training_corpus(
        spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET, mix_target_frac=0.5
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in mixed]


def test_span_dedup_stage(spark):
    """With span_dedup the selected corpus carries each repeated
    8-gram exactly once: re-measuring duplicated-span coverage over
    the selected texts finds zero duplicated windows, and the budget
    accounting uses the CLEANED token counts."""
    from trendr_data_pipeline_spark.operators.dedup import duplicated_span_coverage

    rows = build_training_corpus(
        spark, SMOKE_SF, seq_len=SEQ, token_budget=BUDGET, span_dedup=True
    ).collect()
    assert rows
    sel = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    cov = duplicated_span_coverage(sel, n=8).collect()
    assert all(r["n_dup_windows"] == 0 for r in cov)
    # n_tok matches the cleaned text per row
    for r in rows:
        assert r["n_tok"] == len([t for t in r["text"].split(" ") if t])
