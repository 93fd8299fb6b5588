"""BPE learner/encoder scale-posture tests (r5).

Covers the two 100 TB caveats from the r4 verdict:

1. the encode-dictionary join must not carry a forced broadcast hint
   (billions of distinct words on web text) — AQE still broadcasts a
   small vocab, and a forced-shuffle run produces identical results;
2. merge-round batching must be provably equivalent to one-at-a-time
   greedy learning (identical merge table, counts included) while
   cutting the number of Spark rounds.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from trendr_data_pipeline_spark.operators.bpe import (
    bpe_tokenize_stats,
    learn_bpe_merges,
)

SMOKE_SF = "/root/testdata/sf0.001"


def _reference_merges(texts: list[str], num_merges: int):
    """Pure-Python one-at-a-time greedy BPE learner (Sennrich-style),
    independent of the Spark implementation."""
    vocab: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for step in range(1, num_merges + 1):
        pc: Counter = Counter()
        for w, syms in segs.items():
            c = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (left, right), wcnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, left, right, wcnt))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


def test_batched_learner_matches_one_at_a_time_on_fixture(spark):
    """The r4 verdict's done-criterion: identical merge table on the
    fixture corpus for batch=1 vs batch=8 — and both match the
    independent pure-Python reference."""
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    m1, _ = learn_bpe_merges(docs, num_merges=10, batch=1)
    m8, _ = learn_bpe_merges(docs, num_merges=10, batch=8)
    assert m1 == m8
    texts = [r["text"] for r in docs.select("text").collect()]
    assert m8 == _reference_merges(texts, 10)


@pytest.mark.parametrize("batch", [2, 4, 16])
def test_batched_learner_matches_reference_on_adversarial_corpora(spark, batch):
    """Corpora built to stress the batch-stop conditions: shared
    symbols between top pairs (condition 1), created pairs that
    out-count later candidates (condition 2: merging (t,h) creates
    (th,e) with a near-top count), and a symbol spelled like a
    created string ('ab' formed two ways)."""
    corpora = [
        # 'the' dominance: (t,h) then created (th,e) must precede (i,s)
        ["the then there is is is the"] * 3 + ["is this the thing"],
        # disjoint top pairs: (a,b) and (c,d) batch together safely
        ["ab ab ab cd cd cd xy"] * 2,
        # alias stress: 'a b' merges to 'ab' while literal pair
        # ('ab','c') exists from earlier merges of 'a'+'b' elsewhere
        ["abc abc a b ab ab ababab c c"],
        # repeated-symbol pair (a,a) with overlap runs
        ["aaaa aaa aa baab"],
        # r6 ADVICE counterexamples: a RUN pair's own chained created
        # pair (aa,a) must be bounded by the run pair itself — the
        # accepted-pair exclusion bug let batch>=2 hoist a
        # symbol-disjoint tie past the created pair
        ["aaa aaa bc bc"],
        ["hhh hhh hhh", "iits iits"],
        ["hhh", "hhh", "hhh", "hhh", "hhh", "iits", "iits"],
    ]
    for texts in corpora:
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        got, _ = learn_bpe_merges(docs, num_merges=8, batch=batch)
        assert got == _reference_merges(texts, 8), texts


def test_batching_reduces_spark_rounds(spark):
    """batch=8 must run strictly fewer driver rounds than batch=1 on
    the fixture (the scheduling-overhead win the batching exists
    for). Rounds are observable as collect() calls; count them via
    the learner's localCheckpoint lineage instead: each round
    checkpoints once, so compare job-group side effects indirectly
    by instrumenting _safe_batch_prefix acceptance sizes."""
    from trendr_data_pipeline_spark.operators import bpe

    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    calls: list[int] = []
    orig = bpe._safe_batch_prefix

    def spy(topk, batch, horizon_full):
        out = orig(topk, batch, horizon_full)
        calls.append(len(out))
        return out

    bpe._safe_batch_prefix = spy
    try:
        learn_bpe_merges(docs, num_merges=10, batch=8)
        rounds_batched = len(calls)
        calls.clear()
        learn_bpe_merges(docs, num_merges=10, batch=1)
        rounds_single = len(calls)
    finally:
        bpe._safe_batch_prefix = orig
    assert rounds_single == 10
    assert rounds_batched < rounds_single


def test_safe_batch_prefix_stops_at_shared_symbol():
    from trendr_data_pipeline_spark.operators.bpe import _safe_batch_prefix

    topk = [("t", "h", 100), ("h", "e", 90), ("a", "b", 80)]
    # (h,e) shares 'h' with (t,h): batch must STOP there, not skip to
    # (a,b) — strict greedy might pick (h,e) next if its count holds
    assert _safe_batch_prefix(topk, 8, horizon_full=False) == [("t", "h", 100)]


def test_safe_batch_prefix_created_pair_bound():
    from trendr_data_pipeline_spark.operators.bpe import _safe_batch_prefix

    # merging (t,h) can create (x,th) bounded by count(x,t)=85 >= 80,
    # so (a,b) at 80 is unsafe; at 90 > 85 it would be safe
    topk = [("t", "h", 100), ("x", "t", 85), ("a", "b", 80)]
    assert _safe_batch_prefix(topk, 8, horizon_full=False) == [("t", "h", 100)]
    topk2 = [("t", "h", 100), ("a", "b", 90), ("x", "t", 85)]
    assert _safe_batch_prefix(topk2, 8, horizon_full=False) == [
        ("t", "h", 100),
        ("a", "b", 90),
    ]


def test_safe_batch_prefix_horizon_guard():
    from trendr_data_pipeline_spark.operators.bpe import _safe_batch_prefix

    # when the table was truncated at K, a candidate tied with the
    # floor count cannot be proven safe (unseen pairs may tie it)
    topk = [("t", "h", 100), ("a", "b", 50), ("c", "d", 50)]
    assert _safe_batch_prefix(topk, 8, horizon_full=True) == [("t", "h", 100)]
    assert _safe_batch_prefix(topk, 8, horizon_full=False) == [
        ("t", "h", 100),
        ("a", "b", 50),
        ("c", "d", 50),
    ]


def _encode_join_nodes(plan: str) -> str:
    return "".join(
        line
        for line in plan.splitlines()
        if "Join" in line or "Exchange" in line or "Broadcast" in line
    )


def test_encode_join_broadcasts_small_vocab_under_aqe(spark):
    """With no forced hint, AQE must still broadcast the small
    fixture vocabulary (the join keyed on `word`)."""
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    out = bpe_tokenize_stats(docs, num_merges=4)
    rows = {r["source"]: r for r in out.collect()}
    assert rows
    # after execution AQE has finalized the plan: the dictionary join
    # must be a broadcast, not a sort-merge
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, _encode_join_nodes(plan)
    assert "SortMergeJoin" not in plan, _encode_join_nodes(plan)


def test_encode_join_shuffle_fallback_identical_results(spark):
    """Force the large-dictionary regime (broadcast disabled): the
    join degrades to a shuffle join and the stats are unchanged."""
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    baseline = {tuple(r) for r in bpe_tokenize_stats(docs, num_merges=4).collect()}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = bpe_tokenize_stats(docs, num_merges=4)
        forced = {tuple(r) for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, _encode_join_nodes(plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert forced == baseline


def test_batched_learner_property_random_corpora(spark):
    """Property: the batched learner equals the pure-Python
    one-at-a-time reference on random tiny corpora (small alphabet →
    dense shared-symbol conflicts, the regime where an unsound batch
    rule would diverge)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=5)
    doc = st.lists(word, min_size=1, max_size=6).map(" ".join)

    @given(texts=st.lists(doc, min_size=1, max_size=5),
           batch=st.integers(2, 6))
    @settings(
        max_examples=16,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def inner(texts, batch):
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        got, _ = learn_bpe_merges(docs, num_merges=6, batch=batch)
        assert got == _reference_merges(texts, 6), (texts, batch)

    inner()


def _python_batched_merges(texts: list[str], num_merges: int, batch: int):
    """Pure-Python twin of learn_bpe_merges' round loop (same pair
    counting, same top-K horizon, the REAL _safe_batch_prefix, the
    same disjoint-batch single-pass apply) — lets hypothesis fuzz the
    batch rule with hundreds of examples at zero Spark cost. The
    Spark learner is pinned against this loop structure by the
    adversarial/fixture tests above."""
    from trendr_data_pipeline_spark.operators.bpe import _safe_batch_prefix

    vocab: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges:
        remaining = num_merges - len(merges)
        k = max(4 * batch, 32)
        pc: Counter = Counter()
        for w, syms in segs.items():
            c = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        ordered = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        topk = [(left, right, cnt) for (left, right), cnt in ordered]
        accepted = _safe_batch_prefix(
            topk, min(batch, remaining), horizon_full=len(topk) == k
        )
        for left, right, wcnt in accepted:
            merges.append((len(merges) + 1, left, right, wcnt))
        pair_map = {(left, right): left + right for left, right, _ in accepted}
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in pair_map:
                    out.append(pair_map[(syms[i], syms[i + 1])])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


def test_batch_rule_fuzz_vs_greedy_pure_python():
    """High-volume fuzz of the batch-prefix rule (the ADVICE r5 bug
    regime: run pairs whose chained created pair must be bounded by
    the run pair itself). 400 random corpora over a 2-char alphabet
    with long words — run-pair dense — x every batch size; the
    batched table must equal strict greedy exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=8)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @given(texts=st.lists(doc, min_size=1, max_size=6),
           batch=st.integers(2, 16))
    @settings(max_examples=400, deadline=None)
    def inner(texts, batch):
        got = _python_batched_merges(texts, 8, batch)
        assert got == _reference_merges(texts, 8), (texts, batch)

    inner()


def test_bpe_tokenize_pieces_roundtrip(spark):
    """The consumer-facing encode: per-document piece sequences
    (a) concatenate back to the normalized document text, (b) agree
    with the stats path's piece counts, and (c) every piece is a
    learned vocab symbol (a char or a merge product)."""
    from trendr_data_pipeline_spark.operators.bpe import bpe_tokenize

    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    out = {r["doc_id"]: r for r in bpe_tokenize(docs, num_merges=10).collect()}
    stats_rows = bpe_tokenize_stats(docs, num_merges=10).collect()
    total_pieces_stats = sum(r["n_pieces"] for r in stats_rows)
    assert sum(r["n_pieces"] for r in out.values()) == total_pieces_stats

    merges, _ = learn_bpe_merges(docs, num_merges=10)
    vocab_syms = {left + right for _, left, right, _ in merges}
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for d, r in out.items():
        norm = "".join(w for w in re.split(r"\s+", texts[d].lower()) if w)
        assert "".join(r["pieces"]) == norm, d
        for p in r["pieces"]:
            assert len(p) == 1 or p in vocab_syms, (d, p)


# ---------------------------------------------------------------------------
# r7: production depth — fast in-memory learner, prefix-rule rewrite fuzz,
# batch invariance at >=256 merges (r6 verdict item 2)
# ---------------------------------------------------------------------------


def _direct_scan_prefix(topk, batch, horizon_full):
    """The r6 form of _safe_batch_prefix's condition-2 scan (direct
    O(batch²·K) accepted × topk loop) — kept here as the reference the
    r7 incremental-prefix rewrite is fuzzed against."""
    accepted, conflict = [], set()
    floor = topk[-1][2] if topk else 0
    for left, right, cnt in topk:
        if len(accepted) >= batch:
            break
        if accepted:
            if left in conflict or right in conflict:
                break
            if horizon_full and cnt <= floor:
                break
            boundary_hit = any(
                pc >= cnt and (pr == al or pl == ar)
                for al, ar, _ in accepted
                for pl, pr, pc in topk
                if (pl, pr) != (left, right)
            )
            if boundary_hit:
                break
        accepted.append((left, right, cnt))
        conflict.update((left, right, left + right))
    return accepted


def test_safe_batch_prefix_incremental_equals_direct_scan():
    """400 random count-sorted topk lists over a tiny symbol alphabet
    (dense shared symbols and ties — the regime where the prefix
    machinery could diverge from the direct scan)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trendr_data_pipeline_spark.operators.bpe import _safe_batch_prefix

    sym = st.text(alphabet="abc", min_size=1, max_size=2)
    entry = st.tuples(sym, sym, st.integers(1, 6))

    @given(
        entries=st.lists(entry, min_size=1, max_size=12),
        batch=st.integers(1, 8),
        horizon_full=st.booleans(),
    )
    @settings(max_examples=400, deadline=None)
    def inner(entries, batch, horizon_full):
        seen, topk = set(), []
        for left, right, c in entries:
            if (left, right) not in seen:
                seen.add((left, right))
                topk.append((left, right, c))
        topk.sort(key=lambda t: (-t[2], t[0], t[1]))
        assert _safe_batch_prefix(topk, batch, horizon_full) == (
            _direct_scan_prefix(topk, batch, horizon_full)
        ), (topk, batch, horizon_full)

    inner()


def test_fast_learner_matches_greedy_reference_random_corpora(spark):
    """learn_bpe_merges_fast (dictionary-collapse + in-memory
    incremental greedy) must equal the strict one-at-a-time reference
    exactly — table AND recorded counts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from trendr_data_pipeline_spark.operators.bpe import learn_bpe_merges_fast

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @given(texts=st.lists(doc, min_size=1, max_size=6))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def inner(texts):
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        got, _ = learn_bpe_merges_fast(docs, num_merges=15)
        assert got == _reference_merges(texts, 15), texts

    inner()


def test_fast_learner_refuses_oversized_dictionary(spark):
    from trendr_data_pipeline_spark.operators.bpe import learn_bpe_merges_fast

    docs = spark.createDataFrame(
        [("alpha beta gamma delta",), ("beta gamma epsilon zeta",)],
        "text string",
    )
    with pytest.raises(ValueError, match="max_dict_rows"):
        learn_bpe_merges_fast(docs, num_merges=4, max_dict_rows=3)


def test_batch_invariance_at_depth_256(spark):
    """r6 verdict item 2: batch-size invariance pinned at >= 256
    merges — the regime where run-pair chains and flat tie-heavy
    counts interact (the r5 ADVICE-high bug's habitat). The fixture's
    31-word vocabulary caps word-internal BPE far below 256, so the
    dictionary uses the SentencePiece-style word-bigram grain
    (space as a symbol): distinct sf0.001 bigrams give ~8k learnable
    merges. The in-memory learner is the strict-greedy reference
    (property-pinned above); two different batch sizes must both
    reproduce it exactly, table and counts."""
    from trendr_data_pipeline_spark.operators.bpe import (
        learn_bpe_merges,
        learn_bpe_merges_fast,
    )

    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    want, _ = learn_bpe_merges_fast(docs, num_merges=256, ngram=2)
    assert len(want) == 256
    for batch in (16, 64):
        got, _ = learn_bpe_merges(docs, num_merges=256, batch=batch, ngram=2)
        assert got == want, f"batch={batch} diverged from strict greedy"


def test_ngram_word_frequencies_matches_python(spark):
    """The SentencePiece-style n-gram dictionary must count exactly
    the sliding word n-grams of the lowercased \\s+-split text."""
    from collections import Counter

    from trendr_data_pipeline_spark.operators.bpe import word_frequencies

    texts = ["The cat  sat on the mat", "the cat\tran", "on", "a b a b a"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["word"]: r["cnt"]
        for r in word_frequencies(docs, ngram=2).collect()
    }
    want = Counter()
    for t in texts:
        ws = [w for w in re.split(r"\s+", t.lower()) if w]
        if 0 < len(ws) < 2:
            # short docs contribute their full text as one entry
            want[" ".join(ws)] += 1
        for i in range(len(ws) - 1):
            want[" ".join(ws[i : i + 2])] += 1
    assert got == dict(want)
