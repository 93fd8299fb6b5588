"""BPE vocabulary induction over a document corpus (north-star
LLM-pipeline op: learning the tokenizer's merge table IS a corpus
aggregation job — Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units", public; the practice behind the
GPT-2/Llama tokenizers).

Classic BPE learns from the WORD-FREQUENCY dictionary, not the raw
stream: the corpus collapses to (distinct word, count) once — at web
scale the vocabulary frame is millions of rows where the corpus is
trillions of tokens, so every merge round runs on the small frame.
That collapse is the one fact-table shuffle; each of the ``k`` merge
rounds is then a groupBy over the cached vocabulary frame:

1. adjacent symbol pairs via ``zip_with`` over two ``slice``\\ s of the
   symbol array (JVM-side; NEVER ``element_at`` inside a ``sequence``
   lambda — the unbound-expression trap re-evaluates the array per
   element, see SCALING.md);
2. weighted pair counts (map-side combined — |distinct pairs| rows
   shuffle, not |words|);
3. the argmax pair comes to the driver — ONE row per round (the same
   bounded-driver-fetch posture as IVF/PQ codebook training);
4. the merge applies to the symbol arrays in one Arrow batch pass
   (left-to-right greedy, overlapping occurrences consume left-first
   — the reference semantics of the public implementations).

Rounds checkpoint with ``localCheckpoint`` (same lineage-cutting
pattern as operators/graph.py) so round ``k`` does not replay rounds
``1..k-1``.

Determinism: ties on pair count break on the pair's lexicographic
order, so the learned table is a pure function of the corpus.

Merge-round batching (the 100 TB fix for the one-job-pair-per-merge
loop): a production tokenizer learns 30k-50k merges, and one Spark
job pair per merge is days of scheduling overhead even though each
round's frame is tiny. Each round therefore accepts a PREFIX of the
sorted pair-count list (up to ``batch`` merges) and applies them in
one Arrow pass. The prefix is provably equivalent to one-at-a-time
greedy — both the chosen pairs AND their recorded counts — under
three conditions checked per candidate (stop the batch at the first
violation; never skip over a conflicting pair):

1. *Symbol-disjointness*: the candidate shares no symbol with any
   earlier accepted merge, including the earlier merge's CREATED
   string ``l+r`` (an old symbol spelled identically would alias the
   new one and absorb its created-pair counts). Disjoint pairs'
   counts are untouched by applying the earlier merges, so the
   candidate's table count equals its count at its strict-greedy
   turn.
2. *Created-pair bound*: applying merge ``(a, b)`` creates pairs
   ``(x, ab)`` and ``(ab, y)`` whose counts are bounded by
   ``count(x, a)`` and ``count(b, y)`` respectively (every created
   occurrence consumes one such trigram). The candidate (count
   ``c``) is only safe if no table pair ending at ``a`` or starting
   at ``b`` of any earlier accepted merge has count ``>= c`` —
   otherwise strict greedy might have selected the created pair
   first. ``>=`` (not ``>``) because equal-count ties break
   lexicographically and a created pair could win the tie.
3. *Horizon*: counts below the collected top-K are unobserved, so a
   candidate at or below the K-th count cannot be proven safe once
   any merge is already accepted.

Pairs REMOVED by a merge (``(x,a)``/``(b,y)`` losing occurrences)
only ever lower non-accepted counts, which cannot promote a skipped
pair above an accepted one, so no condition is needed for them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chars_udf():
    def f(s: pd.Series) -> pd.Series:
        return s.map(list)

    return F.pandas_udf(f, "array<string>")


def _merge_udf(merges: list[tuple[str, str]]):
    """Apply a batch of mutually symbol-disjoint merges to a symbol
    array in ONE greedy left-to-right pass (overlaps consume
    left-first). Disjointness (enforced by the learner's batch rule)
    guarantees a single pass is exact: a merge output can never form
    a new instance of another batch member's pair."""
    pair_map = {(left, right): left + right for left, right in merges}

    def f(s: pd.Series) -> pd.Series:
        def apply(syms):
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and (syms[i], syms[i + 1]) in pair_map:
                    out.append(pair_map[(syms[i], syms[i + 1])])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return s.map(apply)

    return F.pandas_udf(f, "array<string>")


def _safe_batch_prefix(
    topk: list[tuple[str, str, int]], batch: int, horizon_full: bool
) -> list[tuple[str, str, int]]:
    """Longest prefix of the (count desc, l, r)-sorted pair list that
    is provably equivalent to one-at-a-time greedy selection — the
    three conditions from the module docstring. ``horizon_full``
    means the table may hold pairs below ``topk[-1]``'s count."""
    accepted: list[tuple[str, str, int]] = []
    conflict: set[str] = set()
    floor = topk[-1][2] if topk else 0
    # Incremental condition-2 machinery (r7): the direct
    # accepted × topk scan is O(batch²·K) — ~10⁷ python ops per round
    # at production sizes (batch 256, K 1024). The scan only ever
    # consults topk pairs with ``pc >= cnt``, and cnt decreases
    # monotonically along the count-sorted list, so that set is a
    # GROWING PREFIX: as_left/as_right count how many prefix pairs
    # start/end with each symbol, and the test per candidate is
    # O(|accepted|). Exact-equivalence with the direct scan is fuzzed
    # in tests/test_bpe.py.
    #
    # The scan includes pairs already ACCEPTED this batch: for
    # distinct-symbol accepted merges that inclusion is vacuous
    # (condition-1 disjointness bars any accepted pair from being
    # another's boundary pair), but a RUN merge (a,a) must bound its
    # own chained created pair (aa,a) — its own count is exactly the
    # bound count(aa,a) <= count(a,a), so excluding it let batch>=2
    # reorder ties against strict greedy (fuzz-found: vocab
    # {hhh:5, iits:2}). Only the CANDIDATE pair itself is excluded
    # (the ``- (al == right)`` / ``- (ar == left)`` terms).
    as_left: dict[str, int] = {}
    as_right: dict[str, int] = {}
    pi = 0  # topk[:pi] is the current >= cnt prefix
    for left, right, cnt in topk:
        if len(accepted) >= batch:
            break
        if accepted:
            if left in conflict or right in conflict:
                break  # condition 1
            if horizon_full and cnt <= floor:
                break  # condition 3
            while pi < len(topk) and topk[pi][2] >= cnt:
                pl, pr, _ = topk[pi]
                as_left[pl] = as_left.get(pl, 0) + 1
                as_right[pr] = as_right.get(pr, 0) + 1
                pi += 1
            boundary_hit = any(
                (as_right.get(al, 0) - (al == right)) > 0
                or (as_left.get(ar, 0) - (ar == left)) > 0
                for al, ar, _ in accepted
            )
            if boundary_hit:
                break  # condition 2
        accepted.append((left, right, cnt))
        conflict.update((left, right, left + right))
    return accepted


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    ngram: int = 1,
) -> DataFrame:
    """(word, cnt) dictionary — whitespace words, matching the
    ``\\s+``-split token semantics used across the text operators.

    ``ngram > 1`` builds the dictionary from sliding word n-grams
    joined by a single space — the SentencePiece posture (Kudo &
    Richardson 2018, public: whitespace is an ordinary symbol, merges
    may cross word boundaries, the way production tokenizers learn
    ``" the"``, ``"in the"``, …). The learner is unchanged — space is
    just another character symbol — but the learnable merge space is
    no longer bounded by the distinct-word inventory, which is what a
    ≥1k-merge production run needs (tools/bpe_depth_bench.py)."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    if ngram <= 1:
        w = F.explode(F.split(txt, r"\s+")).alias("word")
        return (
            docs.select(w)
            .filter(F.length("word") > 0)
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    ws = F.filter(F.split(txt, r"\s+"), lambda w: F.length(w) > 0)
    # materialize the split ONCE, then slice the attribute inside the
    # transform — slicing a bound column is cheap; re-evaluating the
    # split per element is the unbound-expression trap (module doc)
    base = docs.select(ws.alias("ws")).filter(F.size("ws") >= 1)
    # docs shorter than the gram width still contribute — as their one
    # full-width entry — otherwise a corpus of short lines (titles,
    # queries) would silently train a vocabulary that never saw them
    # (r7 review finding); SentencePiece likewise learns from short
    # sequences
    grams = F.when(
        F.size("ws") >= ngram,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - (ngram - 1)),
            lambda i: F.array_join(F.slice(F.col("ws"), i, ngram), " "),
        ),
    ).otherwise(F.array(F.array_join(F.col("ws"), " ")))
    return (
        base.select(F.explode(grams).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    batch: int = 8,
    ngram: int = 1,
    round_log: list | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges, up to ``batch`` per Spark
    round (provably greedy-equivalent — see module docstring; the
    learned table is identical for any ``batch`` >= 1). Returns
    (merge table, final vocabulary frame). Merge table rows: (step,
    left, right, weighted pair count at selection time). The
    vocabulary frame is (word, cnt, syms) with ``syms`` the word's
    symbol sequence after all merges.

    ``ngram``: dictionary grain (see :func:`word_frequencies`) —
    ``>1`` is the SentencePiece-style space-as-symbol mode production
    depth needs. ``round_log``: optional list appended with one
    ``(accepted_this_round, topk_len)`` tuple per Spark round — the
    instrumentation behind the rounds-vs-merges curve in SCALING.md."""
    batch = max(1, batch)
    from ..plan_debug import note_subtree

    vocab = note_subtree(
        "bpe.vocab0",
        word_frequencies(docs, text_col, ngram=ngram).withColumn(
            "syms", _chars_udf()(F.col("word"))
        ),
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges:
        remaining = num_merges - len(merges)
        # top-K horizon: enough headroom that condition 3 rarely
        # binds, while the driver fetch stays O(batch) rows
        k = max(4 * batch, 32)
        n = F.size("syms")
        pairs = vocab.filter(n >= 2).select(
            F.col("cnt"),
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, n - 1),
                    F.slice(F.col("syms"), 2, n - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("wcnt"))
            .orderBy(F.col("wcnt").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(k)
            .collect()
        )
        if not top:
            break
        topk = [(r["p"]["l"], r["p"]["r"], int(r["wcnt"])) for r in top]
        accepted = _safe_batch_prefix(
            topk, min(batch, remaining), horizon_full=len(topk) == k
        )
        if round_log is not None:
            round_log.append((len(accepted), len(topk)))
        for left, right, wcnt in accepted:
            merges.append((len(merges) + 1, left, right, wcnt))
        applied = [(left, right) for left, right, _ in accepted]
        nxt = note_subtree(
            "bpe.vocab_round",
            vocab.withColumn("syms", _merge_udf(applied)(F.col("syms"))),
        ).localCheckpoint()
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def bpe_segment_stats(
    docs: DataFrame, num_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """Corpus-level tokenizer-fitness report for a learned merge
    table: per merge step, the merged symbol plus the resulting
    vocabulary compression — total symbols per corpus word occurrence
    before/after. One row per merge step (step, left, right, merged,
    pair_count) plus a final summary row (step = -1) carrying corpus
    symbol totals (weighted by word counts, integer-exact)."""
    merges, vocab = learn_bpe_merges(docs, num_merges=num_merges, text_col=text_col)
    spark = docs.sparkSession
    total = vocab.select(
        F.sum(F.col("cnt") * F.length("word")).alias("chars"),
        F.sum(F.col("cnt") * F.size("syms")).alias("syms"),
    ).collect()[0]
    rows = [
        (step, left, right, left + right, int(wcnt), None, None)
        for (step, left, right, wcnt) in merges
    ] + [(-1, None, None, None, None, int(total["chars"]), int(total["syms"]))]
    return spark.createDataFrame(
        rows,
        "step int, left string, right string, merged string,"
        " pair_count bigint, corpus_chars bigint, corpus_syms bigint",
    )


def _encode_udf(merges: list[tuple[str, str]]):
    """Factory: pandas UDF applying a learned merge table to a word —
    the classic BPE encode loop: repeatedly merge the LOWEST-RANK
    adjacent pair present (rank = learning order), until none
    applies. Returns the symbol count per word (the piece sequence's
    length is what corpus statistics need; emitting the pieces
    themselves is the same loop with a different return)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def f(s: pd.Series) -> pd.Series:
        def encode(word: str) -> int:
            syms = list(word)
            while len(syms) >= 2:
                best_i, best_rank = -1, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_i, best_rank = i, r
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return len(syms)

        return s.map(encode).astype("int64")

    return F.pandas_udf(f, "long")


def bpe_tokenize_stats(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Learn a merge table, then tokenize the corpus with it and
    report per-``group_col`` compression: total words, total
    characters, total BPE pieces, and pieces-per-char (an exact
    integer/integer double — no rounding step to diverge).

    Scale shape: the encode loop runs over the DISTINCT-WORD
    dictionary only (the same corpus→vocab collapse the learner
    uses — at web scale the vocab is millions of rows against
    trillions of corpus tokens), and the per-word piece counts join
    back onto the exploded word stream UNHINTED: on real web text the
    distinct-word dictionary (URLs, hashes, typos) runs to billions
    of rows, which would OOM a forced broadcast, so AQE picks the
    strategy — it still broadcasts when the dictionary is genuinely
    small (plan pinned in tests/test_bpe.py) and falls back to a
    shuffle join keyed on ``word`` otherwise; the final rollup
    map-side combines per group."""
    merges, _ = learn_bpe_merges(docs, num_merges=num_merges, text_col=text_col)
    pairs = [(left, right) for (_, left, right, _) in merges]

    words = docs.select(
        F.col(group_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    ).filter(F.length("word") > 0)
    vocab = words.select("word").distinct()
    encoded = vocab.withColumn("n_pieces", _encode_udf(pairs)(F.col("word")))
    return (
        words.join(encoded, "word")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_pieces").alias("n_pieces"),
        )
        .select(
            group_col,
            "n_words",
            "n_chars",
            "n_pieces",
            (F.col("n_pieces").cast("double") / F.col("n_chars")).alias("pieces_per_char"),
        )
    )


def _encode_pieces_udf(merges: list[tuple[str, str]]):
    """Factory: pandas UDF applying the learned merge table to a word
    and returning the PIECE SEQUENCE (same rank-based loop as
    :func:`_encode_udf`, different return — the consumer-facing
    tokenizer output)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def f(s: pd.Series) -> pd.Series:
        def encode(word: str) -> list[str]:
            syms = list(word)
            while len(syms) >= 2:
                best_i, best_rank = -1, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_i, best_rank = i, r
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        return s.map(encode)

    return F.pandas_udf(f, "array<string>")


def bpe_tokenize(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "pieces",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table, emitting the
    actual piece sequence per document (the consumer-facing encode —
    :func:`bpe_tokenize_stats` reports the same loop's aggregate
    compression). Returns (id_col, out_col: array<string>, n_pieces).

    Scale shape: identical to the stats path — the encode loop runs
    over the DISTINCT-WORD dictionary only and the per-word piece
    arrays ride an UNHINTED join back onto the position-tagged word
    stream (AQE broadcasts small vocabs); per-document reassembly is
    one keyed sort_array + flatten, so each document's pieces never
    leave one reducer. Word order is preserved via the posexplode
    position; within a word, pieces concatenate back to the word
    (pinned in tests/test_bpe.py)."""
    merges, _ = learn_bpe_merges(docs, num_merges=num_merges, text_col=text_col)
    pairs = [(left, right) for (_, left, right, _) in merges]

    words = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("wpos", "word"),
    )
    vocab = words.select("word").distinct()
    encoded = vocab.withColumn("wp", _encode_pieces_udf(pairs)(F.col("word")))
    assembled = (
        words.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "wp"))),
                    lambda s: s["wp"],
                )
            ).alias(out_col)
        )
    )
    return (
        docs.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(out_col), F.array().cast("array<string>")).alias(out_col),
            F.size(F.coalesce(F.col(out_col), F.array().cast("array<string>"))).cast(
                "long"
            ).alias("n_pieces"),
        )
    )


# ---------------------------------------------------------------------------
# r7: production-depth learner — dictionary-collapse + in-memory exact greedy
# ---------------------------------------------------------------------------

MAX_DICT_ROWS = 5_000_000


def learn_bpe_merges_fast(
    docs: DataFrame,
    num_merges: int = 1024,
    text_col: str = "text",
    ngram: int = 1,
    max_dict_rows: int = MAX_DICT_ROWS,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Production-depth BPE: the Spark job collapses the corpus to the
    (word, cnt) dictionary — the ONE fact-table pass — then the exact
    one-at-a-time greedy loop runs IN MEMORY on the driver with
    incremental pair-count maintenance (a lazy max-heap plus per-pair
    posting sets), the way public tokenizer trainers work (Sennrich
    et al. 2016's fast implementation; HuggingFace `tokenizers`
    trains from word counts in memory for exactly this reason).

    Why this exists alongside :func:`learn_bpe_merges`: strict-greedy
    BPE is inherently sequential — the batched prover stalls at ~1-2
    accepted merges/round once top counts flatten (measured curve in
    SCALING.md), so a 30k-merge production vocabulary would cost tens
    of thousands of Spark rounds. But the DICTIONARY is small even
    when the corpus is not (millions of distinct words against
    trillions of corpus tokens at web scale), so the 100 TB posture
    is: distributed dictionary collapse, bounded driver collect
    (``take(max_dict_rows + 1)`` — refuses loudly, same guard shape as
    ANN serving's MAX_QUERY_ROWS), in-memory merge loop. Use the
    distributed rounds only when even the dictionary exceeds driver
    memory.

    Returns exactly what :func:`learn_bpe_merges` returns, and the
    merge table is IDENTICAL (same count-desc/lexicographic ordering;
    pinned against the batched learner at 256 merges and against the
    strict-greedy reference by property test in tests/test_bpe.py).
    """
    spark = docs.sparkSession
    rows = word_frequencies(docs, text_col, ngram=ngram).take(max_dict_rows + 1)
    if len(rows) > max_dict_rows:
        raise ValueError(
            f"dictionary exceeds max_dict_rows={max_dict_rows}; the "
            "in-memory learner collects the (word, cnt) dictionary — "
            "raise the bound if the driver has headroom, or fall back "
            "to learn_bpe_merges (distributed batched rounds)"
        )
    import heapq
    from collections import Counter

    words: list[list[str]] = [list(r["word"]) for r in rows]
    cnts: list[int] = [int(r["cnt"]) for r in rows]

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        c = cnts[wi]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words.setdefault(p, set()).add(wi)

    # lazy heap: stale entries are skipped when their recorded count
    # no longer matches pair_counts (standard decrease-key avoidance)
    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def push(p: tuple[str, str]) -> None:
        heapq.heappush(heap, (-pair_counts[p], p[0], p[1]))

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges and heap:
        negc, left, right = heapq.heappop(heap)
        cur = pair_counts.get((left, right))
        if cur is None or -negc != cur:
            continue  # stale
        merges.append((len(merges) + 1, left, right, cur))
        merged = left + right
        for wi in list(pair_words.get((left, right), ())):
            syms = words[wi]
            c = cnts[wi]
            old = list(zip(syms, syms[1:]))
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            new = list(zip(out, out[1:]))
            oc, nc = Counter(old), Counter(new)
            for p in oc.keys() | nc.keys():
                d = nc.get(p, 0) - oc.get(p, 0)
                if d:
                    pair_counts[p] += d * c
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                        pair_words.get(p, set()).discard(wi)
                    else:
                        push(p)
                if nc.get(p, 0) == 0:
                    pair_words.get(p, set()).discard(wi)
                elif oc.get(p, 0) == 0:
                    pair_words.setdefault(p, set()).add(wi)
        pair_words.pop((left, right), None)

    # the return frame goes back through Arrow (pandas → createDataFrame
    # uses the Arrow path), not a row-list — at the 5M-row guard bound a
    # Py4J row-by-row upload would dominate the whole learn
    vocab = spark.createDataFrame(
        pd.DataFrame(
            {
                "word": [r["word"] for r in rows],
                "cnt": cnts,
                "syms": words,
            }
        ),
        "word string, cnt bigint, syms array<string>",
    )
    return merges, vocab
