"""Property-based parity (hypothesis): the Spark text functions agree
with their Python oracles on arbitrary generated input, not just the
hand-picked cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.test_text_functions import (
    oracle_dedupe_key,
    oracle_fuzzy,
    oracle_normalize,
    oracle_trigram,
)
from trendr_data_pipeline_spark.functions import text as TX

# text with accents, punctuation, venue words, whitespace runs
_CHARS = st.text(alphabet=list("abcdefghij éèêëàâçœæ'’&.,-|\""), min_size=0, max_size=20)
_WORDS = st.lists(
    st.sampled_from(["café", "st", "Bar", "Restaurant", "cœur", "&"]), min_size=0, max_size=4
)
TEXT = st.builds(lambda c, ws: (c + " " + " ".join(ws)).strip(), _CHARS, _WORDS)

_SETTINGS = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@_SETTINGS
def test_normalize_property(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r[0] for r in df.select(TX.normalize_text(F.col("t"))).collect()]
    assert got == [oracle_normalize(t) for t in texts]


@given(pairs=st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=6))
@_SETTINGS
def test_trigram_fuzzy_property(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    tri = [r[0] for r in df.select(TX.trigram_similarity(F.col("a"), F.col("b"))).collect()]
    fuz = [r[0] for r in df.select(TX.fuzzy_ratio(F.col("a"), F.col("b"))).collect()]
    for (a, b), t, fz in zip(pairs, tri, fuz):
        assert abs(t - oracle_trigram(a, b)) < 1e-12, (a, b)
        assert abs(fz - oracle_fuzzy(a, b)) < 1e-12, (a, b)


URL = st.builds(
    lambda host, path, suffix, lang: f"https://{host}.fr/{lang}{path}{suffix}",
    host=st.sampled_from(["www.site", "blog.site", "a.b.site"]),
    path=st.sampled_from(["articles/x", "p/deep/path", "x.html", "y.php"]),
    suffix=st.sampled_from(["", "-part2", "-v3", "-update", "-12"]),
    lang=st.sampled_from(["", "fr/", "en/", "us/en/"]),
)


@given(urls=st.lists(URL, min_size=1, max_size=8))
@_SETTINGS
def test_dedupe_key_property(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(TX.dedupe_key(F.col("url"))).collect()]
    assert got == [oracle_dedupe_key(u) for u in urls]


def test_word_ngram_hash_flags_match_string_flags(spark):
    """Property: contamination flags computed over hashed grams must
    equal flags computed over string grams for random corpora (the
    hashed encoder is an internal join-key optimization, not a
    semantic change)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from trendr_data_pipeline_spark.operators.dedup import (
        word_ngram_hashes,
        word_ngrams,
    )

    words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
    doc = st.lists(words, min_size=0, max_size=12).map(" ".join)

    @given(texts=st.lists(doc, min_size=1, max_size=8))
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def inner(texts):
        df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
        n = 3
        str_grams = {
            r["doc_id"]: set(r["g"])
            for r in df.select("doc_id", word_ngrams(F.col("text"), n).alias("g")).collect()
        }
        hash_grams = {
            r["doc_id"]: set(r["g"])
            for r in df.select(
                "doc_id", word_ngram_hashes(F.col("text"), n).alias("g")
            ).collect()
        }
        # same gram counts per doc, and identical overlap structure
        for i in str_grams:
            assert len(str_grams[i]) == len(hash_grams[i]), texts[i]
        ids = list(str_grams)
        for a in ids:
            for b in ids:
                assert bool(str_grams[a] & str_grams[b]) == bool(
                    hash_grams[a] & hash_grams[b]
                ), (texts[a], texts[b])

    inner()


def test_shingle_hash_counts_match_string_shingles_random(spark):
    """Property: packed-byte shingles have exactly the string form's
    distinct counts and pairwise intersection sizes on random ASCII
    text (injective encoding — not a hash)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from trendr_data_pipeline_spark.operators.dedup import shingle_hashes, shingle_set

    text = st.text(alphabet="abcdef ", min_size=0, max_size=30)

    @given(texts=st.lists(text, min_size=1, max_size=6))
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def inner(texts):
        df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, t string")
        rows = df.select(
            "doc_id",
            shingle_set(F.col("t"), 5).alias("s"),
            shingle_hashes(F.col("t"), 5).alias("h"),
        ).collect()
        strs = {r["doc_id"]: set(r["s"]) for r in rows}
        hshs = {r["doc_id"]: set(r["h"]) for r in rows}
        for i in strs:
            assert len(strs[i]) == len(hshs[i])
        ids = list(strs)
        for a in ids:
            for b in ids:
                assert len(strs[a] & strs[b]) == len(hshs[a] & hshs[b])

    inner()


def test_bpe_merges_match_reference_learner(spark):
    """x15 parity: the distributed BPE learner reproduces an
    independent pure-Python reference (Sennrich-style: word-frequency
    dict, weighted pair counts, lexicographic tie-break, greedy
    left-to-right merge application) on the smoke corpus — the merge
    table, pair counts, and final corpus symbol totals all match."""
    import re
    from collections import Counter

    from trendr_data_pipeline_spark.operators.bpe import bpe_segment_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bpe_segment_stats(docs, num_merges=10).collect()
    got_merges = [(r["step"], r["left"], r["right"], r["pair_count"])
                  for r in out if r["step"] > 0]
    summary = [r for r in out if r["step"] == -1][0]

    # reference learner
    vocab = Counter()
    for r in docs.select("text").collect():
        for w in re.split(r"\s+", r["text"].lower()):
            if w:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    ref_merges = []
    for step in range(1, 11):
        pc = Counter()
        for w, syms in segs.items():
            c = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (left, right), wcnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ref_merges.append((step, left, right, wcnt))
        for w, syms in segs.items():
            out_s, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out_s.append(left + right)
                    i += 2
                else:
                    out_s.append(syms[i])
                    i += 1
            segs[w] = out_s
    assert got_merges == ref_merges
    assert summary["corpus_chars"] == sum(c * len(w) for w, c in vocab.items())
    assert summary["corpus_syms"] == sum(c * len(segs[w]) for w, c in vocab.items())
    # merges must actually compress the corpus
    assert summary["corpus_syms"] < summary["corpus_chars"]


def test_bpe_tokenize_consistent_with_learner(spark):
    """x19 parity: (a) corpus-wide piece totals from the rank-based
    encode loop equal the learner's final segmentation totals (the
    standard BPE equivalence: encoding with merge ranks reproduces
    the training-time segmentation); (b) per-source stats match a
    pure-Python reference encode."""
    import re
    from collections import Counter

    from trendr_data_pipeline_spark.operators.bpe import (
        bpe_segment_stats,
        bpe_tokenize_stats,
        learn_bpe_merges,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = bpe_tokenize_stats(docs, num_merges=10).collect()
    summary = [r for r in bpe_segment_stats(docs, num_merges=10).collect() if r["step"] == -1][0]
    assert sum(r["n_pieces"] for r in stats) == summary["corpus_syms"]
    assert sum(r["n_chars"] for r in stats) == summary["corpus_chars"]

    merges, _ = learn_bpe_merges(docs, num_merges=10)
    ranks = {(left, right): i for i, (_, left, right, _) in enumerate(merges)}

    def encode_len(word):
        syms = list(word)
        while len(syms) >= 2:
            cands = [(ranks[(a, b)], i) for i, (a, b) in enumerate(zip(syms, syms[1:]))
                     if (a, b) in ranks]
            if not cands:
                break
            _, i = min(cands)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return len(syms)

    ref = {}
    for r in docs.select("source", "text").collect():
        agg = ref.setdefault(r["source"], Counter())
        for w in re.split(r"\s+", r["text"].lower()):
            if w:
                agg["n_words"] += 1
                agg["n_chars"] += len(w)
                agg["n_pieces"] += encode_len(w)
    for r in stats:
        a = ref[r["source"]]
        assert (r["n_words"], r["n_chars"], r["n_pieces"]) == (
            a["n_words"], a["n_chars"], a["n_pieces"]), r["source"]


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=8,
    )
)
@_SETTINGS
def test_quantize_engine_parity_random_vectors(spark, duck, vecs):
    """x09 property parity: for ARBITRARY float32 vectors (including
    constant and near-constant ones), the Spark quantizer and the
    DuckDB oracle expression produce identical codes, checksums and
    integer error sums — the systematic version of the knife-edge
    hunt that caught the r5 mae rounding divergence."""
    from trendr_data_pipeline_spark.operators.similarity import quantize_embeddings
    from trendr_data_pipeline_spark.plans.similarity_ops import _ORACLE_QUANTIZE

    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    got = {r["vec_id"]: (r["codes_md5"], r["code_sum"], r["mae_micro"])
           for r in quantize_embeddings(df).collect()}
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows],
                        "embedding": [r[1] for r in rows]})
    duck.register("embeddings_prop", pdf)
    sql = _ORACLE_QUANTIZE.replace("FROM embeddings", "FROM embeddings_prop")
    want = {r[0]: (r[4], r[5], r[8]) for r in duck.execute(sql).fetchall()}
    duck.unregister("embeddings_prop")
    assert got == want


@given(
    st.lists(
        st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=6,
    )
)
@_SETTINGS
def test_duplicated_spans_match_bruteforce(spark, docs_texts):
    """x13 property parity vs a brute-force Python oracle on random
    tiny-alphabet corpora (maximally collision-prone gram sets):
    window counts and covered-position unions must match exactly."""
    import re

    from trendr_data_pipeline_spark.operators.dedup import duplicated_span_coverage

    n = 3
    rows = [(i, t) for i, t in enumerate(docs_texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_tok"], r["n_dup_windows"], r["covered_tok"])
           for r in duplicated_span_coverage(df, n=n).collect()}

    toks = {i: [w for w in re.split(r"\s+", t.lower()) if w] for i, t in rows}
    gram_docs: dict[tuple, set] = {}
    for i, ts in toks.items():
        for j in range(len(ts) - n + 1):
            gram_docs.setdefault(tuple(ts[j:j + n]), set()).add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want = {}
    for i, ts in toks.items():
        wins = [j for j in range(len(ts) - n + 1) if tuple(ts[j:j + n]) in dup]
        covered = set()
        for j in wins:
            covered.update(range(j, j + n))
        want[i] = (len(ts), len(wins), len(covered))
    assert got == want
