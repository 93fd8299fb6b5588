"""Corpus pipeline at REALISTIC near-dup density (r5 verdict item 6).

The driver fixture's 31-token vocabulary makes 24% of all document
pairs qualify at Jaccard ≥ 0.8 — a density artifact three orders of
magnitude above a real web corpus, and the reason c23's wall time is
dominated by stage 3 (pairs + connected components). This script
builds a synthetic LOW-density corpus (large vocabulary, ~1% injected
clone pairs — the skew_bench posture) at 4× the sf0.1 document count,
runs `build_training_corpus` end-to-end with BOTH stage-3 backends
(exact prefix join vs MinHash-LSH banding), and prints per-stage wall
times — the measured evidence that stage 3 is the cheap stage at real
density (previously a docstring claim, corpus_pipeline.py:31-37).

Usage: python tools/corpus_density_bench.py  (markdown rows for
SCALING.md "corpus pipeline at realistic density").
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from trendr_data_pipeline_spark.session import get_spark  # noqa: E402

N_DOCS = 20_000
VOCAB = 4_000
TOKENS_PER_DOC = 50
CLONE_EVERY = 100  # ~1% of docs are near-clones of their predecessor
SEQ_LEN = 512
BUDGET = 200_000


def _word(i: int) -> str:
    # pronounceable-ish deterministic words, 4-8 chars (keeps the
    # ladder's token-shape quality component realistic)
    h = hashlib.sha256(f"w{i}".encode()).hexdigest()
    letters = "abcdefghijklmnopqrstuvwxyz"
    ln = 4 + (i % 5)
    return "".join(letters[int(h[j * 2 : j * 2 + 2], 16) % 26] for j in range(ln))


def build_corpus(spark, out_dir: str) -> None:
    import random

    vocab = [_word(i) for i in range(VOCAB)]
    stop = ["the", "a", "of", "and", "is"]
    rows = []
    prev_text = None
    for d in range(N_DOCS):
        rng = random.Random(d)
        # offset 7: neither the clone nor its original (d-1, offset 6)
        # may fall in the ladder's contamination benchmark (doc_id%50==0),
        # or the ladder drops every clone pair before stage 3
        if prev_text is not None and d % CLONE_EVERY == 7:
            # near-clone: swap one token of the predecessor (Jaccard
            # ≈ 48/52 ≈ 0.92 ≥ 0.8 — a true near-dup pair)
            toks = prev_text.split()
            toks[rng.randrange(len(toks))] = vocab[rng.randrange(VOCAB)]
            text = " ".join(toks)
        else:
            toks = [vocab[rng.randrange(VOCAB)] for _ in range(TOKENS_PER_DOC - 8)]
            toks += [stop[rng.randrange(len(stop))] for _ in range(8)]
            rng.shuffle(toks)
            text = " ".join(toks)
        prev_text = text
        rows.append((d, text, "en", f"src{d % 5}", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(4).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main() -> None:
    import shutil
    import tempfile

    from trendr_data_pipeline_spark.functions.pii import redact_pii
    from trendr_data_pipeline_spark.io import read_table
    from trendr_data_pipeline_spark.operators.graph import (
        canonicalize_components,
        connected_components,
    )
    from trendr_data_pipeline_spark.plans.corpus_pipeline import (
        _PAIR_BACKENDS,
        build_training_corpus,
    )
    from trendr_data_pipeline_spark.plans.text_ops import clean_ladder

    spark = get_spark("corpus-density-bench")
    work = tempfile.mkdtemp(prefix="densbench_")
    try:
        build_corpus(spark, work)
        docs = read_table(spark, work, "documents")
        print(f"docs={docs.count()}, vocab={VOCAB}, clones ~1/{CLONE_EVERY}")

        t0 = time.time()
        kept_ids = clean_ladder(docs).filter(F.col("decision") == "keep").select("doc_id")
        kept = (
            docs.join(kept_ids, "doc_id")
            .withColumn("text", redact_pii(F.col("text")))
            .localCheckpoint(eager=True)
        )
        t_ladder = time.time() - t0
        n_kept = kept.count()
        print(f"stage 1-2 (ladder + redact): {t_ladder:.1f} s, kept={n_kept}")

        print("| stage | exact backend s | lsh backend s |")
        print("|---|---|---|")
        stage = {}
        for name, fn in sorted(_PAIR_BACKENDS.items()):
            t0 = time.time()
            pairs = fn(kept, threshold=0.8).localCheckpoint(eager=True)
            n_pairs = pairs.count()
            t_pairs = time.time() - t0
            t0 = time.time()
            labels = connected_components(pairs, nodes=kept, node_col="doc_id")
            canonical = canonicalize_components(labels).filter("is_canonical")
            n_canon = canonical.count()
            t_cc = time.time() - t0
            stage[name] = (t_pairs, t_cc, n_pairs, n_canon)
        density = stage["exact"][2] / (n_kept * (n_kept - 1) / 2)
        print(f"| pairs (n={stage['exact'][2]}, density={density:.2e}) "
              f"| {stage['exact'][0]:.1f} | {stage['lsh'][0]:.1f} |")
        print(f"| components (canonical={stage['exact'][3]}) "
              f"| {stage['exact'][1]:.1f} | {stage['lsh'][1]:.1f} |")

        full = {}
        for name in sorted(_PAIR_BACKENDS):
            t0 = time.time()
            out = build_training_corpus(
                spark, work, seq_len=SEQ_LEN, token_budget=BUDGET,
                pair_backend=name,
            ).collect()
            full[name] = (time.time() - t0, len(out), sum(r["n_tok"] for r in out))
        print(f"| full pipeline (docs selected={full['exact'][1]}, "
              f"tokens={full['exact'][2]}) | {full['exact'][0]:.1f} | {full['lsh'][0]:.1f} |")
        assert full["exact"][1] == full["lsh"][1], "backends must select identically"
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
