"""Rounds-vs-merges evidence for BPE at production depth (r6 verdict
item 2).

Two learners over the sf0.1 documents corpus at the SentencePiece-style
word-trigram dictionary grain (space as a symbol — the fixture's
31-word vocabulary caps word-internal BPE far below production depth;
the trigram dictionary carries ~27k entries / ~394k learnable merges):

- ``learn_bpe_merges`` (distributed batched rounds): measures how the
  provably-greedy-equivalent batch prefix actually amortizes at depth —
  the acceptance ratio, rounds, and wall per merge target;
- ``learn_bpe_merges_fast`` (dictionary collapse + in-memory exact
  greedy): the production posture — one Spark job to build the
  dictionary, then 30k merges in seconds on the driver.

Both produce IDENTICAL merge tables (asserted here on the common
prefix, and property-pinned in tests/test_bpe.py).

Usage: python tools/bpe_depth_bench.py [sf_dir]
Prints one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NGRAM = 3
DIST_TARGET = 1024
DIST_BATCHES = (64, 256)
FAST_TARGETS = (1024, 8192, 30000)
CHECKPOINTS = (40, 128, 256, 512, 1024)


def main() -> None:
    from trendr_data_pipeline_spark.operators.bpe import (
        learn_bpe_merges,
        learn_bpe_merges_fast,
    )
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("bpe-depth-bench")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()  # warm

    out = {"sf_dir": SF_DIR, "ngram": NGRAM, "distributed": {}, "fast": {}}

    fast_tables = {}
    for n in FAST_TARGETS:
        t0 = time.time()
        merges, _ = learn_bpe_merges_fast(docs, num_merges=n, ngram=NGRAM)
        wall = round(time.time() - t0, 2)
        fast_tables[n] = merges
        out["fast"][n] = {"merges": len(merges), "wall_s": wall}
        print(f"fast n={n}: {len(merges)} merges in {wall}s", file=sys.stderr)

    for batch in DIST_BATCHES:
        log: list[tuple[int, int]] = []
        t0 = time.time()
        merges, _ = learn_bpe_merges(
            docs, num_merges=DIST_TARGET, batch=batch, ngram=NGRAM,
            round_log=log,
        )
        wall = round(time.time() - t0, 1)
        # rounds needed to reach each checkpoint (cumulative acceptance)
        rounds_at = {}
        cum = 0
        for i, (acc, _k) in enumerate(log, start=1):
            cum += acc
            for cp in CHECKPOINTS:
                if cp not in rounds_at and cum >= cp:
                    rounds_at[cp] = i
        out["distributed"][batch] = {
            "merges": len(merges),
            "rounds": len(log),
            "wall_s": wall,
            "rounds_at": rounds_at,
            "acceptance_per_round": round(len(merges) / max(1, len(log)), 2),
        }
        # greedy-equivalence cross-check against the in-memory learner
        ref = fast_tables[max(FAST_TARGETS)][: len(merges)]
        assert merges == ref, f"batch={batch} diverged from exact greedy"
        print(f"dist batch={batch}: {len(merges)} merges, {len(log)} rounds, "
              f"{wall}s (tables identical to fast)", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
