"""IVFPQ recall-vs-nprobe curve at the x24 operating point (r6 verdict
item 5): shows the serving knob works the way FAISS users tune it —
probe more cells, recover more of the brute-force top-k, pay a
proportionally larger candidate scan.

Setting: the registry's x24 production point (nlist=16, m=8, ksub=16,
candidates=100, k=10 — 32× compression) on the sf embeddings fixture
(isotropic vectors: the WORST case for any cell-pruned ANN; clustered
real embeddings recall far higher at the same nprobe). Recall =
|ivfpq ∩ bruteforce| / |bruteforce| over every-100th-id queries.

Usage: python tools/ivfpq_recall_bench.py [sf_dir] [candidates]
(the candidates sweep separates the ADC-resolution loss from the
candidate-cut loss: at nprobe=nlist the probe admits everything, so
residual recall shortfall is ADC ranking quality alone)
Prints one JSON line; the table lands in SCALING.md and the
monotonicity pin in tests/test_dedup_similarity.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CANDIDATES = int(sys.argv[2]) if len(sys.argv) > 2 else 100
NPROBES = (1, 2, 4, 8, 16)


def main() -> None:
    from pyspark.sql import functions as F

    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivfpq_topk,
    )
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("ivfpq-recall-bench")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(queries, emb, k=10).collect()
    }
    curve = {}
    for nprobe in NPROBES:
        t0 = time.time()
        got = ivfpq_topk(
            queries, emb, k=10, nlist=16, nprobe=nprobe, m=8, ksub=16,
            candidates=CANDIDATES,
        ).collect()
        hits = sum(1 for r in got if (r["query_id"], r["neighbor_id"]) in truth)
        curve[nprobe] = {
            "recall": round(hits / max(1, len(truth)), 4),
            "wall_s": round(time.time() - t0, 2),
        }
        print(f"nprobe={nprobe}: recall={curve[nprobe]['recall']}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "k": 10, "nlist": 16, "m": 8,
                      "ksub": 16, "candidates": CANDIDATES, "curve": curve}))


if __name__ == "__main__":
    main()
