"""Recall-vs-selectivity for filtered ANN (⊕M7): how production-nprobe
IVF recall behaves as the metadata filter gets more selective — the
curve vector-DB users tune against (a more selective filter spreads
the true top-k over more cells, so recall can sag at fixed nprobe;
the fix is raising nprobe with selectivity, same knob as always).

Usage: python tools/filtered_ann_bench.py [sf_dir]
Prints one row per predicate: selectivity, recall@10 of filtered IVF
(nlist=16, nprobe=4 — the x02 production shape) against the filtered
brute force, and recall at nprobe=8 to show the knob works.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("filtered-ann-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from trendr_data_pipeline_spark.io import read_table
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    preds = [
        ("none", None),
        ("label IN (0,1)", F.col("label").isin(0, 1)),
        ("label = 1", F.col("label") == 1),
        ("vec_id % 10 = 0", F.col("vec_id") % 10 == 0),
        ("vec_id % 20 = 0", F.col("vec_id") % 20 == 0),
    ]
    # both columns are recall@10; 4/8 are the nprobe settings
    print(f"{'predicate':>16} {'sel':>6} {'r10@np4':>9} {'r10@np8':>9}")
    for name, pred in preds:
        sel = (emb.filter(pred).count() / n) if pred is not None else 1.0
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk_bruteforce(queries, emb, k=10, where=pred).collect()
        }
        row = [name, f"{sel:.2f}"]
        for nprobe in (4, 8):
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_topk(
                    queries, emb, k=10, nlist=16, nprobe=nprobe, where=pred
                ).collect()
            }
            row.append(f"{len(got & truth) / max(len(truth), 1):.3f}")
        print(f"{row[0]:>16} {row[1]:>6} {row[2]:>9} {row[3]:>9}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
