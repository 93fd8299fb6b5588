"""Measure the BM25 df_cap lever (r9 verdict item 3 → zc42 leg).

Usage: python tools/bm25_bench.py [n ...]   (default 5000 20000 80000)

For each corpus size ``n``, builds the deterministic Zipf-vocabulary
corpus the zc42 leg runs on (``zipf_synthetic_docs`` — the df law the
parquet fixture does NOT follow; its template vocabulary has median
df = 0.77·N, where every pruning cap collapses recall, exactly as the
error bound predicts), then runs ``bm25_topk`` uncapped vs capped at
df_cap = N/2 (per-dropped-term error ≤ ln2·(k1+1) ≈ 1.52 BM25
points — the documented bound's "still meaningful" knee) and prints:

- candidate volume (Σ df over the query docs' terms) uncapped/capped
  — the quantity the inverted-index join actually materializes;
- wall time for both paths (median of ``reps``);
- recall@10 of the capped top-k against the uncapped.

SCALING.md "r10: the BM25 df_cap lever, measured" records the output.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    from pyspark.sql import functions as F

    from trendr_data_pipeline_spark.plans.text_ops import (
        bm25_topk,
        tokens,
        zipf_synthetic_docs,
    )
    from trendr_data_pipeline_spark.session import get_spark

    sizes = [int(x) for x in sys.argv[1:]] or [5_000, 20_000, 80_000]
    reps = 3
    spark = get_spark("bm25-bench")
    print("bm25 df_cap bench: zipf corpus, queries = doc_id % 100 == 0, k=10")
    for n in sizes:
        cap = n // 2
        docs = zipf_synthetic_docs(spark, n).localCheckpoint(eager=True)
        pred = F.col("doc_id") % 100 == 0

        t = docs.select(
            "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
        )
        tf = t.groupBy("doc_id", "tok").count().persist()
        dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        q = tf.filter(pred).select("tok")
        vol = q.join(dfreq, "tok").agg(F.sum("df")).first()[0]
        volc = (
            q.join(dfreq.filter(F.col("df") <= cap), "tok")
            .agg(F.sum("df"))
            .first()[0]
        )
        spark.catalog.clearCache()

        def timed(df_cap):
            runs, rows = [], None
            for _ in range(reps):
                t0 = time.time()
                rows = bm25_topk(docs, pred, k=10, df_cap=df_cap).collect()
                runs.append(time.time() - t0)
                spark.catalog.clearCache()
            return statistics.median(runs), {
                (r["query_id"], r["doc_id"]) for r in rows
            }

        t_exact, exact = timed(None)
        t_capped, capped = timed(cap)
        recall = len(capped & exact) / len(exact) if exact else 1.0
        print(
            f"n={n:>7} cap={cap:>6} candidates={volc}/{vol} "
            f"({volc / vol:.3f}x) uncapped={t_exact:6.2f}s "
            f"capped={t_capped:6.2f}s speedup={t_exact / t_capped:4.2f}x "
            f"recall@10={recall:.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
