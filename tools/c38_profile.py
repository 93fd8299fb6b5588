"""Stage-level wall-time breakdown of the c38 release cycle (r13
optimization round, guide §1: measure first).

Runs the cycle's stages one materialization at a time against the same
staged-v1 + hardlink-clone posture bench.py measures, printing seconds
per stage for REPS repetitions. Usage:

    python tools/c38_profile.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from trendr_data_pipeline_spark.io import read_table
    from trendr_data_pipeline_spark.plans.dedup_ops import v2_snapshot
    from trendr_data_pipeline_spark.plans.release_ops import _staged_v1_index
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("c38-profile")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    def t(label, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"  {label:34s} {dt:7.2f}s")
        return out, dt

    for rep in range(reps):
        print(f"rep {rep}: ")
        from trendr_data_pipeline_spark.operators.ingestion import snapshot_diff
        from trendr_data_pipeline_spark.operators.release import (
            _screen_and_coordinates,
        )
        from trendr_data_pipeline_spark.operators.text_index import (
            apply_snapshot_diff_to_index,
        )

        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        v2 = v2_snapshot(docs)
        (idx, _) = t("stage_v1 (clone only after 1st)", lambda: _staged_v1_index(spark, sf_dir))
        diff = snapshot_diff(docs, v2, id_col="doc_id", content_col="text")
        diff = diff.persist()
        t("diff materialize (count)", lambda: diff.count())
        t("apply_snapshot_diff_to_index", lambda: apply_snapshot_diff_to_index(
            diff, v2, idx, id_col="doc_id", text_col="text"))
        out, _ = t("screen+coords build", lambda: _screen_and_coordinates(
            diff, v2, idx, 0.8, 8, "doc_id", "text", None))
        t("screen+coords collect", lambda: out.collect())
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
