"""Standalone-vs-in-suite probe for the r10 x-series bench anomaly
(r10 verdict item 1): time the given queries in a FRESH session that
runs nothing else, so suite-position effects (JVM code-cache / GC
pressure accumulated over a 104-query single-process bench) are
excluded by construction. Compare against (a) the same probe on the
r9 checkout (ambient attribution) and (b) the full-suite bench run
on the same day (suite-position attribution). SCALING.md "r11: the
x-series anomaly" records the output.

Usage:
    python tools/standalone_probe.py REPO_PATH SF_DIR REPS query ...

REPO_PATH is the checkout to import (this file is checkout-agnostic:
point it at a git worktree of an older round to reproduce that
round's code under today's ambient).
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def main() -> int:
    repo, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sys.path.insert(0, repo)

    from trendr_data_pipeline_spark.plans.registry import all_queries
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("standalone-probe")
    # same warmups bench.py does: parquet footer cache + Arrow workers
    import os

    from pyspark.sql import functions as F

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    _probe = F.pandas_udf(lambda s: s, "long")
    spark.range(64).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _probe(F.col("id"))
    ).count()

    qs = all_queries()
    out: dict[str, float] = {}
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.time()
            qs[name].fn(spark, sf_dir).collect()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = statistics.median(runs)
        print(f"  {name}: median {out[name]} runs {runs}", file=sys.stderr)
    print(json.dumps({"repo": repo, "sf_dir": sf_dir, "reps": reps, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
