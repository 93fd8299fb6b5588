"""Physical-plan audit: for every registered query, report scan
pushdown (PushedFilters / ReadSchema pruning), join strategies, and
whole-stage-codegen coverage. The per-operator scale notes live in
SCALING.md; this tool is the evidence.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from trendr_data_pipeline_spark.plans.registry import all_queries
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:  # noqa: BLE001
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            try:
                df = q.fn(spark, sf_dir)
                with redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: ERROR {ex}")
                continue
        n_scans = plan.count("Scan parquet")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        shj = plan.count("ShuffledHashJoin")
        bnl = plan.count("BroadcastNestedLoopJoin")
        exch = plan.count("Exchange")
        wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widest = max((s.count(",") + 1 for s in schemas), default=0)
        print(
            f"{name}: scans={n_scans} pushedFilters={pushed} "
            f"joins[bhj={bhj} smj={smj} shj={shj} bnl={bnl}] "
            f"exchanges={exch} codegen={wsc} widestScan={widest}cols"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
