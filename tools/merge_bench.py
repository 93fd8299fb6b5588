"""Measured evidence for the partitioned-merge-sink degeneracy fix
(r5 verdict "What's wrong" #1): per-batch upsert wall time and rewrite
volume under UNIFORM-KEY batches of growing distinct-key count, with

- the r5 behavior reproduced by coarse files (`max_records_per_file`
  large → one file per bucket, so every affected bucket is fully
  rewritten), vs
- the r6 file-pruned layout (small range-disjoint files; only files
  whose footer [min,max] contains a batch key are rewritten, the rest
  hard-linked).

Uniform keys are the degenerate case the verdict called out: with B
buckets, any batch of n >> B distinct keys touches ALL buckets, so the
r5 sink rewrote the whole table per batch. With file pruning the
rewrite volume is ~min(n · rows_per_file, table).

Usage: python tools/merge_bench.py          (500k-row crossover table)
       python tools/merge_bench.py --big    (r7: 5M rows / 128MB-file
       posture — footer-pass cost measured separately)
Both print markdown tables for SCALING.md.
"""

from __future__ import annotations

import datetime as dt
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from trendr_data_pipeline_spark.session import get_spark  # noqa: E402
from trendr_data_pipeline_spark.streaming.jobs import (  # noqa: E402
    _pruned_bucket_upsert,
)

TABLE_ROWS = 500_000
BUCKETS = 64
FINE_ROWS_PER_FILE = 500  # ~16 range-disjoint files per bucket
COARSE_ROWS_PER_FILE = 1 << 20  # one file per bucket == the r5 layout
BATCH_SIZES = [1, 10, 100, 1_000, 10_000]

# --big (r6 verdict item 8): one scale step up — 5M rows at a
# 128MB-file posture (10k rows/file here standing in for the
# rows-per-128MB of a real table; ~8 range-disjoint files per
# bucket). The claim under test: the per-batch footer pass scales
# with the AFFECTED buckets' file count, not the table, so the
# constant stays sublinear as the table grows.
BIG_TABLE_ROWS = 5_000_000
BIG_ROWS_PER_FILE = 10_000
BIG_BATCH_SIZES = [1, 100, 10_000]


def build_table(spark, target: str, rows_per_file: int, bucket_of,
                table_rows: int = TABLE_ROWS) -> None:
    t0 = dt.datetime(2025, 1, 1)
    base = spark.range(table_rows).select(
        F.format_string("k%08d", F.col("id")).alias("k"),
        F.lit(t0).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    _pruned_bucket_upsert(base, target, "k", "ts", bucket_of, 0, rows_per_file)


def batch_of(spark, n: int, seed: int, table_rows: int = TABLE_ROWS):
    t1 = dt.datetime(2025, 6, 1)
    # uniform WITHOUT clustering: hash-spread ids across the key space
    return (
        spark.range(table_rows)
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)))
        .limit(n)
        .select(
            F.format_string("k%08d", F.col("id")).alias("k"),
            F.lit(t1).alias("ts"),
            (F.col("id") + 0.5).cast("double").alias("v"),
        )
    )


def dir_bytes(p: str) -> int:
    return sum(f.stat().st_size for f in Path(p).rglob("*.parquet"))


def inode_set(p: str) -> set:
    return {f.stat().st_ino for f in Path(p).rglob("*.parquet")}


def main() -> None:
    spark = get_spark("merge-bench")
    bucket_of = F.pmod(F.xxhash64(F.col("k")), F.lit(BUCKETS))
    if "--big" in sys.argv:
        run_big(spark, bucket_of)
        return
    print(f"table={TABLE_ROWS} rows, buckets={BUCKETS}")
    print("| distinct batch keys | layout | batch wall s | files rewritten | rows rewritten (est) |")
    print("|---|---|---|---|---|")
    for label, rpf in (("r5 (1 file/bucket)", COARSE_ROWS_PER_FILE), ("r6 file-pruned", FINE_ROWS_PER_FILE)):
        for n in BATCH_SIZES:
            work = tempfile.mkdtemp(prefix="mergebench_")
            target = f"{work}/tbl"
            try:
                build_table(spark, target, rpf, bucket_of)
                before = inode_set(target)
                nfiles_before = len(before)
                b = batch_of(spark, n, seed=n).localCheckpoint()  # stage input outside the timer
                t0 = time.time()
                _pruned_bucket_upsert(b, target, "k", "ts", bucket_of, 1, rpf)
                wall = time.time() - t0
                after = inode_set(target)
                rewritten = len(after - before)
                rows_per_file = TABLE_ROWS / max(1, nfiles_before)
                print(
                    f"| {n} | {label} | {wall:.2f} | {rewritten}/{len(after)} |"
                    f" ~{int(min(rewritten * rows_per_file, TABLE_ROWS))} |"
                )
            finally:
                shutil.rmtree(work, ignore_errors=True)


def run_big(spark, bucket_of) -> None:
    print(f"table={BIG_TABLE_ROWS} rows, buckets={BUCKETS}, "
          f"rows/file={BIG_ROWS_PER_FILE} (128MB posture)")
    print("| distinct batch keys | batch wall s | footer pass s |"
          " files rewritten | rows rewritten (est) |")
    print("|---|---|---|---|---|")
    import trendr_data_pipeline_spark.streaming.jobs as J

    for n in BIG_BATCH_SIZES:
        work = tempfile.mkdtemp(prefix="mergebench_big_")
        target = f"{work}/tbl"
        try:
            build_table(spark, target, BIG_ROWS_PER_FILE, bucket_of,
                        table_rows=BIG_TABLE_ROWS)
            before = inode_set(target)
            b = batch_of(spark, n, seed=n,
                         table_rows=BIG_TABLE_ROWS).localCheckpoint()
            footer = [0.0]
            orig = J._file_key_ranges

            def timed(paths, key):
                t = time.time()
                out = orig(paths, key)
                footer[0] += time.time() - t
                return out

            J._file_key_ranges = timed
            try:
                t0 = time.time()
                _pruned_bucket_upsert(b, target, "k", "ts", bucket_of, 1,
                                      BIG_ROWS_PER_FILE)
                wall = time.time() - t0
            finally:
                J._file_key_ranges = orig
            after = inode_set(target)
            rewritten = len(after - before)
            rows_per_file = BIG_TABLE_ROWS / max(1, len(before))
            print(
                f"| {n} | {wall:.2f} | {footer[0]:.3f} |"
                f" {rewritten}/{len(after)} |"
                f" ~{int(min(rewritten * rows_per_file, BIG_TABLE_ROWS))} |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
