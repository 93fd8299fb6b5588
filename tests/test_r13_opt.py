"""Focused pins for the r13 optimization-round internals changes.

O1 — glibc allocator tuning (`_malloctune`): applied at package import,
opt-out honored. O2 — the replay harness pins
``spark.sql.streaming.noDataMicroBatches.enabled=false`` for the replay
query's lifetime; the session value must be RESTORED afterwards (a leak
would silently change watermark semantics for the other streaming
harnesses sharing the session).
"""

from __future__ import annotations

import subprocess
import sys

from pyspark.sql import functions as F


def test_malloctune_applied_at_package_import():
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import trendr_data_pipeline_spark as p;"
            "from trendr_data_pipeline_spark import _malloctune as m;"
            "print(m._applied)",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    # glibc on this box: the import hook must have applied the tunables
    assert out.stdout.strip() == "True"


def test_malloctune_opt_out_via_env():
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import os; os.environ['SPARK_GRAFT_MALLOC_THRESHOLD']='0';"
            "import trendr_data_pipeline_spark as p;"
            "from trendr_data_pipeline_spark import _malloctune as m;"
            "print(m._applied, m.tune_malloc())",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    assert out.stdout.strip() == "False False"


def test_apply_empty_snapshot_diff_is_true_noop(spark, tmp_path):
    """r13: the single-swap combined refresh must keep both old verbs'
    no-op contract — an empty diff publishes nothing (no swap, same
    inodes), so a cron cycle over an unchanged corpus never rewrites
    the artifact."""
    import os

    from trendr_data_pipeline_spark.io import read_table
    from trendr_data_pipeline_spark.operators.ingestion import snapshot_diff
    from trendr_data_pipeline_spark.operators.text_index import (
        apply_snapshot_diff_to_index,
        write_minhash_index,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "idx")
    write_minhash_index(docs, idx)

    def inodes(root):
        out = {}
        for r, _d, fs in os.walk(root):
            for f in fs:
                p = os.path.join(r, f)
                out[os.path.relpath(p, root)] = os.stat(p).st_ino
        return out

    before = inodes(idx)
    d = snapshot_diff(docs, docs, id_col="doc_id", content_col="text")
    assert d.count() == 0
    apply_snapshot_diff_to_index(d, docs, idx)
    assert inodes(idx) == before


def test_replay_waves_restores_session_confs(spark):
    from trendr_data_pipeline_spark.plans.pipeline_ops import _replay_waves

    sp_before = spark.conf.get("spark.sql.shuffle.partitions")
    ndmb_before = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled"
    )

    waves = [
        spark.createDataFrame([(i, f"v{i}") for i in rng], "k int, v string")
        for rng in (range(3), range(3, 5))
    ]
    out = _replay_waves(
        spark,
        waves,
        lambda s: s.select("k", "v"),
        "r13opt_test_",
        "r13opt_restore_check",
        shuffle_partitions="4",
    )
    assert sorted(r.k for r in out.collect()) == [0, 1, 2, 3, 4]
    assert spark.conf.get("spark.sql.shuffle.partitions") == sp_before
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == ndmb_before
    )
