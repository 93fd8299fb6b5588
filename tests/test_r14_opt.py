"""Round-14 optimization pins.

1. ``_replay_events`` (the c05/c18/zp02/zp08 synchronous harness) sets
   ``spark.sql.streaming.noDataMicroBatches.enabled=false`` for the
   replay query's lifetime — measured at sf0.01: the three
   complete-mode aggregates run exactly 1 micro-batch either way, and
   c05's stream-stream join drops its trailing eviction-only no-data
   batch (2 → 1) with identical sink rows. The conf (and the
   shuffle-partitions pin) must be RESTORED afterwards, or the leak
   would change the watermark semantics of other streaming harnesses
   in the same session (the r13 _replay_waves contract, applied here).
2. ``cadence_gated_append`` fails loudly on null timestamps (r13
   ADVICE: the numpy rewrite would otherwise map NaT to int64-min and
   silently emit/drop the row while poisoning the stored last_ts).
3. ``embedding_near_dup_join`` rejects ``corpus_extra_cols`` that
   collide with its internal column names (r13 ADVICE).
"""

from __future__ import annotations

import pytest


def test_replay_events_restores_session_confs(spark):
    from trendr_data_pipeline_spark.plans.pipeline_ops import _replay_events
    from trendr_data_pipeline_spark.streaming import jobs

    sp_before = spark.conf.get("spark.sql.shuffle.partitions")
    ndmb_before = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled"
    )
    out = _replay_events(
        spark,
        "/root/testdata/sf0.001",
        jobs.daily_usage_counters,
        "r14opt_restore_check",
    )
    assert out.count() > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == sp_before
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == ndmb_before
    )


def test_cadence_state_fn_raises_on_null_ts(spark):
    """Drive the real streaming query over a wave containing a null
    timestamp: the state function must fail the query loudly, not emit
    or drop the row silently."""
    from pyspark.sql import functions as F

    from trendr_data_pipeline_spark.plans.pipeline_ops import _replay_waves
    from trendr_data_pipeline_spark.streaming.jobs import cadence_gated_append

    wave = spark.createDataFrame(
        [(1, "cad", 10, 1_700_000_000, 1.0), (1, "cad", 11, None, 2.0)],
        "user_id long, event_type string, event_id long, ts_s long, value double",
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.timestamp_seconds("ts_s").alias("ts"),
        "value",
    )
    with pytest.raises(Exception, match="null ts"):
        _replay_waves(
            spark,
            [wave],
            lambda s: cadence_gated_append(s, interval_days=7.0),
            "r14opt_nat_",
            "r14opt_nat_check",
            shuffle_partitions="2",
        ).collect()


def test_near_dup_join_rejects_reserved_extra_cols(spark):
    from trendr_data_pipeline_spark.operators.similarity import (
        embedding_near_dup_join,
    )

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id long, embedding array<double>"
    ).withColumn("c_id", F.lit(1))
    with pytest.raises(ValueError, match="corpus_extra_cols"):
        embedding_near_dup_join(
            df, df, 0.9, dim=4, corpus_extra_cols=("c_id",)
        )
