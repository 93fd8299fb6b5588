"""Partitioned-dataset layout: writes land in partition directories
and a partition-column filter prunes the scan (PartitionFilters in
the plan, only matching files read)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from trendr_data_pipeline_spark.io import read_table, write_partitioned


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


_AQE_WRAPPERS = {
    "AdaptiveSparkPlanExec", "ResultQueryStageExec",
    "ShuffleQueryStageExec", "BroadcastQueryStageExec",
    "TableCacheQueryStageExec",
}


def _walk_jplan(node):
    """Yield every node of an executed plan, descending through AQE
    wrapper nodes (QueryStageExec hides its subtree behind .plan(),
    AdaptiveSparkPlanExec behind .executedPlan() — collectLeaves()
    stops AT the wrappers, which is why a naive walk sees no scan)."""
    yield node
    name = node.getClass().getSimpleName()
    if name in _AQE_WRAPPERS:
        for attr in ("plan", "executedPlan"):
            try:
                yield from _walk_jplan(getattr(node, attr)())
                return
            except Exception:  # noqa: BLE001 — wrapper variant without attr
                continue
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_jplan(ch.apply(i))


def _partitions_read_metric(df) -> int:
    """The partitioned file scan's runtime ``numPartitions`` SQL
    metric (the Spark-UI "number of partitions read"), read off the
    EXECUTED plan via py4j — the only place runtime DPP's effect is
    visible (plan text shows the pruning expression, not its
    result). The frame must already be materialized."""
    plan = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    for node in _walk_jplan(plan):
        if "FileSourceScan" in node.getClass().getSimpleName():
            m = node.metrics()
            if m.contains("numPartitions"):
                return m.apply("numPartitions").value()
    raise AssertionError("no partitioned scan with a numPartitions metric")


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    ev = read_table(spark, SMOKE_SF, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["day"])

    days = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert len(days) > 1  # the fixture spans a month

    back = spark.read.parquet(path)
    one_day = days[0].split("=", 1)[1]
    q = back.filter(F.col("day") == one_day)

    plan = _plan(q)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]

    # row equality against the unpartitioned source for that day
    want = ev.filter(F.col("day") == one_day).count()
    assert q.count() == want and want > 0

    # full-table row equality (no rows lost in the layout)
    assert back.count() == ev.count()


def test_dynamic_partition_pruning_via_dim_join(spark):
    """c53 (r11, r10 verdict item 6): a dimension-driven day
    selection over the partitioned layout must prune at RUNTIME —
    the fact scan's PartitionFilters carries a
    dynamicpruningexpression fed by the filtered calendar dim, and
    the executed scan reads only the dim's surviving
    day-directories. This is the 100 TB fact access pattern: the
    day set comes from a JOIN, so static pruning cannot apply."""
    from trendr_data_pipeline_spark.plans.layout_ops import (
        calendar_dim,
        pruned_daily_stats,
        staged_partitioned_events,
    )

    df = pruned_daily_stats(spark, SMOKE_SF)
    plan = _plan(df)
    assert "dynamicpruningexpression" in plan, plan

    rows = df.collect()
    got_days = {r["day"].isoformat() for r in rows}
    dim_days = {r["day"].isoformat() for r in calendar_dim(spark).collect()}
    # fixture ends Jan 30, so every selected dim day has events
    assert got_days == {d for d in dim_days if d <= "2024-01-30"}

    # executed-plan evidence: the scan's runtime SQL metric counts
    # only the dim's surviving day-directories, not the layout's 30
    path = staged_partitioned_events(spark, SMOKE_SF)
    n_dirs = len([d for d in os.listdir(path) if d.startswith("day=")])
    assert n_dirs > len(got_days)  # 30 directories, ~4 selected
    n_read = _partitions_read_metric(df)
    assert n_read == len(got_days), (n_read, len(got_days), n_dirs)

    # value parity with the unpartitioned path
    ev = read_table(spark, SMOKE_SF, "events")
    want = (
        ev.withColumn("day", F.to_date("ts"))
        .filter(F.dayofmonth(F.col("day")) % 7 == 3)
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want.collect()))


def test_bucketed_join_plan_is_exchange_free(spark):
    """c54 (r11): orders and customer co-bucketed on the customer key
    must join AND aggregate with ZERO Exchange nodes — the scans'
    HashPartitioning satisfies the SMJ's distribution and the
    per-customer aggregate's clustering, so the only network cost at
    1000 executors is the scans themselves. Also pins value parity
    with the plain unbucketed join (the layout must change the plan,
    never the rows)."""
    from trendr_data_pipeline_spark.plans.layout_ops import (
        bucketed_spend_per_customer,
    )

    df = bucketed_spend_per_customer(spark, SMOKE_SF)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    got = sorted(map(tuple, df.collect()))
    o = read_table(spark, SMOKE_SF, "orders")
    c = read_table(spark, SMOKE_SF, "customer")
    want = sorted(
        map(
            tuple,
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(o.o_custkey.alias("custkey"), "c_name")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
                .cast("double")
                .alias("total_spend"),
            )
            .collect(),
        )
    )
    assert got == want
