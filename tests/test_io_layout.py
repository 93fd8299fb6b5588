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
