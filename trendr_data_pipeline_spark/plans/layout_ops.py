"""c53 — dynamic partition pruning over the 100 TB layout (r11).

``io.write_partitioned`` is the repo's day-partitioned fact layout
(the shape `lineitem`/`events`/`source_mention` would ship in at
100 TB), but until r11 no driver gate ever READ a partitioned
dataset through a dimension-driven partition filter — the layout
claim was pytest-narrated (tests/test_io_layout.py), not
plan-asserted under the driver (r10 verdict item 6). This gate
stages a day-partitioned copy of ``events`` once per process (the
c38 stage-once device; staging seconds published in the bench JSON
under ``staging_s``), then aggregates it through a join against a
filtered calendar dimension. Catalyst plans DYNAMIC partition
pruning: the dim's filter result is broadcast, and the fact scan's
``PartitionFilters`` carries a ``dynamicpruningexpression`` — only
the 4 matching day-directories of 30 are read at runtime.
``tools/plan_audit.py`` counts partitionFilters/dynamicpruning per
query so the claim is plan-asserted every round, and
tests/test_io_layout.py pins both the pruning expression and the
post-execution pruned-partition count.

At 1000-executor scale this is THE fact-table access pattern:
calendar/dimension-driven day selection must never scan the other
996 days. The oracle replays the same day predicate directly on the
unpartitioned events view — identical rows prove pruning lost
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table, write_partitioned
from .registry import register

#: staged day-partitioned events copy: abs(sf_dir) -> dataset dir
_STAGED_EVENTS: dict[str, str] = {}
#: one-time staging wall seconds per abs(sf_dir) (bench staging_s)
STAGING_SECONDS: dict[str, float] = {}
_CLEANUP_REGISTERED = False

#: day-of-month selector for the calendar dim (4 of the fixture's 30
#: January days: 3, 10, 17, 24)
_C53_DOM_MOD, _C53_DOM_EQ = 7, 3


def _reap_staged() -> None:
    import shutil

    for d in _STAGED_EVENTS.values():
        shutil.rmtree(d, ignore_errors=True)


def staged_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per process per fixture dir) the day-partitioned
    events layout and return its path."""
    import atexit
    import os
    import tempfile
    import time

    global _CLEANUP_REGISTERED
    if not _CLEANUP_REGISTERED:
        atexit.register(_reap_staged)
        _CLEANUP_REGISTERED = True
    key = os.path.abspath(sf_dir)
    if key not in _STAGED_EVENTS:
        out = tempfile.mkdtemp(prefix="events_bydaystage_")
        t0 = time.time()
        ev = read_table(spark, sf_dir, "events").withColumn(
            "day", F.to_date(F.col("ts"))
        )
        write_partitioned(ev, out, ["day"])
        STAGING_SECONDS[key] = round(time.time() - t0, 3)
        _STAGED_EVENTS[key] = out
    return _STAGED_EVENTS[key]


def calendar_dim(spark: SparkSession) -> DataFrame:
    """30-row January-2024 calendar with an explicit day-of-month
    filter — the Filter node on the dim side is what makes Catalyst
    judge the DPP subquery worthwhile (``filteringHasBenefit``)."""
    return (
        spark.range(0, 30)
        .select(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
                "day"
            )
        )
        .filter(F.dayofmonth(F.col("day")) % _C53_DOM_MOD == _C53_DOM_EQ)
    )


def pruned_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the partitioned fact to the filtered calendar dim on the
    partition column and aggregate — the plan must show the fact scan
    with ``PartitionFilters: [... dynamicpruningexpression(...)]``."""
    fact = spark.read.parquet(staged_partitioned_events(spark, sf_dir))
    dim = calendar_dim(spark)
    return (
        fact.join(F.broadcast(dim), "day")
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "c53_partition_pruned_stats",
    f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE EXTRACT(day FROM ts) % {_C53_DOM_MOD} = {_C53_DOM_EQ}
    GROUP BY 1, 2
    """,
    doc="""Dynamic-partition-pruning gate over the day-partitioned
    events layout (r11, verdict item 6): stage events partitioned by
    day once per process, aggregate through a broadcast join against
    a filtered 30-row calendar dim — Catalyst's DPP turns the dim's
    filter into a runtime ``dynamicpruningexpression`` partition
    filter on the fact scan (4 of 30 day-directories read;
    plan-audited + pinned by tests/test_io_layout.py). The oracle
    replays the day predicate on the unpartitioned view: identical
    rows prove pruning lost nothing. The fixture's 30 days all fall
    in January, so day-of-month %
    {_C53_DOM_MOD} == {_C53_DOM_EQ} selects exactly the dim's
    surviving days on both sides.""",
)
def c53_partition_pruned_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pruned_daily_stats(spark, sf_dir)
