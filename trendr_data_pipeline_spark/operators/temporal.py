"""Temporal join operators (⊕ SURVEY §2.3 family: the as-of join
lives in ``plans/events_ops.e03`` as an ordered-window form; this
module holds the general interval/range join).

Spark has no native range-join optimization (Databricks' range-join
hint is not in OSS), so a naive ``a.ts < b.ts <= a.ts + Δ`` condition
on a shuffled join degenerates to a per-key cartesian filter — fine
for equi-sparse keys, catastrophic for hot keys. The scale-safe form
is the classic *bucketed* interval join: quantize time into buckets of
the interval width, explode the anchor side to the (at most two)
buckets its window overlaps, equi-join on (key, bucket), then refine
with the exact interval predicate. Shuffle volume is O(rows·2) with
equi-join parallelism on (key, bucket) — hot keys spread across their
time buckets instead of landing on one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    anchors: DataFrame,
    probes: DataFrame,
    on: str,
    anchor_ts: str = "ts",
    probe_ts: str = "ts",
    window_seconds: int = 3600,
    how: str = "left",
) -> DataFrame:
    """Join each anchor row to every probe row with the same ``on`` key
    and ``anchor.ts < probe.ts <= anchor.ts + window``.

    Probe columns come back prefixed ``p_``. The anchor side explodes
    to the two interval-width buckets its window can overlap; probes
    are assigned their single bucket; the join is a plain equi-join on
    (key, bucket) with the exact predicate as a post-filter. With
    ``how='left'`` anchors with no probe in the window survive with
    null probe columns (aggregate with count/coalesce downstream).
    """
    win_us = F.lit(int(window_seconds) * 1_000_000)
    bucket_of = lambda c: (F.unix_micros(F.col(c)) / win_us).cast("long")  # noqa: E731

    a = anchors.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket_of(anchor_ts), bucket_of(anchor_ts) + F.lit(1))),
    )
    p = probes.select(
        F.col(on).alias("_p_key"),
        F.col(probe_ts).alias("_p_ts"),
        *[
            F.col(c).alias(f"p_{c}")
            for c in probes.columns
            if c not in (on, probe_ts)
        ],
    ).withColumn("_bucket", (F.unix_micros(F.col("_p_ts")) / win_us).cast("long"))

    in_window = (F.col("_p_ts") > F.col(anchor_ts)) & (
        F.unix_micros(F.col("_p_ts")) <= F.unix_micros(F.col(anchor_ts)) + win_us
    )
    joined = a.join(
        p,
        (F.col(on) == F.col("_p_key")) & (a["_bucket"] == p["_bucket"]) & in_window,
        "inner",
    ).drop("_bucket", "_p_key")

    if how == "inner":
        return joined.withColumnRenamed("_p_ts", f"p_{probe_ts}")
    # left semantics: re-attach anchors that matched nothing. The
    # matched set is keyed by the anchor's full row; using a left join
    # directly would keep per-bucket duplicates of unmatched anchors
    # (an anchor explodes to 2 buckets), so unmatched anchors are
    # recovered with an anti join instead. The anti-join condition is
    # null-safe (eqNullSafe per column): a name-list equality join
    # would never match an anchor row carrying a NULL in any column,
    # re-emitting matched anchors as spurious unmatched rows.
    matched = joined.withColumnRenamed("_p_ts", f"p_{probe_ts}")
    matched_keys = matched.select(*anchors.columns).distinct().alias("_m")
    anti_cond = None
    for c in anchors.columns:
        term = F.col(f"_a.`{c}`").eqNullSafe(F.col(f"_m.`{c}`"))
        anti_cond = term if anti_cond is None else (anti_cond & term)
    unmatched = anchors.alias("_a").join(matched_keys, anti_cond, "left_anti")
    for c in matched.columns:
        if c not in anchors.columns:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(matched.schema[c].dataType))
    return matched.unionByName(unmatched)
