"""Event-stream analytics over ``events`` (⊕W9 window suite, ⊕J12
as-of join, SS2/SS6/SS10 batch twins, DT7 decay).

These are the batch forms; ``streaming/`` runs the same semantics
under Structured Streaming (the driver's ``events`` table is the
replay fixture). Partition posture at 100 TB: events are
date-partitioned; every window below partitions by ``user_id`` (or
``event_type``), so the shuffle is one hash exchange; sessionization
and as-of are window functions, not self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import read_table
from ._numeric import dsum, sql_dsum
from .registry import register

# --- e01: ranking/analytic window suite (⊕W9) ---


@register(
    "e01_window_suite",
    """
    SELECT event_id, user_id, ts, value,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
           LAG(value)    OVER w AS prev_value,
           LEAD(value)   OVER w AS next_value,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e01_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / lag / lead / running sum per user — the full
    analytic surface the reference approximates with sorted Python
    lists (W1–W8). Running sums accumulate in DECIMAL (order pinned by
    (ts, event_id); exactness keeps the oracle hash stable)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrank = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    running = (
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    return ev.select(
        "event_id", "user_id", "ts", "value",
        F.row_number().over(w).alias("rn"),
        F.rank().over(wrank).alias("value_rank"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        running.alias("running_value"),
    )


# --- e02: sessionization (⊕SS10 batch twin) ---

_GAP_MIN = 30


@register(
    "e02_sessionization",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL {_GAP_MIN} MINUTES
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def e02_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min): lag + flag + running sum — the
    classic batch sessionizer; the streaming twin is
    ``session_window(ts, '30 minutes')`` (streaming/sessions.py)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > _GAP_MIN * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq")).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- e03: as-of join (⊕J12) ---


@register(
    # z-pushed r13 (RENAMES_R13): admits c62_cadence_replay into the
    # driver window; driver-signed as e03 in every window r4-r12
    "ze03_asof_last_purchase",
    """
    WITH marked AS (
        SELECT event_id, user_id, ts, event_type, value,
               LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
        FROM events
    )
    SELECT event_id, user_id, ts, last_purchase_value
    FROM marked WHERE event_type = 'click'
    """,
)
def e03_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as last(ignorenulls) over an ordered
    window: for each click, the latest prior-or-equal purchase value of
    the same user — no self-join, no range explosion (the generalized
    J12 of SURVEY §2.3)."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn(
        "last_purchase_value",
        F.last(F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True).over(w),
    )
    return marked.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "last_purchase_value"
    )


# --- e04: tumbling daily stats (SS2 batch twin) ---


@register(
    "ze04_daily_event_stats",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def e04_daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day aggregate — the batch twin of the streaming
    windowed counter (reference SS2 api_usage upsert,
    utils/api_usage.py:14-46)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- e05: exponential time-decay weighted value (DT7 at scale) ---

_DECAY_AS_OF = "2024-02-01 00:00:00"
_TAU_DAYS = 30.0


@register(
    "ze05_decayed_user_value",
    f"""
    SELECT user_id,
           CAST(SUM(CAST(value * exp(-(epoch_us(TIMESTAMP '{_DECAY_AS_OF}') - epoch_us(ts))
                                     / 86400000000.0 / {_TAU_DAYS} ) AS DECIMAL(28,6))) AS DOUBLE)
               AS decayed_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def e05_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Σ value·exp(-age/τ) per user at a pinned as_of — the engine-wide
    time-decay pattern (reference DT7 scoring.py:348-387) applied to a
    100 TB-shaped aggregation (map-side partial sums in DECIMAL)."""
    ev = read_table(spark, sf_dir, "events")
    as_of = F.lit(_DECAY_AS_OF).cast("timestamp")
    age_days = (F.unix_micros(as_of) - F.unix_micros(F.col("ts"))) / 86400000000.0
    term = (F.col("value") * F.exp(-age_days / _TAU_DAYS)).cast("decimal(28,6)")
    return ev.groupBy("user_id").agg(
        F.sum(term).cast("double").alias("decayed_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- e06: nearest-rank percentiles per type (A7 at scale) ---


@register(
    # z-pushed r13 (RENAMES_R13): admits c61_rescan_timeout_replay into
    # the driver window; driver-signed as e06 in every window r4-r12
    "ze06_value_percentiles",
    """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(FLOOR(n * 0.5) + 1 AS BIGINT) THEN value END) AS p50,
           MAX(CASE WHEN rn = CAST(FLOOR(n * 0.95) + 1 AS BIGINT) THEN value END) AS p95
    FROM ranked
    GROUP BY event_type
    """,
)
def e06_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-rank percentiles (the reference's index-into-sorted-list
    definition, A7 intelligent_classifier.py:530-535) computed WITHOUT
    collecting: row_number + count window + filter — scales to any
    group size, unlike collect_list."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == (F.floor(F.col("n") * 0.5) + 1).cast("long"), F.col("value"))
        ).alias("p50"),
        F.max(
            F.when(F.col("rn") == (F.floor(F.col("n") * 0.95) + 1).cast("long"), F.col("value"))
        ).alias("p95"),
    )


# --- e07: JSON props extraction (AM3 shape) ---


@register(
    "ze07_props_extraction",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY CAST(json_extract(props, '$.k') AS BIGINT) % 10
    """,
)
def e07_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access at the edge (reference AM3/from_json usage):
    get_json_object stays JVM-side; grouping on the extracted value."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- e08: bucketed interval (range) join ---


@register(
    # z-pushed r13 (RENAMES_R13): admits c60_seed_cells into the
    # driver window; driver-signed as e08 in every window r4-r12
    "ze08_interval_join",
    f"""
    SELECT a.event_id, a.user_id,
           CAST(COUNT(b.event_id) AS BIGINT) AS n_follow,
           COALESCE({sql_dsum('b.value')}, 0.0) AS sum_value,
           CAST(COUNT(CASE WHEN b.event_type = 'error' THEN 1 END) AS BIGINT) AS n_errors
    FROM events a LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id, a.user_id
    """,
)
def e08_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (⊕ the interval sibling of e03's as-of join): for
    each purchase, the same user's events in the following 6 hours.
    Spark has no native range-join strategy, so the plan is the
    bucketed form — anchors explode to the two 6 h buckets their
    window overlaps, probes carry their single bucket, and the join is
    a plain equi-join on (user_id, bucket) refined by the exact
    interval predicate (``operators/temporal.bucketed_interval_join``)
    — no per-key cartesian blow-up on hot users."""
    from ..operators.temporal import bucketed_interval_join

    ev = read_table(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = bucketed_interval_join(
        anchors, ev.select("event_id", "user_id", "ts", "event_type", "value"),
        on="user_id", window_seconds=6 * 3600,
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("p_event_id").alias("n_follow"),
        F.coalesce(dsum(F.col("p_value")), F.lit(0.0)).alias("sum_value"),
        F.count(F.when(F.col("p_event_type") == "error", 1)).alias("n_errors"),
    )


# --- e09: hypertable-style time-hierarchy rollup ---


@register(
    # z-pushed r13 (RENAMES_R13): admits c59_radius_join into the
    # driver window; driver-signed as e09 in every window r4-r12
    "ze09_time_rollup",
    f"""
    SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           COALESCE(CAST(EXTRACT(hour FROM ts) AS BIGINT), -1) AS hour,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), EXTRACT(hour FROM ts))
    """,
)
def e09_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: (day, hour) →
    (day) → grand total in ONE pass via ROLLUP — the multi-resolution
    time bucketing a timeseries store materializes as cascaded
    aggregates. Map-side partial aggregation collapses the raw stream
    before the shuffle; at 100 TB the same query lands on
    date-partitioned parquet and the day level prunes partitions."""
    ev = read_table(spark, sf_dir, "events")
    rolled = (
        ev.withColumn("day_ts", F.date_trunc("day", F.col("ts")))
        .withColumn("hour_n", F.hour("ts").cast("long"))
        .rollup("day_ts", "hour_n")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    return rolled.select(
        F.coalesce(F.date_format("day_ts", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
        F.coalesce(F.col("hour_n"), F.lit(-1)).alias("hour"),
        "n_events",
        "total_value",
        "n_users",
    )
