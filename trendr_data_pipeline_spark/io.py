"""Parquet IO layer.

The reference's storage edge is PostgREST with pushed-down predicates
(reference ``utils/database.py:60-66``); here the edge is columnar
parquet and Catalyst does the pushdown (column pruning + predicate
pushdown reach the scan automatically — verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).

At 100 TB the same API reads partitioned datasets: fact tables
(``lineitem``, ``events``, ``source_mention``) are expected to be
date-partitioned directories and dimensions are small single files —
``read_table`` is agnostic, partition pruning happens in Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Dimension tables small enough to broadcast at any realistic scale.
BROADCAST_TABLES = frozenset({"region", "nation", "source_catalog", "city_profiles"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Schema comes from parquet footers (exact);
    the declared StructType in ``schemas.py`` is the contract tests assert
    against, not an inference override.

    ``events.ts`` is physically TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; we read it as long (legacy conf) and floor-divide to
    micros — the same truncation DuckDB applies, so oracle comparisons
    agree."""
    # defensive: oracle comparability requires UTC timestamp semantics
    # even when the caller's session (e.g. the driver's) didn't pin it;
    # session timezone is runtime-settable
    _ensure_session_conf(spark)
    if name in _NANO_TS_TABLES:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        for f in df.schema.fields:
            if f.name in _NANO_TS_COLS and f.dataType.simpleString() == "bigint":
                # integer division — going through double would lose
                # precision beyond 2^53 ns and shift timestamps by 1 µs
                df = df.withColumn(f.name, F.expr(f"timestamp_micros({f.name} div 1000)"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


#: tables whose timestamp columns are nanosecond-precision in parquet
_NANO_TS_TABLES = frozenset({"events"})
_NANO_TS_COLS = frozenset({"ts"})


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Repartition a DataFrame that arrived under-parallel (the test
    fixtures are single-row-group parquet files → one input partition,
    so every downstream stage would run on one core). Only shuffles
    when the current partition count is well below the target — on
    properly laid-out multi-file data this is a no-op. Use before
    CPU-heavy per-row work (UDF fan-out, explode joins)."""
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def _ensure_session_conf(spark: SparkSession) -> None:
    """Pin the runtime-settable confs correctness and performance
    depend on, for sessions we did not build (the external driver's):
    UTC timestamps (oracle comparability), right-sized shuffle
    partitions instead of the 200 default, AQE."""
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:  # noqa: BLE001 — unset: resolver validates defaults
        tz = None
    if tz != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
            )
    except Exception:  # noqa: BLE001
        pass
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    from . import schemas

    for n in names or list(schemas.GENERIC):
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)
