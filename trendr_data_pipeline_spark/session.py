"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` (single JVM); the configuration is
nevertheless written for a multi-executor cluster: AQE on (runtime
coalescing, skew-join splitting), Arrow on (pandas-UDF hot path),
UTC session timezone (oracle comparability), shuffle partitions sized
to the parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "trendr-spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    The conf below is the 100 TB posture scaled to local mode:

    - ``spark.sql.adaptive.enabled``: runtime re-planning — coalesce
      post-shuffle partitions, convert to broadcast when a side turns
      out small, split skewed partitions (replaces the reference's
      manual H3 saturation splitting as a generic mechanism).
    - ``spark.sql.shuffle.partitions``: ~cores locally; on a real
      cluster this is a floor — AQE coalesces down from it.
    - Arrow execution for every pandas UDF (the only Python hot paths
      are parity-critical text/geo functions).
    - UTC timezone so timestamp semantics match the DuckDB oracle.
    """
    n = str(cpus or _DEF_CPUS)
    # allocator env for the JVM we are about to launch (and thus the
    # Python workers it spawns): same rationale/values as
    # _malloctune.tune_malloc (which covers processes already running);
    # glibc reads these at process start
    thresh = os.environ.get("SPARK_GRAFT_MALLOC_THRESHOLD", str(256 * 1024 * 1024))
    if thresh != "0":
        os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", thresh)
        os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", thresh)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # naive parquet timestamps are UTC instants here (oracle parity),
        # not NTZ — Spark 4 flipped the inference default
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
