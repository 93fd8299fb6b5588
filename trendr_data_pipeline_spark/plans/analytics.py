"""Pivot / cube / share-style aggregation plans (⊕A18, A9/A10 shapes)
over the generic fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ._numeric import dsum, sql_dsum
from .registry import register

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


@register(
    "za01_pivot_priority_counts",
    f"""
    SELECT o_orderstatus,
           {", ".join(f"COUNT(CASE WHEN o_orderpriority = '{p}' THEN 1 END) AS {c}"
                      for p, c in zip(_PRIORITIES, _PRIORITY_COLS))}
    FROM orders GROUP BY o_orderstatus
    """,
)
def a01_pivot_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (A10 pivot shape): one shuffle,
    no second pass to discover pivot values — the 100 TB-safe form."""
    orders = read_table(spark, sf_dir, "orders")
    out = orders.groupBy("o_orderstatus").pivot("o_orderpriority", _PRIORITIES).count()
    renamed = out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(c) for p, c in zip(_PRIORITIES, _PRIORITY_COLS)],
    )
    return renamed


@register(
    "za02_cube_region_segment",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE(r_name, c_mktsegment)
    """,
)
def a02_cube_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, market segment) — all four grouping levels in
    one pass (⊕A18)."""
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.cube("r_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "za03_status_share_by_nation",
    """
    WITH c AS (
        SELECT n.n_name AS nation_name, o.o_orderstatus, COUNT(*) AS n
        FROM orders o
        JOIN customer cu ON o.o_custkey = cu.c_custkey
        JOIN nation n ON cu.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, o.o_orderstatus
    )
    SELECT nation_name,
           CAST(ROUND(100.0 * COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN n END), 0)
                 / SUM(n)) AS BIGINT) AS pct_f,
           CAST(ROUND(100.0 * COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN n END), 0)
                 / SUM(n)) AS BIGINT) AS pct_o,
           CAST(ROUND(100.0 * COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN n END), 0)
                 / SUM(n)) AS BIGINT) AS pct_p
    FROM c GROUP BY nation_name
    """,
)
def a03_status_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage-share pivot — the reference's mood-distribution shape
    (A10, utils/database.py:1000-1043) on orders: % of orders per
    status per nation, integer-rounded."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    counts = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )
    total = F.col("F") + F.col("O") + F.col("P")
    return counts.select(
        "nation_name",
        *[
            F.round(100.0 * F.col(s) / total).cast("long").alias(f"pct_{s.lower()}")
            for s in ["F", "O", "P"]
        ],
    )


@register(
    "za04_grouping_sets",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
    """,
)
def a04_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the two one-dimensional subtotals plus
    the grand total in one pass, without the full cube (⊕A18)."""
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    joined.createOrReplaceTempView("a04_joined")
    return spark.sql(
        f"""
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(c_mktsegment, 'ALL') AS segment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_acctbal
        FROM a04_joined
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
        """
    )
