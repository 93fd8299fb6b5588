"""Relational core — the ⊕ generalizations of SURVEY §2 (J11, A17/A18,
W9, U1–U5) expressed over the TPC-H-ish fixtures.

These generalize the reference's query shapes: its PostgREST scans with
pushed-down predicates (reference ``utils/database.py:60-66``) become
parquet scans with Catalyst pushdown; its N+1 per-entity fetch loops
(reference ``scripts/intelligent_classifier.py:499-528``) become
set-oriented joins.

Scale posture: facts (``lineitem``, ``orders``) shuffle on their join
keys once; dimensions (``region``, ``nation``, and at sf ≤1 ``customer``
/ ``supplier``) are broadcast so the fact table never shuffles for them;
AQE coalesces post-shuffle partitions and splits skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import read_table
from ._numeric import davg, dsum, sql_davg, sql_dsum
from .registry import register

# --- q01: pricing summary (TPC-H Q1 shape; generalizes A9/A13 counters) ---

_Q01_CUT = "1999-09-02 00:00:00"


@register(
    "zq01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q01_CUT}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy group-aggregate: one shuffle on the (tiny-cardinality)
    grouping key; partial (map-side) aggregation does nearly all work."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q01_CUT).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- q02: revenue by region (flagship; J11 join chain) ---


@register(
    # z-pushed r10 (freeze rule): admits c50_benchmark_contamination
    # into the driver window; r9-signed as q02 in CORRECTNESS_r09.json
    # (entry() imports the FUNCTION q02_revenue_by_region — unchanged)
    "zq02_revenue_by_region",
    f"""
    SELECT r.r_name AS region_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q02_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ three broadcast dims. ``customer`` is broadcast
    below the default 64 MB threshold at test SFs; at 100 TB it exceeds
    the threshold and AQE falls back to a shuffle join on c_custkey —
    the plan is declarative either way."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --- q03: top-k customers per nation (W9 ranking window) ---


@register(
    # z-pushed r10 (freeze rule): admits c49_cluster_quality_keep into
    # the driver window; r9-signed as q03 in CORRECTNESS_r09.json
    "zq03_top_customers_per_nation",
    f"""
    WITH cust_rev AS (
        SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
               {sql_dsum('o.o_totalprice')} AS total_spent
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT nation_name, c_custkey, c_name, total_spent, rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY nation_name
                   ORDER BY total_spent DESC, c_custkey ASC) AS rk
        FROM cust_rev
    )
    WHERE rk <= 3
    """,
)
def q03_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group (generalizes reference W6 top-8-per-collection,
    ``ai/collection_generator.py:309-311``): aggregate then one window;
    ties broken by key for determinism (reference W4 discipline,
    ``scripts/mention_scanner/scoring.py:182-206``)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    cust_rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(dsum("o_totalprice").alias("total_spent"))
    )
    w = Window.partitionBy("nation_name").orderBy(
        F.col("total_spent").desc(), F.col("c_custkey").asc()
    )
    return (
        cust_rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("nation_name", "c_custkey", "c_name", "total_spent", "rk")
    )


# --- q04: semi join — orders with at least one returned line (J11 semi) ---


@register(
    "zq04_returned_orders_by_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    GROUP BY o.o_orderpriority
    """,
)
def q04_returned_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (generalizes reference F10 existence
    checks, ``scripts/mention_scanner/scanner.py:664-674``)."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --- q05: anti join — customers with no orders (U4 except) ---


@register(
    "zq05_customers_without_orders",
    """
    SELECT n.n_name AS nation_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    )
    GROUP BY n.n_name
    """,
)
def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (reference U4 "unmatched" scans,
    ``utils/database.py:984-998``): customers with no orders in 1995."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    nation = read_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- q06: rollup subtotals (⊕A18) ---


@register(
    # z-pushed r10 (freeze rule): admits c48_quality_calibration into
    # the driver window; r9-signed as q06 in CORRECTNESS_r09.json
    "zq06_rollup_region_nation",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           {sql_dsum('c_acctbal')} AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q06_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (generalizes reference A9/A10 city statistics,
    ``utils/database.py:425-461``). NULL grouping levels are coalesced
    to 'ALL' so the hash compare is unambiguous."""
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(dsum("c_acctbal").alias("total_acctbal"), F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "total_acctbal",
            "n_customers",
        )
    )


# --- q07: distinct counts (⊕A17) ---


@register(
    # z-pushed r10 (freeze rule): admits c47_source_overlap into the
    # driver window; r9-signed as q07 in CORRECTNESS_r09.json
    "zq07_distinct_counts",
    """
    SELECT COUNT(DISTINCT o_custkey) AS n_active_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    """,
)
def q07_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (reference S2 count-only scans,
    ``utils/database.py:434-444``). ``approx_count_distinct`` is the
    100 TB fast path but is engine-specific, so the oracle-checked
    query pins the exact form."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_active_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- q08: set ops union/intersect/except (U1-U5) ---


@register(
    "zq08_set_ops_customers",
    """
    WITH buyers_95 AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    ),
    buyers_96 AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT custkey FROM buyers_95 UNION SELECT custkey FROM buyers_96)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT custkey FROM buyers_95 INTERSECT SELECT custkey FROM buyers_96)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT custkey FROM buyers_95 EXCEPT SELECT custkey FROM buyers_96)
    """,
)
def q08_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union / intersect / except over yearly buyer sets (reference U1
    candidate-stream union ``scanner.py:327-335``, U2 distinct, U4)."""
    orders = read_table(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("custkey"))
            .distinct()
        )

    b95, b96 = buyers(1995), buyers(1996)
    rows = [
        ("union", b95.union(b96).distinct()),
        ("intersect", b95.intersect(b96)),
        ("except", b95.subtract(b96)),
    ]
    out = None
    for op, df in rows:
        piece = df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
        out = piece if out is None else out.unionByName(piece)
    return out


# --- q09: scan pushdown probe (S1) ---


@register(
    # z-pushed r10 (freeze rule): admits c45_cdc_chunk_dedup into the
    # driver window; r9-signed as q09 in CORRECTNESS_r09.json
    "zq09_filtered_scan",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
    """,
)
def q09_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate scan: the PostgREST
    ``.select(...).eq(...).gte(...)`` shape (reference
    ``utils/database.py:60-66``). Both the filter and the 3-column
    projection reach the parquet reader (PushedFilters / ReadSchema)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0)
    ).select("o_orderkey", "o_custkey", "o_totalprice")
