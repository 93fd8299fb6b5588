"""Skew salting + bucketed co-located joins — result equality and
plan-level evidence (the exchange really disappears)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from trendr_data_pipeline_spark.operators.skew import salted_join, write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_salted_join_equals_plain_join(spark):
    """90%-hot-key join: salted results == unsalted results exactly."""
    n = 5000
    big = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("row_id"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(7)] + [(1, "dup")], "k long, label string"
    )
    got = salted_join(big, small, on="k", salts=8).select("row_id", "k", "label")
    want = big.join(small, "k").select("row_id", "k", "label")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # the shuffle key really carries the salt: partitioning covers k AND _salt
    plan = _plan(salted_join(big, small, on="k", salts=8))
    assert "_salt" in plan


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (2, 20), (99, 30)], "k long, v long")
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k long, label string")
    got = {
        (r["k"], r["v"], r["label"])
        for r in salted_join(big, small, on="k", salts=4, how="left").collect()
    }
    assert got == {(1, 10, "a"), (2, 20, "b"), (99, 30, None)}


def test_bucketed_join_runs_without_exchange(spark, tmp_path):
    """Two tables bucketed by the join key into the same bucket count:
    the equi-join plan contains NO Exchange (scan bucketing satisfies
    the join's distribution); the same join on plain parquet shuffles
    both sides."""
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bk_orders_{suffix}", f"bk_lineitem_{suffix}"
    orders = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 5).alias("o_status")
    )
    lineitem = spark.range(4000).select(
        (F.col("id") % 1000).alias("l_orderkey"), (F.col("id") % 50).alias("l_qty")
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, ta, "o_orderkey", buckets=8, path=str(tmp_path / ta))
        write_bucketed(lineitem, tb, "l_orderkey", buckets=8, path=str(tmp_path / tb))
        joined = spark.table(ta).join(
            spark.table(tb), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 4000

        plain = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")
