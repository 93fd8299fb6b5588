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


def test_score_candidates_salted_profiles_identical(spark):
    """The pipeline wiring: score_candidates(salt_profiles=N) shards
    the hot city_slug across N reducers instead of broadcasting the
    profile dim — output must be identical to the broadcast plan on a
    90%-hot-key candidate batch (the real-corpus shape where one city
    dominates)."""
    from datetime import datetime

    from tests.test_mentions import CATALOG, PROFILES
    from trendr_data_pipeline_spark.operators.mentions import score_candidates
    from trendr_data_pipeline_spark.schemas import DOMAIN

    n = 400
    rows = [
        (
            f"poi-{i % 50:04d}",
            f"Venue {i % 50}",
            "paris" if i % 10 < 9 else "lyon",  # 90% hot key
            f"https://site{i % 9}.fr/venue-{i % 50}",
            f"Venue {i % 50} — best of paris",
            "a nice spot 75011",
            None,
            48.85 + (i % 20) * 0.001,
            2.35 + (i % 20) * 0.001,
            None,
        )
        for i in range(n)
    ]
    cands = spark.createDataFrame(
        rows,
        "poi_id string, poi_name string, city_slug string, url string, title string,"
        " snippet string, domain string, poi_lat double, poi_lng double, published_at timestamp",
    )
    profs = spark.createDataFrame(
        [tuple(p.values()) for p in PROFILES],
        "city_slug string, city_names_aliases array<string>, country_code string,"
        " admin_names array<string>, postal_prefixes array<string>, lat_min double,"
        " lat_max double, lng_min double, lng_max double, centroid_lat double,"
        " centroid_lng double, competing_cities array<string>",
    )
    cat_rows = [
        {**{f.name: None for f in DOMAIN["source_catalog"].fields}, **c} for c in CATALOG
    ]
    cat = spark.createDataFrame(
        [tuple(r[f.name] for f in DOMAIN["source_catalog"].fields) for r in cat_rows],
        DOMAIN["source_catalog"],
    )
    as_of = F.lit(datetime(2026, 8, 1).isoformat()).cast("timestamp")
    cols = ["poi_id", "url", "final_score", "decision", "accepted_by"]

    plain = score_candidates(cands, profs, cat, as_of)
    salted = score_candidates(cands, profs, cat, as_of, salt_profiles=8)
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, salted.select(*cols).collect())
    )
    # the salted plan really routes the profile join through the salt
    assert "_salt" in _plan(salted)
    assert "_salt" not in _plan(plain)
