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


# ---------------------------------------------------------------------------
# r13 — mechanical per-round pins (r12 verdict item 4): AQE skew-join
# ACTIVATION on the executed plan, and the salted shard ceiling, both
# on a planted 30%-hot-key power-law fact. tools/plan_audit.py runs
# the same probe shape each round and treats skewJoin=0 as a
# violation, so a Spark upgrade or conf drift that silently disables
# the skew path fails the round.
# ---------------------------------------------------------------------------

import pytest

#: planted power-law: 30 % of the fact on key 0, the rest ~uniform
#: over 200 keys — the "one hot city" shape J6 hits in the reference
#: (batch name enrichment joins 90 %-Paris mention batches)
_N_FACT = 200_000
_N_KEYS = 200


def _skewed_fact(spark):
    return spark.range(_N_FACT).select(
        F.when(F.col("id") % 10 < 3, 0)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(_N_KEYS)))
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pay"),
    )


def _dim(spark):
    return spark.range(_N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


@pytest.fixture()
def skew_confs(spark):
    """Force a sort-merge join and scale the AQE skew thresholds to
    the probe's data volume (defaults are 256 MB-class, sized for
    real clusters), restoring the session afterwards."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset key
            saved[k] = None
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_skew_join_activates(spark, skew_confs):
    """The planted 30 %-hot-key SMJ must be re-planned by AQE's skew
    handler at runtime — pinned on the EXECUTED plan, the only place
    the decision is visible (a static explain shows a plain SMJ)."""
    j = _skewed_fact(spark).join(_dim(spark), "k", "inner")
    assert len(j.collect()) == _N_FACT
    plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "skew=true" in plan, plan[:2000]


def test_salted_join_matches_unsalted_and_caps_shards(spark):
    """salted_join == plain join row-for-row, AND the hot key's rows
    spread across salts so the largest (key, salt) reducer shard is a
    fraction of the unsalted hot partition. The salt is content-
    derived (xxhash64 over the full row), so distinct hot-key rows
    spread ~uniformly; ≤ 1/4 of the hot count at salts=16 is a
    conservative bound (expected ~1/16)."""
    fact = _skewed_fact(spark)
    dim = _dim(spark)
    salts = 16

    plain = {tuple(r) for r in fact.join(dim, "k", "inner").collect()}
    salted = {tuple(r) for r in salted_join(fact, dim, "k", salts=salts).collect()}
    assert salted == plain

    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in fact.columns])), F.lit(salts))
    hot_max = fact.groupBy("k").count().agg(F.max("count")).first()[0]
    shard_max = (
        fact.withColumn("_salt", salt)
        .groupBy("k", "_salt")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert hot_max >= int(0.3 * _N_FACT)  # the planted skew is real
    assert shard_max <= hot_max / 4, (shard_max, hot_max)
