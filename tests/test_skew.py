"""Mechanical skew-resilience pins (r12 verdict item 4).

The salted join and AQE skew handling were narrated (tools/
skew_bench.py measures them at synthetic scale) but nothing verified
them per round. These tests plant a power-law key — one key owning
~30 % of a fixture-scale fact — and pin BOTH mitigation paths
mechanically:

- AQE's skew-join split ACTIVATES on that shape (the executed plan
  carries ``SortMergeJoin(skew=true)`` / a skewed ``AQEShuffleRead``)
  once the thresholds match the data scale — the same runtime-
  evidence posture as c53's partition-pruning pin;
- ``salted_join`` returns exactly the unsalted join's rows while
  capping the hottest reducer shard at ~1/salts of the hot key's
  row count.

tools/plan_audit.py runs the same probe per round and prints a
``skewprobe:`` line (skewJoin=0 is an audit violation), so a Spark
upgrade or a session-conf change that silently disables the skew
path fails the round, not a future debugging session.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trendr_data_pipeline_spark.operators.skew import salted_join

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
