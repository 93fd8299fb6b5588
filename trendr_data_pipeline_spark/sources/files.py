"""File-format sources & sinks.

- JSONL (S9): the reference appends decision/audit records line by
  line (``scripts/mention_scanner/logging_ext.py:88-153``); here the
  sink is ``df.write.json`` (one JSON object per line — the same
  format, written in parallel) and the source is a schema'd
  ``spark.read.json``.
- GeoJSON (S7/S8): a FeatureCollection becomes one row per feature
  (``neighbourhoods/geojson_to_jsonl.py:8-31`` flattens the same way)
  via multiline JSON read + ``explode(features)``; geometry stays a
  JSON string column for the spatial operators.
- API cache (S14): a read-through cache table keyed by
  ``md5(api:query:params)`` with TTL eviction
  (``utils/api_cache.py:50-145``) — expressed as plain DataFrame ops
  over a parquet-backed cache directory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# JSONL (S9)
# ---------------------------------------------------------------------------


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """Audit-log sink: newline-delimited JSON, append semantics."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """Schema'd JSONL source (no inference — SURVEY §1.3 discipline)."""
    return spark.read.schema(schema).json(path)


# ---------------------------------------------------------------------------
# GeoJSON (S7/S8)
# ---------------------------------------------------------------------------

GEOJSON_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
                        # geometry kept as raw JSON text for the spatial ops
                        T.StructField(
                            "geometry",
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def read_geojson_features(spark: SparkSession, path: str) -> DataFrame:
    """FeatureCollection → one row per feature: (feature_type,
    properties map, geometry JSON string). The geometry sub-document is
    re-extracted as raw text with get_json_object so ring coordinates
    survive untyped."""
    raw = spark.read.option("multiLine", True).text(path, wholetext=True)
    feats = raw.select(
        F.explode(
            F.from_json(
                F.col("value"), "STRUCT<features: ARRAY<STRING>>", {"mode": "PERMISSIVE"}
            ).getField("features")
        ).alias("feature")
    )
    return feats.select(
        F.get_json_object("feature", "$.type").alias("feature_type"),
        F.from_json(
            F.get_json_object("feature", "$.properties"), "MAP<STRING, STRING>"
        ).alias("properties"),
        F.get_json_object("feature", "$.geometry").alias("geometry"),
    )


# ---------------------------------------------------------------------------
# API cache (S14)
# ---------------------------------------------------------------------------

CACHE_SCHEMA = T.StructType(
    [
        T.StructField("cache_key", T.StringType(), False),
        T.StructField("api", T.StringType()),
        T.StructField("query", T.StringType()),
        T.StructField("params", T.StringType()),
        T.StructField("response", T.StringType()),
        T.StructField("cached_at", T.TimestampType()),
    ]
)


def cache_key(api: Column, query: Column, params: Column) -> Column:
    """md5 over the canonical request string (reference
    utils/api_cache.py:50-63)."""
    return F.md5(F.concat_ws(":", api, query, F.coalesce(params, F.lit(""))))


def cache_lookup(
    cache: DataFrame, requests: DataFrame, as_of: Column, ttl_seconds: int
) -> DataFrame:
    """Read-through: requests ⟕ live cache entries. Returns requests +
    (response nullable) — null response = cache miss, caller fetches.
    Eviction is the TTL filter, not a delete."""
    live = cache.filter(
        (as_of.cast("long") - F.col("cached_at").cast("long")) <= F.lit(ttl_seconds)
    )
    keyed = requests.withColumn(
        "cache_key", cache_key(F.col("api"), F.col("query"), F.col("params"))
    )
    return keyed.join(
        F.broadcast(live.select("cache_key", "response", "cached_at")), "cache_key", "left"
    )


def cache_upsert(cache: DataFrame, fresh: DataFrame) -> DataFrame:
    """Union new responses and keep the newest entry per key
    (window-dedup-latest MERGE, same as operators/ingestion)."""
    from ..operators.ingestion import upsert_latest

    return upsert_latest(cache, fresh, key="cache_key", version_col="cached_at")
