"""File-format sources/sinks: JSONL roundtrip, GeoJSON feature
explode, API cache read-through + TTL."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from trendr_data_pipeline_spark.sources import files as FS

AS_OF = datetime(2026, 8, 1)


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "ACCEPT", 0.8), (2, "REJECT", 0.1)], "id long, decision string, score double"
    )
    path = str(tmp_path / "decisions")
    FS.write_jsonl(df, path)
    back = FS.read_jsonl(spark, path, "id long, decision string, score double")
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in df.collect())
    # append semantics (S9)
    FS.write_jsonl(df, path)
    assert FS.read_jsonl(spark, path, "id long, decision string, score double").count() == 4


def test_geojson_features(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "1er Arrondissement", "admin_level": "9"},
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [[[[2.3, 48.85], [2.35, 48.85], [2.35, 48.9], [2.3, 48.85]]]],
                },
            },
            {
                "type": "Feature",
                "properties": {"name": "Quartier X", "admin_level": "10"},
                "geometry": {"type": "Point", "coordinates": [2.32, 48.87]},
            },
        ],
    }
    p = tmp_path / "areas.geojson"
    p.write_text(json.dumps(fc))
    rows = FS.read_geojson_features(spark, str(p)).collect()
    assert len(rows) == 2
    by_name = {r["properties"]["name"]: r for r in rows}
    assert by_name["1er Arrondissement"]["properties"]["admin_level"] == "9"
    geom = json.loads(by_name["1er Arrondissement"]["geometry"])
    assert geom["type"] == "MultiPolygon"
    assert geom["coordinates"][0][0][0] == [2.3, 48.85]


def test_api_cache_ttl(spark):
    cache = spark.createDataFrame(
        [
            ("k", "cse", "q1", "", "old-response", AS_OF - timedelta(hours=50)),
            ("k2", "cse", "q2", "", "live-response", AS_OF - timedelta(hours=1)),
        ],
        FS.CACHE_SCHEMA,
    ).withColumn("cache_key", FS.cache_key(F.col("api"), F.col("query"), F.col("params")))
    requests = spark.createDataFrame(
        [("cse", "q1", ""), ("cse", "q2", ""), ("cse", "q3", "")],
        "api string, query string, params string",
    )
    as_of = F.lit(AS_OF.isoformat()).cast("timestamp")
    out = FS.cache_lookup(cache, requests, as_of, ttl_seconds=48 * 3600)
    got = {r["query"]: r["response"] for r in out.collect()}
    # q1 expired (50h > 48h TTL), q2 live, q3 never cached
    assert got == {"q1": None, "q2": "live-response", "q3": None}


def test_cache_upsert_keeps_newest(spark):
    old = spark.createDataFrame(
        [("cse", "q", "", "v1", AS_OF - timedelta(hours=2))],
        "api string, query string, params string, response string, cached_at timestamp",
    ).withColumn("cache_key", FS.cache_key(F.col("api"), F.col("query"), F.col("params")))
    new = spark.createDataFrame(
        [("cse", "q", "", "v2", AS_OF)],
        "api string, query string, params string, response string, cached_at timestamp",
    ).withColumn("cache_key", FS.cache_key(F.col("api"), F.col("query"), F.col("params")))
    merged = FS.cache_upsert(old, new)
    rows = merged.collect()
    assert len(rows) == 1 and rows[0]["response"] == "v2"


def test_snapshot_diff_classification(spark):
    """added/removed/modified/unchanged classification, Python
    oracle, and the unchanged-rows-not-emitted contract."""
    from trendr_data_pipeline_spark.operators.ingestion import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, "d"), (5, "e")], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {2: "modified", 3: "removed", 5: "added"}
    # unchanged ids (1, 4) absent
    rows = snapshot_diff(old, new).collect()
    assert {r.doc_id for r in rows} == {2, 3, 5}
    # hashes populated on the sides that exist
    by = {r.doc_id: r for r in rows}
    assert by[5].old_hash is None and by[5].new_hash is not None
    assert by[3].new_hash is None and by[3].old_hash is not None
    assert by[2].old_hash != by[2].new_hash


def test_snapshot_diff_null_content(spark):
    """NULL content must not be mistaken for absence (md5(NULL) is
    NULL): NULL→value and value→NULL are modifications, NULL→NULL is
    unchanged — the review-reproduced misclassification."""
    from trendr_data_pipeline_spark.operators.ingestion import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "gone")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "y"), (2, None), (3, None), (5, None)], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "modified", 2: "modified", 4: "removed", 5: "added"}
