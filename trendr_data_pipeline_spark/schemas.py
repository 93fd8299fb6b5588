"""StructType registry — the engine's catalog.

The reference keeps schemas implicit (ad-hoc Python dicts validated
only by the remote Postgres schema; see reference
``scripts/google_places_ingester.py:374-418``,
``utils/database.py:93-96``). The engine declares every table once,
here, as an explicit ``StructType`` (SURVEY §1.3).

Two groups:

- ``GENERIC``: the driver's TPC-H-ish fixtures at
  ``/root/testdata/sf*/`` (see TESTDATA.md / FIXTURES.md §A).
- ``DOMAIN``: the reference's own tables (SURVEY §1.4), used by unit
  tests that synthesize reference-shaped rows (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


_STR = T.StringType()
_DBL = T.DoubleType()
_I32 = T.IntegerType()
_I64 = T.LongType()
_TS = T.TimestampType()
_BOOL = T.BooleanType()


# ---------------------------------------------------------------------------
# Generic fixtures (driver-generated; FIXTURES.md §A)
# ---------------------------------------------------------------------------

GENERIC: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", _I32, False), ("r_name", _STR, False)),
    "nation": _s(
        ("n_nationkey", _I32, False),
        ("n_name", _STR, False),
        ("n_regionkey", _I32, False),
    ),
    "customer": _s(
        ("c_custkey", _I64, False),
        ("c_name", _STR, False),
        ("c_nationkey", _I32, False),
        ("c_acctbal", _DBL, True),
        ("c_mktsegment", _STR, True),
    ),
    "supplier": _s(
        ("s_suppkey", _I64, False),
        ("s_name", _STR, False),
        ("s_nationkey", _I32, False),
        ("s_acctbal", _DBL, True),
    ),
    "part": _s(
        ("p_partkey", _I64, False),
        ("p_name", _STR, False),
        ("p_brand", _STR, True),
        ("p_type", _STR, True),
        ("p_size", _I32, True),
        ("p_retailprice", _DBL, True),
    ),
    "orders": _s(
        ("o_orderkey", _I64, False),
        ("o_custkey", _I64, False),
        ("o_orderstatus", _STR, True),
        ("o_totalprice", _DBL, True),
        ("o_orderdate", _TS, True),
        ("o_orderpriority", _STR, True),
    ),
    "lineitem": _s(
        ("l_orderkey", _I64, False),
        ("l_partkey", _I64, False),
        ("l_suppkey", _I64, False),
        ("l_linenumber", _I32, False),
        ("l_quantity", _DBL, True),
        ("l_extendedprice", _DBL, True),
        ("l_discount", _DBL, True),
        ("l_tax", _DBL, True),
        ("l_returnflag", _STR, True),
        ("l_linestatus", _STR, True),
        ("l_shipdate", _TS, True),
    ),
    "events": _s(
        ("event_id", _I64, False),
        ("ts", _TS, False),
        ("user_id", _I64, False),
        ("event_type", _STR, True),
        ("value", _DBL, True),
        ("props", _STR, True),
    ),
    "documents": _s(
        ("doc_id", _I64, False),
        ("text", _STR, True),
        ("lang", _STR, True),
        ("source", _STR, True),
        ("n_chars", _I64, True),
    ),
    "embeddings": _s(
        ("vec_id", _I64, False),
        ("embedding", T.ArrayType(T.FloatType()), True),
        ("label", _I32, True),
    ),
}


# ---------------------------------------------------------------------------
# Domain tables (reference catalog, SURVEY §1.4; FIXTURES.md §B)
# ---------------------------------------------------------------------------

TAG_VALUE = T.StructType(
    [
        T.StructField("confidence", _DBL, True),
        T.StructField("category", _STR, True),
        T.StructField("sources_count", _I32, True),
    ]
)

DOMAIN: dict[str, T.StructType] = {
    # reference scripts/google_places_ingester.py:374-418,445-514;
    # scripts/intelligent_classifier.py:437-457
    "poi": _s(
        ("id", _STR, False),
        ("google_place_id", _STR, True),
        ("name", _STR, False),
        ("category", _STR, True),
        ("subcategories", T.ArrayType(_STR), True),
        ("city_slug", _STR, True),
        ("city", _STR, True),
        ("country", _STR, True),
        ("lat", _DBL, True),
        ("lng", _DBL, True),
        ("address_street", _STR, True),
        ("website", _STR, True),
        ("phone", _STR, True),
        ("price_level", _STR, True),
        ("rating", _DBL, True),
        ("reviews_count", _I64, True),
        ("h3_cell_id", _STR, True),
        ("eligibility_status", _STR, True),
        ("novelty_score", _DBL, True),
        ("novelty_classification", _STR, True),
        ("gatto_score", _DBL, True),
        ("trend_score", _DBL, True),
        ("badges", T.ArrayType(_STR), True),
        ("tags", T.MapType(_STR, TAG_VALUE), True),
        ("primary_mood", _STR, True),
        ("mood_confidence", _DBL, True),
        ("district_name", _STR, True),
        ("neighbourhood_name", _STR, True),
        ("first_seen_at", _TS, True),
        ("last_scored_at", _TS, True),
        ("updated_at", _TS, True),
        ("created_at", _TS, True),
    ),
    # reference utils/database.py:737-938
    "source_mention": _s(
        ("id", _STR, False),
        ("poi_id", _STR, False),
        ("source_id", _STR, True),
        ("discovered_source_id", _STR, True),
        ("url", _STR, True),
        ("title", _STR, True),
        ("excerpt", _STR, True),
        ("domain", _STR, True),
        ("query", _STR, True),
        ("final_score", _DBL, True),
        ("score_components", _STR, True),
        ("published_at", _TS, True),
        ("published_at_confidence", _STR, True),
        ("published_at_method", _STR, True),
        ("source_type", _STR, True),
        ("authority_weight", _DBL, True),
        ("match_score", _DBL, True),
        ("w_time", _DBL, True),
        ("accepted", _BOOL, True),
        ("created_at", _TS, True),
        ("last_seen_at", _TS, True),
    ),
    # reference scripts/google_places_ingester.py:433-439; db.py:94-129
    "rating_snapshot": _s(
        ("poi_id", _STR, False),
        ("source_id", _STR, False),
        ("rating_value", _DBL, True),
        ("reviews_count", _I64, True),
        ("captured_at", _TS, False),
    ),
    # reference utils/database.py:502-543
    "source_catalog": _s(
        ("source_id", _STR, False),
        ("base_url", _STR, True),
        ("type", _STR, True),
        ("authority_weight", _DBL, True),
        ("is_active", _BOOL, True),
        ("cse_site_override", _STR, True),
        ("rss_feed_url", _STR, True),
        ("html_date_selector", _STR, True),
        ("dedup_pattern", _STR, True),
        ("dedup_replacement", _STR, True),
    ),
    # reference utils/database.py:553-583
    "discovered_sources": _s(
        ("id", _STR, False),
        ("domain", _STR, False),
        ("language", _STR, True),
        ("geographic_scope", _STR, True),
        ("auto_authority_weight", _DBL, True),
    ),
    # reference neighbourhoods/ingest_geometries.py:87-105
    "urban_areas": _s(
        ("city_name", _STR, False),
        ("name", _STR, False),
        ("type", _STR, True),
        ("admin_level", _STR, True),
        ("place_type", _STR, True),
        ("geometry", _STR, True),  # GeoJSON MultiPolygon, SRID 4326
    ),
    # reference scripts/h3_scheduler.py:137-155
    "ingestion_cell_h3": _s(
        ("h3", _STR, False),
        ("city_slug", _STR, False),
        ("res", _I32, False),
        ("parent_h3", _STR, True),
        ("status", _STR, True),
        ("saturated", _BOOL, True),
        ("last_scanned_at", _TS, True),
        ("next_due_at", _TS, True),
        ("results_last", _I64, True),
        ("attempts", _I64, True),
    ),
    # reference ai/collection_generator.py:366-405; utils/database.py:243-336
    "collections": _s(
        ("id", _STR, False),
        ("title", _STR, True),
        ("type", _STR, True),
        ("description", _STR, True),
        ("city", _STR, True),
        ("country", _STR, True),
        ("poi_ids", T.ArrayType(_STR), True),
        ("cover_photo", _STR, True),
        ("metadata", _STR, True),
        ("created_at", _TS, True),
        ("updated_at", _TS, True),
    ),
    # reference utils/api_usage.py:14-46
    "api_usage": _s(
        ("date", T.DateType(), False),
        ("api_type", _STR, False),
        ("queries_count", _I64, True),
        ("daily_limit", _I64, True),
    ),
    # reference scripts/mention_scanner/collection_router.py:257-279
    "mention_candidates": _s(
        ("poi_id", _STR, True),
        ("poi_name", _STR, True),
        ("query_used", _STR, True),
        ("url", _STR, True),
        ("title", _STR, True),
        ("snippet", _STR, True),
        ("domain", _STR, True),
        ("displayLink", _STR, True),
        ("published_at", _TS, True),
    ),
    # reference scripts/mention_scanner/city_profiles.py:32-68
    "city_profiles": _s(
        ("city_slug", _STR, False),
        ("city_names_aliases", T.ArrayType(_STR), True),
        ("country_code", _STR, True),
        ("admin_names", T.ArrayType(_STR), True),
        ("postal_prefixes", T.ArrayType(_STR), True),
        ("lat_min", _DBL, True),
        ("lat_max", _DBL, True),
        ("lng_min", _DBL, True),
        ("lng_max", _DBL, True),
        ("centroid_lat", _DBL, True),
        ("centroid_lng", _DBL, True),
        ("competing_cities", T.ArrayType(_STR), True),
    ),
}

ALL: dict[str, T.StructType] = {**GENERIC, **DOMAIN}


def schema_for(table: str) -> T.StructType:
    return ALL[table]
