"""Tag-engine parity (F9/W6/A10/A11/AM1) against Python oracles
transcribed from ai/collection_generator.py and utils/database.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trendr_data_pipeline_spark.operators import collections as C

TAGS_SCHEMA = (
    "id string, tags map<string, struct<confidence double, category string,"
    " sources_count int>>, primary_mood string, mood_confidence double,"
    " neighbourhood_name string"
)

POIS = [
    # id, tags, primary_mood, mood_confidence, neighbourhood
    ("p1", {"date-spot": (0.9, "experience", 2), "trendy": (0.7, "mood", 1)}, None, None, "Marais"),
    ("p2", {"date-spot": (0.4, "experience", 1)}, None, None, "Marais"),          # below min_conf
    ("p3", {"date-spot": (0.8, "experience", 1), "tourist-trap": (0.9, "quality", 3)}, None, None, "Marais"),  # excluded
    ("p4", {}, "chill", 0.8, "Opera"),                                            # mood fallback
    ("p5", {"work-friendly": (0.6, "function", 1)}, None, None, "Opera"),
    ("p6", None, "hidden_gem", None, "Opera"),                                    # mood fallback, default conf
    ("p7", {"date-spot": (0.55, "experience", 1)}, None, None, None),
]


@pytest.fixture(scope="module")
def pois(spark):
    return spark.createDataFrame(POIS, TAGS_SCHEMA)


def test_effective_tags_fallback(pois):
    eff = C.with_effective_tags(pois)
    rows = {r["id"]: r["eff_tags"] for r in eff.collect()}
    # p4/p6 get synthetic mood tags; all others keep their tags
    assert set(rows) == {"p1", "p2", "p3", "p4", "p5", "p6", "p7"}
    assert rows["p4"]["chill"]["confidence"] == pytest.approx(0.8)
    assert rows["p6"]["hidden_gem"]["confidence"] == pytest.approx(0.5)
    assert rows["p6"]["hidden_gem"]["category"] == "mood"


def test_tag_criteria_filter_and_score(pois):
    eff = C.with_effective_tags(pois)
    out = C.filter_by_tag_criteria(
        eff, required_tags=["date-spot", "trendy"], excluded_tags=["tourist-trap"], min_confidence=0.5
    )
    got = {r["id"]: r["match_score"] for r in out.collect()}
    # oracle (collection_generator.py:252-311): p1 score 0.9+0.7; p2 below;
    # p3 excluded; p7 0.55
    assert got == {
        "p1": pytest.approx(0.9 + 0.7),
        "p7": pytest.approx(0.55),
    }


def test_topk_and_min_members(pois):
    eff = C.with_effective_tags(pois)
    matches = C.filter_by_tag_criteria(eff, ["date-spot", "trendy"], ["tourist-trap"], 0.5).withColumn(
        "template", F.lit("date_spots")
    )
    topk = C.top_k_collection(matches, k=8, min_members=2)
    assert {r["id"] for r in topk.collect()} == {"p1", "p7"}
    # with min_members=3 the template dies
    assert C.top_k_collection(matches, k=8, min_members=3).count() == 0
    cols = C.assemble_collections(topk, "Paris", {"date_spots": "Best Date Spots"}).collect()
    assert len(cols) == 1
    assert cols[0]["slug"] == "best-date-spots-paris"
    assert cols[0]["poi_ids"] == ["p1", "p7"]  # score order


def test_tag_usage(pois):
    eff = C.with_effective_tags(pois)
    got = {r["tag"]: r["n_pois"] for r in C.tag_usage(eff).collect()}
    assert got["date-spot"] == 4
    assert got["chill"] == 1 and got["hidden_gem"] == 1


def test_tag_categories(pois):
    eff = C.with_effective_tags(pois)
    rows = C.tag_categories(eff).collect()
    p1 = {r["category"]: r["entries"] for r in rows if r["id"] == "p1"}
    assert set(p1) == {"experience", "mood"}
    assert p1["experience"][0]["tag"] == "date-spot"


def test_mood_distribution(spark):
    data = [
        ("a", None, "chill", None, "Marais"),
        ("b", None, "chill", None, "Marais"),
        ("c", None, "trendy", None, "Marais"),
        ("d", None, "hidden_gem", None, "Marais"),
        ("e", None, "chill", None, "Opera"),
    ]
    pois = spark.createDataFrame(data, TAGS_SCHEMA)
    got = {r["neighbourhood_name"]: r for r in C.mood_distribution(pois).collect()}
    assert got["Marais"]["chill"] == 50 and got["Marais"]["trendy"] == 25 and got["Marais"]["hidden"] == 25
    assert got["Opera"]["chill"] == 100 and got["Opera"]["trendy"] == 0


def test_structured_data_jsonld(spark):
    import json as _json

    cols = spark.createDataFrame(
        [("date_spots", "Best Date Spots")], "template string, title string"
    )
    members = spark.createDataFrame(
        [("date_spots", "p1", "Le Servan", 1), ("date_spots", "p2", "Cafe A", 2)],
        "template string, id string, name string, rk int",
    )
    out = C.structured_data(cols, members).first()
    sd = _json.loads(out["structured_data"])
    assert sd["@type"] == "CollectionPage"
    items = sd["mainEntity"]["itemListElement"]
    assert [i["position"] for i in items] == [1, 2]
    assert items[0]["item"]["name"] == "Le Servan"
