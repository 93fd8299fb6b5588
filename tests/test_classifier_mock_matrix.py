"""Port of the reference's embedded 4-POI mock matrix
(scripts/intelligent_classifier.py:576-741): archetypes A new+trending /
B established / C weak / D hidden-gem, each with one guide mention
(weight 1.5, w_time 0.9) and a 2-snapshot 14d series (40 → 50).
Assertions follow the reference's checks (ranges, exact Gatto formula
within 0.1) plus exact expected values derived from the formulas."""

from __future__ import annotations

import math
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from tests.fixtures import AS_OF
from trendr_data_pipeline_spark.operators.classifier import classify
from trendr_data_pipeline_spark.schemas import DOMAIN

ARCHETYPES = [
    # (id, name, category, rating, reviews, first_seen_days_ago)
    ("poi-a", "New Trendy Cafe", "cafe", 4.8, 50, 30),
    ("poi-b", "Classic Bistro", "restaurant", 4.2, 800, 500),
    ("poi-c", "Struggling Bar", "bar", 3.2, 20, 200),
    ("poi-d", "Secret Wine Bar", "bar", 4.7, 120, 100),
]


@pytest.fixture(scope="module")
def matrix(spark):
    pois, mentions, snaps = [], [], []
    for pid, name, cat, rating, reviews, days in ARCHETYPES:
        pois.append(
            {**{f.name: None for f in DOMAIN["poi"].fields},
             "id": pid, "name": name, "category": cat, "city": "paris",
             "rating": rating, "reviews_count": reviews,
             "first_seen_at": AS_OF - timedelta(days=days)}
        )
        mentions.append(
            {**{f.name: None for f in DOMAIN["source_mention"].fields},
             "id": f"m-{pid}", "poi_id": pid, "source_type": "guide",
             "authority_weight": 1.5, "match_score": 1.0, "w_time": 0.9,
             "created_at": AS_OF}
        )
        snaps.append(dict(poi_id=pid, source_id="google", rating_value=rating,
                          reviews_count=50, captured_at=AS_OF))
        snaps.append(dict(poi_id=pid, source_id="google", rating_value=rating,
                          reviews_count=40, captured_at=AS_OF - timedelta(days=14)))
    poi_df = spark.createDataFrame(
        [tuple(p[f.name] for f in DOMAIN["poi"].fields) for p in pois], DOMAIN["poi"]
    )
    men_df = spark.createDataFrame(
        [tuple(m[f.name] for f in DOMAIN["source_mention"].fields) for m in mentions],
        DOMAIN["source_mention"],
    )
    snap_df = spark.createDataFrame(
        [tuple(s[f.name] for f in DOMAIN["rating_snapshot"].fields) for s in snaps],
        DOMAIN["rating_snapshot"],
    )
    out = classify(poi_df, men_df, snap_df, F.lit(AS_OF.isoformat()).cast("timestamp"))
    return {r["id"]: r for r in out.collect()}


def _expected_review(rating, reviews, cat):
    sr = max(0.0, min(1.0, (rating - 3.5) / 1.5)) * 100
    sv = max(0.0, min(1.0, math.log1p(reviews) / math.log1p(2000))) * 100 if reviews else 0.0
    rv = 0.7 * sr + 0.3 * sv
    if cat in ("bar", "night_club"):
        rv *= 0.85
    return min(100.0, max(0.0, rv))


def test_mock_matrix(matrix):
    expected_authority = min(100.0, math.tanh(1.0 * 1.5 * 0.9 * 1.0 / 100) * 100)
    for pid, name, cat, rating, reviews, days in ARCHETYPES:
        r = matrix[pid]
        # reference assertions: all scores in range, gatto formula exact
        for k in ("authority_score", "review_score", "momentum_score", "gatto_score"):
            assert 0 <= r[k] <= 100, (pid, k)
        expected_gatto = 0.5 * r["authority_score"] + 0.3 * r["review_score"] + 0.2 * r["momentum_score"]
        assert abs(r["gatto_score"] - expected_gatto) < 0.1
        assert r["eligibility_status"] in ("approved", "eligible", "hold")
        # exact expectations from the formulas
        assert r["authority_score"] == pytest.approx(expected_authority, abs=1e-9)
        assert r["review_score"] == pytest.approx(_expected_review(rating, reviews, cat), abs=1e-9)
        # delta 10 over p95=5.0 caps at 100; one w_time=0.9 mention < 2 → no bonus
        assert r["momentum_score"] == pytest.approx(100.0, abs=1e-9)


def test_mock_matrix_archetype_badges(matrix):
    # A is new (first_seen 30d, mention w_time .9>.6 today) and trending (M=100≥65)
    assert set(matrix["poi-a"]["badges"]) == {"new", "trending"}
    # B established: trending only (momentum from snapshot growth)
    assert set(matrix["poi-b"]["badges"]) == {"trending"}
    # C weak: rating 3.2 → no gem/local; trending via momentum
    assert set(matrix["poi-c"]["badges"]) == {"trending"}
    # D hidden gem candidate: rating 4.7, 120 reviews — but its only
    # mention is 'guide', not press/local → NOT hidden_gem (reference
    # requires a press/local mention)
    assert set(matrix["poi-d"]["badges"]) == {"trending"}
