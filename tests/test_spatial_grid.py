"""J1 spatial association, J8 radius join, S13 normalization, H1–H4
grid operators — Python shapely-free oracles on synthetic Paris-like
polygons (two 'arrondissements' at admin_level 9, one nested 'quartier'
at level 10, one place node overlap; FIXTURES.md §B6 shapes)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from trendr_data_pipeline_spark.operators import grid, spatial
from trendr_data_pipeline_spark.schemas import DOMAIN

AS_OF = datetime(2026, 8, 1)


def box(lng0, lat0, lng1, lat1):
    return {
        "type": "MultiPolygon",
        "coordinates": [[[[lng0, lat0], [lng1, lat0], [lng1, lat1], [lng0, lat1], [lng0, lat0]]]],
    }


AREAS = [
    # two adjacent districts
    ("Paris", "1er Arrondissement", "admin", "9", None, json.dumps(box(2.30, 48.85, 2.35, 48.90))),
    ("Paris", "2e Arrondissement", "admin", "9", None, json.dumps(box(2.35, 48.85, 2.40, 48.90))),
    # a quartier nested inside the 1er (smaller area wins at level 10)
    ("Paris", "Quartier Vendôme", "admin", "10", None, json.dumps(box(2.31, 48.86, 2.33, 48.88))),
    # an overlapping place polygon (same bbox as quartier) — type
    # priority: admin beats place on equal area
    ("Paris", "Place Zone", "place", "10", "sq", json.dumps(box(2.31, 48.86, 2.33, 48.88))),
]

POIS = [
    ("poi-1", 48.87, 2.32),   # inside 1er + quartier (+ place overlap)
    ("poi-2", 48.87, 2.37),   # inside 2e only
    ("poi-3", 48.87, 2.35),   # exactly on the shared boundary — covered by both; smaller-name tie-break
    ("poi-4", 48.95, 2.32),   # outside everything
]


@pytest.fixture(scope="module")
def assoc(spark):
    areas = spark.createDataFrame(
        [(c, n, t, al, pt, g) for c, n, t, al, pt, g in AREAS], DOMAIN["urban_areas"]
    )
    pois = spark.createDataFrame(POIS, "id string, lat double, lng double")
    out = spatial.associate_pois(pois, areas)
    return {r["id"]: r for r in out.collect()}


def test_point_in_polygon_assignment(assoc):
    assert assoc["poi-1"]["district_name"] == "1er Arrondissement"
    assert assoc["poi-1"]["neighbourhood_name"] == "Quartier Vendôme"  # admin beats place
    assert assoc["poi-2"]["district_name"] == "2e Arrondissement"
    assert assoc["poi-2"]["neighbourhood_name"] is None
    assert assoc["poi-4"]["district_name"] is None


def test_boundary_point_covered_deterministically(assoc):
    # on-edge point is covered by both districts; name asc tie-break
    assert assoc["poi-3"]["district_name"] == "1er Arrondissement"


def test_covers_oracle_against_python(spark):
    geom = json.loads(AREAS[0][5])
    cases = [(48.87, 2.32, True), (48.87, 2.37, False), (48.85, 2.30, True), (48.9, 2.35, True)]
    df = spark.createDataFrame(cases, "lat double, lng double, want boolean").withColumn(
        "geojson", F.lit(AREAS[0][5])
    )
    rows = df.withColumn(
        "got", spatial.covered_by(F.col("lat"), F.col("lng"), F.col("geojson"))
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], (r["lat"], r["lng"])
        assert spatial._covers(r["lng"], r["lat"], geom) == r["want"]


def test_radius_join(spark):
    pois = spark.createDataFrame(POIS, "id string, lat double, lng double")
    centers = spark.createDataFrame([(48.87, 2.32, "c1")], "c_lat double, c_lng double, cid string")
    out = spatial.radius_join(pois, centers, radius_km=3.0)
    got = {r["id"]: r["distance_km"] for r in out.collect()}
    # poi-1 at the center; poi-3 ~2.2km east; poi-2 ~3.7km — excluded
    assert set(got) == {"poi-1", "poi-3"}
    assert got["poi-1"] == pytest.approx(0.0, abs=1e-9)


def test_normalize_geometry_polygon_to_multi(spark):
    open_ring = {
        "type": "Polygon",
        "coordinates": [[[2.0, 48.0], [2.1, 48.0], [2.1, 48.1]]],  # unclosed
    }
    df = spark.createDataFrame([(json.dumps(open_ring),)], "g string")
    out = json.loads(df.select(spatial.normalize_geometry(F.col("g"))).first()[0])
    assert out["type"] == "MultiPolygon"
    ring = out["coordinates"][0][0]
    assert ring[0] == ring[-1]  # closed


# --- grid (fallback provider; same DataFrame operators as with h3) ---


@pytest.fixture(scope="module")
def city(spark):
    return spark.createDataFrame(
        [("paris", json.dumps(box(2.30, 48.85, 2.34, 48.89)))], "city_slug string, geometry string"
    )


def test_seed_cells_idempotent(spark, city):
    seeded = grid.seed_cells(city, existing=None)
    n = seeded.count()
    assert n > 0
    assert seeded.filter(F.col("status") != "pending").count() == 0
    again = grid.seed_cells(city, existing=seeded)
    assert again.count() == 0  # idempotent: all cells exist


def test_due_cells_order_and_limit(spark, city):
    seeded = grid.seed_cells(city, existing=None)
    as_of = F.lit(AS_OF.isoformat()).cast("timestamp")
    due = grid.due_cells(seeded, "paris", as_of, limit=5).collect()
    assert len(due) == 5
    assert all(r["next_due_at"] is None for r in due)


def test_split_saturated(spark, city):
    seeded = grid.seed_cells(city, existing=None)
    first = seeded.orderBy("h3").first()["h3"]
    state = seeded.withColumn(
        "results_last", F.when(F.col("h3") == first, 80).otherwise(10)
    ).withColumn("status", F.lit("scanned"))
    new_state = grid.split_saturated(state, city)
    rows = {r["h3"]: r for r in new_state.collect()}
    assert rows[first]["status"] == "split"
    children = [r for r in rows.values() if r["parent_h3"] == first]
    assert children and all(r["res"] == 10 and r["status"] == "pending" for r in children)
    # children centroids must be inside the city polygon
    geom = json.loads(city.first()["geometry"])
    for r in children:
        lat, lng = grid.cell_to_latlng_py(r["h3"])
        assert spatial._covers(lng, lat, geom)


def test_update_scanned(spark, city):
    seeded = grid.seed_cells(city, existing=None)
    target = seeded.orderBy("h3").first()["h3"]
    scans = spark.createDataFrame([(target, 70)], "h3 string, results long")
    as_of = F.lit(AS_OF.isoformat()).cast("timestamp")
    updated = {r["h3"]: r for r in grid.update_scanned(seeded, scans, as_of).collect()}
    r = updated[target]
    assert r["status"] == "saturated" and r["saturated"] and r["attempts"] == 1
    assert r["results_last"] == 70 and r["next_due_at"] is not None
    other = next(v for k, v in updated.items() if k != target)
    assert other["status"] == "pending" and other["attempts"] == 0


def test_ring_assembly():
    """H5: segments in arbitrary order/orientation chain into a closed
    ring; leftover open chains are dropped."""
    from trendr_data_pipeline_spark.operators.spatial import (
        assemble_rings,
        rings_to_multipolygon,
    )

    a, b, c, d = [0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]
    segments = [
        [a, b],          # bottom
        [c, b],          # right, reversed orientation
        [c, d],          # top
        [a, d],          # left, reversed
        [[5.0, 5.0], [6.0, 6.0]],  # dangling chain — dropped
    ]
    rings = assemble_rings(segments)
    assert len(rings) == 1
    ring = rings[0]
    assert ring[0] == ring[-1]
    assert {tuple(p) for p in ring} == {tuple(p) for p in [a, b, c, d]}
    geo = json.loads(rings_to_multipolygon(rings))
    assert geo["type"] == "MultiPolygon" and len(geo["coordinates"]) == 1


def test_assembled_ring_usable_by_covers(spark):
    from trendr_data_pipeline_spark.operators.spatial import (
        _covers,
        assemble_rings,
        rings_to_multipolygon,
    )

    segs = [[[0.0, 0.0], [2.0, 0.0]], [[2.0, 2.0], [2.0, 0.0]],
            [[2.0, 2.0], [0.0, 2.0]], [[0.0, 2.0], [0.0, 0.0]]]
    geom = json.loads(rings_to_multipolygon(assemble_rings(segs)))
    assert _covers(1.0, 1.0, geom) is True
    assert _covers(3.0, 1.0, geom) is False
