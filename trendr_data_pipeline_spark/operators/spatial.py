"""Spatial operators (SURVEY §2.3 J1/J8, §2.1 S13).

No geo library is required: geometry is GeoJSON text; the exact
point-in-polygon refine is a vectorized pandas UDF implementing
ray-casting with holes (the even-odd rule PostGIS `ST_Covers` follows
for points, with on-edge treated as covered); everything else — bbox
prefilter, area tie-break, radius join — is JVM-side column math.

The join strategy (reference db.py:247-278 contract; README.md:58-65):

1. **bbox prefilter** — areas carry precomputed [lat_min..lng_max];
   the candidate join is POI-bbox containment, a cheap theta-join
   against a BROADCAST dimension (urban_areas is always small).
   At 100 TB of POIs this is a map-side operation, no shuffle of the
   fact table.
2. **exact refine** — ray-casting UDF on the few candidates per POI.
3. **tie-break** — smallest area first (README: "Smallest area first
   for precision"), then type priority (admin before place), then name
   — fully deterministic.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.math_geo import haversine_km

# ---------------------------------------------------------------------------
# GeoJSON helpers (driver/executor-safe pure Python)
# ---------------------------------------------------------------------------


def _rings(geom: dict) -> list[list[list[float]]]:
    """All rings of a Polygon/MultiPolygon as [[lng, lat], ...] lists;
    first ring of each polygon is the shell, rest are holes."""
    t = geom.get("type")
    if t == "Polygon":
        return [geom["coordinates"]]
    if t == "MultiPolygon":
        return list(geom["coordinates"])
    raise ValueError(f"unsupported geometry type: {t}")


def _point_in_ring(lng: float, lat: float, ring: list[list[float]]) -> bool:
    """Even-odd ray casting; points exactly on an edge count as inside
    (ST_Covers semantics for boundary points, approximated)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        # on-edge check (collinear + within segment bbox)
        cross = (x2 - x1) * (lat - y1) - (y2 - y1) * (lng - x1)
        if (
            abs(cross) < 1e-12
            and min(x1, x2) - 1e-12 <= lng <= max(x1, x2) + 1e-12
            and min(y1, y2) - 1e-12 <= lat <= max(y1, y2) + 1e-12
        ):
            return True
        if (y1 > lat) != (y2 > lat):
            xin = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lng < xin:
                inside = not inside
    return inside


def _covers(lng: float, lat: float, geom: dict) -> bool:
    for poly in _rings(geom):
        if _point_in_ring(lng, lat, poly[0]) and not any(
            _point_in_ring(lng, lat, hole) for hole in poly[1:]
        ):
            return True
    return False


def _ring_area(ring: list[list[float]]) -> float:
    """Shoelace area in squared degrees (tie-break only — relative
    ordering is what matters, matching ST_Area on the same SRID)."""
    a = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2.0


def geom_stats_py(geojson: str) -> tuple[float, float, float, float, float]:
    g = json.loads(geojson)
    area = 0.0
    lat_min = lng_min = math.inf
    lat_max = lng_max = -math.inf
    for poly in _rings(g):
        area += _ring_area(poly[0]) - sum(_ring_area(h) for h in poly[1:])
        for x, y in ((pt[0], pt[1]) for pt in poly[0]):
            lng_min, lng_max = min(lng_min, x), max(lng_max, x)
            lat_min, lat_max = min(lat_min, y), max(lat_max, y)
    return (lat_min, lat_max, lng_min, lng_max, area)


# ---------------------------------------------------------------------------
# column functions
# ---------------------------------------------------------------------------


def geom_stats(geojson: Column) -> Column:
    """(lat_min, lat_max, lng_min, lng_max, area) struct from GeoJSON —
    computed once per area row (dimension-side, negligible cost)."""

    def _f(s: pd.Series) -> pd.DataFrame:
        rows = [geom_stats_py(g) for g in s]
        return pd.DataFrame(
            rows, columns=["lat_min", "lat_max", "lng_min", "lng_max", "area"]
        )

    return F.pandas_udf(
        _f,
        "lat_min double, lat_max double, lng_min double, lng_max double, area double",
    )(geojson)


def covered_by(lat: Column, lng: Column, geojson: Column) -> Column:
    """Exact point-in-multipolygon (S13/J1 refine)."""

    def _f(lat_s: pd.Series, lng_s: pd.Series, gj: pd.Series) -> pd.Series:
        cache: dict[str, dict] = {}
        out = []
        for la, ln, g in zip(lat_s, lng_s, gj):
            if la is None or ln is None or g is None:
                out.append(False)
                continue
            geom = cache.get(g)
            if geom is None:
                geom = cache[g] = json.loads(g)
            out.append(_covers(float(ln), float(la), geom))
        return pd.Series(out)

    return F.pandas_udf(_f, "boolean")(lat, lng, geojson)


def normalize_geometry(geojson: Column) -> Column:
    """S13 normalization: Polygon → MultiPolygon cast (the
    `ST_Multi(ST_MakeValid(...))` pipeline of
    neighbourhoods/ingest_geometries.py:87-96; validity repair beyond
    ring closure requires a geometry library and raises for degenerate
    input rather than guessing)."""

    def _f(s: pd.Series) -> pd.Series:
        out = []
        for g in s:
            if g is None:
                out.append(None)
                continue
            geom = json.loads(g)
            if geom.get("type") == "Polygon":
                geom = {"type": "MultiPolygon", "coordinates": [geom["coordinates"]]}
            for poly in geom["coordinates"]:
                for ring in poly:
                    if ring and ring[0] != ring[-1]:
                        ring.append(ring[0])  # close open rings
            out.append(json.dumps(geom))
        return pd.Series(out)

    return F.pandas_udf(_f, "string")(geojson)


# ---------------------------------------------------------------------------
# J1 — POI ↔ urban_areas association
# ---------------------------------------------------------------------------

#: type priority for tie-breaking (admin areas beat place nodes)
_TYPE_PRIORITY = {"admin": 0, "place": 1}


def associate_pois(pois: DataFrame, urban_areas: DataFrame) -> DataFrame:
    """Assign each POI its best covering area: bbox-prefiltered
    broadcast join + exact refine + (area asc, type priority, name)
    tie-break. Returns poi id, lat, lng + area name/type/admin_level.

    district_name/neighbourhood_name split follows admin_level
    ('9' → district, '10' → neighbourhood), reference README.md:58-65.
    """
    areas = urban_areas.withColumn("_gs", geom_stats(F.col("geometry"))).select(
        F.col("name").alias("area_name"),
        F.col("type").alias("area_type"),
        F.col("admin_level"),
        F.col("geometry"),
        F.col("_gs.lat_min").alias("a_lat_min"),
        F.col("_gs.lat_max").alias("a_lat_max"),
        F.col("_gs.lng_min").alias("a_lng_min"),
        F.col("_gs.lng_max").alias("a_lng_max"),
        F.col("_gs.area").alias("a_area"),
    )
    cand = pois.join(
        F.broadcast(areas),
        (F.col("lat") >= F.col("a_lat_min"))
        & (F.col("lat") <= F.col("a_lat_max"))
        & (F.col("lng") >= F.col("a_lng_min"))
        & (F.col("lng") <= F.col("a_lng_max")),
        "inner",
    ).filter(covered_by(F.col("lat"), F.col("lng"), F.col("geometry")))

    prio = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in _TYPE_PRIORITY.items() for x in kv]),
            F.col("area_type"),
        ),
        F.lit(9),
    )
    # best-per-(poi, level) as ONE partial-aggregated argmin instead of
    # a row_number window + two per-level joins (r12): the rank key
    # (area, prio, name) packs into a struct whose field-wise ordering
    # IS the ORDER BY, so min(struct) two-phases through Tungsten —
    # map tasks reduce their slice of each (id, level) group before
    # the exchange — and one conditional aggregation per level folds
    # both association columns in the same pass. Net plan: the old
    # shape shuffled the candidate frame for the window, then the fact
    # table twice more (district join + neighbourhood join); this one
    # shuffles candidates once and the fact table once.
    best = cand.groupBy("id").agg(
        *[
            F.min(
                F.when(
                    F.col("admin_level") == lvl,
                    F.struct(
                        F.col("a_area").alias("a"),
                        prio.alias("p"),
                        F.col("area_name").alias("n"),
                    ),
                )
            )["n"].alias(out_col)
            for lvl, out_col in (("9", "district_name"), ("10", "neighbourhood_name"))
        ]
    )
    # poi may already carry (null) association columns — the join result
    # replaces them (the reference's UPDATE semantics, db.py:247-278)
    base = pois.drop("district_name", "neighbourhood_name")
    return base.join(best, "id", "left")


# ---------------------------------------------------------------------------
# J8 — radius join
# ---------------------------------------------------------------------------


def radius_join(
    pois: DataFrame,
    centers: DataFrame,
    radius_km: float,
    poi_lat: str = "lat",
    poi_lng: str = "lng",
    center_lat: str = "c_lat",
    center_lng: str = "c_lng",
) -> DataFrame:
    """POIs within r km of each center (reference
    utils/database.py:224-237 RPC): bbox theta-join against the
    broadcast center set, then exact haversine refine. The bbox uses
    the latitude-dependent longitude span, so the prefilter is tight
    everywhere except near the poles."""
    lat_delta = radius_km / 111.32
    lng_delta = lat_delta / F.cos(F.radians(F.col(center_lat)))
    dist = haversine_km(F.col(poi_lat), F.col(poi_lng), F.col(center_lat), F.col(center_lng))
    # ONE join condition with the cheap bbox conjuncts FIRST: the BNL
    # predicate short-circuits left to right, so the trig refine runs
    # only on rows inside the rectangle (a post-join .filter gets
    # pushed into the condition ahead of the bbox, inverting that)
    cand = pois.join(
        F.broadcast(centers),
        (F.col(poi_lat) >= F.col(center_lat) - lat_delta)
        & (F.col(poi_lat) <= F.col(center_lat) + lat_delta)
        & (F.col(poi_lng) >= F.col(center_lng) - lng_delta)
        & (F.col(poi_lng) <= F.col(center_lng) + lng_delta)
        & (dist <= radius_km),
        "inner",
    )
    return cand.withColumn("distance_km", dist)


# ---------------------------------------------------------------------------
# H5 — OSM ring assembly (reference neighbourhoods/extract_neighbourhoods.py:163-296)
# ---------------------------------------------------------------------------


def assemble_rings(segments: list[list[list[float]]]) -> list[list[list[float]]]:
    """Order and flip way segments into closed rings — the OSM
    relation→polygon step, pure Python (executor- or driver-side; runs
    once per relation at ingestion time).

    Each segment is a list of [lng, lat] points. Greedy chaining:
    start a ring with any unused segment, repeatedly append the unused
    segment whose endpoint touches the ring's open end (flipping when
    it matches reversed), until the ring closes or no continuation
    exists (unclosed chains are dropped, as the reference skips
    incomplete relations)."""
    unused = [list(s) for s in segments if len(s) >= 2]
    rings: list[list[list[float]]] = []
    while unused:
        ring = unused.pop(0)
        progress = True
        while progress and ring[0] != ring[-1]:
            progress = False
            end = ring[-1]
            for i, seg in enumerate(unused):
                if seg[0] == end:
                    ring.extend(seg[1:])
                elif seg[-1] == end:
                    ring.extend(list(reversed(seg))[1:])
                else:
                    continue
                unused.pop(i)
                progress = True
                break
        if len(ring) >= 4 and ring[0] == ring[-1]:
            rings.append(ring)
    return rings


def rings_to_multipolygon(rings: list[list[list[float]]]) -> str:
    """Closed rings → GeoJSON MultiPolygon text (outer rings only; the
    reference treats each closed ring as a polygon shell)."""
    return json.dumps(
        {"type": "MultiPolygon", "coordinates": [[ring] for ring in rings]}
    )
