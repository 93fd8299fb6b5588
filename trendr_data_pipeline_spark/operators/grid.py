"""Hex/square grid work-queue operators (SURVEY §2.8 H1–H4).

The true H3 library is not in this image, so cell math goes through a
thin provider: ``h3`` when importable, else a deterministic
square-grid fallback with the same API surface (ids are
``sq{res}_{row}_{col}`` over a res-dependent lat/lng lattice). The
DataFrame-level operators — seeding, due-cell selection, saturation
split, state update — are provider-agnostic and are the actual engine
surface (reference scripts/h3_scheduler.py:80-163, 165-212, 256-275,
419-543).
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover — h3 not present in the test image
    import h3 as _h3

    HAVE_H3 = True
except ImportError:
    _h3 = None
    HAVE_H3 = False

#: scan radius per resolution, meters (reference h3_scheduler.py:68-72)
RES_RADIUS_M = {9: 420, 10: 220, 11: 110}

# square-grid fallback: cell edge in degrees per resolution (~matches
# the H3 res 9/10/11 scale at mid latitudes)
_FALLBACK_EDGE_DEG = {9: 0.004, 10: 0.002, 11: 0.001}


# ---------------------------------------------------------------------------
# provider API (pure Python, executor-safe)
# ---------------------------------------------------------------------------


def polygon_to_cells_py(geojson: str, res: int) -> list[str]:
    geom = json.loads(geojson)
    if HAVE_H3:
        return sorted(_h3.polyfill_geojson(geom, res) if hasattr(_h3, "polyfill_geojson") else _h3.geo_to_cells(geom, res))
    # fallback: lattice cells whose center is inside the polygon bbox ∩ polygon
    from .spatial import _covers, _rings

    edge = _FALLBACK_EDGE_DEG[res]
    lats = [pt[1] for poly in _rings(geom) for pt in poly[0]]
    lngs = [pt[0] for poly in _rings(geom) for pt in poly[0]]
    out = []
    r0 = math.floor(min(lats) / edge)
    r1 = math.ceil(max(lats) / edge)
    c0 = math.floor(min(lngs) / edge)
    c1 = math.ceil(max(lngs) / edge)
    for r in range(r0, r1 + 1):
        for c in range(c0, c1 + 1):
            lat, lng = (r + 0.5) * edge, (c + 0.5) * edge
            if _covers(lng, lat, geom):
                out.append(f"sq{res}_{r}_{c}")
    return out


def cell_to_latlng_py(cell: str) -> tuple[float, float]:
    if HAVE_H3 and not cell.startswith("sq"):
        return _h3.cell_to_latlng(cell)
    res, r, c = cell[2:].split("_")
    edge = _FALLBACK_EDGE_DEG[int(res)]
    return ((int(r) + 0.5) * edge, (int(c) + 0.5) * edge)


def cell_resolution_py(cell: str) -> int:
    if HAVE_H3 and not cell.startswith("sq"):
        return _h3.get_resolution(cell)
    return int(cell[2:].split("_")[0])


def cell_to_children_py(cell: str) -> list[str]:
    if HAVE_H3 and not cell.startswith("sq"):
        return sorted(_h3.cell_to_children(cell))
    res, r, c = (int(x) for x in cell[2:].split("_"))
    child_res = res + 1
    ratio = round(_FALLBACK_EDGE_DEG[res] / _FALLBACK_EDGE_DEG[child_res])
    return [
        f"sq{child_res}_{r * ratio + dr}_{c * ratio + dc}"
        for dr in range(ratio)
        for dc in range(ratio)
    ]


# ---------------------------------------------------------------------------
# column wrappers
# ---------------------------------------------------------------------------


def cells_of_polygon(geojson: Column, res: int) -> Column:
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([polygon_to_cells_py(g, res) for g in s])

    return F.pandas_udf(_f, "array<string>")(geojson)


def cell_centroid(cell: Column) -> Column:
    def _f(s: pd.Series) -> pd.DataFrame:
        rows = [cell_to_latlng_py(c) for c in s]
        return pd.DataFrame(rows, columns=["lat", "lng"])

    return F.pandas_udf(_f, "lat double, lng double")(cell)


def cell_children(cell: Column) -> Column:
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([cell_to_children_py(c) for c in s])

    return F.pandas_udf(_f, "array<string>")(cell)


def scan_radius_m(res: Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in RES_RADIUS_M.items() for x in kv])
    return F.element_at(m, res)


# ---------------------------------------------------------------------------
# H1 — seed cells for a city polygon (idempotent)
# ---------------------------------------------------------------------------


def seed_cells(cities: DataFrame, existing: DataFrame | None, res: int = 9) -> DataFrame:
    """One pending row per res-9 cell covering each city polygon;
    idempotent via left-anti against existing state (reference seeds
    only when no cells exist, h3_scheduler.py:95-109)."""
    seeded = cities.select(
        "city_slug", F.explode(cells_of_polygon(F.col("geometry"), res)).alias("h3")
    ).select(
        "h3",
        "city_slug",
        F.lit(res).alias("res"),
        F.lit(None).cast("string").alias("parent_h3"),
        F.lit("pending").alias("status"),
        F.lit(False).alias("saturated"),
        F.lit(None).cast("timestamp").alias("last_scanned_at"),
        F.lit(None).cast("timestamp").alias("next_due_at"),
        F.lit(None).cast("long").alias("results_last"),
        F.lit(0).cast("long").alias("attempts"),
    )
    if existing is not None:
        # 100 TB shape: ``existing`` is the corpus-grain state table
        # while the seeded frame is city-polygon-grain (bounded). A
        # direct left-anti would broadcast or shuffle the corpus side;
        # instead semi-reduce existing by broadcasting the bounded
        # seeded keys into its scan, then anti against the ≤|seeded|
        # intersection — existing is scanned once, never shuffled,
        # never broadcast (the c60 gate pins the semantics, this
        # keeps the plan's big side stream-only).
        hits = existing.select("h3").join(
            F.broadcast(seeded.select("h3")), "h3", "left_semi"
        )
        seeded = seeded.join(F.broadcast(hits), "h3", "left_anti")
    return seeded


# ---------------------------------------------------------------------------
# F8 — due-cell selection
# ---------------------------------------------------------------------------


def due_cells(state: DataFrame, city_slug: str, as_of: Column, limit: int) -> DataFrame:
    """Cells of a city, not split, ordered by res then next_due_at
    nulls-first, limited (reference h3_scheduler.py:165-212)."""
    return (
        state.filter((F.col("city_slug") == city_slug) & (F.col("status") != "split"))
        .filter(F.col("next_due_at").isNull() | (F.col("next_due_at") <= as_of))
        .orderBy(F.col("res").asc(), F.col("next_due_at").asc_nulls_first(), F.col("h3").asc())
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# H3 — saturation split
# ---------------------------------------------------------------------------


def split_saturated(
    state: DataFrame,
    cities: DataFrame,
    scan_cap: int = 60,
    max_res: int = 11,
) -> DataFrame:
    """Replace saturated cells (results ≥ cap) below max_res with their
    children whose centroid falls inside the city polygon; parents move
    to status='split' (reference h3_scheduler.py:256-275,419-493).

    One driver-side iteration (the reference's loop is per-scan too);
    the transformation itself is set-oriented: explode children →
    centroid UDF → point-in-polygon filter → union."""
    from .spatial import covered_by

    sat = state.filter(
        (F.col("results_last") >= scan_cap) & (F.col("res") < max_res) & (F.col("status") != "split")
    )
    parents_split = state.join(sat.select("h3"), "h3", "left_semi").withColumn(
        "status", F.lit("split")
    )
    untouched = state.join(sat.select("h3"), "h3", "left_anti")

    children = (
        sat.select("h3", "city_slug", "res", F.explode(cell_children(F.col("h3"))).alias("child"))
        .withColumn("_c", cell_centroid(F.col("child")))
        .join(F.broadcast(cities.select("city_slug", "geometry")), "city_slug")
        .filter(covered_by(F.col("_c.lat"), F.col("_c.lng"), F.col("geometry")))
        .select(
            F.col("child").alias("h3"),
            "city_slug",
            (F.col("res") + 1).alias("res"),
            F.col("h3").alias("parent_h3"),
            F.lit("pending").alias("status"),
            F.lit(False).alias("saturated"),
            F.lit(None).cast("timestamp").alias("last_scanned_at"),
            F.lit(None).cast("timestamp").alias("next_due_at"),
            F.lit(None).cast("long").alias("results_last"),
            F.lit(0).cast("long").alias("attempts"),
        )
    )
    return untouched.unionByName(parents_split).unionByName(children)


# ---------------------------------------------------------------------------
# H4 — scan-result state update (MERGE as window-dedup-latest)
# ---------------------------------------------------------------------------


def update_scanned(
    state: DataFrame, scans: DataFrame, as_of: Column, rescan_days: int = 7, scan_cap: int = 60
) -> DataFrame:
    """Apply scan results (h3, results count) to the state table:
    status scanned/saturated, next_due += rescan interval, attempts+1
    (reference h3_scheduler.py:495-543)."""
    updated = (
        state.join(scans.select("h3", F.col("results").alias("_results")), "h3", "inner")
        .withColumn("results_last", F.col("_results"))
        .withColumn("saturated", F.col("_results") >= scan_cap)
        .withColumn(
            "status", F.when(F.col("saturated"), "saturated").otherwise(F.lit("scanned"))
        )
        .withColumn("last_scanned_at", as_of)
        .withColumn("next_due_at", F.timestamp_add("DAY", F.lit(rescan_days), as_of))
        .withColumn("attempts", F.col("attempts") + 1)
        .drop("_results")
    )
    untouched = state.join(scans.select("h3"), "h3", "left_anti")
    return untouched.unionByName(updated)
