"""c55 — driver gate for the spatial association join (J1 family).

The r11 verdict's top ask: the spatial/grid subsystem was the one
remaining reference subsystem with pytest-only verification, because
the fixture carries no geometry. The c51 synthetic-corpus device
removes the excuse — both engines construct the SAME geometry from
fixture-id integer arithmetic, so the oracle needs no fixture change:

- **POIs** from ``customer``: ``lat = (c_custkey*17) % 500 + 0.5``,
  ``lng = (c_custkey*29) % 500 + 0.5`` — every coordinate is an
  integer + 0.5, while every area boundary below is a multiple of 5,
  so no point ever sits ON a rectangle edge (no float-tolerance
  ambiguity between the ray-cast refine and the SQL ``BETWEEN``).
- **Areas** from ``nation`` (25 rows at every SF — the broadcast dim
  J1 assumes), six families over grid coords ``gx=k%5, gy=k//5``:

  | family    | level | type  | shape                          | exercises |
  |-----------|-------|-------|--------------------------------|-----------|
  | district  | '9'   | admin | 100×100 grid cell              | base assignment (covers all POIs) |
  | aa_district (k%7=0) | '9' | admin | same bounds as district | NAME tie-break at equal area+prio |
  | metro (k%6=0) | '9' | admin | 200×200 around the cell    | smallest-area-first (never wins) |
  | pl (all k) | '9'  | place | 100×100 shifted +50,+50        | TYPE priority at equal area |
  | dia (k%3=1) | '9'  | place | diamond r=40 at cell center   | the exact REFINE: bbox hits, ray-cast decides |
  | n (all k) / inner (k%4=0) | '10' | place/admin | 50×50 scatter / 35×35 nested | level split + nested smallest-area + level-10 name ties |

  The diamond family is the load-bearing one: its bbox (6400) admits
  corner points its hull (area 2·r² = 3200) rejects, so the pandas
  ray-cast UDF — not the bbox prefilter — decides coverage, and a
  diamond that covers a POI wins level '9' (3200 < 10000). On-edge
  diamond points (|x−cx|+|y−cy| = 40 exactly — possible, both sums
  are integers) are COVERED on both engines: the ray-caster's
  collinearity test hits exact zero (all products are .5-grid exact)
  and the SQL twin uses ``<=``; near-edge points are ≥ 0.5 away in
  the cross-product metric, far above the 1e-12 tolerance.

Spark runs the REAL operator — :func:`operators.spatial.associate_pois`
(reference ``db.py:247-278``, ``scripts/associate_pois.py:16-44``,
``README.md:58-65``): geom_stats pandas UDF over the GeoJSON dim,
bbox theta-join against the BROADCAST area frame (zero fact-table
shuffle at 100 TB), ray-cast refine, (area asc, type prio, name)
rank per (poi, admin_level), split into district ('9') /
neighbourhood ('10') left-joins. The DuckDB twin rebuilds the same
geometry arithmetically and ranks with a ROW_NUMBER window.

The shapely/non-convex parity path stays pytest-pinned
(tests/test_spatial_grid.py) — this gate pins the convex/rectilinear
semantics cross-engine, which is exactly what the synthetic device
can make byte-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

#: every boundary below is a multiple of 5; POI coords are int + 0.5
_RECT_GEO = (
    '{"type": "Polygon", "coordinates": '
    "[[[%d,%d],[%d,%d],[%d,%d],[%d,%d],[%d,%d]]]}"
)


def _rect(x0: Column, x1: Column, y0: Column, y1: Column) -> Column:
    return F.format_string(_RECT_GEO, x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)


def _diamond(cx: Column, cy: Column, r: int) -> Column:
    return F.format_string(
        _RECT_GEO, cx - r, cy, cx, cy - r, cx + r, cy, cx, cy + r, cx - r, cy
    )


def synthetic_urban_areas(nation: DataFrame) -> DataFrame:
    """The six area families (module docstring table) as the
    ``urban_areas`` frame :func:`associate_pois` expects:
    (name, type, admin_level, geometry)."""
    g = nation.select(
        F.col("n_nationkey").cast("int").alias("k"),
        F.col("n_name").alias("nm"),
        (F.col("n_nationkey") % 5).cast("int").alias("gx"),
        (F.col("n_nationkey") / 5).cast("int").alias("gy"),
    )
    gx0, gy0 = F.col("gx") * 100, F.col("gy") * 100

    def fam(df: DataFrame, name: Column, typ: str, lvl: str, geo: Column) -> DataFrame:
        return df.select(
            name.alias("name"),
            F.lit(typ).alias("type"),
            F.lit(lvl).alias("admin_level"),
            geo.alias("geometry"),
        )

    district = fam(
        g, F.concat(F.lit("district_"), F.col("nm")), "admin", "9",
        _rect(gx0, gx0 + 100, gy0, gy0 + 100),
    )
    aa_district = fam(
        g.filter(F.col("k") % 7 == 0),
        F.concat(F.lit("aa_district_"), F.col("nm")), "admin", "9",
        _rect(gx0, gx0 + 100, gy0, gy0 + 100),
    )
    metro = fam(
        g.filter(F.col("k") % 6 == 0),
        F.concat(F.lit("metro_"), F.col("nm")), "admin", "9",
        _rect(gx0 - 50, gx0 + 150, gy0 - 50, gy0 + 150),
    )
    place = fam(
        g, F.concat(F.lit("pl_"), F.col("nm")), "place", "9",
        _rect(gx0 + 50, gx0 + 150, gy0 + 50, gy0 + 150),
    )
    dia = fam(
        g.filter(F.col("k") % 3 == 1),
        F.concat(F.lit("dia_"), F.col("nm")), "place", "9",
        _diamond(gx0 + 50, gy0 + 50, 40),
    )
    nx0 = (F.col("k") * 7 % 10) * 50
    ny0 = (F.col("k") * 3 % 10) * 50
    neigh = fam(
        g, F.concat(F.lit("n_"), F.col("nm")), "place", "10",
        _rect(nx0, nx0 + 50, ny0, ny0 + 50),
    )
    inner = fam(
        g.filter(F.col("k") % 4 == 0),
        F.concat(F.lit("inner_"), F.col("nm")), "admin", "10",
        _rect(nx0 + 10, nx0 + 45, ny0 + 10, ny0 + 45),
    )
    out = district
    for f in (aa_district, metro, place, dia, neigh, inner):
        out = out.unionByName(f)
    return out


_SQL_AREAS = """
    g AS (
        SELECT n_nationkey AS k, n_name AS nm,
               (n_nationkey % 5) * 100 AS gx0,
               (n_nationkey // 5) * 100 AS gy0,
               ((n_nationkey * 7) % 10) * 50 AS nx0,
               ((n_nationkey * 3) % 10) * 50 AS ny0
        FROM nation
    ),
    rects AS (
        SELECT 'district_' || nm AS name, 'admin' AS typ, '9' AS lvl,
               gx0 AS x0, gx0 + 100 AS x1, gy0 AS y0, gy0 + 100 AS y1 FROM g
        UNION ALL
        SELECT 'aa_district_' || nm, 'admin', '9',
               gx0, gx0 + 100, gy0, gy0 + 100 FROM g WHERE k % 7 = 0
        UNION ALL
        SELECT 'metro_' || nm, 'admin', '9',
               gx0 - 50, gx0 + 150, gy0 - 50, gy0 + 150 FROM g WHERE k % 6 = 0
        UNION ALL
        SELECT 'pl_' || nm, 'place', '9',
               gx0 + 50, gx0 + 150, gy0 + 50, gy0 + 150 FROM g
        UNION ALL
        SELECT 'n_' || nm, 'place', '10',
               nx0, nx0 + 50, ny0, ny0 + 50 FROM g
        UNION ALL
        SELECT 'inner_' || nm, 'admin', '10',
               nx0 + 10, nx0 + 45, ny0 + 10, ny0 + 45 FROM g WHERE k % 4 = 0
    ),
    dias AS (
        SELECT 'dia_' || nm AS name, 'place' AS typ, '9' AS lvl,
               gx0 + 50 AS cx, gy0 + 50 AS cy, 40 AS r FROM g WHERE k % 3 = 1
    )
"""

_SQL_SPATIAL_ASSOCIATION = f"""
    WITH poi AS (
        SELECT c_custkey AS id,
               (c_custkey * 17) % 500 + 0.5 AS lat,
               (c_custkey * 29) % 500 + 0.5 AS lng
        FROM customer
    ),
    {_SQL_AREAS},
    cand AS (
        SELECT p.id, a.lvl, a.name,
               (a.x1 - a.x0) * (a.y1 - a.y0) AS area,
               CASE a.typ WHEN 'admin' THEN 0 WHEN 'place' THEN 1 ELSE 9 END AS prio
        FROM poi p JOIN rects a
          ON p.lng >= a.x0 AND p.lng <= a.x1
         AND p.lat >= a.y0 AND p.lat <= a.y1
        UNION ALL
        SELECT p.id, d.lvl, d.name,
               2.0 * d.r * d.r AS area,
               CASE d.typ WHEN 'admin' THEN 0 WHEN 'place' THEN 1 ELSE 9 END AS prio
        FROM poi p JOIN dias d
          ON abs(p.lng - d.cx) + abs(p.lat - d.cy) <= d.r
    ),
    best AS (
        SELECT id, lvl, name FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY id, lvl ORDER BY area ASC, prio ASC, name ASC
            ) AS rk FROM cand
        ) WHERE rk = 1
    )
    SELECT p.id, d.name AS district_name, n.name AS neighbourhood_name
    FROM poi p
    LEFT JOIN (SELECT id, name FROM best WHERE lvl = '9') d ON p.id = d.id
    LEFT JOIN (SELECT id, name FROM best WHERE lvl = '10') n ON p.id = n.id
"""


@register(
    "c55_spatial_association",
    _SQL_SPATIAL_ASSOCIATION,
    doc="""J1 spatial-association driver gate (r11 verdict item 1, via
    the c51 synthetic-geometry device): POIs and a six-family area set
    built from fixture-id integer arithmetic on both engines; Spark
    runs the REAL associate_pois (broadcast bbox theta-join → pandas
    ray-cast refine → area/priority/name rank → district/neighbourhood
    split), DuckDB ranks the same candidates arithmetically. The
    diamond family makes the refine step decisive (its bbox admits
    corner points its hull rejects), so a broken ray-caster — not just
    a broken rank — breaks the hash. Full POI frame hashed including
    the NULL-neighbourhood leg.""",
)
def c55_spatial_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import associate_pois

    pois = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 17) % 500 + 0.5).alias("lat"),
        ((F.col("c_custkey") * 29) % 500 + 0.5).alias("lng"),
    )
    areas = synthetic_urban_areas(read_table(spark, sf_dir, "nation"))
    return associate_pois(pois, areas).select(
        "id", "district_name", "neighbourhood_name"
    )


# ---------------------------------------------------------------------------
# c59 — J8 radius join driver gate (r12 verdict item 2a)
# ---------------------------------------------------------------------------

#: radius chosen by a numeric scan over the FULL planted lattice (all
#: poi×center grid combinations): every achievable haversine distance
#: sits ≥ 1.22 km away from 15.2, so libm-ulp differences between the
#: JVM and DuckDB trig can never flip the ≤ r membership; the bbox
#: prefilter (lat span r/111.32 deg) admits every true pair (the gap
#: between 1/111.32 and the true 1/111.195 deg/km lies between lattice
#: steps) while 42 in-bbox candidates at sf0.01 (4 at sf0.001, 416 at
#: sf0.1) fail the exact refine — the haversine refine DECIDES, the
#: bbox only prunes
_C59_R_KM = 15.2

_SQL_RADIUS_JOIN = f"""
    WITH pois AS (
        SELECT c_custkey AS poi_id,
               40.0 + 0.05 * (c_custkey % 60) AS lat,
               2.0 + 0.05 * ((7 * (c_custkey % 60) + c_custkey // 60) % 60) AS lng
        FROM customer
    ),
    centers AS (
        SELECT n_nationkey AS center_id,
               40.5 + 0.5 * (n_nationkey % 5) AS c_lat,
               2.5 + 0.5 * ((n_nationkey // 5) % 5) AS c_lng
        FROM nation
    )
    SELECT poi_id, center_id,
           ROUND(2 * 6371.0 * atan2(
               sqrt(pow(sin(radians(c_lat - lat) / 2), 2)
                    + cos(radians(lat)) * cos(radians(c_lat))
                    * pow(sin(radians(c_lng - lng) / 2), 2)),
               sqrt(1 - (pow(sin(radians(c_lat - lat) / 2), 2)
                    + cos(radians(lat)) * cos(radians(c_lat))
                    * pow(sin(radians(c_lng - lng) / 2), 2)))), 6) AS distance_km
    FROM pois JOIN centers
      ON 2 * 6371.0 * atan2(
               sqrt(pow(sin(radians(c_lat - lat) / 2), 2)
                    + cos(radians(lat)) * cos(radians(c_lat))
                    * pow(sin(radians(c_lng - lng) / 2), 2)),
               sqrt(1 - (pow(sin(radians(c_lat - lat) / 2), 2)
                    + cos(radians(lat)) * cos(radians(c_lat))
                    * pow(sin(radians(c_lng - lng) / 2), 2)))) <= {_C59_R_KM}
"""


@register(
    "c59_radius_join",
    _SQL_RADIUS_JOIN,
    doc="""J8 radius join driver gate (r12 verdict item 2 — the last
    spatial-family member with pytest-only verification alongside H1;
    reference ``utils/database.py:224-237`` nearby-POIs RPC). The
    c55 synthetic device: POIs on a 0.05°-step lattice from customer
    keys (lat idx = k%60, lng idx = (7·(k%60) + k//60) % 60 — the
    second coordinate mixes in k//60 so the joint coverage is 2-D at
    every SF; a pure (ak%60, bk%60) pair collapses to a 60-point
    1-D sublattice, the c56 modular-collapse pitfall), 25 centers on
    a 0.5° grid from nation keys. Spark runs the REAL
    :func:`operators.spatial.radius_join` — broadcast center dim,
    latitude-corrected bbox theta-join (zero fact shuffle at 100 TB),
    exact haversine refine; the DuckDB twin brute-forces the θ-join
    with the same R=6371 km formula. Distances round to 1e-6 km on
    both sides and the planted lattice keeps every achievable
    distance ≥1.22 km from the radius, so the hash is
    libm-ulp-proof; 42 in-bbox candidates at sf0.01 fail the refine,
    so a bbox-only implementation breaks the hash.""",
)
def c59_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import radius_join

    cust = read_table(spark, sf_dir, "customer")
    li = F.col("c_custkey") % 60
    pois = cust.select(
        F.col("c_custkey").alias("poi_id"),
        (40.0 + 0.05 * li).alias("lat"),
        (2.0 + 0.05 * ((7 * li + (F.col("c_custkey") / 60).cast("long")) % 60)).alias(
            "lng"
        ),
    )
    nat = read_table(spark, sf_dir, "nation")
    centers = nat.select(
        F.col("n_nationkey").alias("center_id"),
        (40.5 + 0.5 * (F.col("n_nationkey") % 5)).alias("c_lat"),
        (2.5 + 0.5 * ((F.col("n_nationkey") / 5).cast("long") % 5)).alias("c_lng"),
    )
    out = radius_join(pois, centers, radius_km=_C59_R_KM)
    return out.select(
        "poi_id", "center_id", F.round("distance_km", 6).alias("distance_km")
    )
