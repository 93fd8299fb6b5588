"""Scalar-function surface under the oracle gate: date parsing (DT1/
DT3), URL normalization + domain extraction (ST6–ST8), catalog domain
resolution (J4), haversine distance bands (M3/M6), slug/country
transforms (ST10/ST11), TTL due-filters (DT8). Inputs are derived
deterministically from the generic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import is_due, parse_date_flexible, season_of
from ..functions.math_geo import haversine_km
from ..functions.text import (
    country_from_address,
    domain_of,
    normalize_url,
    slugify,
)
from ..io import read_table
from .registry import register

# ---------------------------------------------------------------------------
# s01 — DT1 flexible date parsing + DT5 date hierarchy (merged r4: the
# driver's correctness pass records at most 50 queries, so same-grain
# scalar gates share one query; s07's hierarchy columns ride along)
# ---------------------------------------------------------------------------

_MONTH_ABBR = ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"]


@register(
    "zs01_flexible_date_parse",
    f"""
    WITH s AS (
        SELECT o_orderkey,
               CASE o_orderkey % 4
                 WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
                 WHEN 1 THEN CAST(day(o_orderdate) AS VARCHAR) || ' ' ||
                             ['{"','".join(_MONTH_ABBR)}'][month(o_orderdate)] || ' ' ||
                             CAST(year(o_orderdate) AS VARCHAR)
                 WHEN 2 THEN CAST(day(o_orderdate) AS VARCHAR) || '/' ||
                             CAST(month(o_orderdate) AS VARCHAR) || '/' ||
                             CAST(year(o_orderdate) AS VARCHAR)
                 ELSE CAST(year(o_orderdate) AS VARCHAR) || '-' ||
                      CAST(month(o_orderdate) AS VARCHAR) || '-' ||
                      CAST(day(o_orderdate) AS VARCHAR)
               END AS raw,
               CASE WHEN o_orderkey % 4 = 0 THEN o_orderdate END AS rss_dt,
               CASE WHEN o_orderkey % 3 = 0 THEN o_orderdate + INTERVAL 1 DAY END AS schema_dt,
               CASE WHEN o_orderkey % 2 = 0 THEN o_orderdate + INTERVAL 2 DAY END AS og_dt,
               CASE WHEN o_orderkey % 5 = 0 THEN o_orderdate + INTERVAL 3 DAY END AS url_dt
        FROM orders
    )
    SELECT o_orderkey, raw,
           COALESCE(
             TRY_CAST(raw AS TIMESTAMP),
             TRY_STRPTIME(raw, '%-d %b %Y'),
             TRY_STRPTIME(raw, '%-d/%-m/%Y'),
             TRY_STRPTIME(raw, '%Y-%-m-%-d')
           ) AS parsed,
           COALESCE(rss_dt, schema_dt, og_dt, url_dt) AS published_at,
           CASE WHEN rss_dt IS NOT NULL THEN 'high'
                WHEN schema_dt IS NOT NULL THEN 'high'
                WHEN og_dt IS NOT NULL THEN 'medium'
                WHEN url_dt IS NOT NULL THEN 'low' END AS confidence,
           CASE WHEN rss_dt IS NOT NULL THEN 'rss'
                WHEN schema_dt IS NOT NULL THEN 'schema_org'
                WHEN og_dt IS NOT NULL THEN 'opengraph'
                WHEN url_dt IS NOT NULL THEN 'url_inference' END AS method
    FROM s
    """,
)
def s01_flexible_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DT1: four serialization styles of o_orderdate (ISO, 'd mon
    yyyy', 'd/m/yyyy', 'yyyy-m-d') round-tripped through the
    coalesce-ladder parser (reference date_enricher.py:328-414),
    PLUS DT5's priority coalesce-ladder over per-method date columns
    (published_at, confidence, method — date_enricher.py:42-77) on the
    same orders grain."""
    from ..functions.dates import date_hierarchy
    from ..io import spread

    # the try_to_timestamp ladder evaluates 4+ parse attempts per row;
    # a single-row-group input would run the whole ladder on one core
    # (r13, guide §2.5 input skew) — spread is a no-op on real layouts
    o = spread(read_table(spark, sf_dir, "orders"))
    month_arr = F.array(*[F.lit(m) for m in _MONTH_ABBR])
    d, m, y = F.dayofmonth("o_orderdate"), F.month("o_orderdate"), F.year("o_orderdate")
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(
            F.col("o_orderkey") % 4 == 1,
            F.concat_ws(" ", d.cast("string"), F.element_at(month_arr, m), y.cast("string")),
        )
        .when(
            F.col("o_orderkey") % 4 == 2,
            F.concat_ws("/", d.cast("string"), m.cast("string"), y.cast("string")),
        )
        .otherwise(F.concat_ws("-", y.cast("string"), m.cast("string"), d.cast("string")))
    )
    day = lambda n: F.col("o_orderdate") + F.expr(f"INTERVAL {n} DAYS")  # noqa: E731
    s = o.select(
        "o_orderkey",
        raw.alias("raw"),
        F.when(F.col("o_orderkey") % 4 == 0, F.col("o_orderdate")).alias("rss_dt"),
        F.when(F.col("o_orderkey") % 3 == 0, day(1)).alias("schema_dt"),
        F.when(F.col("o_orderkey") % 2 == 0, day(2)).alias("og_dt"),
        F.when(F.col("o_orderkey") % 5 == 0, day(3)).alias("url_dt"),
    )
    published, conf, method = date_hierarchy(
        rss=F.col("rss_dt"),
        schema_org=F.col("schema_dt"),
        opengraph=F.col("og_dt"),
        url_inference=F.col("url_dt"),
    )
    return s.select(
        "o_orderkey",
        "raw",
        parse_date_flexible(F.col("raw")).alias("parsed"),
        published.alias("published_at"),
        conf.alias("confidence"),
        method.alias("method"),
    )


# ---------------------------------------------------------------------------
# s02 — ST6/ST8 URL normalization + domain/apex, merged r4 with the J4
# catalog domain resolution (s03): same orders grain, one gate under
# the driver's 50-query correctness cap. The URL-derived host is
# emitted as ``url_domain``; ``domain`` is the resolution candidate.
# ---------------------------------------------------------------------------

_CATALOG = [
    ("lefooding", "https://www.lefooding.com", "guide", 1.0),
    ("timeout_fr", "https://www.timeout.fr", "press", 0.8),
    ("sortiraparis", "https://www.sortiraparis.com", "local", 0.6),
    ("leblog", "https://food.leblog.fr", "blog", 0.5),
    ("example0", "https://blog0.example.fr", "press", 0.7),
]

_SQL_CATALOG_VALUES = ", ".join(
    f"('{sid}', '{url}', '{typ}', CAST({w} AS DOUBLE))" for sid, url, typ, w in _CATALOG
)


@register(
    "zs02_url_functions",
    f"""
    WITH cat(source_id, base_url, type, authority_weight) AS (
        VALUES {_SQL_CATALOG_VALUES}
    ),
    cat_d AS (
        SELECT *, regexp_replace(lower(regexp_extract(base_url, '://([^/]+)', 1)),
                                 '^www\\.', '') AS catalog_domain
        FROM cat
    ),
    u AS (
        SELECT o_orderkey,
               'https://www.blog' || CAST(o_orderkey % 7 AS VARCHAR)
               || '.example.fr/fr/articles/story-' || CAST(o_orderkey % 100 AS VARCHAR)
               || CASE WHEN o_orderkey % 3 = 0 THEN '?utm_source=x&utm_campaign=y' ELSE '' END
               || CASE WHEN o_orderkey % 5 = 0 THEN '#section' ELSE '' END
               || CASE WHEN o_orderkey % 4 = 0 THEN '/' ELSE '' END AS url
        FROM orders
    ),
    uf AS (
        SELECT o_orderkey,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
               '#.*$', ''), '[?&]utm_(source|medium|campaign|content|term)=[^&]*', '', 'g'),
               '\\?&', '?', 'g'), '/+$', '') AS url_norm,
           regexp_replace(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)),
               '^www\\.', '') AS url_domain,
           CASE WHEN len(string_split(regexp_replace(lower(regexp_extract(url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)), '^www\\.', ''), '.')) <= 2
                THEN regexp_replace(lower(regexp_extract(url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)), '^www\\.', '')
                ELSE array_to_string(string_split(regexp_replace(lower(regexp_extract(url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)), '^www\\.', ''), '.')[-2:], '.')
           END AS apex
        FROM u
    ),
    cands AS (
        SELECT o_orderkey,
               CASE o_orderkey % 6
                 WHEN 0 THEN 'lefooding.com'
                 WHEN 1 THEN 'www.timeout.fr'
                 WHEN 2 THEN 'guides.sortiraparis.com'
                 WHEN 3 THEN 'food.leblog.fr'
                 WHEN 4 THEN 'blog' || CAST(o_orderkey % 3 AS VARCHAR) || '.example.fr'
                 ELSE 'unknown' || CAST(o_orderkey % 10 AS VARCHAR) || '.org'
               END AS raw
        FROM orders
    ),
    d AS (SELECT o_orderkey, regexp_replace(lower(raw), '^www\\.', '') AS domain FROM cands),
    exact AS (
        SELECT d.o_orderkey, d.domain, c.source_id, c.authority_weight
        FROM d LEFT JOIN cat_d c ON d.domain = c.catalog_domain
    ),
    suffix AS (
        SELECT e.o_orderkey, e.domain, c.source_id, c.authority_weight,
               ROW_NUMBER() OVER (PARTITION BY e.o_orderkey
                                  ORDER BY len(c.catalog_domain) DESC, c.source_id) AS rk
        FROM (SELECT * FROM exact WHERE source_id IS NULL) e
        LEFT JOIN cat_d c
          ON suffix(e.domain, c.catalog_domain) OR suffix(c.catalog_domain, e.domain)
    ),
    resolved AS (
        SELECT o_orderkey, domain,
               COALESCE(source_id, 'unknown') AS source_id,
               COALESCE(authority_weight, 0.4) AS authority_weight
        FROM (
            SELECT o_orderkey, domain, source_id, authority_weight FROM exact
            WHERE source_id IS NOT NULL
            UNION ALL
            SELECT o_orderkey, domain, source_id, authority_weight FROM suffix WHERE rk = 1
        )
    )
    SELECT uf.o_orderkey, uf.url_norm, uf.url_domain, uf.apex,
           r.domain, r.source_id, r.authority_weight
    FROM uf JOIN resolved r ON uf.o_orderkey = r.o_orderkey
    """,
)
def s02_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 normalize_url + ST8 domain/apex on synthesized URLs with
    utm params, fragments, trailing slashes, www prefixes — PLUS J4
    via the real resolve_source operator on the same rows: exact host
    match, then the bidirectional-suffix pass with pinned tie-break;
    unknown domains get the discovered-source default weight 0.4
    (reference utils/database.py:617-688, 553-583). One orders scan on
    the Spark side (resolve_source preserves its input columns, so the
    URL-function columns ride through the resolution joins)."""
    from ..functions.text import apex_domain
    from ..io import spread
    from ..operators.mentions import resolve_source
    from ..schemas import DOMAIN

    # URL synthesis + normalize/apex regex chain per row — same
    # single-row-group parallelization note as s01 (spread: no-op on
    # properly laid-out inputs)
    o = spread(read_table(spark, sf_dir, "orders"))
    url = F.concat(
        F.lit("https://www.blog"),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit(".example.fr/fr/articles/story-"),
        (F.col("o_orderkey") % 100).cast("string"),
        F.when(F.col("o_orderkey") % 3 == 0, "?utm_source=x&utm_campaign=y").otherwise(""),
        F.when(F.col("o_orderkey") % 5 == 0, "#section").otherwise(""),
        F.when(F.col("o_orderkey") % 4 == 0, "/").otherwise(""),
    )
    raw = (
        F.when(F.col("o_orderkey") % 6 == 0, F.lit("lefooding.com"))
        .when(F.col("o_orderkey") % 6 == 1, F.lit("www.timeout.fr"))
        .when(F.col("o_orderkey") % 6 == 2, F.lit("guides.sortiraparis.com"))
        .when(F.col("o_orderkey") % 6 == 3, F.lit("food.leblog.fr"))
        .when(
            F.col("o_orderkey") % 6 == 4,
            F.concat(F.lit("blog"), (F.col("o_orderkey") % 3).cast("string"), F.lit(".example.fr")),
        )
        .otherwise(
            F.concat(F.lit("unknown"), (F.col("o_orderkey") % 10).cast("string"), F.lit(".org"))
        )
    )
    dom = domain_of(url)
    cands = o.select(
        "o_orderkey",
        normalize_url(url).alias("url_norm"),
        dom.alias("url_domain"),
        apex_domain(dom).alias("apex"),
        F.regexp_replace(F.lower(raw), r"^www\.", "").alias("domain"),
        F.col("o_orderkey").alias("poi_id"),
        F.lit("u").alias("url"),
    )
    cat_rows = [
        {**{f.name: None for f in DOMAIN["source_catalog"].fields},
         "source_id": sid, "base_url": url_, "type": typ, "authority_weight": w, "is_active": True}
        for sid, url_, typ, w in _CATALOG
    ]
    catalog = spark.createDataFrame(
        [tuple(r[f.name] for f in DOMAIN["source_catalog"].fields) for r in cat_rows],
        DOMAIN["source_catalog"],
    )
    resolved = resolve_source(cands, catalog)
    return resolved.select(
        "o_orderkey",
        "url_norm",
        "url_domain",
        "apex",
        "domain",
        F.coalesce(F.col("cat_source_id"), F.lit("unknown")).alias("source_id"),
        F.coalesce(F.col("cat_authority"), F.lit(0.4)).alias("authority_weight"),
    )


# ---------------------------------------------------------------------------
# s04 — M3 haversine distance bands, merged r4 with s05's ST10 slug +
# ST11 country-from-address + DT9 seasons (same customer grain, one
# gate under the driver's 50-query correctness cap)
# ---------------------------------------------------------------------------


@register(
    "zs04_haversine_bands",
    """
    WITH pts AS (
        SELECT c_custkey, c_name,
               48.8156 + (c_custkey % 100) * 0.0008 AS lat,
               2.2247 + (c_custkey % 250) * 0.00098 AS lng
        FROM customer
    )
    SELECT c_custkey,
           ROUND(2 * 6371.0 * atan2(
               sqrt(pow(sin(radians(lat - 48.8566) / 2), 2)
                    + cos(radians(48.8566)) * cos(radians(lat))
                    * pow(sin(radians(lng - 2.3522) / 2), 2)),
               sqrt(1 - (pow(sin(radians(lat - 48.8566) / 2), 2)
                    + cos(radians(48.8566)) * cos(radians(lat))
                    * pow(sin(radians(lng - 2.3522) / 2), 2)))), 6) AS dist_km,
           CASE WHEN 2 * 6371.0 * atan2(
                    sqrt(pow(sin(radians(lat - 48.8566) / 2), 2)
                         + cos(radians(48.8566)) * cos(radians(lat))
                         * pow(sin(radians(lng - 2.3522) / 2), 2)),
                    sqrt(1 - (pow(sin(radians(lat - 48.8566) / 2), 2)
                         + cos(radians(48.8566)) * cos(radians(lat))
                         * pow(sin(radians(lng - 2.3522) / 2), 2)))) < 3 THEN CAST(0.3 AS DOUBLE)
                WHEN 2 * 6371.0 * atan2(
                    sqrt(pow(sin(radians(lat - 48.8566) / 2), 2)
                         + cos(radians(48.8566)) * cos(radians(lat))
                         * pow(sin(radians(lng - 2.3522) / 2), 2)),
                    sqrt(1 - (pow(sin(radians(lat - 48.8566) / 2), 2)
                         + cos(radians(48.8566)) * cos(radians(lat))
                         * pow(sin(radians(lng - 2.3522) / 2), 2)))) < 15 THEN CAST(0.15 AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS distance_score,
           regexp_replace(regexp_replace(regexp_replace(lower(
               'Best of ' || c_name || ' 3ème'), 'ème', 'e', 'g'),
               '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g') AS slug,
           CASE WHEN len(list_last(string_split(c_name || ', ' ||
                    CASE c_custkey % 3 WHEN 0 THEN 'France'
                         WHEN 1 THEN 'Italia' ELSE 'US' END, ', '))) > 2
                THEN list_last(string_split(c_name || ', ' ||
                    CASE c_custkey % 3 WHEN 0 THEN 'France'
                         WHEN 1 THEN 'Italia' ELSE 'US' END, ', '))
                ELSE NULL END AS country,
           CASE WHEN (1 + c_custkey % 12) IN (12, 1, 2) THEN 'winter'
                WHEN (1 + c_custkey % 12) IN (3, 4, 5) THEN 'spring'
                WHEN (1 + c_custkey % 12) IN (6, 7, 8) THEN 'summer'
                ELSE 'autumn' END AS season
    FROM pts
    """,
)
def s04_haversine_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 haversine (meters formula /1000) + M6 distance bands against
    the Paris centroid, on a lattice derived from customer keys
    (distances rounded to 1e-6 km — libm ulp differences), PLUS the
    s05 scalar trio on the same grain: ST10 slugify ('ème'→'e',
    punct→dash), ST11 country-from-address tail (rejects ≤2-char tails
    like 'US'), DT9 month→season ladder."""
    c = read_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        "c_name",
        (48.8156 + (F.col("c_custkey") % 100) * 0.0008).alias("lat"),
        (2.2247 + (F.col("c_custkey") % 250) * 0.00098).alias("lng"),
    )
    dist = haversine_km(F.col("lat"), F.col("lng"), F.lit(48.8566), F.lit(2.3522))
    addr = F.concat(
        F.col("c_name"),
        F.lit(", "),
        F.when(F.col("c_custkey") % 3 == 0, "France")
        .when(F.col("c_custkey") % 3 == 1, "Italia")
        .otherwise("US"),
    )
    fake_date = F.make_date(F.lit(2026), (F.col("c_custkey") % 12 + 1).cast("int"), F.lit(1))
    return pts.select(
        "c_custkey",
        F.round(dist, 6).alias("dist_km"),
        F.when(dist < 3, 0.3).when(dist < 15, 0.15).otherwise(0.0).alias("distance_score"),
        slugify(F.concat(F.lit("Best of "), F.col("c_name"), F.lit(" 3ème"))).alias("slug"),
        country_from_address(addr).alias("country"),
        season_of(fake_date).alias("season"),
    )


# ---------------------------------------------------------------------------
# s06 — DT8 TTL due-filter
# ---------------------------------------------------------------------------

_S06_AS_OF = "2000-01-01 00:00:00"


@register(
    "zs06_ttl_due_filter",
    f"""
    WITH st AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderdate END AS last_done
        FROM orders
    )
    SELECT o_orderkey, last_done
    FROM st
    WHERE last_done IS NULL
       OR date_diff('day', CAST(last_done AS DATE), DATE '2000-01-01') >= 7
    """,
)
def s06_ttl_due_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DT8: the 7-day TTL work-selection predicate (never-done OR
    interval elapsed) — the reference's rescan/rescore gates
    (h3_scheduler.py:516-526, intelligent_classifier.py:379-387)."""
    o = read_table(spark, sf_dir, "orders")
    st = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None).cast("timestamp"))
        .otherwise(F.col("o_orderdate"))
        .alias("last_done"),
    )
    as_of = F.lit(_S06_AS_OF).cast("timestamp")
    return st.filter(is_due(F.col("last_done"), as_of, 7))


# ---------------------------------------------------------------------------
# s08 — W5/W7 max_by + ordered limits
# ---------------------------------------------------------------------------


@register(
    "s08_maxby_best_per_group",
    """
    WITH j AS (
        SELECT n.n_name AS nation_name, c.c_name, c.c_acctbal, c.c_custkey
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY nation_name
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rk_hi,
               ROW_NUMBER() OVER (PARTITION BY nation_name
                                  ORDER BY c_acctbal ASC, c_custkey DESC) AS rk_lo
        FROM j
    )
    SELECT nation_name,
           MAX(CASE WHEN rk_hi = 1 THEN c_name END) AS richest_customer,
           MAX(c_acctbal) AS max_acctbal,
           MAX(CASE WHEN rk_lo = 1 THEN c_name END) AS poorest_customer
    FROM r GROUP BY nation_name
    """,
)
def s08_maxby_best_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 'best-of per group' via max_by/min_by (reference photo
    best-of, utils/photo_manager.py:401-429) — tie-broken by key so
    the argmax is deterministic."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    tie = F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("neg_key"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.max_by("c_name", tie).alias("richest_customer"),
            F.max("c_acctbal").alias("max_acctbal"),
            F.min_by("c_name", tie).alias("poorest_customer"),
        )
    )
