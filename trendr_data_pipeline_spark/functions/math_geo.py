"""Math / geo functions M1–M9 (SURVEY §2.7) — all JVM-side column
expressions; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# M1 — clamp (reference scoring.py:94; intelligent_classifier.py:95)
# ---------------------------------------------------------------------------


def clamp(col: Column, lo: float = 0.0, hi: float = 1.0) -> Column:
    return F.least(F.greatest(col, F.lit(float(lo))), F.lit(float(hi)))


def clamp01(col: Column) -> Column:
    return clamp(col, 0.0, 1.0)


def clamp0100(col: Column) -> Column:
    return clamp(col, 0.0, 100.0)


# ---------------------------------------------------------------------------
# M2 — weighted linear blends (reference scoring.py:82-112 et al.)
# ---------------------------------------------------------------------------


def weighted_blend(**weight_cols: tuple[float, Column]) -> Column:
    """Σ wᵢ·cᵢ — explicit helper so blends read like the reference's
    weight tables (mention 0.60/0.25/0.15, gatto 0.5/0.3/0.2, …)."""
    out = F.lit(0.0)
    for _, (w, c) in weight_cols.items():
        out = out + F.lit(float(w)) * c
    return out


# ---------------------------------------------------------------------------
# M3 — haversine (reference matching.py:102-115 meters, R=6371000)
# ---------------------------------------------------------------------------


def haversine_m(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    r = 6371000.0
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lng2 - lng1)
    a = F.sin(dp / 2) * F.sin(dp / 2) + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2)
    return F.lit(r) * 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def haversine_km(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    return haversine_m(lat1, lng1, lat2, lng2) / 1000.0


# ---------------------------------------------------------------------------
# M4 / M5 — tanh soft cap, log1p volume (intelligent_classifier.py:94,113-117)
# ---------------------------------------------------------------------------


def tanh_soft_cap(raw: Column, scale: float = 100.0) -> Column:
    return F.tanh(raw / F.lit(scale)) * F.lit(scale)


def log1p_volume(n: Column, cap: float = 2000.0) -> Column:
    return clamp01(F.log1p(n) / F.log1p(F.lit(cap)))


# ---------------------------------------------------------------------------
# M6 — geo signal score (reference city_profiles.py:93-236)
# ---------------------------------------------------------------------------

GEO_WEIGHTS = {
    "city_name": 0.4,
    "postal_code": 0.3,
    "admin_region": 0.2,
    "country": 0.1,
    "url_city_segment": 0.3,
    "distance_full": 0.3,
    "distance_half": 0.15,
    "distance_full_km": 3.0,
    "distance_half_km": 15.0,
}


def _any_alias_in(aliases: Column, text: Column) -> Column:
    return F.exists(aliases, lambda a: F.contains(text, F.lower(a)))


def geo_signal_score(
    title: Column,
    snippet: Column,
    url: Column,
    city_aliases: Column,
    admin_names: Column,
    postal_prefixes: Column,
    country_code: Column,
    poi_lat: Column | None = None,
    poi_lng: Column | None = None,
    centroid_lat: Column | None = None,
    centroid_lng: Column | None = None,
) -> Column:
    """Σ of detected signal weights, exactly mirroring the reference's
    component logic (title/snippet alias hit, postal-prefix regex over
    title+snippet+url, admin region, country indicator, /city/ URL
    segment, centroid-distance bands)."""
    w = GEO_WEIGHTS
    t, s, u = F.lower(title), F.lower(snippet), F.lower(url)
    ts = F.concat_ws(" ", t, s)

    city = F.when(_any_alias_in(city_aliases, t) | _any_alias_in(city_aliases, s), w["city_name"]).otherwise(0.0)

    def postal_hit(text: Column) -> Column:
        return F.exists(
            postal_prefixes,
            lambda p: F.regexp_like(text, F.concat(F.lit(r"\b"), p, F.lit(r"\d{1,3}\b"))),
        )

    postal = F.when(postal_hit(t) | postal_hit(s) | postal_hit(u), w["postal_code"]).otherwise(0.0)

    admin = F.when(_any_alias_in(admin_names, t) | _any_alias_in(admin_names, s), w["admin_region"]).otherwise(0.0)

    # country indicators: FR → ['france', 'fr'], else lowercase code
    fr_hit = F.contains(ts, F.lit("france")) | F.contains(ts, F.lit("fr"))
    other_hit = F.contains(ts, F.lower(country_code))
    country = F.when(
        F.when(country_code == "FR", fr_hit).otherwise(other_hit), w["country"]
    ).otherwise(0.0)

    url_seg = F.when(
        F.exists(
            city_aliases,
            lambda a: F.contains(u, F.concat(F.lit("/"), F.lower(a), F.lit("/")))
            | F.contains(u, F.concat(F.lit("/"), F.lower(a), F.lit("-")))
            | F.endswith(u, F.concat(F.lit("/"), F.lower(a))),
        ),
        w["url_city_segment"],
    ).otherwise(0.0)

    if poi_lat is not None and centroid_lat is not None:
        dist_km = haversine_km(poi_lat, poi_lng, centroid_lat, centroid_lng)
        distance = (
            F.when(poi_lat.isNull() | centroid_lat.isNull(), 0.0)
            .when(dist_km < w["distance_full_km"], w["distance_full"])
            .when(dist_km < w["distance_half_km"], w["distance_half"])
            .otherwise(0.0)
        )
    else:
        distance = F.lit(0.0)

    return city + postal + admin + country + url_seg + distance


# ---------------------------------------------------------------------------
# M7 — penalties (reference scoring.py:282-345)
# ---------------------------------------------------------------------------

#: per-expected-country conflicting-mention regexes (scoring.py:317-327)
COUNTRY_CONFLICTS = {
    "FR": [r"\benglish\b", r"\bunited states\b", r"\busa\b", r"\bgermany\b", r"\bspain\b", r"\bitaly\b"],
    "CA": [r"\bfrance\b", r"\bgermany\b", r"\bspain\b", r"\bitaly\b"],
    "US": [r"\bfrance\b", r"\bcanada\b", r"\bgermany\b", r"\bspain\b", r"\bitaly\b"],
    "GB": [r"\bfrance\b", r"\bcanada\b", r"\bgermany\b", r"\bspain\b", r"\bitaly\b"],
    "DE": [r"\bfrance\b", r"\bcanada\b", r"\busa\b", r"\bspain\b", r"\bitaly\b"],
    "ES": [r"\bfrance\b", r"\bcanada\b", r"\busa\b", r"\bgermany\b", r"\bitaly\b"],
    "IT": [r"\bfrance\b", r"\bcanada\b", r"\busa\b", r"\bgermany\b", r"\bspain\b"],
}


def country_mismatch(text: Column, expected_country: Column) -> Column:
    """1.0 (hard reject) when a conflicting country is explicitly
    mentioned for the expected country, else 0.0."""
    out = F.lit(False)
    for code, patterns in COUNTRY_CONFLICTS.items():
        hit = F.lit(False)
        for p in patterns:
            hit = hit | F.regexp_like(text, F.lit(p))
        out = F.when(expected_country == code, hit).otherwise(out)
    return F.when(out, 1.0).otherwise(0.0)


def city_mismatch(text: Column, competing_cities: Column) -> Column:
    """0.15 soft penalty when a competing city appears in the text."""
    return F.when(
        F.exists(competing_cities, lambda c: F.contains(text, F.lower(c))), 0.15
    ).otherwise(0.0)


# ---------------------------------------------------------------------------
# M8 — ε-banded tie-break sort keys (reference scoring.py:182-206, W4)
# ---------------------------------------------------------------------------


def eps_band(score: Column, eps: float = 0.01) -> Column:
    """Quantize a score into ε bands so ordering matches the
    reference's 'scores within ε are equal' comparator: sort by
    (eps_band desc, authority desc, domain asc)."""
    return F.floor(score / F.lit(eps))


# ---------------------------------------------------------------------------
# M9 — cost estimates (reference google_places_ingester.py:106-113)
# ---------------------------------------------------------------------------


def api_cost_usd(calls: Column, per_1000: float = 17.0) -> Column:
    return calls / 1000.0 * F.lit(per_1000)
