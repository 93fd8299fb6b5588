"""Date/time functions DT1–DT9 (SURVEY §2.7).

Every time-dependent expression takes an explicit ``as_of`` column or
literal — the reference calls ``datetime.now()`` inside operators
(reference ``scoring.py:371``, ``intelligent_classifier.py:65``); the
engine forbids wall-clock so plans are replayable and oracle-checkable
(SURVEY §4 determinism discipline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# DT1 — flexible date parsing (reference date_enricher.py:328-414)
# ---------------------------------------------------------------------------

_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
    # french month prefixes used by the reference's regex fallbacks
    "janvier": 1, "fevrier": 2, "mars": 3, "avril": 4, "mai": 5, "juin": 6,
    "juillet": 7, "aout": 8, "septembre": 9, "octobre": 10,
    "novembre": 11, "decembre": 12,
}


def parse_date_flexible(col: Column) -> Column:
    """coalesce-ladder over the reference's accepted formats: ISO
    (with/without Z), ``d mon yyyy``, ``mon d, yyyy``, ``d/m/yyyy``,
    ``yyyy-m-d``."""
    # try_to_timestamp: under ANSI mode (Spark 4 default) a failed
    # parse inside coalesce would throw, not yield NULL
    iso = F.try_to_timestamp(F.regexp_replace(col, r"Z$", "+00:00"))
    dmy_slash = F.try_to_timestamp(col, F.lit("d/M/yyyy"))
    ymd = F.try_to_timestamp(col, F.lit("yyyy-M-d"))
    # '12 mar 2024' / 'mar 12, 2024' via a month-name map join-free rewrite
    mon_map = F.create_map(*[F.lit(x) for kv in _MONTHS.items() for x in kv])
    lower = F.lower(col)
    d_mon_y = F.regexp_extract(lower, r"^(\d{1,2}) ([a-z]+),? (\d{4})$", 0)
    mon_d_y = F.regexp_extract(lower, r"^([a-z]+) (\d{1,2}),? (\d{4})$", 0)
    d_mon_y_ts = F.when(
        d_mon_y != "",
        F.make_timestamp(
            F.regexp_extract(lower, r"(\d{4})$", 1).cast("int"),
            F.element_at(mon_map, F.regexp_extract(lower, r"^\d{1,2} ([a-z]+)", 1)),
            F.regexp_extract(lower, r"^(\d{1,2})", 1).cast("int"),
            F.lit(0), F.lit(0), F.lit(0),
        ),
    )
    mon_d_y_ts = F.when(
        mon_d_y != "",
        F.make_timestamp(
            F.regexp_extract(lower, r"(\d{4})$", 1).cast("int"),
            F.element_at(mon_map, F.regexp_extract(lower, r"^([a-z]+)", 1)),
            F.regexp_extract(lower, r"^[a-z]+ (\d{1,2})", 1).cast("int"),
            F.lit(0), F.lit(0), F.lit(0),
        ),
    )
    return F.coalesce(iso, dmy_slash, ymd, d_mon_y_ts, mon_d_y_ts)


# ---------------------------------------------------------------------------
# DT2 — date validation (reference date_enricher.py:416-430)
# ---------------------------------------------------------------------------


def is_valid_published_date(ts: Column, as_of: Column) -> Column:
    """Reject future (beyond +24 h skew) and pre-1990 dates."""
    return (ts <= as_of + F.expr("INTERVAL 24 HOURS")) & (
        ts >= F.lit("1990-01-01").cast("timestamp")
    )


# ---------------------------------------------------------------------------
# DT3 — URL date inference (reference date_enricher.py:265-297)
# ---------------------------------------------------------------------------


def date_from_url(url: Column) -> Column:
    ymd_path = F.regexp_extract(url, r"/(\d{4})/(\d{1,2})/(\d{1,2})/", 0)
    ymd_dash = F.regexp_extract(url, r"/(\d{4})-(\d{1,2})-(\d{1,2})", 0)
    qdate = F.regexp_extract(url, r"[?&]date=(\d{4}-\d{2}-\d{2})", 1)

    def mk(pattern: str) -> Column:
        return F.make_date(
            F.regexp_extract(url, pattern, 1).cast("int"),
            F.regexp_extract(url, pattern, 2).cast("int"),
            F.regexp_extract(url, pattern, 3).cast("int"),
        )

    return F.coalesce(
        F.when(ymd_path != "", mk(r"/(\d{4})/(\d{1,2})/(\d{1,2})/")),
        F.when(ymd_dash != "", mk(r"/(\d{4})-(\d{1,2})-(\d{1,2})")),
        F.when(qdate != "", F.to_date(qdate)),
    ).cast("timestamp")


# ---------------------------------------------------------------------------
# DT5 — date hierarchy with confidence (reference date_enricher.py:42-77)
# ---------------------------------------------------------------------------

#: method → confidence (reference date_enricher.py:18-29)
METHOD_CONFIDENCE = {
    "rss": "high",
    "schema_org": "high",
    "custom_selector": "high",
    "opengraph": "medium",
    "meta_article": "medium",
    "url_inference": "low",
    "http_last_modified": "low",
    "serp": "low",
}


def date_hierarchy(**method_cols: Column) -> tuple[Column, Column, Column]:
    """coalesce-ladder over per-method date columns, in the reference's
    priority order; returns (published_at, confidence, method).

    Call as ``date_hierarchy(rss=c1, schema_org=c2, opengraph=c3, ...)``
    with whatever methods are available; priority follows
    METHOD_CONFIDENCE's declaration order.
    """
    ordered = [m for m in METHOD_CONFIDENCE if m in method_cols]
    published = F.coalesce(*[method_cols[m] for m in ordered])
    method = F.lit(None).cast("string")
    conf = F.lit(None).cast("string")
    for m in reversed(ordered):
        method = F.when(method_cols[m].isNotNull(), F.lit(m)).otherwise(method)
        conf = F.when(
            method_cols[m].isNotNull(), F.lit(METHOD_CONFIDENCE[m])
        ).otherwise(conf)
    return published, conf, method


# ---------------------------------------------------------------------------
# DT6/DT7 — age and exponential time decay (reference scoring.py:348-402;
# per-source-type variant intelligent_classifier.py:73-87)
# ---------------------------------------------------------------------------


def age_days(ts: Column, as_of: Column) -> Column:
    return F.datediff(as_of, ts)


def time_decay(
    ts: Column,
    as_of: Column,
    tau_days: Column | float = 90.0,
    max_age_days: float | None = 365.0,
    missing_value: float = 0.5,
) -> Column:
    """``exp(-age/τ)`` clamped to [0,1]; 0 beyond max_age; fallback for
    null timestamps (the reference uses 0.5 when no date,
    ``intelligent_classifier.py:87``)."""
    tau = F.lit(tau_days) if isinstance(tau_days, (int, float)) else tau_days
    age = age_days(ts, as_of).cast("double")
    decay = F.exp(-age / tau)
    out = F.when(ts.isNull(), F.lit(missing_value))
    if max_age_days is not None:
        out = out.when(age > F.lit(max_age_days), F.lit(0.0))
    return out.otherwise(F.least(F.greatest(decay, F.lit(0.0)), F.lit(1.0)))


#: per-source-type decay constants τ (reference intelligent_classifier.py:32-43)
SOURCE_TYPE_TAU = {"guide": 180.0, "press": 75.0, "local": 30.0}


def source_type_tau(source_type: Column, default: float = 90.0) -> Column:
    m = F.create_map(*[F.lit(x) for kv in SOURCE_TYPE_TAU.items() for x in kv])
    return F.coalesce(F.element_at(m, source_type), F.lit(default))


# ---------------------------------------------------------------------------
# DT8 — TTL / interval predicates (reference DT8 citations)
# ---------------------------------------------------------------------------


def is_due(last_done: Column, as_of: Column, interval_days: float) -> Column:
    """True when never done or the interval has elapsed — the 7d cell
    rescan / 7d snapshot / 24h rescore gates."""
    return last_done.isNull() | (F.datediff(as_of, last_done) >= F.lit(interval_days))


# ---------------------------------------------------------------------------
# DT9 — seasonal context (reference ai/collection_generator.py:618-653)
# ---------------------------------------------------------------------------


def season_of(as_of: Column) -> Column:
    m = F.month(as_of)
    return (
        F.when(m.isin(12, 1, 2), "winter")
        .when(m.isin(3, 4, 5), "spring")
        .when(m.isin(6, 7, 8), "summer")
        .otherwise("autumn")
    )


# ---------------------------------------------------------------------------
# DT4 — SERP snippet date (reference date_enricher.py:79-102)
# ---------------------------------------------------------------------------

_MON_GROUP = "(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)"


def date_from_snippet(snippet: Column) -> Column:
    """First match of the reference's three snippet patterns:
    'd mon 20yy', '20yy-mm-dd', 'd/m/20yy' (case-insensitive)."""
    s = F.lower(snippet)
    mon_map = F.create_map(
        *[F.lit(x) for kv in
          {m: i + 1 for i, m in
           enumerate(["jan", "feb", "mar", "apr", "may", "jun",
                      "jul", "aug", "sep", "oct", "nov", "dec"])}.items()
          for x in kv]
    )
    p1 = rf"(\d{{1,2}})\s+{_MON_GROUP}\s+(20\d{{2}})"
    d_mon = F.when(
        F.regexp_extract(s, p1, 0) != "",
        F.make_date(
            F.regexp_extract(s, p1, 3).cast("int"),
            F.element_at(mon_map, F.regexp_extract(s, p1, 2)),
            F.regexp_extract(s, p1, 1).cast("int"),
        ),
    )
    p2 = r"(20\d{2})-(\d{2})-(\d{2})"
    iso = F.when(
        F.regexp_extract(s, p2, 0) != "",
        F.make_date(
            F.regexp_extract(s, p2, 1).cast("int"),
            F.regexp_extract(s, p2, 2).cast("int"),
            F.regexp_extract(s, p2, 3).cast("int"),
        ),
    )
    p3 = r"(\d{1,2})/(\d{1,2})/(20\d{2})"
    dmy = F.when(
        F.regexp_extract(s, p3, 0) != "",
        F.make_date(
            F.regexp_extract(s, p3, 3).cast("int"),
            F.regexp_extract(s, p3, 2).cast("int"),
            F.regexp_extract(s, p3, 1).cast("int"),
        ),
    )
    return F.coalesce(d_mon, iso, dmy).cast("timestamp")
