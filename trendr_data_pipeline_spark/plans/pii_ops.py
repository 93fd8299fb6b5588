"""c51 — driver gate for PII redaction (⊕T7), r11 verdict item 2.

The ``functions.pii`` ladder (EMAIL → IPV4 → PHONE, C4-style corpus
scrubbing) has carried only pytest oracles since r6 because the
bundled ``documents`` fixture contains no PII-shaped text — a driver
gate on it would hash an identity transform. r10's zc42 device (a
deterministic JVM-side synthetic corpus when the fixture can't carry
the semantics) is the fix the r10 verdict prescribed: both engines
construct the SAME corpus from the fixture's ``doc_id`` column —
filler tokens from md5 hex (identical lowercase hex in Spark and
DuckDB), planted PII from pure integer arithmetic (identical BIGINT
``%`` semantics) — so the oracle needs no fixture change and no
Python-side generation.

Plant layout per doc (single-space ``concat_ws``; absent parts are
NULL and skipped by both engines):

    w0 w1 [email if id%3=0] w2 w3 [ipv4 if id%4=0] w4
    [phone if id%5=0] w5

which yields every co-occurrence class — email+ip (id%12), email+
phone (id%15), ip+phone (id%20), all three (id%60), none (~40 %) —
and exercises the ladder's ordering guarantees: the email's digit
runs and dotted domain (``@mail<k>.example.com``) are exactly the
shapes the IPV4/PHONE rules would mis-eat if they ran first; counts
are taken on the progressively redacted text (mirroring
``pii_counts``) so a match consumed by an earlier rule is never
double-counted.

Scale shape: one projection over a doc_id scan + three scan-local
``regexp_replace``/``regexp_extract_all`` passes — zero shuffles,
zero Python, whole-stage codegen end to end; at 100 TB this is the
one-pass privacy scrub cost it claims to be. Regex dialect risk
(Java backtracking vs DuckDB RE2 leftmost-longest vs Python re) is
pinned three ways: this gate cross-checks Java vs RE2 on every
planted shape, tests/test_pii.py cross-checks Java vs Python ``re``
on constructed + hypothesis corpora.

Reference parity: the reference has no PII pass (its corpus is POI
metadata); ⊕T7 is a beyond-reference training-pipeline operator
(SURVEY §2.11), patterns documented in functions/pii.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pii import PII_PATTERNS, pii_counts, redact_pii
from ..io import read_table
from .registry import register

_EMAIL_PAT, _EMAIL_REP = PII_PATTERNS[0][1], PII_PATTERNS[0][2]
_IPV4_PAT, _IPV4_REP = PII_PATTERNS[1][1], PII_PATTERNS[1][2]
_PHONE_PAT, _PHONE_REP = PII_PATTERNS[2][1], PII_PATTERNS[2][2]

_SALT = "pii"


def pii_synthetic_text(doc_id: Column) -> Column:
    """The planted-PII document body for ``doc_id`` — every
    sub-expression here has a byte-identical DuckDB twin in
    ``_SQL_PII_TEXT`` (md5 hex is lowercase in both engines; the
    numeric parts are BIGINT arithmetic cast to string)."""
    d = doc_id.cast("long")

    def w(j: int) -> Column:
        return F.concat(
            F.lit("w"),
            F.substring(
                F.md5(F.concat(F.lit(_SALT), d.cast("string"), F.lit(f"-{j}"))), 1, 6
            ),
        )

    email = F.concat(
        F.lit("user"), (d % 97).cast("string"),
        F.lit("."), (d % 7).cast("string"),
        F.lit("@mail"), (d % 13).cast("string"),
        F.lit(".example.com"),
    )
    ipv4 = F.concat(
        (d % 200 + 10).cast("string"), F.lit("."),
        (d % 256).cast("string"), F.lit("."),
        ((d * 7) % 256).cast("string"), F.lit("."),
        (d % 254 + 1).cast("string"),
    )
    phone = F.concat(
        F.lit("+"), (d % 89 + 1).cast("string"),
        F.lit(" "), (d % 900 + 100).cast("string"),
        F.lit(" "), ((d * 3) % 900 + 100).cast("string"),
        F.lit(" "), (d % 9000 + 1000).cast("string"),
    )
    return F.concat_ws(
        " ",
        w(0), w(1),
        F.when(d % 3 == 0, email),
        w(2), w(3),
        F.when(d % 4 == 0, ipv4),
        w(4),
        F.when(d % 5 == 0, phone),
        w(5),
    )


def _sql_w(j: int) -> str:
    return (
        f"'w' || substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR) || '-{j}'), 1, 6)"
    )


_SQL_PII_TEXT = f"""concat_ws(' ',
    {_sql_w(0)}, {_sql_w(1)},
    CASE WHEN doc_id % 3 = 0 THEN
        'user' || CAST(doc_id % 97 AS VARCHAR)
        || '.' || CAST(doc_id % 7 AS VARCHAR)
        || '@mail' || CAST(doc_id % 13 AS VARCHAR) || '.example.com' END,
    {_sql_w(2)}, {_sql_w(3)},
    CASE WHEN doc_id % 4 = 0 THEN
        CAST(doc_id % 200 + 10 AS VARCHAR)
        || '.' || CAST(doc_id % 256 AS VARCHAR)
        || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        || '.' || CAST(doc_id % 254 + 1 AS VARCHAR) END,
    {_sql_w(4)},
    CASE WHEN doc_id % 5 = 0 THEN
        '+' || CAST(doc_id % 89 + 1 AS VARCHAR)
        || ' ' || CAST(doc_id % 900 + 100 AS VARCHAR)
        || ' ' || CAST((doc_id * 3) % 900 + 100 AS VARCHAR)
        || ' ' || CAST(doc_id % 9000 + 1000 AS VARCHAR) END,
    {_sql_w(5)})"""

# counts on the PROGRESSIVELY redacted text, exactly as pii_counts
# does it (each rule counts on the text the previous rules left)
_SQL_PII_REDACTION = f"""
    WITH raw AS (
        SELECT doc_id, {_SQL_PII_TEXT} AS text FROM documents
    ), s1 AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS email_n,
               regexp_replace(text, '{_EMAIL_PAT}', '{_EMAIL_REP}', 'g') AS t1
        FROM raw
    ), s2 AS (
        SELECT doc_id, email_n,
               len(regexp_extract_all(t1, '{_IPV4_PAT}')) AS ipv4_n,
               regexp_replace(t1, '{_IPV4_PAT}', '{_IPV4_REP}', 'g') AS t2
        FROM s1
    )
    SELECT doc_id,
           regexp_replace(t2, '{_PHONE_PAT}', '{_PHONE_REP}', 'g') AS clean,
           CAST(email_n AS BIGINT) AS email_n,
           CAST(ipv4_n AS BIGINT) AS ipv4_n,
           CAST(len(regexp_extract_all(t2, '{_PHONE_PAT}')) AS BIGINT) AS phone_n
    FROM s2
"""


@register(
    "c51_pii_redaction",
    _SQL_PII_REDACTION,
    doc="""PII redaction driver gate (⊕T7, r11 — the r10 verdict's
    item 2, via the zc42 synthetic-corpus device): plant
    deterministic emails/IPv4s/phones into a corpus derived from the
    fixture's doc_ids, run the ordered EMAIL→IPV4→PHONE ladder, and
    hash the FULL redacted text plus the per-rule counts (taken on
    progressively redacted text — sum(counts) == placeholders
    emitted). Clean docs (~40 %) are in the frame with zero counts,
    so an over-eager pattern breaks the hash in both directions.
    Zero shuffles, zero Python — three codegen'd regex passes over
    one projection.""",
)
def c51_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    raw = docs.select("doc_id", pii_synthetic_text(F.col("doc_id")).alias("text"))
    c = pii_counts(F.col("text"))
    return raw.select(
        "doc_id",
        redact_pii(F.col("text")).alias("clean"),
        c["email"].cast("long").alias("email_n"),
        c["ipv4"].cast("long").alias("ipv4_n"),
        c["phone"].cast("long").alias("phone_n"),
    )
