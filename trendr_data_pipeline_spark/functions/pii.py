"""PII detection / redaction for training-corpus scrubbing (⊕T7).

The standard pre-training privacy pass (C4 and successors scrub
emails/phones/IPs before anything else sees the text). Everything
here is JVM-side ``regexp_extract_all`` / ``regexp_replace`` —
scan-local, zero shuffle, inside whole-stage codegen; at 100 TB this
costs exactly one pass over the text column it was already reading.

Patterns are deliberately lookahead-free ASCII ([0-9], not \\d —
Python's re gives \\d Unicode semantics while Java's is ASCII, and
the pytest oracle cross-checks Spark's Java regex against Python re)
so every engine in the fleet agrees byte-for-byte.

Redaction order is fixed and documented (EMAIL → IPV4 → PHONE):
emails are matched before the phone rule can eat digit runs inside
them, and IPs before phones because a dotted quad is a valid match
for neither other rule but a phone prefix could overlap a quad's
leading digits.

The bundled ``documents`` fixture contains no PII-shaped text (word
bags, zero digits), so these operators carry pytest oracles on
constructed + hypothesis-generated corpora rather than a vacuous
all-zero driver gate — recorded in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "redact_pii", "has_pii"]

#: ordered (kind, regex, replacement) rules — order matters, see module doc
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+[0-9]{1,3}[ -]?[0-9]{2,4}(?:[ -]?[0-9]{2,4}){2,4}",
        "<PHONE>",
    ),
]


def pii_counts(col: Column) -> Column:
    """Per-kind match counts as ``struct(email, ipv4, phone)``.

    Counts are taken on the PROGRESSIVELY REDACTED text (each rule
    counts on the text left by the previous rules), mirroring
    :func:`redact_pii` exactly — so ``sum(counts) == number of
    placeholders redact_pii emits`` and a digit run inside an email
    is never double-counted as a phone.
    """
    counts = []
    cur = col
    for kind, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(kind)
        )
        cur = F.regexp_replace(cur, pat, repl)
    return F.struct(*counts)


def has_pii(col: Column) -> Column:
    c = pii_counts(col)
    return (c["email"] + c["ipv4"] + c["phone"]) > 0


def redact_pii(col: Column) -> Column:
    """Replace every match with its typed placeholder, applying the
    rules in ``PII_PATTERNS`` order."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
