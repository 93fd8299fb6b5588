"""PII scrub oracles: Spark's Java-regex pipeline vs a Python ``re``
reference applying the same ordered rules — constructed cases plus
hypothesis-composed documents mixing PII snippets into filler."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from trendr_data_pipeline_spark.functions.pii import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)


def py_scrub(text: str) -> tuple[dict, str]:
    counts = {}
    cur = text
    for kind, pat, repl in PII_PATTERNS:
        counts[kind] = len(re.findall(pat, cur))
        cur = re.sub(pat, repl, cur)
    return counts, cur


def spark_scrub(spark, texts: list[str]):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = (
        df.select(
            "i",
            pii_counts(F.col("text")).alias("c"),
            redact_pii(F.col("text")).alias("red"),
        )
        .orderBy("i")
        .collect()
    )
    return [({k: r["c"][k] for k in ("email", "ipv4", "phone")}, r["red"]) for r in rows]


CASES = [
    "contact me at jane.doe+spam@example.co.uk or on +44 20 7946 0958",
    "server 10.0.0.1 talked to 192.168.255.254; ports open",
    "digits 1234567890123 are not a phone without +cc",
    "email-in-url http://a@b.io/path and bare a@b.io twice a@b.io",
    "+1 555 123 4567 and +33-6-12-34-56-78 and not a phone: 555 1234",
    "mixed: root@10.0.0.1 logs from 8.8.8.8 mailto:x_y%z@host.org",
    "",
    "no pii here at all",
    "edge 999.999.999.999 still matches the permissive quad rule",
]


def test_constructed_cases(spark):
    got = spark_scrub(spark, CASES)
    for text, (gc, gr) in zip(CASES, got):
        wc, wr = py_scrub(text)
        assert gc == wc, (text, gc, wc)
        assert gr == wr, (text, gr, wr)


PII_SNIPPETS = st.sampled_from(
    [
        "bob@mail.net",
        "x.y@sub.domain.io",
        "+49 170 1234567",
        "+1-202-555-0144",
        "172.16.0.9",
        "8.8.8.8",
        "plain words",
        "12345",
        "a@b",  # not an email (no tld)
        "+12",  # not a phone (too short)
    ]
)


@settings(max_examples=25, deadline=None)
@given(st.lists(PII_SNIPPETS, min_size=0, max_size=8))
def test_property_composed_docs(spark, parts):
    text = " between ".join(parts)
    ((gc, gr),) = spark_scrub(spark, [text])
    wc, wr = py_scrub(text)
    assert gc == wc, (text, gc, wc)
    assert gr == wr, (text, gr, wr)


def test_counts_match_redaction_placeholders(spark):
    text = "a@b.co +44 20 7946 0958 10.0.0.1 c@d.org"
    ((gc, gr),) = spark_scrub(spark, [text])
    assert sum(gc.values()) == sum(gr.count(p) for p in ("<EMAIL>", "<IP>", "<PHONE>"))
