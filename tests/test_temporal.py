"""Bucketed interval join (e08's operator) — boundary semantics."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from trendr_data_pipeline_spark.operators.temporal import bucketed_interval_join


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def test_interval_join_boundaries(spark):
    """Window is half-open (a.ts, a.ts + W]: a probe AT the anchor ts
    is excluded, one exactly W later is included; matches crossing the
    bucket boundary are found; anchors with no probe survive the left
    form with null probe columns."""
    anchors = spark.createDataFrame(
        [(1, 10, _ts(1, 30)), (2, 10, _ts(9)), (3, 20, _ts(1))],
        "event_id long, user_id long, ts timestamp",
    )
    probes = spark.createDataFrame(
        [
            (101, 10, _ts(1, 30), 5.0),   # == anchor1.ts → excluded
            (102, 10, _ts(2, 30), 7.0),   # next hour-bucket → included
            (103, 10, _ts(2, 30, 1), 9.0),  # 1s past the window → excluded
            (104, 30, _ts(1, 45), 1.0),   # other user → excluded
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = bucketed_interval_join(
        anchors, probes, on="user_id", window_seconds=3600
    ).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["event_id"], []).append(r["p_event_id"])
    assert by_anchor[1] == [102]
    assert by_anchor[2] == [None]  # no probe in (9:00, 10:00]
    assert by_anchor[3] == [None]

    inner = bucketed_interval_join(
        anchors, probes, on="user_id", window_seconds=3600, how="inner"
    ).collect()
    assert [(r["event_id"], r["p_event_id"]) for r in inner] == [(1, 102)]


def test_interval_join_window_end_inclusive(spark):
    probes = spark.createDataFrame(
        [(201, 10, _ts(2, 30), 2.0)], "event_id long, user_id long, ts timestamp, value double"
    )
    anchors = spark.createDataFrame(
        [(1, 10, _ts(1, 30))], "event_id long, user_id long, ts timestamp"
    )
    got = bucketed_interval_join(
        anchors, probes, on="user_id", window_seconds=3600, how="inner"
    ).select("p_event_id").collect()
    assert [r["p_event_id"] for r in got] == [201]


def test_interval_join_hot_key_no_duplicates(spark):
    """A pair can only meet in the probe's own bucket — exploding the
    anchor to two buckets must not duplicate matches."""
    anchors = spark.createDataFrame(
        [(i, 1, _ts(3, 0, i)) for i in range(20)],
        "event_id long, user_id long, ts timestamp",
    )
    probes = spark.createDataFrame(
        [(100 + i, 1, _ts(3, 30, i), float(i)) for i in range(20)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = bucketed_interval_join(
        anchors, probes, on="user_id", window_seconds=3600, how="inner"
    )
    pairs = [(r["event_id"], r["p_event_id"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # brute-force oracle
    arows = [(i, _ts(3, 0, i)) for i in range(20)]
    prows = [(100 + i, _ts(3, 30, i)) for i in range(20)]
    want = {
        (ai, pi)
        for ai, at in arows
        for pi, pt in prows
        if at < pt <= datetime(2024, 1, 1, 4, 0, at.second)
    }
    assert set(pairs) == want


def test_interval_join_property_random_timelines(spark):
    """Randomized timelines vs a brute-force oracle: pair sets must be
    identical for arbitrary key/offset combinations (covers bucket
    boundaries, multi-key interleaving, empty windows)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    events = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=7200),   # second offset
        ),
        min_size=1,
        max_size=25,
    )

    @given(anchors=events, probes=events)
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def inner(anchors, probes):
        from trendr_data_pipeline_spark.operators.temporal import bucketed_interval_join

        a_rows = [(i, u, datetime(2024, 1, 1) + timedelta(seconds=s))
                  for i, (u, s) in enumerate(anchors)]
        p_rows = [(100 + i, u, datetime(2024, 1, 1) + timedelta(seconds=s),
                   float(i))
                  for i, (u, s) in enumerate(probes)]
        a_df = spark.createDataFrame(a_rows, "event_id long, user_id long, ts timestamp")
        p_df = spark.createDataFrame(
            p_rows, "event_id long, user_id long, ts timestamp, value double"
        )
        got = {
            (r["event_id"], r["p_event_id"])
            for r in bucketed_interval_join(
                a_df, p_df, on="user_id", window_seconds=600, how="inner"
            ).collect()
        }
        want = {
            (ai, pi)
            for ai, au, at in a_rows
            for pi, pu, pt, _ in p_rows
            if au == pu and at < pt <= at + timedelta(seconds=600)
        }
        assert got == want

    inner()


def test_interval_join_null_anchor_columns(spark):
    """ADVICE r3: the left-form recovery anti-join must be null-safe.
    A MATCHED anchor carrying a NULL in a non-key column must not be
    re-emitted as a spurious unmatched row (the name-list equality
    join never matched NULL-bearing rows)."""
    anchors = spark.createDataFrame(
        [(1, 10, _ts(1, 30), None), (2, 10, _ts(9), "x"), (None, 20, _ts(1), None)],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    probes = spark.createDataFrame(
        [(102, 10, _ts(2, 0), 7.0), (103, 20, _ts(1, 30), 9.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = bucketed_interval_join(anchors, probes, on="user_id", window_seconds=3600).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault((r["event_id"], r["user_id"]), []).append(r["p_event_id"])
    # anchor 1 (null tag) matched 102 — and must appear ONLY as matched
    assert by_anchor[(1, 10)] == [102]
    # anchor with NULL id matched 103 — null-safe keys still dedup it
    assert by_anchor[(None, 20)] == [103]
    # anchor 2 genuinely unmatched → one null row
    assert by_anchor[(2, 10)] == [None]
    assert len(out) == 3
