"""Sequence-packing oracles: the two-phase bucketed prefix sum vs
the single-partition global window it replaces, plus chunk-span edge
cases (straddling docs, zero-weight docs, bucket boundaries)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trendr_data_pipeline_spark.operators.packing import (
    global_running_offsets,
    pack_sequences,
)


def global_window_offsets(df):
    w = (
        Window.orderBy("bucket", "k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn("offset", F.coalesce(F.sum("w").over(w), F.lit(0)).cast("long"))


def make_df(spark, rows):
    return spark.createDataFrame(rows, "bucket string, k long, w long")


def test_two_phase_matches_global_window(spark):
    rng = random.Random(7)
    rows = [
        (f"s{rng.randrange(5)}", k, rng.choice([0, 1, 3, 47, 512, 700]))
        for k in range(400)
    ]
    df = make_df(spark, rows).repartition(16)
    got = {
        (r["bucket"], r["k"]): r["offset"]
        for r in global_running_offsets(df, "w", "bucket", "k").collect()
    }
    want = {
        (r["bucket"], r["k"]): r["offset"]
        for r in global_window_offsets(make_df(spark, rows)).collect()
    }
    assert got == want


def test_empty_and_single_bucket(spark):
    df = make_df(spark, [("only", 1, 10), ("only", 2, 0), ("only", 3, 5)])
    got = {r["k"]: r["offset"] for r in global_running_offsets(df, "w", "bucket", "k").collect()}
    assert got == {1: 0, 2: 10, 3: 10}
    empty = make_df(spark, [("x", 1, 1)]).where("k < 0")
    assert global_running_offsets(empty, "w", "bucket", "k").count() == 0


def test_pack_sequences_spans(spark):
    # seq_len 10: doc a spans [0,25) -> seqs 0..2; b [25,25) zero-tok;
    # c [25,30) -> seq 2; d (next bucket) [30,42) -> seqs 3..4
    df = spark.createDataFrame(
        [("s1", 1, 25), ("s1", 2, 0), ("s1", 3, 5), ("s2", 4, 12)],
        "source string, doc_id long, n_tok long",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, seq_len=10, weight_col="n_tok", bucket_col="source", order_col="doc_id"
        ).collect()
    }
    assert (rows[1]["tok_offset"], rows[1]["first_seq"], rows[1]["last_seq"], rows[1]["n_seqs"]) == (0, 0, 2, 3)
    assert (rows[2]["first_seq"], rows[2]["n_seqs"]) == (None, 0)
    assert (rows[3]["tok_offset"], rows[3]["first_seq"], rows[3]["last_seq"]) == (25, 2, 2)
    assert (rows[4]["tok_offset"], rows[4]["first_seq"], rows[4]["last_seq"], rows[4]["n_seqs"]) == (30, 3, 4, 2)


def test_no_global_exchange_on_big_frame(spark):
    """The corpus-grain plan must not funnel through a single-partition
    window: the only SinglePartition exchange allowed is the tiny
    bucket-totals frame (guarded by checking the window over the big
    frame is partitioned)."""
    df = make_df(spark, [("s", k, 1) for k in range(10)]).repartition(4)
    plan = global_running_offsets(df, "w", "bucket", "k")._jdf.queryExecution().executedPlan().toString()
    # the big-frame window carries a partition spec (hashpartitioning
    # on bucket); count SinglePartition exchanges — exactly one, for
    # the bucket-totals running sum
    assert plan.count("SinglePartition") == 1, plan


def test_null_bucket_rows_survive(spark):
    """NULL buckets are a real group: rows must not be dropped by the
    add-back join, and the group orders LAST (SQL default)."""
    df = spark.createDataFrame(
        [("a", 1, 5), (None, 2, 7), ("b", 3, 11), (None, 4, 2)],
        "bucket string, k long, w long",
    )
    got = {r["k"]: r["offset"] for r in global_running_offsets(df, "w", "bucket", "k").collect()}
    w = (
        Window.orderBy(F.col("bucket").asc_nulls_last(), F.col("k"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["k"]: r["offset"]
        for r in df.withColumn(
            "offset", F.coalesce(F.sum("w").over(w), F.lit(0)).cast("long")
        ).collect()
    }
    assert got == want
    assert len(got) == 4


def test_global_offsets_property_random_frames(spark):
    """Property: the two-phase prefix sum equals the single-partition
    global window on random (bucket, order, weight) frames — including
    NULL buckets, zero weights, and single-row buckets."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from trendr_data_pipeline_spark.operators.packing import global_running_offsets

    row = st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),  # bucket (nullable)
        st.integers(0, 50),                       # order key
        st.integers(0, 9),                        # weight
    )

    @given(rows=st.lists(row, min_size=1, max_size=25))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def inner(rows):
        # unique (bucket, order) keys — the documented contract
        uniq = {}
        for b, o, w in rows:
            uniq[(b, o)] = w
        data = [(b, o, w, i) for i, ((b, o), w) in enumerate(sorted(
            uniq.items(), key=lambda kv: (kv[0][0] is None, kv[0])))]
        df = spark.createDataFrame(
            [(b, o, w) for b, o, w, _ in data], "bucket int, ord int, w int"
        )
        got = {
            (r["bucket"], r["ord"]): r["off"]
            for r in global_running_offsets(df, "w", "bucket", "ord", out_col="off").collect()
        }
        # oracle: python prefix sum under (bucket NULLS LAST, ord)
        run = 0
        want = {}
        for b, o, w, _ in sorted(
            data, key=lambda t: (t[0] is None, t[0] if t[0] is not None else 0, t[1])
        ):
            want[(b, o)] = run
            run += w
        assert got == want

    inner()


# ---------------------------------------------------------------------------
# chunk_documents (t09): per-document sliding windows
# ---------------------------------------------------------------------------


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_documents_python_oracle(spark):
    from trendr_data_pipeline_spark.operators.packing import chunk_documents

    random.seed(109)
    texts = [
        " ".join(f"w{random.randrange(30)}" for _ in range(n))
        for n in [0, 1, 15, 16, 17, 48, 63, 64, 65, 100, 112, 113, 200]
    ]
    got = sorted(
        (r.doc_id, r.chunk_id, r.start_pos, r.n_tok, r.chunk_text)
        for r in chunk_documents(_mk_docs(spark, texts), 64, 48).collect()
    )
    want = []
    for i, t in enumerate(texts):
        ws = t.split()
        if not ws:
            continue
        s = 1
        while s <= max(len(ws) - 16, 1):
            chunk = ws[s - 1 : s - 1 + 64]
            want.append((i, (s - 1) // 48, s, len(chunk), " ".join(chunk)))
            s += 48
    assert got == sorted(want)


def test_chunk_documents_invariants(spark):
    """Coverage + no-contained-chunk + single-chunk-for-short-docs,
    over random lengths around every boundary."""
    from trendr_data_pipeline_spark.operators.packing import chunk_documents

    random.seed(110)
    texts = [
        " ".join(f"w{random.randrange(9)}" for _ in range(random.randrange(1, 260)))
        for _ in range(120)
    ]
    rows = chunk_documents(_mk_docs(spark, texts), 64, 48).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(texts)))
    for i, t in enumerate(texts):
        n = len(t.split())
        chunks = sorted(by_doc[i], key=lambda r: r.start_pos)
        covered = set()
        prev_end = 0
        for c in chunks:
            end = c.start_pos + c.n_tok - 1
            assert end > prev_end, "chunk contained in predecessor"
            covered.update(range(c.start_pos, end + 1))
            prev_end = end
        assert covered == set(range(1, n + 1)), "not a full cover"
        if n <= 64:
            assert len(chunks) == 1


def test_chunk_documents_rejects_bad_stride(spark):
    import pytest

    from trendr_data_pipeline_spark.operators.packing import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(_mk_docs(spark, ["a b"]), chunk_size=8, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(_mk_docs(spark, ["a b"]), chunk_size=8, stride=9)


def test_chunk_documents_property_random_geometry(spark):
    """Invariants hold for EVERY (chunk_size, stride) geometry, not
    just the gate's 64/48: full cover, no contained chunk, exact
    start arithmetic, single chunk for short docs. One Spark job for
    all geometries (hypothesis's per-example Spark round trip is the
    slow part, so this sweeps a grid instead)."""
    from trendr_data_pipeline_spark.operators.packing import chunk_documents

    random.seed(111)
    texts = [
        " ".join(f"w{random.randrange(7)}" for _ in range(n))
        for n in list(range(1, 20)) + [31, 32, 33, 47, 48, 49, 95, 96, 97, 150]
    ]
    df = _mk_docs(spark, texts)
    for chunk_size, stride in [(1, 1), (2, 1), (5, 5), (7, 3), (16, 15), (32, 8)]:
        overlap = chunk_size - stride
        rows = chunk_documents(df, chunk_size, stride).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for i, t in enumerate(texts):
            ws = t.split()
            n = len(ws)
            chunks = sorted(by_doc[i], key=lambda r: r.start_pos)
            # exact start set per the documented rule
            want_starts = list(range(1, max(n - overlap, 1) + 1, stride))
            assert [c.start_pos for c in chunks] == want_starts, (
                chunk_size, stride, n)
            covered = set()
            prev_end = 0
            for c in chunks:
                assert c.chunk_id == (c.start_pos - 1) // stride
                end = c.start_pos + c.n_tok - 1
                assert c.n_tok == len(ws[c.start_pos - 1 : c.start_pos - 1 + chunk_size])
                assert end > prev_end
                covered.update(range(c.start_pos, end + 1))
                prev_end = end
            assert covered == set(range(1, n + 1))
            if n <= chunk_size:
                assert len(chunks) == 1


def test_chunk_documents_is_streaming_compatible(spark, tmp_path):
    """chunk_documents is a stateless projection, so the SAME
    function must run unchanged on a structured stream (the
    preprocessing-at-ingest shape) and emit exactly the batch
    output across multi-wave arrival."""
    from tests.fixtures import stage_stream_file
    from trendr_data_pipeline_spark.operators.packing import chunk_documents

    random.seed(112)
    texts = [
        (i, " ".join(f"w{random.randrange(9)}" for _ in range(random.randrange(1, 130))))
        for i in range(40)
    ]
    batch_df = spark.createDataFrame(texts, "doc_id long, text string")
    want = sorted(tuple(r) for r in chunk_documents(batch_df, 64, 48).collect())

    d = tmp_path / "waves"
    d.mkdir()
    stage_stream_file(spark, str(d), "w1", batch_df.filter(F.col("doc_id") < 20))
    stream = spark.readStream.schema(batch_df.schema).parquet(str(d))
    q = (
        chunk_documents(stream, 64, 48)
        .writeStream.format("memory")
        .queryName("chunk_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        stage_stream_file(spark, str(d), "w2", batch_df.filter(F.col("doc_id") >= 20))
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM chunk_stream").collect())
    assert got == want


def test_spfhp_plan_hand_case_perfect_packing():
    """⊕T25 hand case with a known optimal layout: lengths
    [6,5,4,3,2] at max_len 10 pack PERFECTLY into two packs
    {6,4} and {5,3,2} under shortest-pack-first."""
    from trendr_data_pipeline_spark.operators.packing import _spfhp_plan

    events, n_packs = _spfhp_plan({6: 1, 5: 1, 4: 1, 3: 1, 2: 1}, 10)
    assert n_packs == 2
    # replay events into pack contents
    packs = {}
    for length, rank_start, take, pack_start, stride, pos_start in events:
        for d in range(take):
            packs.setdefault(pack_start + stride * d, []).append(length)
    assert sorted(map(sorted, packs.values())) == [[2, 3, 5], [4, 6]]


def _spfhp_per_doc_reference(lengths, max_len):
    """Independent per-doc simulation of shortest-pack-first with the
    batched implementation's tie rule (among equal remaining: the
    pack that ENTERED that remaining-class earliest; ties within one
    event's run by ascending pack id). Returns the sorted multiset of
    pack load-lists."""
    packs = []  # [remaining, entry_seq, id, loads]
    seq = 0
    for l in sorted(set(lengths), reverse=True):
        for _ in range(sum(1 for x in lengths if x == l)):
            fits = [p for p in packs if p[0] >= l]
            if fits:
                p = min(fits, key=lambda p: (p[0], p[1], p[2]))
            else:
                packs.append([max_len, seq, len(packs), []])
                seq += 1
                p = packs[-1]
            p[0] -= l
            p[1] = seq
            seq += 1
            p[3].append(l)
    return sorted(sorted(p[3]) for p in packs)


def test_spfhp_assignments_random_vs_reference(spark):
    """⊕T25 seed-sweep: random length mixes → the Spark assignment is
    (1) VALID (every pack Σ ≤ max_len), (2) COMPLETE (every doc
    exactly once, dense pack ids), (3) DETERMINISTIC across reruns,
    and (4) pack-for-pack equal (as load multisets) to the
    independent per-doc shortest-pack-first simulation; efficiency
    beats the one-doc-per-pack floor by construction."""
    import random

    from trendr_data_pipeline_spark.operators.packing import spfhp_pack_assignments

    for seed, max_len in ((5, 32), (6, 17), (7, 64)):
        rng = random.Random(seed)
        rows = [(i, rng.randrange(1, max_len + 1)) for i in range(rng.randrange(40, 90))]
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        out = spfhp_pack_assignments(df, max_len).collect()
        assert len(out) == len(rows)
        assert {r["doc_id"] for r in out} == {i for i, _ in rows}
        packs = {}
        for r in out:
            packs.setdefault(r["pack_id"], []).append((r["pack_pos"], r["n_tok"]))
        assert set(packs) == set(range(len(packs))), "pack ids not dense"
        for pid, members in packs.items():
            assert sum(t for _, t in members) <= max_len, (seed, pid)
            assert sorted(p for p, _ in members) == list(range(len(members))), (
                "pack_pos not dense per pack", seed, pid)
        got = sorted(sorted(t for _, t in m) for m in packs.values())
        want = _spfhp_per_doc_reference([l for _, l in rows], max_len)
        assert got == want, (seed, got, want)
        # determinism
        again = spfhp_pack_assignments(df, max_len).collect()
        assert sorted(map(tuple, (r.asDict().items() for r in again)), key=str) == sorted(
            map(tuple, (r.asDict().items() for r in out)), key=str)
