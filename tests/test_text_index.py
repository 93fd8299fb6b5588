"""Persisted MinHash-LSH text index: probe parity with the in-memory
LSH join, O(new)-extend with inode preservation, replay-safe
streaming ingestion — the text twin of test_index_store.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from trendr_data_pipeline_spark.io import read_table
from trendr_data_pipeline_spark.operators.text_index import (
    extend_minhash_index,
    minhash_extend_sink,
    minhash_probe,
    write_minhash_index,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _inodes(d):
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, d)] = os.stat(p).st_ino
    return out


def test_probe_matches_inmemory_lsh_join(spark, tmp_path):
    """Index the full corpus, probe the %10 slice: identical results
    to the d03 registry query (the in-memory subset-form LSH join) —
    same candidates, same exact verification, same top-k, and no
    self-pairs."""
    from trendr_data_pipeline_spark.operators.dedup import minhash_lsh_topk_join

    docs = read_table(spark, SMOKE_SF, "documents")
    idx = str(tmp_path / "mh_idx")
    write_minhash_index(docs, idx)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    got = _rows(minhash_probe(incoming, idx, threshold=0.8, k=20))
    want = _rows(
        minhash_lsh_topk_join(F.col("doc_id") % 10 == 0, docs, threshold=0.8, k=20)
    )
    assert got == want and got
    assert all(a != b for a, b, _j, _rk in got)


def test_extend_equals_full_rebuild_and_preserves_inodes(spark, tmp_path):
    """index(A) + extend(B) answers every probe exactly like
    index(A ∪ B), and the extend rewrote nothing: every pre-existing
    parquet file survives as the same inode."""
    docs = read_table(spark, SMOKE_SF, "documents")
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)

    grown = str(tmp_path / "grown")
    write_minhash_index(a, grown)
    before = _inodes(grown)
    extend_minhash_index(b, grown)
    after = _inodes(grown)
    assert set(before) <= set(after)
    assert all(after[f] == ino for f, ino in before.items())  # zero rewrites

    full = str(tmp_path / "full")
    write_minhash_index(docs, full)
    got = _rows(minhash_probe(incoming, grown, threshold=0.8, k=20))
    want = _rows(minhash_probe(incoming, full, threshold=0.8, k=20))
    assert got == want and got


def test_extend_skip_existing_is_replay_idempotent(spark, tmp_path):
    """Re-extending with an already-indexed batch adds NO postings
    (the property that makes the streaming sink replay-safe)."""
    docs = read_table(spark, SMOKE_SF, "documents")
    a = docs.filter(F.col("doc_id") < 300)
    b = docs.filter((F.col("doc_id") >= 280) & (F.col("doc_id") < 320))  # overlaps a
    idx = str(tmp_path / "idx")
    write_minhash_index(a, idx)
    extend_minhash_index(b, idx, skip_existing=True)
    n1 = spark.read.parquet(os.path.join(idx, "data", "toks")).count()
    extend_minhash_index(b, idx, skip_existing=True)  # full replay
    n2 = spark.read.parquet(os.path.join(idx, "data", "toks")).count()
    assert n1 == n2
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(idx, "data", "toks"))
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") > 1)
        .collect()
    ]
    assert ids == []  # one toks row per doc, no duplicate postings


def test_meta_gate_and_frozen_params(spark, tmp_path):
    """A non-minhash dir is rejected loudly; extend reads the hash
    family back from meta, so a non-default build still probes
    consistently after extension."""
    docs = read_table(spark, SMOKE_SF, "documents")
    bogus = str(tmp_path / "bogus")
    spark.createDataFrame([(1,)], "x int").write.parquet(os.path.join(bogus, "meta"))
    with pytest.raises(Exception):
        minhash_probe(docs.limit(5), bogus, threshold=0.8)

    idx = str(tmp_path / "small")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    write_minhash_index(a, idx, n_hashes=64, bands=16)
    extend_minhash_index(b, idx)  # must sign with 64/16 from meta
    full = str(tmp_path / "small_full")
    write_minhash_index(docs, full, n_hashes=64, bands=16)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    assert _rows(minhash_probe(incoming, idx, threshold=0.8)) == _rows(
        minhash_probe(incoming, full, threshold=0.8)
    )


def test_streaming_sink_ingests_waves_replay_safe(spark, tmp_path):
    """Two file-source waves (with an overlapping id) flow through
    minhash_extend_sink; the final artifact answers probes exactly
    like a batch build over the union."""
    docs = read_table(spark, SMOKE_SF, "documents")
    base = docs.filter(F.col("doc_id") < 250)
    w1 = docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 375))
    w2 = docs.filter(F.col("doc_id") >= 370)  # 370-374 replay w1 docs

    idx = str(tmp_path / "idx")
    write_minhash_index(base, idx)

    src = str(tmp_path / "src")
    os.makedirs(src)

    def stage(i, df):
        tmp = str(tmp_path / f"stage{i}")
        df.select("doc_id", "text").coalesce(1).write.parquet(tmp)
        import glob
        import shutil

        (part,) = glob.glob(f"{tmp}/*.parquet")
        os.rename(part, os.path.join(src, f"wave{i}.parquet"))
        shutil.rmtree(tmp)

    stage(1, w1)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = minhash_extend_sink(stream, idx, checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        stage(2, w2)
        q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "full")
    write_minhash_index(docs, full)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    assert _rows(minhash_probe(incoming, idx, threshold=0.8)) == _rows(
        minhash_probe(incoming, full, threshold=0.8)
    )
    n = spark.read.parquet(os.path.join(idx, "data", "toks")).count()
    assert n == docs.count()  # overlap ingested once


def test_remove_prunes_files_and_matches_fresh_build(spark, tmp_path):
    """Hard-deletion: post-remove probes equal a fresh build over the
    survivors, only files containing doomed ids were rewritten (every
    other inode survives), postings and token sets stay in agreement,
    and removing absent ids is a true no-op."""
    from trendr_data_pipeline_spark.operators.text_index import (
        remove_from_minhash_index,
    )

    docs = read_table(spark, SMOKE_SF, "documents")
    idx = str(tmp_path / "idx")
    # multi-file artifact: write halves then extend, so removal has
    # untouched files to preserve
    write_minhash_index(docs.filter(F.col("doc_id") < 250), idx)
    extend_minhash_index(docs.filter(F.col("doc_id") >= 250), idx)
    doomed = [5, 17, 260, 261]
    before = _inodes(idx)
    remove_from_minhash_index(
        spark.createDataFrame([(i,) for i in doomed], "doc_id long"), idx
    )
    after = _inodes(idx)
    survivors_kept = set(before) & set(after)
    assert survivors_kept  # some files were untouched...
    assert any(after[f] == before[f] for f in survivors_kept)  # ...and kept inodes

    toks = spark.read.parquet(os.path.join(idx, "data", "toks"))
    bands = spark.read.parquet(os.path.join(idx, "data", "bands"))
    assert toks.filter(F.col("doc_id").isin(doomed)).count() == 0
    assert bands.filter(F.col("doc_id").isin(doomed)).count() == 0
    # postings and token sets agree on the surviving id set
    t_ids = {r["doc_id"] for r in toks.select("doc_id").distinct().collect()}
    b_ids = {r["doc_id"] for r in bands.select("doc_id").distinct().collect()}
    assert t_ids == b_ids

    fresh = str(tmp_path / "fresh")
    write_minhash_index(docs.filter(~F.col("doc_id").isin(doomed)), fresh)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    assert _rows(minhash_probe(incoming, idx, threshold=0.8)) == _rows(
        minhash_probe(incoming, fresh, threshold=0.8)
    )

    # absent ids: true no-op, inodes unchanged
    snap = _inodes(idx)
    remove_from_minhash_index(
        spark.createDataFrame([(999_999,)], "doc_id long"), idx
    )
    assert _inodes(idx) == snap


def test_remove_sink_streaming_takedowns(spark, tmp_path):
    """Takedown-request stream with an overlapping id across waves
    (the replay shape): final index equals a fresh build over the
    survivors."""
    from trendr_data_pipeline_spark.operators.text_index import (
        minhash_remove_sink,
    )

    docs = read_table(spark, SMOKE_SF, "documents")
    idx = str(tmp_path / "idx")
    write_minhash_index(docs, idx)

    src = str(tmp_path / "takedowns")
    os.makedirs(src)

    def stage(i, ids):
        tmp = str(tmp_path / f"td{i}")
        spark.createDataFrame([(x,) for x in ids], "doc_id long").coalesce(
            1
        ).write.parquet(tmp)
        import glob
        import shutil

        (part,) = glob.glob(f"{tmp}/*.parquet")
        os.rename(part, os.path.join(src, f"wave{i}.parquet"))
        shutil.rmtree(tmp)

    stage(1, [10, 20, 30])
    stream = spark.readStream.schema("doc_id long").parquet(src)
    q = minhash_remove_sink(stream, idx, checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        stage(2, [30, 40])  # 30 replays wave 1
        q.processAllAvailable()
    finally:
        q.stop()

    doomed = [10, 20, 30, 40]
    fresh = str(tmp_path / "fresh")
    write_minhash_index(docs.filter(~F.col("doc_id").isin(doomed)), fresh)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    assert _rows(minhash_probe(incoming, idx, threshold=0.8)) == _rows(
        minhash_probe(incoming, fresh, threshold=0.8)
    )


def test_compact_reduces_files_probe_identical(spark, tmp_path):
    """Many small extends → compaction rewrites only oversized
    subtrees; probes are byte-identical before/after and a second
    compact is a no-op."""
    from trendr_data_pipeline_spark.operators.text_index import (
        compact_minhash_index,
    )

    docs = read_table(spark, SMOKE_SF, "documents")
    idx = str(tmp_path / "idx")
    write_minhash_index(docs.filter(F.col("doc_id") < 100), idx)
    for lo in range(100, 500, 100):
        extend_minhash_index(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)), idx
        )
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    before = _rows(minhash_probe(incoming, idx, threshold=0.8))
    n_before = len(_inodes(idx))
    compact_minhash_index(idx, max_files_per_group=2)
    n_after = len(_inodes(idx))
    assert n_after < n_before
    assert _rows(minhash_probe(incoming, idx, threshold=0.8)) == before
    snap = _inodes(idx)
    compact_minhash_index(idx, max_files_per_group=2)  # no-op
    assert _inodes(idx) == snap


def test_reader_survives_swap_window_and_writer_heals(spark, tmp_path):
    """Died-mid-swap residue (artifact exists only as .old): a READER
    resolves the surviving copy without mutating anything; the next
    WRITER heals the layout and proceeds — same contract as the ANN
    artifacts, exercised through the text-index module."""
    import shutil

    docs = read_table(spark, SMOKE_SF, "documents")
    idx = str(tmp_path / "idx")
    write_minhash_index(docs.filter(F.col("doc_id") < 400), idx)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    want = _rows(minhash_probe(incoming, idx, threshold=0.8))

    # simulate a writer that died between backup-out and swap-in
    shutil.move(idx, idx + ".old")
    assert _rows(minhash_probe(incoming, idx, threshold=0.8)) == want  # reader OK
    assert not os.path.exists(os.path.join(idx, "meta"))  # reader didn't heal

    # the next writer heals, then extends
    extend_minhash_index(docs.filter(F.col("doc_id") >= 400), idx)
    assert os.path.exists(os.path.join(idx, "meta"))
    assert not os.path.isdir(idx + ".old")
    full = str(tmp_path / "full")
    write_minhash_index(docs, full)
    assert _rows(minhash_probe(incoming, idx, threshold=0.8)) == _rows(
        minhash_probe(incoming, full, threshold=0.8)
    )


def test_filtered_probe_pre_filter_semantics(spark, tmp_path):
    """filter_ids restricts the searchable corpus with PRE-filter
    semantics: results equal a probe against an index built over only
    the allowed docs (top-k among allowed, never a post-cut), and
    every neighbor satisfies the predicate."""
    docs = read_table(spark, SMOKE_SF, "documents")
    idx = str(tmp_path / "idx")
    write_minhash_index(docs, idx)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    pred = F.col("doc_id") % 2 == 1  # odd-id corpus docs only
    allowed = docs.filter(pred).select("doc_id")
    got = _rows(
        minhash_probe(incoming, idx, threshold=0.8, filter_ids=allowed)
    )
    ref = str(tmp_path / "ref")
    write_minhash_index(docs.filter(pred), ref)
    want = _rows(minhash_probe(incoming, ref, threshold=0.8))
    assert got == want and got
    assert all(b % 2 == 1 for _a, b, _j, _rk in got)


def test_cadence_driven_nightly_compaction(spark, tmp_path):
    """Composition: the SS8 cadence runner drives the index
    lifecycle — a nightly compact job fires once per slot, compacts
    the extend-accumulated small files, and probe results are
    byte-identical; the same-day re-tick runs nothing."""
    import datetime as dt

    from trendr_data_pipeline_spark.operators.text_index import (
        compact_minhash_index,
    )
    from trendr_data_pipeline_spark.streaming.cadence import (
        CadenceJob,
        run_due_jobs,
    )

    docs = read_table(spark, SMOKE_SF, "documents")
    idx = str(tmp_path / "idx")
    write_minhash_index(docs.filter(F.col("doc_id") < 100), idx)
    for lo in range(100, 500, 100):
        extend_minhash_index(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)), idx
        )
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    before_rows = _rows(minhash_probe(incoming, idx, threshold=0.8))
    n_files_before = len(_inodes(idx))

    job = CadenceJob(
        "nightly_compact",
        lambda: compact_minhash_index(idx, max_files_per_group=2),
        daily_at="03:00",
    )
    state = str(tmp_path / "cadence")
    tz = dt.timezone.utc
    assert run_due_jobs([job], state, now=dt.datetime(2026, 8, 15, 3, 0, tzinfo=tz))
    assert len(_inodes(idx)) < n_files_before
    assert _rows(minhash_probe(incoming, idx, threshold=0.8)) == before_rows
    # same-day re-tick: nothing runs, index untouched
    snap = _inodes(idx)
    assert run_due_jobs([job], state, now=dt.datetime(2026, 8, 15, 9, 0, tzinfo=tz)) == []
    assert _inodes(idx) == snap


def test_apply_snapshot_diff_refreshes_index_incrementally(spark, tmp_path):
    """The composed release-cycle verb: snapshot_diff(v1, v2) drives
    remove + extend so the index matches a fresh build over v2 —
    modified docs stop matching their OLD text and start matching
    their NEW text, removed docs vanish, unchanged files keep their
    inodes through both swaps."""
    from trendr_data_pipeline_spark.operators.ingestion import snapshot_diff
    from trendr_data_pipeline_spark.operators.text_index import (
        apply_snapshot_diff_to_index,
    )

    docs = read_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    v1 = docs
    modified = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "text", F.concat(F.lit("totally rewritten body "), F.col("doc_id").cast("string"))
    )
    v2 = (
        docs.filter(F.col("doc_id") % 25 != 0)  # %25==0 removed (incl. %50 kept-as-modified? no: %50 ⊂ %25)
        .unionByName(modified)  # %50==0 re-added with new text
        .unionByName(
            docs.filter(F.col("doc_id") % 25 == 0).withColumn(
                "doc_id", F.col("doc_id") + 100_000
            )
        )  # brand-new ids
    )
    idx = str(tmp_path / "idx")
    write_minhash_index(v1, idx)
    inodes_before = _inodes(idx)

    d = snapshot_diff(v1, v2, id_col="doc_id", content_col="text")
    counts = {r["status"]: r["n"] for r in d.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"added", "removed", "modified"}
    apply_snapshot_diff_to_index(d, v2, idx)

    fresh = str(tmp_path / "fresh")
    write_minhash_index(v2, fresh)
    incoming = v2.filter(F.col("doc_id") % 10 == 0)
    got = _rows(minhash_probe(incoming, idx, threshold=0.8))
    want = _rows(minhash_probe(incoming, fresh, threshold=0.8))
    assert got == want and got
    # unchanged docs' files survived both swaps as the same inodes
    after = _inodes(idx)
    survived = [f for f in inodes_before if f in after and after[f] == inodes_before[f]]
    assert survived


def test_apply_snapshot_diff_is_replay_safe(spark, tmp_path):
    """ADVICE r8: re-running the same diff (crash-resume, at-least-once
    orchestration) must be a no-op for already-applied 'added' docs —
    the extend runs skip_existing, so a double apply leaves the index
    byte-equal in content to the single apply (no duplicate band/tok
    postings, so probes emit no duplicate pairs)."""
    from trendr_data_pipeline_spark.operators.ingestion import snapshot_diff
    from trendr_data_pipeline_spark.operators.text_index import (
        apply_snapshot_diff_to_index,
    )

    docs = read_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    v1 = docs.filter(F.col("doc_id") % 7 != 0)
    v2 = docs  # the %7==0 docs are 'added'
    idx = str(tmp_path / "idx")
    write_minhash_index(v1, idx)
    d = snapshot_diff(v1, v2, id_col="doc_id", content_col="text")
    apply_snapshot_diff_to_index(d, v2, idx)
    incoming = v2.filter(F.col("doc_id") % 10 == 0)
    once = _rows(minhash_probe(incoming, idx, threshold=0.8))
    # replay the SAME diff — must not re-append the added docs
    apply_snapshot_diff_to_index(d, v2, idx)
    twice = _rows(minhash_probe(incoming, idx, threshold=0.8))
    assert twice == once and once
    # stored band postings carry no duplicate (band, doc) rows
    import os as _os

    bands = spark.read.parquet(_os.path.join(idx, "data", "bands"))
    n = bands.count()
    nd = bands.distinct().count()
    assert n == nd
