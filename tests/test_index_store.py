"""Persisted ANN index artifacts (r5): build once, query warm, get
bit-identical results to the train-and-query path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from trendr_data_pipeline_spark.io import read_table
from trendr_data_pipeline_spark.operators.index_store import (
    ivf_topk_index,
    pq_topk_index,
    write_ivf_index,
    write_pq_index,
)
from trendr_data_pipeline_spark.operators.similarity import ivf_topk, pq_topk


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_index_roundtrip_identical(spark, tmp_path):
    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=16, seed=42, train_sample=4096)
    warm = _rows(ivf_topk_index(queries, idx, k=10, nprobe=4))
    direct = _rows(ivf_topk(queries, emb, k=10, nlist=16, nprobe=4))
    assert warm == direct
    # full-probe degenerate-exact setting must also match
    warm16 = _rows(ivf_topk_index(queries, idx, k=10, nprobe=16))
    direct16 = _rows(ivf_topk(queries, emb, k=10, nlist=16, nprobe=16))
    assert warm16 == direct16


def test_ivf_index_layout_is_cell_partitioned(spark, tmp_path):
    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=8)
    cells = [d for d in os.listdir(os.path.join(idx, "data")) if d.startswith("cell=")]
    assert len(cells) >= 2, "inverted-file layout missing"
    # a probe-pruned scan must push the cell filter into partition pruning
    import contextlib
    import io

    sub = spark.read.parquet(os.path.join(idx, "data")).filter(F.col("cell").isin(0, 1))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sub.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan, plan


def test_pq_index_roundtrip_identical(spark, tmp_path):
    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "pq_idx")
    # production setting (x12 shape)
    write_pq_index(emb, idx, m=8, ksub=16, seed=42, train_sample=4096)
    warm = _rows(pq_topk_index(queries, emb, idx, k=10, candidates=50))
    direct = _rows(pq_topk(queries, emb, k=10, m=8, ksub=16, candidates=50))
    assert warm == direct


def test_pq_index_warm_query_skips_training(spark, tmp_path):
    """The point of persistence: the warm path must not retrain the
    codebooks or re-encode the corpus (at fixture scale wall-clock
    can't show this — numpy training on 500 vectors is instant — so
    assert STRUCTURALLY: the training/encode entry points must not
    run during an index query; SCALING.md carries the sf0.1 warm/cold
    timings)."""
    from trendr_data_pipeline_spark.operators import index_store, similarity

    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "pq_idx")
    write_pq_index(emb, idx, m=8, ksub=16)

    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("warm query must not retrain/re-encode")

    saved = (similarity._pq_train_on, similarity._pq_encode,
             index_store._pq_train_on, index_store._pq_encode)
    similarity._pq_train_on = similarity._pq_encode = boom
    index_store._pq_train_on = index_store._pq_encode = boom
    try:
        assert pq_topk_index(queries, emb, idx, k=10).count() > 0
    finally:
        (similarity._pq_train_on, similarity._pq_encode,
         index_store._pq_train_on, index_store._pq_encode) = saved


def test_index_kind_mismatch_fails_loudly(spark, tmp_path):
    import pytest

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=8)
    with pytest.raises(ValueError, match="not a pq"):
        pq_topk_index(emb.limit(1), emb, idx)


def test_index_rebuild_is_atomic(spark, tmp_path):
    """Rebuilding over an existing index swaps atomically: after the
    second build no .old/._tmp residue remains and queries read the
    new artifact."""
    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=8, seed=1)
    write_ivf_index(emb, idx, nlist=16, seed=42)
    assert not os.path.exists(idx + ".old")
    assert not os.path.exists(idx + "._tmp")
    meta = spark.read.parquet(os.path.join(idx, "meta")).collect()[0]
    assert meta["nlist"] == 16 and meta["seed"] == 42


def test_ivfpq_index_roundtrip_identical(spark, tmp_path):
    from trendr_data_pipeline_spark.operators.index_store import (
        ivfpq_topk_index,
        write_ivfpq_index,
    )
    from trendr_data_pipeline_spark.operators.similarity import ivfpq_topk

    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(emb, idx, nlist=16, m=8, ksub=16, seed=42, train_sample=4096)
    warm = _rows(ivfpq_topk_index(queries, emb, idx, k=10, nprobe=4))
    direct = _rows(ivfpq_topk(queries, emb, k=10, nlist=16, nprobe=4, m=8, ksub=16))
    assert warm == direct


def test_ivfpq_index_scan_is_partition_pruned(spark, tmp_path):
    """The probed-cell union must reach the parquet scan as a
    PartitionFilter — reading nprobe/nlist of the code frame is the
    inverted file's point."""
    import contextlib
    import io as _io

    from trendr_data_pipeline_spark.operators.index_store import write_ivfpq_index

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(emb, idx, nlist=8)
    sub = spark.read.parquet(os.path.join(idx, "data")).filter(
        F.col("cell").isin(0, 3)
    )
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        sub.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan, plan


# ---------------------------------------------------------------------------
# r7: incremental extend (FAISS train/add split)
# ---------------------------------------------------------------------------


def _inodes(d):
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, d)] = os.stat(p).st_ino
    return out


def test_extend_ivf_index_adds_without_rewrite(spark, tmp_path):
    """extend = FAISS add: (1) at nprobe = nlist the extended index
    answers exactly the brute force over the UNION (degenerate-exact
    under the original centroids); (2) every pre-existing file
    survives as the SAME inode (the no-retrain/no-rewrite claim is
    executable); (3) model/ and meta/ are untouched."""
    from trendr_data_pipeline_spark.operators.index_store import (
        extend_ivf_index,
    )
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(base, idx, nlist=8, seed=42)
    before = _inodes(idx)
    extend_ivf_index(new, idx)
    after = _inodes(idx)
    # old files: same relative path, same inode
    for rel, ino in before.items():
        assert after.get(rel) == ino, f"rewritten or lost: {rel}"
    assert len(after) > len(before)  # new cell files landed
    got = _rows(
        ivf_topk_index(queries, idx, k=10, nprobe=8).select(
            "query_id", "neighbor_id"
        )
    )
    want = _rows(
        cosine_topk_bruteforce(queries, emb, k=10).select(
            "query_id", "neighbor_id"
        )
    )
    assert got == want


def test_extend_ivfpq_index_new_vectors_findable(spark, tmp_path):
    """After extend, a query identical to a NEW vector returns that
    vector as its top hit (exact rescore: cosine 1.0 wins once ADC
    admits it), and old files' inodes are unchanged."""
    from trendr_data_pipeline_spark.operators.index_store import (
        extend_ivfpq_index,
        ivfpq_topk_index,
        write_ivfpq_index,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    idx = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(base, idx, nlist=8, m=8, ksub=16, seed=42)
    before = _inodes(idx)
    extend_ivfpq_index(new, idx)
    after = _inodes(idx)
    for rel, ino in before.items():
        assert after.get(rel) == ino, f"rewritten or lost: {rel}"
    # query with FRESH ids (the ADC scan masks qid == neighbor_id self
    # matches by design): each query vector equals one NEW corpus
    # vector, which must come back as the exact-cosine-1.0 top hit
    queries = new.filter(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    got = ivfpq_topk_index(
        queries, emb, idx, k=1, nprobe=8, candidates=400
    ).collect()
    assert got, "no results from extended index"
    for r in got:
        assert r["neighbor_id"] == r["query_id"] - 1_000_000, r
        assert abs(r["cosine_sim"] - 1.0) < 1e-9


def test_extend_ivf_index_rejects_wrong_kind(spark, tmp_path):
    import pytest

    from trendr_data_pipeline_spark.operators.index_store import (
        extend_ivfpq_index,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=8)
    with pytest.raises(ValueError, match="ivfpq"):
        extend_ivfpq_index(emb.limit(5), idx)


def test_extend_heals_crash_residue(spark, tmp_path):
    """An extend that died mid-build (leftover ._tmp) or mid-swap
    cleanup (leftover .old) must not poison the next extend — the
    shared _atomic_write recovery, exercised through the extend
    path."""
    import shutil

    from trendr_data_pipeline_spark.operators.index_store import (
        extend_ivf_index,
    )
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(base, idx, nlist=8, seed=42)
    # simulate a crashed prior build: torn tmp + stale old backup
    os.makedirs(idx + "._tmp/garbage")
    shutil.copytree(idx, idx + ".old")
    extend_ivf_index(new, idx)
    assert not os.path.exists(idx + "._tmp")
    assert not os.path.exists(idx + ".old")
    got = _rows(
        ivf_topk_index(queries, idx, k=10, nprobe=8).select(
            "query_id", "neighbor_id"
        )
    )
    want = _rows(
        cosine_topk_bruteforce(queries, emb, k=10).select(
            "query_id", "neighbor_id"
        )
    )
    assert got == want


def test_extend_pq_index_codes_and_retrieval(spark, tmp_path):
    """PQ extend uses the frozen codebooks: (a) the NEW rows' stored
    codes equal ``_pq_encode(books)`` of their vectors under the
    index's own codebooks (the exact contract — a transposed or
    re-trained codebook would fail this even if exact-match queries
    still won the rescore); (b) old files keep their inodes; (c) a
    query equal to a new vector retrieves it at exact cosine 1.0."""
    from trendr_data_pipeline_spark.operators.index_store import (
        _load_index,
        extend_pq_index,
        pq_topk_index,
    )
    from trendr_data_pipeline_spark.operators.similarity import _pq_encode

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    idx = str(tmp_path / "pq_idx")
    write_pq_index(base, idx, m=8, ksub=16, seed=42)
    before = _inodes(idx)
    extend_pq_index(new, idx)
    after = _inodes(idx)
    for rel, ino in before.items():
        assert after.get(rel) == ino, f"rewritten or lost: {rel}"
    # every new row is searchable: stored rows == union
    data = spark.read.parquet(os.path.join(idx, "data"))
    stored = {r["neighbor_id"] for r in data.collect()}
    assert stored == {r["vec_id"] for r in emb.collect()}
    # (a) stored codes of the new rows == frozen-codebook encode
    _root, _meta, _c, books = _load_index(spark, idx, "pq")
    want_codes = {
        r["neighbor_id"]: list(r["codes"])
        for r in new.select(
            F.col("vec_id").alias("neighbor_id"),
            _pq_encode(books)(F.col("embedding")).alias("codes"),
        ).collect()
    }
    got_codes = {
        r["neighbor_id"]: list(r["codes"])
        for r in data.filter(
            F.col("neighbor_id").isin(list(want_codes))
        ).collect()
    }
    assert got_codes == want_codes
    got = pq_topk_index(queries, emb, idx, k=3, candidates=500).collect()
    assert got
    # a query equal to a new vector finds it at exact cosine 1.0
    tops = {r["query_id"]: r for r in got if r["rk"] == 1}
    for qid, r in tops.items():
        assert r["neighbor_id"] == qid - 1_000_000, r
        assert abs(r["cosine_sim"] - 1.0) < 1e-9


def test_compact_index_reduces_files_and_preserves_results(spark, tmp_path):
    """Three extends accumulate files per cell; compaction rewrites
    only oversized cells to one file each, leaves small cells'
    inodes untouched, and search results are identical before and
    after."""
    from trendr_data_pipeline_spark.operators.index_store import (
        compact_index,
        extend_ivf_index,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 4 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(base, idx, nlist=4, seed=42)
    for rem in (1, 2, 3):
        extend_ivf_index(emb.filter(F.col("vec_id") % 4 == rem), idx)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    pre = _rows(ivf_topk_index(queries, idx, k=10, nprobe=4))

    def files_per_cell():
        out = {}
        for root, _dirs, files in os.walk(os.path.join(idx, "data")):
            n = sum(1 for f in files if f.endswith(".parquet"))
            if n:
                out[os.path.basename(root)] = n
        return out

    before = files_per_cell()
    assert max(before.values()) > 2, before  # extends really accumulated
    compact_index(idx, max_files_per_cell=2)
    after = files_per_cell()
    assert max(after.values()) <= 2, after
    assert set(after) == set(before)  # no cell lost
    post = _rows(ivf_topk_index(queries, idx, k=10, nprobe=4))
    assert post == pre
    # idempotent: nothing oversized left, second call is a no-op
    compact_index(idx, max_files_per_cell=2)
    assert files_per_cell() == after


def test_ivf_extend_sink_streaming_replay_safe(spark, tmp_path):
    """Two waves with overlapping ids: the sink inserts each vector
    once (replay-style duplicates anti-joined away via the
    partition-pruned id scan), and the final index answers the full
    union exactly at nprobe = nlist."""
    from trendr_data_pipeline_spark.operators.index_store import (
        ivf_extend_sink,
    )
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 4 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(base, idx, nlist=4, seed=42)

    d = tmp_path / "waves"
    d.mkdir()

    from tests.fixtures import stage_stream_file

    def write_wave(i, df):
        stage_stream_file(spark, str(d), f"w{i}", df)

    # wave 1: % 4 in {0 (dup of base!), 1}; wave 2: {1 (dup), 2, 3}
    write_wave(1, emb.filter(F.col("vec_id") % 4 <= 1))
    stream = spark.readStream.schema(emb.schema).parquet(str(d))
    q = ivf_extend_sink(stream, idx, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        write_wave(2, emb.filter(F.col("vec_id") % 4 >= 1))
        q.processAllAvailable()
    finally:
        q.stop()
    stored = spark.read.parquet(os.path.join(idx, "data")).select("neighbor_id")
    assert stored.count() == stored.distinct().count() == emb.count()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = _rows(
        ivf_topk_index(queries, idx, k=10, nprobe=4).select(
            "query_id", "neighbor_id"
        )
    )
    want = _rows(
        cosine_topk_bruteforce(queries, emb, k=10).select(
            "query_id", "neighbor_id"
        )
    )
    assert got == want


def test_extend_heals_died_mid_swap(spark, tmp_path):
    """The worst residue: the previous writer died BETWEEN the two
    renames, so only `.old` exists. Every entry point loads through
    the heal-first path, so the next extend (and a plain query)
    must recover and succeed rather than crash-loop on a missing
    dir."""
    from trendr_data_pipeline_spark.operators.index_store import (
        extend_ivf_index,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(base, idx, nlist=8, seed=42)
    os.rename(idx, idx + ".old")  # simulate died-mid-swap
    extend_ivf_index(new, idx)
    assert os.path.isdir(idx) and not os.path.exists(idx + ".old")
    stored = spark.read.parquet(os.path.join(idx, "data")).select("neighbor_id")
    assert stored.count() == emb.count()


def test_compact_drops_crc_sidecars(spark, tmp_path):
    """Hadoop .crc sidecars of compacted files must not be re-linked
    forever: after compaction, every .crc in the artifact corresponds
    to an existing file."""
    from trendr_data_pipeline_spark.operators.index_store import (
        compact_index,
        extend_ivf_index,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb.filter(F.col("vec_id") % 4 == 0), idx, nlist=4)
    for rem in (1, 2, 3):
        extend_ivf_index(emb.filter(F.col("vec_id") % 4 == rem), idx)
    compact_index(idx, max_files_per_cell=1)
    orphans = []
    for root, _dirs, files in os.walk(idx):
        present = set(files)
        for f in files:
            if f.endswith(".crc") and f.startswith("."):
                target = f[1:-4]
                if target not in present:
                    orphans.append(os.path.join(root, f))
    assert not orphans, orphans


def test_concurrent_writer_conflict_detected(spark, tmp_path):
    """The single-writer guard: a build window during which the live
    data listing changes must abort the publish with RuntimeError
    (loud retry), never silently drop the other writer's rows."""
    import pytest

    from trendr_data_pipeline_spark.operators import index_store

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(base, idx, nlist=4, seed=42)

    orig = index_store._link_tree

    def racing_link_tree(src, dst):
        orig(src, dst)
        # another writer lands a file in the LIVE tree mid-build
        cell = next(
            d
            for d in os.listdir(os.path.join(idx, "data"))
            if d.startswith("cell=")
        )
        with open(os.path.join(idx, "data", cell, "part-intruder.parquet"), "wb") as f:
            f.write(b"x")

    index_store._link_tree = racing_link_tree
    try:
        with pytest.raises(RuntimeError, match="concurrent"):
            index_store.extend_ivf_index(new, idx)
    finally:
        index_store._link_tree = orig


def test_streaming_extend_then_compact_then_resume(spark, tmp_path):
    """The documented single-writer lifecycle end-to-end: stream
    extends accumulate files → stop the stream → compact → restart
    the stream on new data. Every stage preserves exactness at full
    probe and the checkpoint survives the compaction."""
    from trendr_data_pipeline_spark.operators.index_store import (
        compact_index,
        ivf_extend_sink,
    )
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb.filter(F.col("vec_id") % 4 == 0), idx, nlist=4, seed=42)

    d = tmp_path / "waves"
    d.mkdir()
    ck = str(tmp_path / "ck")

    from tests.fixtures import stage_stream_file

    def write_wave(i, df):
        stage_stream_file(spark, str(d), f"w{i}", df)

    def start():
        return ivf_extend_sink(
            spark.readStream.schema(emb.schema).parquet(str(d)), idx, ck
        )

    write_wave(1, emb.filter(F.col("vec_id") % 4 == 1))
    write_wave(2, emb.filter(F.col("vec_id") % 4 == 2))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    compact_index(idx, max_files_per_cell=1)

    write_wave(3, emb.filter(F.col("vec_id") % 4 == 3))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    stored = spark.read.parquet(os.path.join(idx, "data")).select("neighbor_id")
    assert stored.count() == stored.distinct().count() == emb.count()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = _rows(
        ivf_topk_index(queries, idx, k=10, nprobe=4).select(
            "query_id", "neighbor_id"
        )
    )
    want = _rows(
        cosine_topk_bruteforce(queries, emb, k=10).select(
            "query_id", "neighbor_id"
        )
    )
    assert got == want


def test_ivfpq_extend_sink_streaming(spark, tmp_path):
    """The compressed production leg of the extend sink: overlapping
    waves insert each vector once (codes under the frozen books), and
    new vectors are retrievable at exact cosine 1.0."""
    from trendr_data_pipeline_spark.operators.index_store import (
        index_extend_sink,
        ivfpq_topk_index,
        write_ivfpq_index,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(
        emb.filter(F.col("vec_id") % 4 == 0), idx, nlist=4, m=8, ksub=16
    )
    d = tmp_path / "waves"
    d.mkdir()

    from tests.fixtures import stage_stream_file

    def write_wave(i, df):
        stage_stream_file(spark, str(d), f"w{i}", df)

    write_wave(1, emb.filter(F.col("vec_id") % 4 <= 1))
    stream = spark.readStream.schema(emb.schema).parquet(str(d))
    q = index_extend_sink(stream, idx, str(tmp_path / "ck"), kind="ivfpq")
    try:
        q.processAllAvailable()
        write_wave(2, emb.filter(F.col("vec_id") % 4 >= 1))
        q.processAllAvailable()
    finally:
        q.stop()
    stored = spark.read.parquet(os.path.join(idx, "data")).select("neighbor_id")
    assert stored.count() == stored.distinct().count() == emb.count()
    queries = emb.filter(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    got = ivfpq_topk_index(
        queries, emb, idx, k=1, nprobe=4, candidates=400
    ).collect()
    assert got
    for r in got:
        assert r["neighbor_id"] == r["query_id"] - 1_000_000, r
        assert abs(r["cosine_sim"] - 1.0) < 1e-9


def test_reader_survives_swap_window_without_mutating(spark, tmp_path):
    """Readers are PURE: when the artifact momentarily exists only as
    `.old` (a writer's swap window), a query answers from the
    surviving copy and leaves the layout EXACTLY as it found it —
    healing is writer-only (a reader's rename would race the writer's
    swap; r7 review)."""
    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=8, seed=42)
    want = _rows(ivf_topk_index(queries, idx, k=10, nprobe=8))
    os.rename(idx, idx + ".old")  # the writer's window-A state
    got = _rows(ivf_topk_index(queries, idx, k=10, nprobe=8))
    assert got == want
    # the reader did NOT heal: layout untouched
    assert os.path.isdir(idx + ".old") and not os.path.exists(idx)
    os.rename(idx + ".old", idx)


# ---------------------------------------------------------------------------
# remove_from_index: the third lifecycle verb (extend / compact / remove)
# ---------------------------------------------------------------------------


def test_remove_from_index_ivf_file_pruned(spark, tmp_path):
    """(1) post-remove full-probe search == brute force over the
    surviving corpus; (2) removed ids never returned; (3) files not
    containing a doomed id keep their inodes (file-pruned rewrite is
    executable, not prose)."""
    from trendr_data_pipeline_spark.operators.index_store import remove_from_index
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=8, seed=42)

    doomed_ids = [1, 2, 3]
    # which files hold the doomed rows (for the inode pin below)
    stored = spark.read.parquet(os.path.join(idx, "data"))
    hit = {
        os.path.relpath(r["_f"].removeprefix("file:"), idx)
        for r in stored.withColumn("_f", F.input_file_name())
        .filter(F.col("neighbor_id").isin(doomed_ids))
        .select("_f")
        .distinct()
        .collect()
    }
    assert hit
    before = _inodes(idx)
    doomed = spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long")
    remove_from_index(doomed, idx)
    after = _inodes(idx)
    for rel, ino in before.items():
        if rel not in hit:
            assert after.get(rel) == ino, f"untouched file rewritten: {rel}"
        else:
            assert after.get(rel) != ino, f"affected file kept: {rel}"

    survivors = emb.filter(~F.col("vec_id").isin(doomed_ids))
    got = _rows(
        ivf_topk_index(queries, idx, k=10, nprobe=8).select(
            "query_id", "neighbor_id", "cosine_sim", "rk"
        )
    )
    want = _rows(cosine_topk_bruteforce(queries, survivors, k=10))
    assert got == want
    assert not {r for r in got if r[1] in set(doomed_ids)}


def test_remove_from_index_noop_and_idempotent(spark, tmp_path):
    from trendr_data_pipeline_spark.operators.index_store import remove_from_index

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=8, seed=42)
    before = _inodes(idx)
    # ids absent from the index: TRUE no-op, no swap, no rewrite
    ghost = spark.createDataFrame([(10**9 + 7,)], "vec_id long")
    remove_from_index(ghost, idx)
    assert _inodes(idx) == before
    # real removal, then the SAME removal again: second call no-op
    doomed = spark.createDataFrame([(4,), (5,)], "vec_id long")
    remove_from_index(doomed, idx)
    mid = _inodes(idx)
    remove_from_index(doomed, idx)
    assert _inodes(idx) == mid


def test_remove_from_index_pq_flat(spark, tmp_path):
    """Flat (unpartitioned) pq artifact: removal rewrites the flat
    data root's affected files; warm search over the artifact equals
    the train-and-query path on the surviving corpus."""
    from trendr_data_pipeline_spark.operators.index_store import remove_from_index

    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "pq_idx")
    write_pq_index(emb, idx, m=8, ksub=16, seed=42)
    doomed_ids = [0, 8, 16]
    doomed = spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long")
    remove_from_index(doomed, idx)
    survivors = emb.filter(~F.col("vec_id").isin(doomed_ids))
    # candidates >= corpus makes ADC admit everything, so both paths
    # reduce to exact cosine over their (surviving) code sets and the
    # codebook difference (index trained pre-removal) cannot matter
    got = _rows(pq_topk_index(queries, survivors, idx, k=10, candidates=10**9))
    want = _rows(
        pq_topk(queries, survivors, k=10, m=8, ksub=16, seed=42, candidates=10**9)
    )
    assert got == want


def test_remove_composes_with_extend_and_compact(spark, tmp_path):
    """Full lifecycle: build on a base slice, extend with new rows,
    REMOVE a mix of base and new ids, compact — final search equals
    brute force over (base ∪ new) − removed at full probe."""
    from trendr_data_pipeline_spark.operators.index_store import (
        compact_index,
        extend_ivf_index,
        remove_from_index,
    )
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(base, idx, nlist=8, seed=42)
    extend_ivf_index(new, idx)
    doomed_ids = [1, 2, 5, 10]  # base ids and extended ids
    remove_from_index(
        spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long"), idx
    )
    compact_index(idx, max_files_per_cell=0)
    survivors = emb.filter(~F.col("vec_id").isin(doomed_ids))
    got = _rows(
        ivf_topk_index(queries, idx, k=10, nprobe=8).select(
            "query_id", "neighbor_id", "cosine_sim", "rk"
        )
    )
    want = _rows(cosine_topk_bruteforce(queries, survivors, k=10))
    assert got == want


def test_filtered_search_on_persisted_indexes(spark, tmp_path):
    """⊕M7 on the warm path: filter_ids restricts all three persisted
    artifacts' searches with pre-filter semantics — at degenerate
    settings (full probe / full candidates) each equals the filtered
    brute force, and every neighbor satisfies the predicate."""
    from trendr_data_pipeline_spark.operators.index_store import (
        ivfpq_topk_index,
        write_ivfpq_index,
    )
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    pred = F.col("label") == 1
    allowed = emb.filter(pred).select("vec_id")
    allowed_set = {r["vec_id"] for r in allowed.collect()}
    want = _rows(cosine_topk_bruteforce(queries, emb, k=10, where=pred))

    ivf_dir = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, ivf_dir, nlist=8, seed=42)
    got_ivf = _rows(
        ivf_topk_index(queries, ivf_dir, k=10, nprobe=8, filter_ids=allowed).select(
            "query_id", "neighbor_id", "cosine_sim", "rk"
        )
    )
    assert got_ivf == want

    pq_dir = str(tmp_path / "pq_idx")
    write_pq_index(emb, pq_dir, m=8, ksub=16, seed=42)
    got_pq = _rows(
        pq_topk_index(queries, emb, pq_dir, k=10, candidates=10**9, filter_ids=allowed)
    )
    assert got_pq == want

    ivfpq_dir = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(emb, ivfpq_dir, nlist=8, m=8, ksub=16, seed=42)
    got_ivfpq = _rows(
        ivfpq_topk_index(
            queries, emb, ivfpq_dir, k=10, nprobe=8, candidates=10**9,
            filter_ids=allowed,
        )
    )
    assert got_ivfpq == want

    # production settings: results may be approximate but must still
    # satisfy the predicate (the filter is pre-scan, not post-cut)
    approx = ivf_topk_index(
        queries, ivf_dir, k=10, nprobe=3, filter_ids=allowed
    ).collect()
    assert approx and all(r["neighbor_id"] in allowed_set for r in approx)


def test_filter_ids_non_numeric_raises_not_empty(spark, tmp_path):
    """ADVICE r7: a filter id the long-cast NULLs out must raise at
    execution, not silently vanish from the semi-join (which would
    return zero candidates and read as 'no survivors')."""
    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ivf_dir = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, ivf_dir, nlist=4, seed=42)
    bad = spark.createDataFrame([("7",), ("not-an-id",)], "vec_id string")
    with pytest.raises(Exception, match="non-numeric"):
        ivf_topk_index(queries, ivf_dir, k=5, nprobe=4, filter_ids=bad).collect()
    # numeric strings are fine — the cast is lossless for them
    ok = spark.createDataFrame([("7",), ("14",)], "vec_id string")
    got = ivf_topk_index(queries, ivf_dir, k=5, nprobe=4, filter_ids=ok).collect()
    assert got and all(r["neighbor_id"] in (7, 14) for r in got)


def test_filtered_search_composes_with_lifecycle(spark, tmp_path):
    """r7 verdict item 7: the lifecycle verbs and filtered search are
    tested separately — compose them. Build on a base slice, EXTEND
    with new rows, REMOVE a mix of base and new ids, then run a
    FILTERED search (filter_ids) at full probe; the result must
    hash-equal the filtered brute force over the survivors."""
    from trendr_data_pipeline_spark.operators.index_store import (
        extend_ivf_index,
        remove_from_index,
    )
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(base, idx, nlist=8, seed=42)
    extend_ivf_index(new, idx)
    doomed_ids = [1, 2, 5, 10]  # base ids and extended ids
    remove_from_index(
        spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long"), idx
    )
    pred = F.col("label") == 1
    survivors = emb.filter(~F.col("vec_id").isin(doomed_ids))
    allowed = emb.filter(pred).select("vec_id")  # filter may name removed ids
    got = _rows(
        ivf_topk_index(queries, idx, k=10, nprobe=8, filter_ids=allowed).select(
            "query_id", "neighbor_id", "cosine_sim", "rk"
        )
    )
    want = _rows(cosine_topk_bruteforce(queries, survivors, k=10, where=pred))
    assert got == want


def test_index_remove_sink_streaming_takedowns(spark, tmp_path):
    """Deletion-request stream applied through foreachBatch: two
    waves with an OVERLAPPING id (the replay shape — re-removal is a
    structural no-op), final index equals the brute force over the
    survivors at full probe, and a third empty-effect wave leaves
    every inode unchanged."""
    from trendr_data_pipeline_spark.operators.index_store import (
        index_remove_sink,
    )
    from trendr_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=4, seed=42)

    d = tmp_path / "waves"
    d.mkdir()
    from tests.fixtures import stage_stream_file

    ids_schema = "vec_id long"
    w1 = spark.createDataFrame([(1,), (2,)], ids_schema)
    w2 = spark.createDataFrame([(2,), (3,)], ids_schema)  # 2 again: no-op half
    stage_stream_file(spark, str(d), "w1", w1)
    stream = spark.readStream.schema(w1.schema).parquet(str(d))
    q = index_remove_sink(stream, idx, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        stage_stream_file(spark, str(d), "w2", w2)
        q.processAllAvailable()
        before = _inodes(idx)
        # wave of ids already gone / never present: TRUE no-op
        stage_stream_file(
            spark, str(d), "w3",
            spark.createDataFrame([(1,), (10**9,)], ids_schema),
        )
        q.processAllAvailable()
        assert _inodes(idx) == before
    finally:
        q.stop()
    survivors = emb.filter(~F.col("vec_id").isin([1, 2, 3]))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = _rows(
        ivf_topk_index(queries, idx, k=10, nprobe=4).select(
            "query_id", "neighbor_id"
        )
    )
    want = _rows(
        cosine_topk_bruteforce(queries, survivors, k=10).select(
            "query_id", "neighbor_id"
        )
    )
    assert got == want


def test_remove_all_ids_leaves_searchable_empty_index(spark, tmp_path):
    """Removing EVERY id is a valid (if drastic) takedown: the data
    tree keeps (empty) parquet files so schema inference and the
    warm search still work — 0 rows returned, no crash — and a
    subsequent extend repopulates the same artifact."""
    from trendr_data_pipeline_spark.operators.index_store import (
        extend_ivf_index,
        remove_from_index,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=4, seed=42)
    remove_from_index(emb.select("vec_id"), idx)
    assert ivf_topk_index(queries, idx, k=5, nprobe=4).count() == 0
    extend_ivf_index(emb.filter(F.col("vec_id") < 50), idx)
    got = ivf_topk_index(queries, idx, k=5, nprobe=4)
    assert got.count() > 0
    assert all(r["neighbor_id"] < 50 for r in got.collect())


def test_remove_heals_died_mid_swap(spark, tmp_path):
    """Removal is an index writer like extend/compact: it must
    recover a died-mid-swap (.old-only) artifact before its first
    read instead of crash-looping."""
    from trendr_data_pipeline_spark.operators.index_store import (
        remove_from_index,
    )

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=4, seed=42)
    os.rename(idx, idx + ".old")  # simulate died-mid-swap
    doomed = spark.createDataFrame([(1,), (2,)], "vec_id long")
    remove_from_index(doomed, idx)
    assert os.path.isdir(idx) and not os.path.exists(idx + ".old")
    stored = spark.read.parquet(os.path.join(idx, "data")).select("neighbor_id")
    assert stored.count() == emb.count() - 2


def test_remove_from_index_null_or_bad_id_raises(spark, tmp_path):
    """ADVICE r8: a NULL or non-long-castable takedown id must FAIL
    LOUDLY — a silently-NULL _rm_id never matches the removal join,
    so the doc would stay in the index (the worst silent failure for
    a takedown verb). Same _long_id device as the text index."""
    from trendr_data_pipeline_spark.operators.index_store import remove_from_index

    emb = read_table(spark, SMOKE_SF, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, idx, nlist=4, seed=42)
    for bad in (
        spark.createDataFrame([(None,), (1,)], "vec_id long"),
        spark.createDataFrame([("not-an-id",)], "vec_id string"),
    ):
        with pytest.raises(Exception, match="non-null long-castable"):
            remove_from_index(bad, idx)
    # numeric strings still work — the cast is lossless for them
    remove_from_index(spark.createDataFrame([("3",)], "vec_id string"), idx)
    stored = spark.read.parquet(os.path.join(idx, "data"))
    assert stored.filter(F.col("neighbor_id") == 3).count() == 0
