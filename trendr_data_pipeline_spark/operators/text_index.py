"""Persisted MinHash-LSH text index — incremental corpus dedup.

The batch near-dup joins (d02/d03/d05) recompute corpus signatures on
every run; at 100 TB the corpus side dominates and is ~static while
the increment (today's crawl) is small. This module persists the
signature work as a parquet artifact so screening N new docs costs
O(N·bands) compute plus two corpus SCANS with zero corpus shuffles —
the text twin of the ANN index lifecycle in
:mod:`~.index_store` (same atomic-swap/link/stage/single-writer
discipline, same FAISS-style train-vs-add split: the hash family is
the frozen "model", adding docs never touches existing files).

Layout under ``<index_dir>/``:

- ``meta/``        one row: kind='minhash', version, n_hashes, bands,
                   tokenizer ('words' | 'shingles');
- ``data/bands/``  (doc_id, size, band, bucket) — the LSH postings;
- ``data/toks/``   (doc_id, toks, size) — token sets for the exact
                   verification of candidates.

Probe plan (:func:`minhash_probe`): the incoming docs are signed in
one Arrow pass (the d03 UDF), their band rows broadcast against ONE
scan of ``data/bands`` (size-compatibility bound applied inside the
join, before the candidate-dedup shuffle), candidates verified
exactly against ONE scan of ``data/toks`` — identical results to
:func:`~.dedup.minhash_lsh_topk_join` over (incoming, corpus), pinned
in tests/test_text_index.py, at none of its corpus-side compute.

Reference scope: the reference's dedup is per-run in-memory
(``scripts/mention_scanner/dedup.py``); the persisted/incremental
form is a beyond-reference ⊕ operator motivated by the training-data
pipeline brief.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_band_buckets, shingle_set, token_set
from .index_store import (
    _atomic_write,
    _guarded_parts,
    _heal_crash_residue,
    _link_tree,
    _reader_root,
    _stage_files,
)

__all__ = [
    "write_minhash_index",
    "extend_minhash_index",
    "minhash_probe",
    "minhash_extend_sink",
    "remove_from_minhash_index",
    "minhash_remove_sink",
    "compact_minhash_index",
    "apply_snapshot_diff_to_index",
]

_TEXT_VERSION = 1
_TOKENIZERS = {"words": token_set, "shingles": shingle_set}


def _long_id(col: F.Column, what: str) -> F.Column:
    """Alias for the SHARED loud-cast guard (r9 review finding: three
    hand-kept copies of the device would drift like the compactors
    did) — see :func:`index_store.loud_long_id` for the contract."""
    from .index_store import loud_long_id

    return loud_long_id(col, what)


def _sign(
    docs: DataFrame, tokenizer: str, n_hashes: int, bands: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, toks, size, buckets) in one UDF pass — the d03
    signature frame, computed once per write/extend/probe."""
    tokset = _TOKENIZERS[tokenizer]
    return (
        docs.select(
            _long_id(F.col(id_col), "minhash index").alias("doc_id"),
            tokset(F.col(text_col)).alias("toks"),
        )
        .filter(F.size("toks") > 0)
        .withColumn("size", F.size("toks"))
        .withColumn("buckets", minhash_band_buckets(F.col("toks"), n_hashes, bands))
    )


def _band_rows(sig: DataFrame) -> DataFrame:
    return sig.select(
        "doc_id", "size", F.posexplode("buckets").alias("band", "bucket")
    )


def _tok_rows(sig: DataFrame) -> DataFrame:
    return sig.select("doc_id", "toks", "size")


def _load_meta(spark: SparkSession, index_dir: str, heal: bool):
    """Gate → meta, mirroring :func:`~.index_store._load_index`'s
    writer-heals / reader-doesn't contract."""
    if heal:
        _heal_crash_residue(index_dir)
        root = index_dir
    else:
        root = _reader_root(index_dir)
    meta = spark.read.parquet(os.path.join(root, "meta")).collect()[0]
    if meta["kind"] != "minhash" or meta["version"] != _TEXT_VERSION:
        raise ValueError(
            f"not a minhash text index at version {_TEXT_VERSION}: {index_dir}"
        )
    return root, meta


def write_minhash_index(
    corpus: DataFrame,
    out_dir: str,
    n_hashes: int = 128,
    bands: int = 32,
    tokenizer: str = "words",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Build the artifact from scratch: one signature pass over the
    corpus, postings + token sets written through the atomic swap."""
    if tokenizer not in _TOKENIZERS:
        raise ValueError(f"tokenizer must be one of {sorted(_TOKENIZERS)}")
    spark = corpus.sparkSession
    # the signature feeds TWO write jobs (bands + toks); without the
    # checkpoint each would recompute the full tokenize+minhash UDF
    # pass over the corpus (review finding — the build cost doubled,
    # contradicting the "one signature pass" contract)
    from ..plan_debug import note_subtree

    sig = note_subtree(
        "text_index.signature",
        _sign(corpus, tokenizer, n_hashes, bands, id_col, text_col),
    ).localCheckpoint(eager=True)

    def parts(tmp: str) -> None:
        spark.createDataFrame(
            [("minhash", _TEXT_VERSION, int(n_hashes), int(bands), tokenizer)],
            "kind string, version int, n_hashes int, bands int, tokenizer string",
        ).coalesce(1).write.parquet(os.path.join(tmp, "meta"))
        _band_rows(sig).write.parquet(os.path.join(tmp, "data", "bands"))
        _tok_rows(sig).write.parquet(os.path.join(tmp, "data", "toks"))

    _atomic_write(out_dir, parts)


def extend_minhash_index(
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    skip_existing: bool = False,
) -> None:
    """Add documents WITHOUT touching existing files: the hash family
    is frozen in ``meta`` (n_hashes/bands/tokenizer are read back, so
    an extend can never fork the signature space), every current file
    is hard-linked into the new tree, and only the new docs are
    signed and staged — cost O(new docs). ``skip_existing=True``
    anti-joins the incoming ids against ONE column-pruned scan of
    ``data/toks`` first, which is what makes the streaming sink's
    batch replay idempotent (re-adding an indexed doc is a no-op
    instead of a duplicate posting)."""
    spark = new_docs.sparkSession
    _root, meta = _load_meta(spark, index_dir, heal=True)
    sig = _sign(
        new_docs, meta["tokenizer"], meta["n_hashes"], meta["bands"], id_col, text_col
    )
    if skip_existing:
        existing = spark.read.parquet(os.path.join(index_dir, "data", "toks")).select(
            "doc_id"
        )
        sig = sig.join(existing, "doc_id", "left_anti")
    # the signature feeds two writes — materialize once, not twice
    from ..plan_debug import note_subtree

    sig = note_subtree("text_index.extend_sig", sig).localCheckpoint(eager=True)
    if sig.isEmpty():
        # nothing genuinely new (the replay shape): a true no-op —
        # no link-tree, no swap, inodes untouched (review finding;
        # matches remove's "absent ids = no swap" contract)
        return

    def build(tmp: str) -> None:
        _link_tree(index_dir, tmp)
        _stage_files(_band_rows(sig), os.path.join(tmp, "data", "bands"))
        _stage_files(_tok_rows(sig), os.path.join(tmp, "data", "toks"))

    _atomic_write(index_dir, _guarded_parts(index_dir, build))


def minhash_probe(
    incoming: DataFrame,
    index_dir: str,
    threshold: float,
    k: int | None = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Screen ``incoming`` against the indexed corpus: top-``k``
    near-duplicate matches per incoming doc at Jaccard ≥ ``threshold``
    — (id_a, id_b, jaccard, rk), id_a incoming, id_b stored. A stored
    doc with the SAME id as an incoming doc is skipped (the
    re-screening shape: a doc is never its own duplicate).

    ``k=None`` returns ALL verified matches UNRANKED — (id_a, id_b,
    jaccard), no ``rk`` column (r10): consumers that only need match
    EXISTENCE (the release cycle's dup rule) skip the per-id_a
    row_number exchange+sort entirely, which at the fixture's
    near-dup density is a window over ~10⁶ rows for a boolean.

    ``filter_ids`` restricts the SEARCHABLE corpus (the ⊕M7
    pre-filter model, e.g. screen only against same-language or
    same-license docs): the caller evaluates its predicate on the
    source-of-truth table and passes the allowed ids; one LEFT SEMI
    join prunes the postings scan BEFORE banding/verify — top-k among
    allowed docs, never a post-cut of an unfiltered top-k.

    Scale shape: the incoming side is signed in one Arrow pass and
    BROADCAST twice (band rows into the postings scan, token sets
    into the verify); the stored side is two scans with zero
    shuffles of corpus data — the only exchange keys on the
    CANDIDATE pairs (LSH-pruned, size-bound-pruned inside the band
    join before the distinct). Candidate recall at the threshold is
    the d03 banding bound 1−(1−t^r)^b."""
    spark = incoming.sparkSession
    root, meta = _load_meta(spark, index_dir, heal=False)
    # the signed incoming frame feeds the band join AND the verify —
    # persist once; same lifetime contract as the dedup joins (a lazy
    # builder cannot unpersist before its result materializes, so the
    # cache lives until the session's next clearCache)
    sig = _sign(
        incoming, meta["tokenizer"], meta["n_hashes"], meta["bands"], id_col, text_col
    ).persist()
    in_bands = _band_rows(sig).select(
        F.col("doc_id").alias("id_a"),
        F.col("size").alias("size_a"),
        "band",
        "bucket",
    )
    stored = spark.read.parquet(os.path.join(root, "data", "bands"))
    if filter_ids is not None:
        # loud-cast, not plain cast: a non-numeric filter id silently
        # vanishing from the semi-join would shrink the screened
        # corpus and report "no near-duplicates" (review finding —
        # the _apply_id_filter contract, applied here too)
        allowed = filter_ids.select(
            _long_id(F.col(id_col), "minhash_probe filter_ids").alias("_ok_id")
        ).distinct()
        stored = stored.join(
            allowed, stored["doc_id"] == allowed["_ok_id"], "left_semi"
        )
    t = float(threshold)
    cand = (
        stored.join(
            F.broadcast(in_bands),
            on=(
                (stored["band"] == in_bands["band"])
                & (stored["bucket"] == in_bands["bucket"])
                & (stored["doc_id"] != in_bands["id_a"])
                # J ≥ t ⇒ t·|A| ≤ |B| ≤ |A|/t — prune before the shuffle
                & (stored["size"] >= F.ceil(in_bands["size_a"] * t))
                & (stored["size"] * t <= in_bands["size_a"])
            ),
        )
        .select("id_a", stored["doc_id"].alias("id_b"))
        .distinct()
    )
    # verify on xxhash64-long arrays (r13, guide §2.3): intersect
    # cardinality — all the Jaccard below reads — is hash-invariant,
    # and long-array intersects skip per-element string work (see
    # operators.dedup.hashed_toks for the collision argument)
    from .dedup import hashed_toks

    toks_b = spark.read.parquet(os.path.join(root, "data", "toks")).select(
        F.col("doc_id").alias("id_b"),
        hashed_toks("toks").alias("toks_b"),
        F.col("size").alias("size_b"),
    )
    toks_a = sig.select(
        F.col("doc_id").alias("id_a"),
        hashed_toks("toks").alias("toks_a"),
        F.col("size").alias("size_a"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    jac = F.round(
        inter * 1.0 / (F.col("size_a") + F.col("size_b") - inter), 6
    )
    from pyspark.sql.window import Window

    verified = (
        cand.join(toks_b, "id_b")
        .join(F.broadcast(toks_a), "id_a")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
    )
    if k is None:
        return verified.select("id_a", "id_b", "jaccard")
    w = Window.partitionBy("id_a").orderBy(F.col("jaccard").desc(), F.col("id_b").asc())
    return (
        verified.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id_a", "id_b", "jaccard", "rk")
    )


def minhash_extend_sink(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming ingestion into the text index (the ⊕SS13 screen's
    persistence half): each micro-batch extends the artifact through
    :func:`extend_minhash_index` with ``skip_existing=True``, so a
    replayed batch (restart-from-checkpoint delivery) re-adds nothing
    — same replay-safety argument as ``ivf_extend_sink``."""

    def handle(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        extend_minhash_index(
            batch, index_dir, id_col=id_col, text_col=text_col, skip_existing=True
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def remove_from_minhash_index(
    ids: DataFrame, index_dir: str, id_col: str = "doc_id"
) -> None:
    """Hard-delete documents from the text index — takedowns/opt-outs
    as physical deletion, the third lifecycle verb. The file-pruned
    rewrite body is SHARED with the ANN artifacts
    (:func:`~.index_store._pruned_remove`, review finding: one copy
    of the removal protocol): both subtrees are discovery-scanned and
    pruned inside ONE atomic swap, so a crash can never publish an
    index whose postings and token sets disagree; removing absent ids
    is a true no-op (no swap, inodes unchanged) — idempotent, which
    keeps the takedown sink replay-safe."""
    from .index_store import _pruned_remove

    spark = ids.sparkSession
    _load_meta(spark, index_dir, heal=True)
    doomed = ids.select(_long_id(F.col(id_col), "remove_from_minhash_index").alias("_rm_id")).distinct()
    _pruned_remove(
        spark,
        index_dir,
        doomed,
        stored_id="doc_id",
        scan_roots=[
            os.path.join(index_dir, "data", "bands"),
            os.path.join(index_dir, "data", "toks"),
        ],
    )


def minhash_remove_sink(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
):
    """Streaming takedowns: each micro-batch of doomed ids is applied
    through :func:`remove_from_minhash_index`; replay-safe because
    re-removing an absent id is a structural no-op."""

    def handle(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        remove_from_minhash_index(batch, index_dir, id_col=id_col)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_minhash_index(index_dir: str, max_files_per_group: int = 8) -> None:
    """Small-file compaction (fourth lifecycle verb, completing
    extend/probe/REMOVE/compact parity with the ANN artifacts): a
    daily-extend lifecycle accumulates one file per subtree per
    extend; any subtree holding more than ``max_files_per_group``
    parquet files is rewritten as one file, everything else
    hard-links through the same atomic swap. Probe results are
    byte-identical before/after; a second call is a no-op
    (pytest-pinned)."""
    from pyspark.sql import SparkSession

    from .index_store import _compact_data_tree

    spark = SparkSession.active()
    _load_meta(spark, index_dir, heal=True)
    _compact_data_tree(spark, index_dir, max_files_per_group)


def apply_snapshot_diff_to_index(
    diff: DataFrame,
    new_snapshot: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental index refresh from a dataset-version diff — the
    composed maintenance verb a corpus release cycle runs:
    ``snapshot_diff(v1, v2)`` (⊕S17) says what changed, this applies
    it to the near-dup artifact WITHOUT re-signing the unchanged
    corpus. ``removed`` and ``modified`` ids are hard-deleted (a
    modified doc's old token set must not keep matching), then
    ``added`` and ``modified`` docs are signed and appended from
    ``new_snapshot`` — cost O(|delta|), and unchanged docs' files
    keep their inodes through both swaps. The result is pinned equal
    to a fresh build over v2 (tests/test_text_index.py).

    Remove-then-extend order matters for modified docs, and the
    extend skips already-indexed non-doomed ids so the verb is REPLAY
    SAFE (review finding): re-running the same diff — or resuming
    after a crash — must not re-append ``added`` docs that are
    already indexed (duplicate band/tok rows would make probes emit
    duplicate pairs). Modified docs still re-add because their stale
    rows are excluded from the "existing" set. Idempotency is
    pytest-pinned (double-apply == single-apply).

    r13 optimization (guide §1.2 fewer passes / §5 driver work): the
    refresh publishes through ONE guarded atomic swap instead of the
    old remove-swap + extend-swap pair — one heal, one link-tree, one
    conflict-guard listing, and both subtree rewrites and both new-row
    stagings inside a single build. Row-level semantics are identical
    (the old path's "existing" anti-join ran after the remove swap,
    i.e. against current-minus-doomed ids — reproduced literally
    below), and crash atomicity is strictly better: the old
    crash-between-swaps intermediate state (doomed removed, fresh not
    yet appended) can no longer be published."""
    from urllib.parse import unquote, urlparse

    spark = diff.sparkSession
    _root, meta = _load_meta(spark, index_dir, heal=True)
    doomed = (
        diff.filter(F.col("status").isin("removed", "modified"))
        .select(_long_id(F.col(id_col), "apply_snapshot_diff").alias("_rm_id"))
        .distinct()
    )
    changed = diff.filter(F.col("status").isin("added", "modified")).select(id_col)
    fresh = new_snapshot.join(changed, id_col, "left_semi")
    sig = _sign(
        fresh, meta["tokenizer"], meta["n_hashes"], meta["bands"], id_col, text_col
    )
    # "existing" = currently indexed ids minus the doomed set — exactly
    # what the old extend-after-remove anti-joined against
    toks_root = os.path.join(index_dir, "data", "toks")
    bands_root = os.path.join(index_dir, "data", "bands")
    existing = (
        spark.read.parquet(toks_root)
        .select("doc_id")
        .join(doomed, F.col("doc_id") == F.col("_rm_id"), "left_anti")
    )
    sig = sig.join(existing, "doc_id", "left_anti")
    from ..plan_debug import note_subtree

    sig = note_subtree("text_index.refresh_sig", sig).localCheckpoint(eager=True)

    # file discovery for the doomed rewrite: both subtrees in ONE job
    # (the id column is all the semi-join needs; union the pruned scans)
    stored_ids = (
        spark.read.parquet(bands_root)
        .select("doc_id", F.input_file_name().alias("_f"))
        .unionByName(
            spark.read.parquet(toks_root).select(
                "doc_id", F.input_file_name().alias("_f")
            )
        )
    )
    hit_files = [
        unquote(urlparse(r["_f"]).path)
        for r in stored_ids.join(
            doomed, F.col("doc_id") == F.col("_rm_id"), "left_semi"
        )
        .select("_f")
        .distinct()
        .collect()
    ]
    have_new = not sig.isEmpty()
    if not hit_files and not have_new:
        # nothing to delete, nothing genuinely new: TRUE no-op — no
        # swap, inodes untouched (both old verbs' no-op contract)
        return
    by_dir: dict[str, list[str]] = {}
    for p in hit_files:
        by_dir.setdefault(os.path.dirname(p), []).append(p)

    def build(tmp: str) -> None:
        _link_tree(index_dir, tmp)
        for d, files in by_dir.items():
            out = os.path.join(tmp, os.path.relpath(d, index_dir))
            for p in files:
                base = os.path.basename(p)
                for name in (base, f".{base}.crc"):
                    linked = os.path.join(out, name)
                    if os.path.exists(linked):
                        os.remove(linked)
            survivors = spark.read.parquet(*sorted(files)).join(
                doomed, F.col("doc_id") == F.col("_rm_id"), "left_anti"
            )
            _stage_files(survivors.coalesce(1), out)
        if have_new:
            _stage_files(_band_rows(sig), os.path.join(tmp, "data", "bands"))
            _stage_files(_tok_rows(sig), os.path.join(tmp, "data", "toks"))

    _atomic_write(index_dir, _guarded_parts(index_dir, build))
