"""Incremental corpus-release cycle — the composed maintenance run a
real 100 TB training-data release executes between two dataset
versions (reference analog: the full refresh loop the reference's
``monitoring_system.py`` cron drives piecewise; here it is ONE
operator so the O(delta) claim is exercised end-to-end under a hash
oracle).

Stages, each separately gated (the c23 composition posture):

1. ``snapshot_diff(v1, v2)`` (⊕S17, gate c33) — what changed.
2. ``apply_snapshot_diff_to_index`` (⊕M9) — refresh the persisted
   MinHash near-dup index in O(|delta|): removed/modified docs
   hard-deleted, added/modified docs signed and appended; unchanged
   docs' files keep their inodes.
3. ``minhash_probe`` re-screen: every added/modified doc searched
   against the REFRESHED index. A changed doc is a duplicate iff it
   near-matches (exact-verified Jaccard ≥ threshold) a RETAINED doc
   (the shipped release always wins), or a fellow changed doc with a
   smaller id (the dedup family's keep-min convention).
4. Survivors get their deterministic ``split_assign`` (⊕D15, gate
   c34) and ``shuffle_shards`` (⊕D17, gate c36) coordinates — the
   rows a training run would actually ingest.

Scale shape: stage 2 touches O(delta) corpus data; stage 3 is the
probe's zero-corpus-shuffle scan (bands + toks, broadcast incoming);
stage 4 is a projection plus one bounded per-shard sort. The ONLY
full-corpus work is the diff's one co-partitioned full-outer join —
unavoidable (it defines the delta) and gated on its own as c33.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["incremental_release_update", "release_from_scratch"]


def _screen_and_coordinates(
    diff: DataFrame,
    v2: DataFrame,
    index_dir: str,
    threshold: float,
    n_shards: int,
    id_col: str,
    text_col: str,
    split_weights: dict[str, float] | None,
) -> DataFrame:
    """Stages 3-4 of the cycle (shared by the incremental path and the
    from-scratch baseline — same screen against WHICHEVER v2 artifact
    ``index_dir`` holds): probe every added/modified doc, apply the
    dup rule (retained partner wins; among changed docs the smaller
    id wins), and give survivors their split/shard/pos coordinates."""
    from .sampling import shuffle_shards, split_assign
    from .text_index import minhash_probe

    changed = diff.filter(F.col("status").isin("added", "modified")).select(
        F.col(id_col), "status"
    )
    incoming = v2.join(changed.select(id_col), id_col, "left_semi")
    # k=None: the dup decision needs EVERY verified match, not a
    # top-k (a qualifying neighbor below a small k would silently
    # flip a doc to survivor) — and needs no RANKS, so the probe's
    # per-id_a window exchange+sort is skipped entirely (r10)
    matches = minhash_probe(
        incoming, index_dir, threshold=threshold, k=None,
        id_col=id_col, text_col=text_col,
    )
    nb = changed.select(
        F.col(id_col).alias("id_b"), F.lit(True).alias("_nb_changed")
    )
    dup = (
        matches.join(F.broadcast(nb), "id_b", "left")
        .filter(F.col("_nb_changed").isNull() | (F.col("id_b") < F.col("id_a")))
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    survivors = changed.join(dup, id_col, "left_anti")
    out = split_assign(survivors, weights=split_weights, key_col=id_col)
    out = shuffle_shards(out, n_shards=n_shards, key_col=id_col)
    return out.select(id_col, "status", "split", "shard", "pos")


def incremental_release_update(
    v1: DataFrame,
    v2: DataFrame,
    index_dir: str,
    threshold: float = 0.8,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Run the release cycle from ``v1`` to ``v2`` against the
    persisted MinHash index at ``index_dir`` (which must hold v1 —
    the previous release's artifact). Returns one row per SURVIVING
    added/modified doc: (id, status, split, shard, pos).

    The index at ``index_dir`` is refreshed IN PLACE to v2 as a side
    effect (the artifact the next release cycle starts from). Both
    the refresh and this function are replay-safe: re-running the
    same (diff, v2) pair is a no-op for already-applied docs.

    Caching contract (r9 ADVICE): the diff frame is ``persist()``-ed
    and the returned lazy DataFrame still references it; the cache
    entry lives until ``spark.catalog.clearCache()`` or session end
    (bench.py and the driver clear between queries). A long-lived
    orchestrator running many cycles in one session should clearCache
    after materializing each cycle's survivors.
    """
    from .ingestion import snapshot_diff
    from .text_index import apply_snapshot_diff_to_index

    diff = snapshot_diff(v1, v2, id_col=id_col, content_col=text_col)
    # the diff feeds the refresh (two swap jobs) AND the screen —
    # persist once, the module-family materialize-once posture
    diff = diff.persist()
    apply_snapshot_diff_to_index(
        diff, v2, index_dir, id_col=id_col, text_col=text_col
    )
    return _screen_and_coordinates(
        diff, v2, index_dir, threshold, n_shards, id_col, text_col, split_weights
    )


def release_from_scratch(
    v1: DataFrame,
    v2: DataFrame,
    index_dir: str,
    threshold: float = 0.8,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """The O(corpus) baseline the incremental path is measured
    against (r9 verdict item 1): identical release semantics, but the
    v2 artifact at ``index_dir`` is BUILT FROM SCRATCH (one full
    signature pass over v2) instead of refreshed O(delta) from v1's.
    Output is row-identical to :func:`incremental_release_update` —
    asserted in-run by tools/text_index_bench.py's release mode and
    pinned by pytest; the wall-time ratio between the two is the
    cycle's O(delta) claim as a measured number (SCALING.md).

    Same caching contract as the incremental path (the diff frame is
    persisted; callers clearCache between cycles)."""
    from .ingestion import snapshot_diff
    from .text_index import write_minhash_index

    diff = snapshot_diff(v1, v2, id_col=id_col, content_col=text_col).persist()
    write_minhash_index(v2, index_dir, id_col=id_col, text_col=text_col)
    return _screen_and_coordinates(
        diff, v2, index_dir, threshold, n_shards, id_col, text_col, split_weights
    )
