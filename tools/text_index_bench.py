"""Measure the persisted-text-index value proposition: screening an
increment against an indexed corpus (minhash_probe) vs recomputing
the full in-memory LSH join (the d03 path) at the same SF.

Usage: python tools/text_index_bench.py [sf_dir] [threshold] [replicate]
``replicate`` (default 1) unions ``replicate`` id-shifted copies of
the corpus BEFORE indexing, scaling the corpus:increment ratio to
show how the gap widens when the corpus dominates (the 100 TB
regime: the increment stays fixed, corpus compute is what the index
amortizes away). Writes nothing; prints wall times + the
result-parity check. The SCALING.md "persisted text index" section
records the output.

Second mode (r9, verdict item 6) — the REALISTIC skew regime::

    python tools/text_index_bench.py synthetic [scale ...]

Third mode (r10, verdict item 1) — the COMPOSED release cycle's
O(delta) claim as wall time::

    python tools/text_index_bench.py release [scale ...]

Fourth mode (r11, verdict item 4) — the INCREMENTAL DATA CARD's
O(delta) claim as wall time (same growing-corpus/constant-delta
device; incremental_data_card over a staged v1 feature artifact vs
the from-scratch v2 card, parity asserted in-run)::

    python tools/text_index_bench.py card [scale ...]

Same synthetic growing-corpus device (hash-unique v1 scaled by
``scale``, CONSTANT delta: 100 removed + 150 modified + 250 added,
50 of the adds planted near-dups), but the measured unit is the
whole cycle: ``incremental_release_update`` (diff → O(delta) index
refresh → probe screen → split/shard) vs ``release_from_scratch``
(identical semantics, v2 index built from scratch — the O(corpus)
baseline). Output parity is asserted in-run at every scale; the
fresh:incremental ratio should GROW with corpus size (both paths
share the diff and the screen; the index work is what the
incremental path collapses to O(delta)). SCALING.md "r10: the
release cycle's O(delta) wall time" records the output.

Replication keeps near-dup density artificially high (every replica
is an exact dup, so candidate volume grows WITH the corpus and
compresses the ratio). The synthetic mode instead generates a corpus
of hash-unique documents (cross-doc Jaccard ≈ 0 — near-dup density
≪ 1/doc, the deduplicated-production-corpus shape), scales IT by
``scale`` while holding the increment constant at 500 docs (with 50
planted near-dups so parity is checkable), and prints
probe-vs-recompute at each scale. Signing the corpus dominates the
recompute path, so the ratio should GROW with corpus size — the
claim SCALING.md's "skewed corpus:increment" row records.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _synthetic_docs(spark, n: int, salt: str, id_offset: int = 0):
    """n hash-unique docs, 40 tokens each drawn from a 16^6 token
    space — cross-doc Jaccard ≈ 0, generated JVM-side (no driver
    loop, no fixture writes)."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(salt),
                                F.col("id").cast("string"),
                                F.lit("-"),
                                j.cast("string"),
                            )
                        ),
                        1,
                        6,
                    ),
                ),
            ),
        ).alias("text"),
    )


def synthetic_mode(scales: list[int]) -> int:
    import tempfile
    import time

    from pyspark.sql import functions as F

    from trendr_data_pipeline_spark.operators.dedup import minhash_lsh_topk_join
    from trendr_data_pipeline_spark.operators.text_index import (
        minhash_probe,
        write_minhash_index,
    )
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("text-index-bench-syn")
    base_n, inc_n, planted = 5_000, 500, 50
    thr = 0.8
    print(f"synthetic mode: base={base_n} increment={inc_n} planted={planted} thr={thr}")
    for scale in scales:
        n = base_n * scale
        corpus = _synthetic_docs(spark, n, "c").localCheckpoint(eager=True)
        # constant increment: 450 unique docs + 50 one-token-perturbed
        # near-dups of corpus docs (J = 39/41 ≈ 0.95 ≥ thr)
        uniq = _synthetic_docs(spark, inc_n - planted, "i", id_offset=100_000_000)
        near = (
            corpus.filter(F.col("doc_id") % (n // planted) == 0)
            .limit(planted)
            .select(
                (F.col("doc_id") + 200_000_000).alias("doc_id"),
                F.concat(
                    F.expr(
                        "substring(text, 1, length(text) - 7)"
                    ),
                    F.lit(" zz9end"),
                ).alias("text"),
            )
        )
        incoming = uniq.unionByName(near).localCheckpoint(eager=True)
        with tempfile.TemporaryDirectory() as d:
            idx = f"{d}/mh_idx"
            t0 = time.time()
            write_minhash_index(corpus, idx)
            t_build = time.time() - t0
            spark.catalog.clearCache()
            t0 = time.time()
            got = {
                tuple(r) for r in minhash_probe(incoming, idx, thr, k=20).collect()
            }
            t_probe = time.time() - t0
            spark.catalog.clearCache()
            t0 = time.time()
            want = {
                tuple(r)
                for r in minhash_lsh_topk_join(incoming, corpus, thr, k=20).collect()
            }
            t_full = time.time() - t0
            ratio = t_full / t_probe if t_probe > 0 else float("inf")
            print(
                f"scale={scale:>3} corpus={n:>7} build={t_build:6.2f}s "
                f"probe={t_probe:6.2f}s recompute={t_full:6.2f}s "
                f"ratio={ratio:5.2f}x pairs={len(got)} "
                f"parity={'OK' if got == want else 'MISMATCH'}"
            )
    return 0


#: the constant release delta both growing-corpus modes use
_DELTA = dict(n_rem=100, n_mod=150, n_add=250, planted=50)


def _release_pair(spark, n: int):
    """(v1, v2) with the CONSTANT delta regardless of corpus size:
    remove the first n_rem ids, append-modify the next n_mod, add
    n_add new docs (planted near-dups perturb one trailing token,
    J≈39/41≥0.8). Both checkpointed eagerly so generation cost never
    leaks into the timed paths."""
    from pyspark.sql import functions as F

    n_rem, n_mod, n_add, planted = (
        _DELTA["n_rem"], _DELTA["n_mod"], _DELTA["n_add"], _DELTA["planted"]
    )
    v1 = _synthetic_docs(spark, n, "c").localCheckpoint(eager=True)
    kept = v1.filter(F.col("doc_id") >= n_rem)
    modified = F.col("doc_id") < n_rem + n_mod
    v2_body = kept.select(
        "doc_id",
        F.when(modified, F.concat(F.col("text"), F.lit(" modxx")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    uniq = _synthetic_docs(spark, n_add - planted, "a", id_offset=100_000_000)
    near = (
        v1.filter(F.col("doc_id") % (n // planted) == 1)
        .limit(planted)
        .select(
            (F.col("doc_id") + 200_000_000).alias("doc_id"),
            F.concat(
                F.expr("substring(text, 1, length(text) - 7)"),
                F.lit(" zz9end"),
            ).alias("text"),
        )
    )
    v2 = v2_body.unionByName(uniq).unionByName(near).localCheckpoint(eager=True)
    return v1, v2


def release_mode(scales: list[int]) -> int:
    import shutil
    import tempfile
    import time

    from trendr_data_pipeline_spark.operators.release import (
        incremental_release_update,
        release_from_scratch,
    )
    from trendr_data_pipeline_spark.operators.text_index import write_minhash_index
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("release-bench")
    base_n = 5_000
    print(
        f"release mode: base={base_n} delta=({_DELTA['n_rem']} removed, "
        f"{_DELTA['n_mod']} modified, {_DELTA['n_add']} added incl. "
        f"{_DELTA['planted']} planted near-dups) thr=0.8"
    )
    for scale in scales:
        n = base_n * scale
        v1, v2 = _release_pair(spark, n)
        with tempfile.TemporaryDirectory() as d:
            idx = f"{d}/v1_idx"
            t0 = time.time()
            write_minhash_index(v1, idx)
            t_stage = time.time() - t0
            spark.catalog.clearCache()

            t0 = time.time()
            got = {
                tuple(r)
                for r in incremental_release_update(v1, v2, idx, threshold=0.8).collect()
            }
            t_inc = time.time() - t0
            spark.catalog.clearCache()

            fresh_idx = f"{d}/v2_idx"
            t0 = time.time()
            want = {
                tuple(r)
                for r in release_from_scratch(
                    v1, v2, fresh_idx, threshold=0.8
                ).collect()
            }
            t_fresh = time.time() - t0
            spark.catalog.clearCache()
            shutil.rmtree(fresh_idx, ignore_errors=True)
        ratio = t_fresh / t_inc if t_inc > 0 else float("inf")
        print(
            f"scale={scale:>3} corpus={n:>7} v1_stage={t_stage:6.2f}s "
            f"incremental={t_inc:6.2f}s from_scratch={t_fresh:6.2f}s "
            f"ratio={ratio:5.2f}x survivors={len(got)} "
            f"parity={'OK' if got == want else 'MISMATCH'}"
        )
    return 0


def card_mode(scales: list[int]) -> int:
    """Fourth mode (r11, verdict item 4) — c44's O(delta) claim as
    WALL TIME, the c38 treatment applied to the data card: growing
    corpus, constant delta; ``incremental_data_card`` over a staged
    v1 feature artifact vs the from-scratch v2 card, parity asserted
    in-run at every scale. Expected shape (and the honest difference
    from the release cycle): the incremental card avoids the
    re-FEATURIZE pass (tokenize/quality/entropy — the dominant cost)
    but still scans the maintained feature frame to aggregate, so
    the ratio grows toward featurize:scan, not unboundedly like the
    partition-pruned index probe. SCALING.md records the curve."""
    import tempfile
    import time

    from trendr_data_pipeline_spark.plans.data_card import (
        card_from_features,
        doc_card_features,
        incremental_data_card,
    )
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("card-bench")
    base_n = 5_000
    print(
        f"card mode: base={base_n} delta=({_DELTA['n_rem']} removed, "
        f"{_DELTA['n_mod']} modified, {_DELTA['n_add']} added)"
    )
    for scale in scales:
        n = base_n * scale
        v1, v2 = _release_pair(spark, n)
        with tempfile.TemporaryDirectory() as d:
            feat_path = f"{d}/feat_v1"
            t0 = time.time()
            doc_card_features(v1).write.parquet(feat_path)
            t_stage = time.time() - t0
            spark.catalog.clearCache()

            feat_v1 = spark.read.parquet(feat_path)
            t0 = time.time()
            got = {
                tuple(r)
                for r in incremental_data_card(feat_v1, v1, v2).collect()
            }
            t_inc = time.time() - t0
            spark.catalog.clearCache()

            # shared-diff variant: the release run's own c33 diff
            # handed in (c38's cycle computes it anyway — the card
            # piggybacks), so the timed path is the card's OWN work:
            # featurize the delta, merge, aggregate
            from trendr_data_pipeline_spark.operators.ingestion import (
                snapshot_diff,
            )

            diff = snapshot_diff(v1, v2).localCheckpoint(eager=True)
            t0 = time.time()
            got_shared = {
                tuple(r)
                for r in incremental_data_card(
                    feat_v1, v1, v2, diff=diff
                ).collect()
            }
            t_shared = time.time() - t0
            spark.catalog.clearCache()

            t0 = time.time()
            want = {
                tuple(r)
                for r in card_from_features(doc_card_features(v2)).collect()
            }
            t_fresh = time.time() - t0
            spark.catalog.clearCache()
        ratio = t_fresh / t_inc if t_inc > 0 else float("inf")
        ratio_s = t_fresh / t_shared if t_shared > 0 else float("inf")
        ok = got == want and got_shared == want
        print(
            f"scale={scale:>3} corpus={n:>7} feat_stage={t_stage:6.2f}s "
            f"incremental={t_inc:6.2f}s shared_diff={t_shared:6.2f}s "
            f"from_scratch={t_fresh:6.2f}s ratio={ratio:5.2f}x "
            f"ratio_shared={ratio_s:5.2f}x rows={len(got)} "
            f"parity={'OK' if ok else 'MISMATCH'}"
        )
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "synthetic":
        scales = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
        return synthetic_mode(scales)
    if len(sys.argv) > 1 and sys.argv[1] == "release":
        scales = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
        return release_mode(scales)
    if len(sys.argv) > 1 and sys.argv[1] == "card":
        scales = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
        return card_mode(scales)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from functools import reduce

    from pyspark.sql import functions as F

    from trendr_data_pipeline_spark.io import read_table
    from trendr_data_pipeline_spark.operators.dedup import minhash_lsh_topk_join
    from trendr_data_pipeline_spark.operators.text_index import (
        extend_minhash_index,
        minhash_probe,
        write_minhash_index,
    )
    from trendr_data_pipeline_spark.session import get_spark

    spark = get_spark("text-index-bench")
    base = read_table(spark, sf_dir, "documents")
    if replicate > 1:
        # id-shifted copies: same text distribution, bigger corpus —
        # scales corpus compute without touching the increment
        docs = reduce(
            lambda a, b: a.unionByName(b),
            [
                base.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 1_000_000)
                )
                for i in range(replicate)
            ],
        ).localCheckpoint(eager=True)
    else:
        docs = base
    incoming_pred = F.col("doc_id") % 10 == 0
    incoming = docs.filter(incoming_pred) if replicate == 1 else base.filter(
        incoming_pred
    )
    if replicate > 1:
        # disjoint incoming slice: shift past every replica
        incoming = incoming.withColumn(
            "doc_id", F.col("doc_id") + F.lit(replicate * 1_000_000)
        )
    n_docs, n_in = docs.count(), incoming.count()
    print(f"corpus={n_docs} incoming={n_in} threshold={thr} replicate={replicate}")

    with tempfile.TemporaryDirectory() as d:
        idx = f"{d}/mh_idx"
        t0 = time.time()
        write_minhash_index(docs, idx)
        t_build = time.time() - t0
        print(f"build_index: {t_build:.2f}s (one-time)")

        for tag in ("cold", "warm"):
            spark.catalog.clearCache()
            t0 = time.time()
            got = {tuple(r) for r in minhash_probe(incoming, idx, thr, k=20).collect()}
            print(f"probe_{tag}: {time.time() - t0:.2f}s ({len(got)} pairs)")

        spark.catalog.clearCache()
        t0 = time.time()
        want = {
            tuple(r)
            for r in minhash_lsh_topk_join(
                # subset (predicate) form when incoming ⊆ corpus;
                # two-frame form for the replicated disjoint increment
                incoming_pred if replicate == 1 else incoming,
                docs,
                thr,
                k=20,
            ).collect()
        }
        t_full = time.time() - t0
        print(f"full_recompute (d03 path): {t_full:.2f}s ({len(want)} pairs)")
        print(f"parity: {'OK' if got == want else 'MISMATCH'}")

        # incremental day-2: extend with a 10% slice, cost vs rebuild
        inc = docs.filter(F.col("doc_id") % 7 == 0)
        t0 = time.time()
        extend_minhash_index(inc.withColumn("doc_id", F.col("doc_id") + 10_000_000), idx)
        print(f"extend_10pct: {time.time() - t0:.2f}s (vs rebuild {t_build:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
