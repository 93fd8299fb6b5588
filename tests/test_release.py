"""Incremental release cycle (c38's operator): artifact convergence,
replay safety, and screen semantics beyond the driver gate's hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from trendr_data_pipeline_spark.io import read_table
from trendr_data_pipeline_spark.operators.release import incremental_release_update
from trendr_data_pipeline_spark.operators.text_index import (
    minhash_probe,
    write_minhash_index,
)
from trendr_data_pipeline_spark.plans.dedup_ops import v2_snapshot


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_release_cycle_converges_index_and_replays(spark, tmp_path):
    """After the cycle, the in-place-refreshed index answers probes
    identically to a fresh v2 build (the artifact the NEXT cycle
    starts from is correct), and re-running the same cycle — the
    at-least-once orchestration case — returns the identical survivor
    frame without corrupting the artifact."""
    docs = read_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    v2 = v2_snapshot(docs)
    idx = str(tmp_path / "idx")
    write_minhash_index(docs, idx)
    out1 = _rows(incremental_release_update(docs, v2, idx, n_shards=8))
    assert out1

    fresh = str(tmp_path / "fresh")
    write_minhash_index(v2, fresh)
    queries = v2.filter(F.col("doc_id") % 10 == 0)
    got = _rows(minhash_probe(queries, idx, threshold=0.8))
    want = _rows(minhash_probe(queries, fresh, threshold=0.8))
    assert got == want and got

    out2 = _rows(incremental_release_update(docs, v2, idx, n_shards=8))
    assert out2 == out1
    got2 = _rows(minhash_probe(queries, idx, threshold=0.8))
    assert got2 == want


def test_release_screen_semantics(spark, tmp_path):
    """Hand-built corpus pinning the dup rule: a changed doc matching
    a RETAINED doc drops regardless of id order; among changed docs
    the smaller id survives; non-matching changed docs survive."""
    rows_v1 = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "totally unrelated content about spark engines"),
        (9, "alpha beta gamma delta epsilon zeta"),  # dup of 1, retained
    ]
    # v2: doc 9 retained-unchanged; 0 added == retained 9's text (drops
    # even though 0 < 9); 5 and 6 added as near-identical twins (5
    # survives, 6 drops); 7 added unique (survives); 2 modified
    # uniquely (survives); 1 removed
    rows_v2 = [
        (2, "totally unrelated content about spark engines revised"),
        (9, "alpha beta gamma delta epsilon zeta"),
        (0, "alpha beta gamma delta epsilon zeta"),
        (5, "one two three four five six seven eight nine ten"),
        (6, "one two three four five six seven eight nine ten"),
        (7, "completely fresh and unique document body here"),
    ]
    v1 = spark.createDataFrame(rows_v1, "doc_id long, text string")
    v2 = spark.createDataFrame(rows_v2, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    write_minhash_index(v1, idx)
    out = incremental_release_update(v1, v2, idx, threshold=0.8, n_shards=4)
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got == {5: "added", 7: "added", 2: "modified"}


def test_diff_and_release_oracles_null_content_parity(spark, tmp_path):
    """r9 review finding: md5(NULL) = NULL, so an oracle inferring
    existence from hash nullness misclassifies NULL-content docs. The
    fixture has no NULL texts, so the gate alone cannot catch a
    regression here — this pins Spark vs the REGISTERED oracle
    strings on a synthetic documents table WITH NULL texts, for both
    c33 (diff) and c38 (release cycle)."""
    import duckdb

    from trendr_data_pipeline_spark.plans.registry import all_queries

    rows = [
        (i, None if i % 5 == 0 else f"body text number {i} with words")
        for i in range(80)
    ]
    d = tmp_path / "synth"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))

    qs = all_queries()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("c33_snapshot_diff", "c38_release_cycle"):
        got = sorted(
            tuple(r) for r in qs[name].fn(spark, str(d)).collect()
        )
        want = sorted(tuple(r) for r in con.sql(qs[name].oracle).fetchall())
        assert got == want and got, name
        if name == "c33_snapshot_diff":
            # NULL-content transitions classify correctly: NULL→NULL
            # revision is UNCHANGED (absent), a re-added NULL doc is
            # 'added' with a NULL hash
            st = {r[0]: r[1] for r in got}
            null_readds = [
                i + 10_000_000 for i in range(80) if i % 13 == 0 and i % 5 == 0
            ]
            assert null_readds and all(st[x] == "added" for x in null_readds)
            null_revised = [
                i for i in range(80)
                if i % 5 == 0 and i % 7 == 0 and i % 11 != 0 and i % 13 != 0
            ]
            assert null_revised and all(x not in st for x in null_revised)


def test_release_cycle_empty_delta_is_noop(spark, tmp_path):
    """v2 == v1: the diff is empty, the refresh must not swap the
    artifact (inodes unchanged — the extend empty-no-op and remove
    no-hit guarantees composing), and the survivor frame is empty."""
    import os

    def inodes(root):
        out = {}
        for r, _dirs, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(r, f)
                    out[os.path.relpath(p, root)] = os.stat(p).st_ino
        return out

    docs = read_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "idx")
    write_minhash_index(docs, idx)
    before = inodes(idx)
    out = incremental_release_update(docs, docs, idx, n_shards=4)
    assert out.count() == 0
    assert inodes(idx) == before
