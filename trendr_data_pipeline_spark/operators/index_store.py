"""Persisted ANN indexes (r4 verdict item 7): write the trained
IVF centroids / PQ codebooks plus the encoded corpus as parquet
artifacts, so repeated query batches skip retrain + re-encode — the
shape a real 100 TB serving path needs (FAISS separates `train`/
`add` from `search` for exactly this reason; here the artifact is a
plain parquet layout any Spark session can read).

Layout under ``<index_dir>/``:

- ``meta/``      one-row parquet: kind, params, dim, seed, version;
- ``model/``     the trained arrays — IVF: (cell, vec) centroid rows;
                 PQ: (subspace, code, vec) codeword rows — always
                 ``m·ksub`` / ``nlist`` rows, driver-collectable by
                 construction;
- ``data/``      the encoded corpus — IVF: (neighbor_id, cv, cell)
                 so a warm query is ONE scan with cell pruning and no
                 join back to the corpus; PQ: (neighbor_id, codes),
                 the compressed form ADC scans (the raw corpus is
                 still needed for the exact rescore, as in
                 :func:`~.similarity.pq_topk`).

Writes go through a temp-dir + atomic-rename swap (same two-phase
posture as ``streaming/jobs.merge_sink``): readers never observe a
half-written index, and a rebuild atomically replaces the old one.

Determinism: training is the same hash-ordered-sample numpy as the
query-time paths, so ``build → query`` equals ``train-and-query``
bit-for-bit (pinned in tests/test_index_store.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _ivf_search,
    _nearest_cells,
    _pq_adc_rescore,
    _pq_encode,
    _pq_train_on,
    _spherical_kmeans,
)

# v2 (r6): ivfpq codes are RESIDUAL codes (x_n − C[cell]) and the pq
# meta carries an explicit ksub column — v1 pq/ivfpq artifacts would be
# misdecoded, so their version gate rejects them. The IVF layout and
# semantics are UNCHANGED since v1, so v1 ivf artifacts stay valid
# (r6 ADVICE: a single module-wide bump forced needless IVF rebuilds)
# — versioning is per index KIND: new builds stamp _VERSION, readers
# accept _ACCEPTED_VERSIONS[kind].
_VERSION = 2
_ACCEPTED_VERSIONS = {"ivf": {1, 2}, "pq": {2}, "ivfpq": {2}}


def _atomic_write(out_dir: str, write_parts) -> None:
    """Write the index parts into ``out_dir`` via a temp dir + rename
    (atomic on POSIX within a filesystem; on object stores this
    becomes the store's commit protocol). Heals stale crash residue
    first: a ``.old`` left by a build that died between swap-in and
    cleanup would otherwise make EVERY later rebuild's backup rename
    fail (ENOTEMPTY) until someone deleted it by hand — the same
    recovery contract as ``streaming/jobs.merge_sink``."""
    import shutil

    old = out_dir + ".old"
    if os.path.exists(old):
        if os.path.exists(out_dir):
            shutil.rmtree(old)  # prior swap finished; cleanup didn't
        else:
            os.rename(old, out_dir)  # prior build died mid-swap
    tmp = out_dir + "._tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    write_parts(tmp)
    if os.path.exists(out_dir):
        os.rename(out_dir, old)
    os.rename(tmp, out_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def write_ivf_index(
    corpus: DataFrame,
    out_dir: str,
    nlist: int = 16,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train the spherical-k-means coarse quantizer and persist
    centroids + cell-assigned corpus."""
    import numpy as np

    spark = corpus.sparkSession
    sample = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(train_sample)
        .collect()
    )
    X = np.array([r["v"] for r in sample], dtype=np.float64)
    centroids = _spherical_kmeans(X, nlist=nlist, seed=seed)
    dim = centroids.shape[1]
    assign_udf = _nearest_cells(centroids, nprobe=1)
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign_udf(F.col(vec_col)).getItem(0).alias("cell"),
    )

    def parts(tmp: str) -> None:
        spark.createDataFrame(
            [(int(c), [float(x) for x in centroids[c]]) for c in range(nlist)],
            "cell int, vec array<double>",
        ).coalesce(1).write.parquet(os.path.join(tmp, "model"))
        # partitionBy(cell): a warm query with nprobe cells reads only
        # those partitions — the on-disk layout IS the inverted file
        assigned.write.partitionBy("cell").parquet(os.path.join(tmp, "data"))
        spark.createDataFrame(
            [("ivf", _VERSION, int(nlist), 0, int(dim), int(seed))],
            "kind string, version int, nlist int, m int, dim int, seed int",
        ).coalesce(1).write.parquet(os.path.join(tmp, "meta"))

    _atomic_write(out_dir, parts)


def ivf_topk_index(
    queries: DataFrame,
    index_dir: str,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index: read centroids (tiny), prune the
    partitioned data scan to the probed cells, exact-rescore. No
    training, no encode — the warm-path cost is the candidate scan."""
    import numpy as np

    spark = queries.sparkSession
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    if meta["kind"] != "ivf" or meta["version"] not in _ACCEPTED_VERSIONS["ivf"]:
        raise ValueError(
            f"not an ivf index at an accepted version "
            f"({sorted(_ACCEPTED_VERSIONS['ivf'])}): {index_dir}"
        )
    rows = spark.read.parquet(os.path.join(index_dir, "model")).collect()
    centroids = np.zeros((meta["nlist"], meta["dim"]), dtype=np.float64)
    for r in rows:
        centroids[r["cell"]] = r["vec"]
    assigned = spark.read.parquet(os.path.join(index_dir, "data"))
    return _ivf_search(queries, assigned, centroids, k, nprobe, id_col, vec_col)


def write_pq_index(
    corpus: DataFrame,
    out_dir: str,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train per-subspace codebooks and persist them + the encoded
    (id, codes) corpus — the 4-32× compressed form ADC scans."""
    spark = corpus.sparkSession
    books = _pq_train_on(corpus, m, ksub, seed, train_sample, id_col, vec_col)
    dim = books.shape[0] * books.shape[2]
    encode = _pq_encode(books)
    coded = corpus.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("codes")
    )

    def parts(tmp: str) -> None:
        spark.createDataFrame(
            [
                (j, c, [float(x) for x in books[j, c]])
                for j in range(books.shape[0])
                for c in range(books.shape[1])
            ],
            "subspace int, code int, vec array<double>",
        ).coalesce(1).write.parquet(os.path.join(tmp, "model"))
        coded.write.parquet(os.path.join(tmp, "data"))
        # explicit ksub column (nlist = 0: a pq index has no coarse
        # quantizer) — the same meta name must not mean different
        # things per index kind (r5 ADVICE; ivfpq already does this)
        spark.createDataFrame(
            [("pq", _VERSION, 0, int(m), int(dim), int(seed), int(books.shape[1]))],
            "kind string, version int, nlist int, m int, dim int, seed int, ksub int",
        ).coalesce(1).write.parquet(os.path.join(tmp, "meta"))

    _atomic_write(out_dir, parts)


def pq_topk_index(
    queries: DataFrame,
    corpus: DataFrame,
    index_dir: str,
    k: int = 10,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted PQ index: codebooks from ``model/`` (m·ksub
    rows), ADC over the persisted codes, exact rescore against the
    raw ``corpus`` vectors (the index stores only the compressed
    codes; the rescore join is the same broadcast-candidate shape as
    :func:`~.similarity.pq_topk`)."""
    import numpy as np

    spark = queries.sparkSession
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    if meta["kind"] != "pq" or meta["version"] not in _ACCEPTED_VERSIONS["pq"]:
        raise ValueError(
            f"not a pq index at an accepted version "
            f"({sorted(_ACCEPTED_VERSIONS['pq'])}): {index_dir}"
        )
    m, ksub = meta["m"], meta["ksub"]
    dsub = meta["dim"] // m
    rows = spark.read.parquet(os.path.join(index_dir, "model")).collect()
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in rows:
        books[r["subspace"], r["code"]] = r["vec"]
    coded = spark.read.parquet(os.path.join(index_dir, "data"))
    return _pq_adc_rescore(queries, corpus, books, coded, k, candidates, id_col, vec_col)


def write_ivfpq_index(
    corpus: DataFrame,
    out_dir: str,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train coarse centroids + RESIDUAL PQ codebooks on the same
    hash sample and persist the corpus as (neighbor_id, codes) rows
    partitioned by cell — the 32×-compressed, partition-prunable
    serving layout (FAISS IVFPQ's inverted file as a parquet
    directory tree). Codes are residual codes (v2): the codebooks are
    trained on ``x_n − C[cell]`` and decode relative to the cell
    centroid."""
    from .similarity import _assign_and_encode_residual, _ivfpq_train_on

    spark = corpus.sparkSession
    centroids, books = _ivfpq_train_on(
        corpus, nlist, m, ksub, seed, train_sample, id_col, vec_col
    )
    dim = centroids.shape[1]

    assign_encode = _assign_and_encode_residual(centroids, books)
    coded = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        assign_encode(F.col(vec_col)).alias("ce"),
    ).select(
        "neighbor_id", F.col("ce.cell").alias("cell"), F.col("ce.codes").alias("codes")
    )

    def parts(tmp: str) -> None:
        spark.createDataFrame(
            [(-1, int(c), [float(x) for x in centroids[c]]) for c in range(nlist)]
            + [
                (j, c, [float(x) for x in books[j, c]])
                for j in range(m)
                for c in range(books.shape[1])
            ],
            # subspace = -1 rows are the coarse centroids; >= 0 rows
            # the per-subspace codewords — one model file, two roles
            "subspace int, code int, vec array<double>",
        ).coalesce(1).write.parquet(os.path.join(tmp, "model"))
        coded.write.partitionBy("cell").parquet(os.path.join(tmp, "data"))
        spark.createDataFrame(
            [("ivfpq", _VERSION, int(nlist), int(m), int(dim), int(seed), int(books.shape[1]))],
            "kind string, version int, nlist int, m int, dim int, seed int, ksub int",
        ).coalesce(1).write.parquet(os.path.join(tmp, "meta"))

    _atomic_write(out_dir, parts)


def ivfpq_topk_index(
    queries: DataFrame,
    corpus: DataFrame,
    index_dir: str,
    k: int = 10,
    nprobe: int = 4,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVFPQ index: centroids + codebooks from
    ``model/`` (tiny), then the ADC scan reads ONLY the probed cells'
    partitions — the union of every query's probe set prunes the
    parquet scan itself (PartitionFilters), on top of the per-query
    -inf mask inside the scan. Exact rescore against the raw
    ``corpus`` as usual."""
    import numpy as np

    from .similarity import _pq_adc_rescore

    spark = queries.sparkSession
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    if meta["kind"] != "ivfpq" or meta["version"] not in _ACCEPTED_VERSIONS["ivfpq"]:
        raise ValueError(
            f"not an ivfpq index at an accepted version "
            f"({sorted(_ACCEPTED_VERSIONS['ivfpq'])}): {index_dir}"
        )
    nlist, m, ksub, dim = meta["nlist"], meta["m"], meta["ksub"], meta["dim"]
    rows = spark.read.parquet(os.path.join(index_dir, "model")).collect()
    centroids = np.zeros((nlist, dim), dtype=np.float64)
    books = np.zeros((m, ksub, dim // m), dtype=np.float64)
    for r in rows:
        if r["subspace"] < 0:
            centroids[r["code"]] = r["vec"]
        else:
            books[r["subspace"], r["code"]] = r["vec"]

    # union of all queries' probe sets → partition-pruned data scan.
    # Collect the query rows ONCE and hand them down — _pq_adc_rescore
    # would otherwise ship the same vectors driver-side a second time.
    # Bounded via the shared guard (refuses > MAX_QUERY_ROWS batches)
    from .similarity import _collect_query_rows

    qrows = _collect_query_rows(queries, id_col, vec_col)
    qv = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qn = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    probed = sorted(
        {
            int(c)
            for row in np.argsort(-(qn @ cn.T), axis=1, kind="stable")[:, :nprobe]
            for c in row
        }
    )
    coded = spark.read.parquet(os.path.join(index_dir, "data")).filter(
        F.col("cell").isin(probed)
    )
    return _pq_adc_rescore(
        queries, corpus, books, coded, k, candidates, id_col, vec_col,
        probe_centroids=centroids, nprobe=nprobe, qrows=qrows, residual=True,
    )


# ---------------------------------------------------------------------------
# r7: incremental extend — FAISS's train/add split for persisted artifacts
# ---------------------------------------------------------------------------


def _link_tree(src: str, dst: str) -> None:
    """Hard-link every file under ``src`` into the same relative
    layout under ``dst`` (copy2 fallback on mounts without link
    support — the merge-sink posture). Zero data movement on POSIX."""
    import shutil

    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def _stage_into_cells(new_part: DataFrame, data_dir: str) -> None:
    """Write the cell-partitioned new rows into a staging dir, then
    move its part files into the (already hard-linked) ``data_dir``
    cell tree. Spark part-file names carry write UUIDs, so moved
    files cannot collide with linked ones — the same argument the
    partitioned merge sink documents."""
    import shutil

    stage = data_dir + "._stage"
    new_part.write.partitionBy("cell").parquet(stage)
    for root, _dirs, files in os.walk(stage):
        rel = os.path.relpath(root, stage)
        if rel == ".":
            continue
        out = os.path.join(data_dir, rel)
        os.makedirs(out, exist_ok=True)
        for f in files:
            if f.endswith(".parquet"):
                shutil.move(os.path.join(root, f), os.path.join(out, f))
    shutil.rmtree(stage)


def extend_ivf_index(
    new_vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """FAISS's ``train``/``add`` split, parquet-artifact edition (the
    lifecycle step between :func:`write_ivf_index` — full retrain +
    rewrite — and serving): add ``new_vectors`` to a persisted IVF
    index WITHOUT retraining the coarse quantizer and WITHOUT
    rewriting the stored corpus. The trained centroids are reused
    verbatim (assignment is the same stable cosine argmax as
    serving), every existing file is HARD-LINKED into the new
    artifact, and only the new rows are assigned and written — cost
    O(new vectors), not O(corpus). The swap is the same atomic
    two-phase rename as every index build: readers never observe a
    half-extended index, and a crashed extend leaves the old artifact
    intact (retry-safe).

    Search contract (pinned in tests/test_index_store.py): after
    extend, queries run against the UNION corpus under the ORIGINAL
    centroids — at nprobe = nlist that is exactly the brute force
    over the union (the m03 degenerate argument), and the old files'
    inodes are unchanged (the no-rewrite claim is executable)."""
    import numpy as np

    spark = new_vectors.sparkSession
    from .similarity import _nearest_cells

    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    if meta["kind"] != "ivf" or meta["version"] not in _ACCEPTED_VERSIONS["ivf"]:
        raise ValueError(
            f"not an ivf index at an accepted version "
            f"({sorted(_ACCEPTED_VERSIONS['ivf'])}): {index_dir}"
        )
    rows = spark.read.parquet(os.path.join(index_dir, "model")).collect()
    centroids = np.zeros((meta["nlist"], meta["dim"]), dtype=np.float64)
    for r in rows:
        centroids[r["cell"]] = r["vec"]
    assign_udf = _nearest_cells(centroids, nprobe=1)
    assigned = new_vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign_udf(F.col(vec_col)).getItem(0).alias("cell"),
    )

    def parts(tmp: str) -> None:
        _link_tree(index_dir, tmp)
        _stage_into_cells(assigned, os.path.join(tmp, "data"))

    _atomic_write(index_dir, parts)


def extend_ivfpq_index(
    new_vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """:func:`extend_ivf_index` for the IVFPQ artifact: reuse the
    trained centroids AND residual codebooks, hard-link every
    existing file, encode + write only the new rows (one Arrow
    projection over the new vectors). New vectors' residuals are
    quantized by codebooks trained before they existed — exactly
    FAISS ``add`` semantics: the codebook is a frozen model, recall
    on post-training data is an empirical property (pinned: a query
    equal to a new vector finds it — the exact rescore guarantees
    cosine 1.0 wins once ADC admits it)."""
    import numpy as np

    spark = new_vectors.sparkSession
    from .similarity import _assign_and_encode_residual

    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    if meta["kind"] != "ivfpq" or meta["version"] not in _ACCEPTED_VERSIONS["ivfpq"]:
        raise ValueError(
            f"not an ivfpq index at an accepted version "
            f"({sorted(_ACCEPTED_VERSIONS['ivfpq'])}): {index_dir}"
        )
    nlist, m, ksub, dim = meta["nlist"], meta["m"], meta["ksub"], meta["dim"]
    rows = spark.read.parquet(os.path.join(index_dir, "model")).collect()
    centroids = np.zeros((nlist, dim), dtype=np.float64)
    books = np.zeros((m, ksub, dim // m), dtype=np.float64)
    for r in rows:
        if r["subspace"] < 0:
            centroids[r["code"]] = r["vec"]
        else:
            books[r["subspace"], r["code"]] = r["vec"]
    assign_encode = _assign_and_encode_residual(centroids, books)
    coded = new_vectors.select(
        F.col(id_col).alias("neighbor_id"),
        assign_encode(F.col(vec_col)).alias("ce"),
    ).select(
        "neighbor_id",
        F.col("ce.cell").alias("cell"),
        F.col("ce.codes").alias("codes"),
    )

    def parts(tmp: str) -> None:
        _link_tree(index_dir, tmp)
        _stage_into_cells(coded, os.path.join(tmp, "data"))

    _atomic_write(index_dir, parts)


def extend_pq_index(
    new_vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """:func:`extend_ivf_index` for the flat PQ artifact: encode the
    new rows with the frozen codebooks (one Arrow projection), stage
    them as new files beside the hard-linked existing ones, atomic
    swap."""
    import numpy as np

    spark = new_vectors.sparkSession
    from .similarity import _pq_encode

    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    if meta["kind"] != "pq" or meta["version"] not in _ACCEPTED_VERSIONS["pq"]:
        raise ValueError(
            f"not a pq index at an accepted version "
            f"({sorted(_ACCEPTED_VERSIONS['pq'])}): {index_dir}"
        )
    m, ksub, dim = meta["m"], meta["ksub"], meta["dim"]
    rows = spark.read.parquet(os.path.join(index_dir, "model")).collect()
    books = np.zeros((m, ksub, dim // m), dtype=np.float64)
    for r in rows:
        books[r["subspace"], r["code"]] = r["vec"]
    encode = _pq_encode(books)
    coded = new_vectors.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("codes")
    )

    def parts(tmp: str) -> None:
        import shutil

        _link_tree(index_dir, tmp)
        data_dir = os.path.join(tmp, "data")
        stage = data_dir + "._stage"
        coded.write.parquet(stage)
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(stage, f), os.path.join(data_dir, f))
        shutil.rmtree(stage)

    _atomic_write(index_dir, parts)


def compact_index(index_dir: str, max_files_per_cell: int = 8) -> None:
    """Small-file compaction for extended indexes: every
    :func:`extend_*_index` call adds at least one file per touched
    cell, so a daily-extend lifecycle accumulates files that tax the
    scan (open/footer cost per file). Rewrite ONLY the cells (or the
    flat data root, for pq) holding more than ``max_files_per_cell``
    parquet files — each such group is read and rewritten as one file
    — hard-link everything else unchanged, and publish through the
    same atomic swap. Cost O(oversized cells' rows); search results
    are byte-identical before/after (pinned in
    tests/test_index_store.py)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.active()
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    if meta["kind"] not in _ACCEPTED_VERSIONS:
        raise ValueError(f"unknown index kind at {index_dir}")
    data_dir = os.path.join(index_dir, "data")
    groups: dict[str, list[str]] = {}
    for root, _dirs, files in os.walk(data_dir):
        pq_files = [f for f in files if f.endswith(".parquet")]
        if pq_files:
            groups[os.path.relpath(root, data_dir)] = sorted(
                os.path.join(root, f) for f in pq_files
            )
    oversized = {g: fs for g, fs in groups.items() if len(fs) > max_files_per_cell}
    if not oversized:
        return

    def parts(tmp: str) -> None:
        import shutil

        _link_tree(index_dir, tmp)
        for g, fs in oversized.items():
            out = os.path.join(tmp, "data") if g == "." else os.path.join(
                tmp, "data", g
            )
            # drop the linked copies of the files being compacted
            for p in fs:
                linked = os.path.join(out, os.path.basename(p))
                if os.path.exists(linked):
                    os.remove(linked)
            stage = out + "._stage"
            spark.read.parquet(*fs).coalesce(1).write.parquet(stage)
            for f in os.listdir(stage):
                if f.endswith(".parquet"):
                    shutil.move(os.path.join(stage, f), os.path.join(out, f))
            shutil.rmtree(stage)

    _atomic_write(index_dir, parts)


def ivf_extend_sink(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming index maintenance: each micro-batch extends the
    persisted IVF index with its genuinely-new vectors — the
    lifecycle stream a serving deployment runs beside ingestion
    (FAISS ``add`` on a schedule, expressed as foreachBatch over
    :func:`extend_ivf_index`).

    Replay safety: a replayed batch (checkpoint recovery) must not
    double-insert, so the batch anti-joins the stored ids first — and
    that scan is PRUNED to the batch's own cells (assign the batch
    with the current centroids, read only ``cell IN (...)``
    partitions, project only ``neighbor_id``), so the idempotence
    check costs O(affected cells' ids), not O(corpus). Every publish
    goes through the atomic swap, so concurrent readers are never
    torn and a crash leaves the previous artifact intact.

    Returns the started StreamingQuery."""
    import numpy as np

    from .similarity import _nearest_cells

    def do_extend(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if not batch.take(1):
            return
        rows = spark.read.parquet(os.path.join(index_dir, "model")).collect()
        meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
        centroids = np.zeros((meta["nlist"], meta["dim"]), dtype=np.float64)
        for r in rows:
            centroids[r["cell"]] = r["vec"]
        assign_udf = _nearest_cells(centroids, nprobe=1)
        assigned = batch.withColumn(
            "cell", assign_udf(F.col(vec_col)).getItem(0)
        ).localCheckpoint()
        cells = [int(r["cell"]) for r in assigned.select("cell").distinct().collect()]
        stored_ids = (
            spark.read.parquet(os.path.join(index_dir, "data"))
            .filter(F.col("cell").isin(cells))
            .select(F.col("neighbor_id").alias(id_col))
        )
        new_only = (
            assigned.drop("cell")
            .dropDuplicates([id_col])
            .join(stored_ids, id_col, "left_anti")
        )
        if new_only.take(1):
            extend_ivf_index(new_only, index_dir, id_col=id_col, vec_col=vec_col)

    return (
        stream.writeStream.foreachBatch(do_extend)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
