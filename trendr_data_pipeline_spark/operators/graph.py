"""Connected components over a pair/edge DataFrame — the clustering
step a training-data pipeline runs after near-dup pair generation
(d02/d03/d05/d06 emit PAIRS; choosing one canonical document per
duplicate GROUP requires the transitive closure of those pairs).

Two algorithms, both pure DataFrame iterations driven from a tiny
driver loop (the loop moves ~3 scalar counters per iteration — the
data never leaves the cluster):

- ``two_phase`` (default): alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14 — public). Converges in O(log² n) rounds on ANY graph
  shape, so a 100 TB corpus with a pathological million-node chain
  still terminates in ~40 rounds. Each round is two groupBy-min
  shuffles on the edge list.

- ``label_prop``: minimum-label propagation (HashToMin flavor).
  O(diameter) rounds — cheaper per round and typically faster on
  near-dup graphs, whose components are clique-ish with tiny
  diameters, but unbounded on long chains. Offered because the
  dedup workload usually satisfies its assumption; the default does
  not gamble on it.

Every iteration ``localCheckpoint``s the frontier: without it the
lineage doubles per round and Catalyst analysis time goes
exponential (the classic iterative-DataFrame trap).

Reference parity note: the reference has no graph operator (its
dedup is per-scan windowed, `scripts/mention_scanner/dedup.py`);
this module is north-star scope (SURVEY §2.11 ⊕D9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "canonicalize_components"]


def _sym(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """(v, m(u)) for every neighbor v > u, m(u) = min(Γ(u) ∪ {u}).

    Output edges always run bigger → smaller (v > u ≥ m), so the
    small-star half of the round can skip canonicalization. No
    ``distinct`` here: each input edge emits at most one output, so
    duplicate volume is bounded by |E| and the round-final distinct
    dedups once instead of thrice (each distinct is a shuffle — at 3–4
    rounds per run, dropping two of three cuts the loop's stage count
    nearly in half, and on the tiny per-round frames stage scheduling
    IS the cost).
    """
    sym = _sym(e)
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """(x, m(u)) for x ∈ Γ(u) ∪ {u}, x ≠ m — assumes every input edge
    already runs bigger → smaller (true of `_large_star` output), so
    m(u) = min(Γ(u)) < u directly. The single ``distinct`` here is the
    round's only dedup."""
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = e.join(m, "u").where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    centers = m.select(F.col("u"), F.col("m").alias("v"))
    return nbrs.union(centers).distinct()


def _signature(e: DataFrame) -> tuple:
    """Deterministic fixpoint signature: count + decimal sums + a
    commutative hash. Equal signatures on the star-forest fixpoint
    ⇔ identical edge sets for this algorithm (the iteration is a
    deterministic function of the set)."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], row["su"], row["sv"], row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    algorithm: str = "two_phase",
    max_iter: int = 60,
) -> DataFrame:
    """Component labels for an undirected pair list.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id in the component. ``nodes``/``node_col`` optionally adds
    isolated nodes (as their own singleton components) — pair
    generators only emit nodes that HAVE a near-dup, but the
    canonical-keep decision needs every document labeled.
    """
    from ..plan_debug import note_subtree

    e = note_subtree(
        "cc.edges",
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct(),
    ).localCheckpoint(eager=True)

    if algorithm == "two_phase":
        sig = _signature(e)
        for _ in range(max_iter):
            e = note_subtree("cc.star_round", _small_star(_large_star(e))).localCheckpoint(eager=True)
            new_sig = _signature(e)
            if new_sig == sig:
                break
            sig = new_sig
        else:  # pragma: no cover - O(log² n) bound makes this unreachable
            raise RuntimeError(f"two_phase did not converge in {max_iter} rounds")
        # fixpoint is a star forest: every edge is (member, center=min)
        members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        centers = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
        labels = members.union(centers).distinct()
    elif algorithm == "label_prop":
        sym = note_subtree("cc.sym", _sym(e)).localCheckpoint(eager=True)
        labels = note_subtree(
            "cc.labels0",
            sym.select("u")
            .union(sym.select("v"))
            .distinct()
            .select(F.col("u").alias("node"), F.col("u").alias("component")),
        ).localCheckpoint(eager=True)
        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels, sym["v"] == labels["node"])
                .groupBy(sym["u"].alias("node2"))
                .agg(F.min("component").alias("nbr_comp"))
            )
            new_labels = note_subtree(
                "cc.labels_round",
                labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left")
                .select(
                    "node",
                    F.least(
                        "component", F.coalesce("nbr_comp", F.col("component"))
                    ).alias("component"),
                ),
            ).localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(f"label_prop did not converge in {max_iter} rounds")
    else:
        raise ValueError(f"unknown algorithm: {algorithm}")

    if nodes is not None:
        col = node_col or src
        allnodes = nodes.select(F.col(col).alias("node")).distinct()
        labels = (
            allnodes.join(labels, "node", "left")
            .select("node", F.coalesce("component", F.col("node")).alias("component"))
        )
    return labels


def canonicalize_components(labels: DataFrame) -> DataFrame:
    """Per-node keep/drop decision from component labels: the
    component minimum is the canonical survivor (the deterministic
    min-id rule d01 uses within exact-dup groups, extended to
    transitive near-dup clusters)."""
    return labels.select(
        "node",
        "component",
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
