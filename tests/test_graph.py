"""Connected-components oracles: both DataFrame algorithms vs a
plain-Python union-find, on adversarial shapes (long chains — worst
case for label_prop, best stress for two_phase's O(log² n) claim —
cliques, stars, random graphs) plus the canonical-keep wrapper."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from trendr_data_pipeline_spark.operators.graph import (
    canonicalize_components,
    connected_components,
)


def union_find(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # relabel to component minimum
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def spark_components(spark, edges, nodes=None, algorithm="two_phase"):
    edf = spark.createDataFrame(
        edges or [(-1, -1)], "id_a long, id_b long"
    )
    if not edges:
        edf = edf.where("id_a > 0")  # empty frame with schema
    ndf = None
    if nodes is not None:
        ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = connected_components(
        edf, nodes=ndf, node_col="doc_id", algorithm=algorithm
    ).collect()
    return {r["node"]: r["component"] for r in got}


SHAPES = {
    "chain": [(i, i + 1) for i in range(40)],
    "two_cliques": [(i, j) for i in range(6) for j in range(i + 1, 6)]
    + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)],
    "star": [(0, i) for i in range(1, 20)],
    "self_heavy": [(5, 5), (1, 2), (2, 1), (3, 4)],
    "reverse_chain": [(i + 1, i) for i in range(30)],
    "empty": [],
}


def test_shapes_both_algorithms(spark):
    for name, edges in SHAPES.items():
        nodes = {n for e in edges for n in e} | {999}  # 999 = isolated
        want = union_find(edges, nodes)
        for algo in ("two_phase", "label_prop"):
            got = spark_components(spark, edges, nodes, algo)
            assert got == want, (name, algo)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=60,
    )
)
def test_property_random_graphs(spark, edges):
    nodes = {n for e in edges for n in e} | {0, 31}
    want = union_find([e for e in edges if e[0] != e[1]], nodes)
    for algo in ("two_phase", "label_prop"):
        got = spark_components(spark, edges, nodes, algo)
        assert got == want, algo


def test_without_nodes_frame_only_connected_nodes_labeled(spark):
    got = spark_components(spark, [(3, 7), (7, 9)])
    assert got == {3: 3, 7: 3, 9: 3}


def test_canonicalize(spark):
    edf = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    labels = connected_components(edf)
    rows = canonicalize_components(labels).collect()
    keep = {r["node"] for r in rows if r["is_canonical"]}
    drop = {r["node"] for r in rows if not r["is_canonical"]}
    assert keep == {1, 10}
    assert drop == {2, 3, 11}
