"""Connected components (large-star/small-star) + dedup clustering."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from claims_data_spark.operators.graph import (
    cluster_representatives,
    connected_components,
    near_dup_clusters,
)


def _uf_components(n_nodes, edges):
    """Reference union-find for property checks."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def test_chain_needs_multiple_rounds(spark):
    # a 12-node chain: worst case for naive propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {i: 0 for i in range(12)}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    expect = _uf_components(n, edges)
    paired = {a for e in edges for a in e}
    assert got == {x: expect[x] for x in paired}


def test_distributed_path_matches_local_path(spark):
    """`local_threshold=0` forces the star-contraction loop; its labels
    must be bit-identical to the adaptive driver union-find path on the
    same graph (chains, self-contained cliques, isolated pairs)."""
    rng = random.Random(11)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    edges += [(200 + i, 201 + i) for i in range(9)]  # a chain
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert local == dist


def test_near_dup_clusters_and_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}", 100 - i) for i in range(6)],
        "doc_id long, text string, quality int",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    clustered = near_dup_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in clustered.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}

    # lowest id survives by default
    kept = cluster_representatives(clustered)
    assert {r["doc_id"] for r in kept.collect()} == {0, 3, 4}

    # quality-preferred survivor: doc 2 has lowest quality value
    kept_q = cluster_representatives(
        clustered, prefer=[F.col("quality").asc()]
    )
    assert {r["doc_id"] for r in kept_q.collect()} == {2, 3, 5}
