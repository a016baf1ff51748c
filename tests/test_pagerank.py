"""Fixed-point PageRank (operators/graph.pagerank).

The mirror below recomputes the exact integer recurrence in pure
python — because every operation is BIGINT (truncating div, exact
sums), the Spark result must match it bit-for-bit, which is the whole
point of the fixed-point design (retry-stable, engine-exact).
"""
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from claims_data_spark.operators.graph import pagerank


def _mirror(edges, iterations=5, damping_pct=85, mass_scale=10**12):
    es = {(s, d) for s, d in edges if s != d}
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    n = len(nodes)
    init = mass_scale // n
    base = (100 - damping_pct) * init // 100
    deg = defaultdict(int)
    for s, _ in es:
        deg[s] += 1
    rank = {v: init for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(int)
        for s, d in es:
            contrib[d] += rank[s] // deg[s]
        rank = {v: base + (damping_pct * contrib[v]) // 100 for v in nodes}
    return rank


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (6, 3),
    (7, 1), (7, 2), (8, 8),  # self-loop: dropped
    (1, 2),                   # parallel edge: counted once
    (9, 3),                   # 9 is dangling-in only via nothing; out-edge
]


@pytest.fixture(scope="module")
def ranked(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    out = pagerank(df, iterations=5)
    return {r.node: r.rank_fp for r in out.collect()}


def test_matches_integer_mirror_exactly(ranked):
    assert ranked == _mirror(EDGES)


def test_hub_outranks_leaves(ranked):
    # node 3 collects 6 in-edges and passes ALL its mass to node 1
    # (its only out-edge), so 1 and 3 dominate; pure-source nodes
    # (4,5,6,7,9 — no in-edges) all sit exactly at the damping base
    assert set(sorted(ranked, key=ranked.get)[-2:]) == {1, 3}
    assert ranked[4] == ranked[5] == ranked[6] == ranked[7] == ranked[9]
    assert ranked[3] > ranked[4]


def test_self_loop_node_excluded(ranked):
    # (8,8) was node 8's only edge; dropping it removes the node
    assert 8 not in ranked


def test_mass_never_exceeds_total(ranked):
    # truncating shares only ever LEAK mass; total is bounded above
    # by the initial allocation plus the per-node base
    assert sum(ranked.values()) <= 10**12


def test_deterministic_across_partitionings(spark):
    df1 = spark.createDataFrame(EDGES, "src long, dst long").repartition(1)
    df7 = spark.createDataFrame(EDGES, "src long, dst long").repartition(7)
    r1 = {r.node: r.rank_fp for r in pagerank(df1, iterations=3).collect()}
    r7 = {r.node: r.rank_fp for r in pagerank(df7, iterations=3).collect()}
    assert r1 == r7


def test_iterations_validated(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_empty_graph(spark):
    df = spark.createDataFrame([(1, 1)], "src long, dst long")
    assert pagerank(df, iterations=2).count() == 0
