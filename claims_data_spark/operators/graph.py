"""Distributed connected components + near-duplicate clustering.

Near-dup pair generators (MinHash/SimHash/embedding blocking in
``operators/dedup.py`` / ``similarity.py``) emit EDGES; turning edges
into dedup groups — "keep one doc per cluster" — needs connected
components.  At 100 TB the graph cannot sit on the driver, so this is
the alternating **large-star / small-star** algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14): pure
DataFrame groupBy/join rounds, O(log n) iterations, per-round state
bounded by the edge list.  No GraphFrames dependency, no driver-side
adjacency.

Round structure (node ids must be orderable; ties broken by the
natural ordering):

* large-star: every node ``u`` connects its strictly-larger
  neighbors to ``m = min(N(u) + {u})``,
* small-star: every node connects its smaller-or-equal neighbors
  (and itself) to ``m``.

Both are one shuffle each (groupBy u -> min, rebroadcast via join on
u).  Convergence when the edge multiset stops changing — checked with
a count + xxhash checksum in one aggregate; each round persists and
truncates lineage so plans stay bounded.

The reference repo has no graph operator (its identity xwalk is
bounded full-outer merges, ``tables/xwalk.py``); this is an engine
extension for the training-data pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _min_neighbor(sym: DataFrame) -> DataFrame:
    return (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least(F.col("u"), F.col("_mv")).alias("m"))
    )


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-independent, overflow-free (edges are distinct,
    # so the xor over the set is a faithful fingerprint)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _local_components(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Driver-side union-find for a SMALL edge list (below the adaptive
    threshold, already counted by the caller).  Path-halving find +
    size-union; labels are re-rooted to the component minimum to match
    the distributed path bit-for-bit."""
    spark = edges.sparkSession
    pdf = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).toPandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            parent[r] = parent.get(parent[r], parent[r])
            r = parent[r]
        return r

    for a, b in zip(pdf["a"], pdf["b"]):
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            # root at the smaller id so find() already trends toward
            # the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = set(pdf["a"]).union(pdf["b"])
    rows = [(n, find(n)) for n in nodes]
    schema = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("component")
    ).schema
    return spark.createDataFrame(rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Component labels for every node appearing in ``edges``.

    Returns (node, component) where ``component`` is the minimum node
    id of the connected component.  Nodes with no edges are absent —
    callers left-join and coalesce to the node's own id.

    Adaptive execution, same philosophy as Spark's broadcast-join
    threshold: the star-contraction loop costs O(log n) rounds of
    shuffles — tens of scheduled jobs — which is the right trade only
    when the edge list is genuinely too big for one machine.  Below
    ``local_threshold`` edges (counted first; one job) the graph is
    solved with driver-side union-find in two jobs total and the
    labels re-enter the cluster as a (usually broadcast-sized)
    DataFrame.  A 100 TB near-dup corpus keeps the distributed path;
    a per-block or per-day slice doesn't pay 60 jobs for a 50k-edge
    graph.  Pass ``local_threshold=0`` to force the distributed loop.
    """
    pruned = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if local_threshold:
        # truncate the edge lineage BEFORE the adaptive count so the
        # (possibly expensive) edge plan — e.g. near-dup pair
        # generation — is evaluated exactly once; the count and
        # whichever branch runs both read the checkpointed data
        pruned = pruned.localCheckpoint(eager=True)
        if pruned.count() <= local_threshold:
            return _local_components(pruned, "src", "dst")
    # each round's result is eagerly localCheckpoint-ed: iterative
    # self-referencing plans grow multiplicatively per round, so the
    # lineage MUST be truncated, not merely cached (persist still
    # re-analyzes the full tree)
    cur = _symmetrize(pruned).localCheckpoint(eager=True)
    prev_sig = _edge_checksum(cur)

    for _ in range(max_iter):
        sym = cur
        mins = _min_neighbor(sym)
        # large-star: (v, m) for v > u
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        )
        # small-star over the large-star output
        sym2 = _symmetrize(large).localCheckpoint(eager=True)
        mins2 = _min_neighbor(sym2)
        small = (
            sym2.join(mins2, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .unionByName(
                mins2.select(F.col("u").alias("src"), F.col("m").alias("dst"))
            )
        )
        nxt = _symmetrize(small).localCheckpoint(eager=True)
        sig = _edge_checksum(nxt)
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig

    # converged edge set is a union of stars rooted at component minima
    labels = cur.groupBy("u").agg(F.min("v").alias("root")).select(
        F.col("u").alias("node"),
        F.least(F.col("u"), F.col("root")).alias("component"),
    )
    return labels


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_left: str = "id_a",
    pair_right: str = "id_b",
) -> DataFrame:
    """Attach a ``cluster_id`` to every doc: the component root of its
    near-dup graph, or its own id when un-paired."""
    comp = connected_components(pairs, src=pair_left, dst=pair_right)
    return docs.join(
        comp.withColumnRenamed("node", id_col),
        id_col,
        "left",
    ).withColumn(
        "cluster_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")


def cluster_representatives(
    clustered: DataFrame,
    id_col: str = "doc_id",
    prefer: list | None = None,
) -> DataFrame:
    """One kept doc per cluster (the dedup "survivor"): lowest id by
    default, or the caller's ordering columns (e.g. quality desc).
    One ranking window on cluster_id — the same shape as the
    reference's priority dedups (P6/P7)."""
    from pyspark.sql import Window

    order = (prefer or []) + [F.col(id_col)]
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return (
        clustered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
