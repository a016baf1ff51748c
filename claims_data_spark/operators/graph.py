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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    mass_scale: int = 10**12,
    checkpoint_edge_threshold: int = 2_000_000,
) -> DataFrame:
    """Fixed-point PageRank over a link graph: ``(node, rank_fp)``
    where ``rank_fp`` is the node's authority mass as a BIGINT in
    units of ``1/mass_scale`` (divide by ``mass_scale`` for the usual
    [0,1] score).  The corpus-curation use is link-authority quality
    weighting: crawl pipelines boost sampling rates for pages that
    many other pages cite (the original web-quality signal) — pair
    with ``weighted_sample`` / ``mix_rebalance``.

    ALL arithmetic is integer (``div``-truncated shares, integer
    damping), which buys two properties floats cannot give at scale:

    * **retry-stable**: a recomputed partition sums the same BIGINTs
      to the same BIGINT regardless of order — no FP drift between
      task attempts, so downstream sampling keyed on rank never sees
      two values for one node;
    * **engine-exact**: a DuckDB oracle reproduces every rank
      bit-for-bit (unrolled to the same iteration count), so the
      operator is value-checkable, not just rows-only.

    Semantics (documented simplifications, both deterministic):
    parallel edges count once and self-loops are dropped; dangling
    nodes (no out-edges) keep their base share but their mass leaks
    rather than redistributing — the standard map-reduce PageRank
    simplification.  Update rule per iteration, all in BIGINT::

        share(u)   = rank(u) div out_deg(u)
        rank'(v)   = base + (damping_pct * SUM share(u->v)) div 100
        base       = (100 - damping_pct) * (mass_scale div N) div 100

    Scale shape: the edge list (joined once with out-degrees, then
    eagerly checkpointed) is scanned once per iteration; each
    iteration is exactly two exchanges — ranks-to-edges on the source
    key, contribution sum on the destination key — with partial
    aggregation on the sum.  Per-iteration state is one (node, rank)
    row per node, checkpoint-truncated so Catalyst never sees a
    growing plan.  On a real cluster the edge side would be bucketed
    by ``src`` to delete the first exchange; nothing in the loop holds
    driver state beyond the node count (one scalar).

    Adaptive small-graph path (the union-find counted-fallback
    ruling): at or below ``checkpoint_edge_threshold`` counted edges
    the per-iteration eager checkpoints are SKIPPED and the whole
    recurrence plans as one lazy DAG — a demo-scale graph doesn't need
    lineage truncation, and each checkpoint is a blocking job (5
    iterations cost 37 jobs with, ~13 without; measured).  Integer
    arithmetic makes the two paths bit-identical; the distributed
    checkpointed path stays the default above the threshold.

    The reference repo has no graph ranking; this is an engine
    extension for the training-data pipeline (see module docstring).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
    )
    e = e.persist()
    n_edges = e.count()  # bounded metadata: one scalar (threshold gate)
    small = n_edges <= checkpoint_edge_threshold
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    nodes = nodes.persist() if small else nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()  # bounded metadata: one scalar
    if n_nodes == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    init = mass_scale // n_nodes
    base = (100 - damping_pct) * init // 100

    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    edges_deg = e.join(deg, "_s")
    edges_deg = (
        edges_deg.persist() if small
        else edges_deg.localCheckpoint(eager=True)
    )

    ranks = nodes.select(
        "node", F.lit(init).cast("long").alias("rank_fp")
    )
    if not small:
        ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            edges_deg.join(
                ranks.withColumnRenamed("node", "_s"), "_s"
            )
            .select(
                F.col("_d").alias("node"),
                F.expr("rank_fp div _deg").alias("_share"),
            )
            .groupBy("node")
            .agg(F.sum("_share").alias("_contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(_contrib, 0L)) div 100"
                    )
                ).cast("long").alias("rank_fp"),
            )
        )
        if not small:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
