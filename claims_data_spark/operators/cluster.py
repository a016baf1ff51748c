"""Fixed-point distributed k-means — the IVF codebook trainer that
actually scales.

``similarity.ivf_build`` trains its coarse quantizer on a driver-side
SAMPLE (bounded, fine for small corpora). At 100 TB the codebook
should be fit on the full corpus: Lloyd iterations where assignment is
a map-only pass and the centroid update is one k x dim-bounded
aggregate. The classic blocker for a DISTRIBUTED Lloyd's is
determinism: float centroid means depend on partition summation order,
so two runs of the same job can converge to different codebooks —
poison for a pipeline whose every operator is retry-stable and
engine-checkable.

Fixed-point arithmetic removes the blocker (the ``pagerank`` /
``quality_classify`` discipline):

* vectors quantize once to integers (``scale_fp`` fixed-point units);
* assignment minimizes EXACT integer squared L2 distance (BIGINT
  sums; ties to the lower centroid id);
* the update sums coordinates as BIGINTs — associative and
  commutative, so ANY partitioning yields the same sums — and the new
  centroid is the floor-div mean: bit-identical across runs, retries
  and cluster layouts;
* per-iteration driver state is the k x dim integer centroid matrix
  (bounded metadata, the BPE-argmax precedent).

Scale shape per iteration: one map-only assignment pass + one
aggregate whose exchange carries at most tasks x k rows of
dim-length sum arrays (partial aggregation pre-merges per task).
Empty clusters keep their previous centroid (the standard Lloyd
fallback, deterministic here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantize(df: DataFrame, vec_col: str, scale_fp: int) -> DataFrame:
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x * F.lit(float(scale_fp)) + F.lit(0.5)).cast(
            "long"
        ),
    )
    return df.withColumn("_qv", q)


def _seed_centroids(
    df: DataFrame, id_col: str, k: int, seed: str
) -> list[list[int]]:
    """Deterministic seeds: the k rows with the smallest md5(id|seed)
    digest — order-free, partition-free, engine-reproducible."""
    rows = (
        df.select(
            "_qv",
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
            .alias("_h"),
        )
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    return [[int(x) for x in r["_qv"]] for r in rows]


def _assign_expr(cents: list[list[int]]):
    """argmin over exact integer squared distances, ties to lower id.
    Compiled as one sort_array over (dist, cid) structs; each distance
    is a sequential-fold aggregate over the zipped difference."""
    structs = []
    for cid, cv in enumerate(cents):
        d = F.aggregate(
            F.zip_with(
                F.col("_qv"),
                F.lit(cv),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        structs.append(
            F.struct(
                d.alias("dist"), F.lit(cid).cast("int").alias("cid")
            )
        )
    return F.sort_array(F.array(*structs))[0]["cid"]


def kmeans_fit(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 5,
    scale_fp: int = 1 << 20,
    seed: str = "kmfp",
) -> list[list[int]]:
    """Fit ``k`` fixed-point centroids over the FULL frame. Returns the
    integer centroid matrix (divide by ``scale_fp`` for float
    centroids). Deterministic under any partitioning."""
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    qdf = _quantize(df, vec_col, scale_fp).select(id_col, "_qv").persist()
    cents = _seed_centroids(qdf, id_col, k, seed)
    if len(cents) < k:
        qdf.unpersist()
        raise ValueError(
            f"kmeans_fit: input has only {len(cents)} row(s) but k={k}; "
            "reduce k or provide at least k rows"
        )
    dim = len(cents[0])
    for _ in range(iterations):
        assigned = qdf.withColumn("_cid", _assign_expr(cents))
        # element-wise BIGINT sums: posexplode -> (cid, pos) partial
        # aggregation; the exchange is k x dim rows, never data-sized
        sums = (
            assigned.select(
                "_cid", F.posexplode("_qv").alias("_pos", "_x")
            )
            .groupBy("_cid", "_pos")
            .agg(
                F.sum("_x").alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        by_cid: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cid.setdefault(int(r["_cid"]), {})[int(r["_pos"])] = (
                int(r["_s"]), int(r["_n"]),
            )
        new_cents = []
        for cid in range(k):
            coords = by_cid.get(cid)
            if not coords:
                new_cents.append(cents[cid])  # empty cluster: keep
                continue
            new_cents.append(
                [
                    coords[p][0] // coords[p][1]
                    if coords[p][1] else cents[cid][p]
                    for p in range(dim)
                ]
            )
        if new_cents == cents:
            break
        cents = new_cents
    qdf.unpersist()
    return cents


def kmeans_assign(
    df: DataFrame,
    cents: list[list[int]],
    vec_col: str = "embedding",
    scale_fp: int = 1 << 20,
    out_col: str = "cluster_id",
) -> DataFrame:
    """Map-only assignment of every row to its nearest fitted centroid
    (exact integer distances, ties to the lower id)."""
    return (
        _quantize(df, vec_col, scale_fp)
        .withColumn(out_col, _assign_expr(cents))
        .drop("_qv")
    )
