"""Fixed-point distributed k-means (operators/cluster.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from claims_data_spark.operators.cluster import kmeans_assign, kmeans_fit

DIM = 8


def _blobs(spark, n_per=40, seed=3):
    """Three well-separated gaussian blobs."""
    rng = np.random.RandomState(seed)
    centers = np.array(
        [[5.0] * DIM, [-5.0] * DIM, [5.0] * 4 + [-5.0] * 4]
    )
    rows = []
    for ci, c in enumerate(centers):
        pts = c + rng.randn(n_per, DIM) * 0.3
        for j, p in enumerate(pts):
            rows.append((ci * n_per + j, [float(x) for x in p], ci))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, true_blob int"
    )


def test_kmeans_recovers_planted_blobs(spark):
    df = _blobs(spark)
    cents = kmeans_fit(df, k=3, iterations=8)
    out = kmeans_assign(df, cents)
    # every blob maps to exactly one cluster and clusters don't merge
    m = (
        out.groupBy("true_blob")
        .agg(F.countDistinct("cluster_id").alias("n"),
             F.first("cluster_id").alias("cid"))
        .collect()
    )
    assert all(r["n"] == 1 for r in m)
    assert len({r["cid"] for r in m}) == 3
    # fitted centroids are near the planted centers (fixed-point units)
    floats = sorted(round(c[0] / (1 << 20)) for c in cents)
    assert floats == [-5, 5, 5]


def test_kmeans_partitioning_invariance(spark):
    """BIGINT coordinate sums are associative-commutative: the fitted
    codebook is bit-identical under any partitioning."""
    df = _blobs(spark)
    a = kmeans_fit(df, k=3, iterations=4)
    b = kmeans_fit(df.repartition(13), k=3, iterations=4)
    c = kmeans_fit(df.coalesce(1), k=3, iterations=4)
    assert a == b == c


def test_kmeans_assignment_deterministic_ties(spark):
    """Two identical centroids (possible after an empty-cluster keep):
    ties go to the lower centroid id, never arbitrarily."""
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [1.1, 0.9])],
        "vec_id long, embedding array<double>",
    )
    cents = [[1 << 20, 1 << 20], [1 << 20, 1 << 20]]
    out = kmeans_assign(df, cents)
    assert {r["cluster_id"] for r in out.collect()} == {0}


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k larger than the distinct point count: surplus clusters keep
    their seed centroid instead of crashing or going NaN."""
    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(df, k=3, iterations=3)
    assert len(cents) == 3
    assert all(len(c) == 2 for c in cents)


def test_kmeans_validates_args(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=1, iterations=0)


def test_kmeans_trains_better_ivf_codebook(spark, sf_dir):
    """End-to-end: a codebook fit on real embeddings balances the
    inverted lists far better than arbitrary fixed seeds (the point of
    training at all) — no cluster holds more than half the corpus."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>")
                .alias("embedding"))
        .limit(400)
    )
    cents = kmeans_fit(emb, k=8, iterations=4)
    out = kmeans_assign(emb, cents)
    sizes = [r["n"] for r in out.groupBy("cluster_id")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert sum(sizes) == 400
    assert max(sizes) <= 200
