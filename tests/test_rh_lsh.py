"""Random-hyperplane LSH kNN (operators/similarity.rh_lsh_topk)."""
import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from claims_data_spark.operators.similarity import (
    brute_force_topk,
    rh_lsh_topk,
    rh_planes,
)

DIM = 16


def _vecs(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, DIM).round(3)


@pytest.fixture(scope="module")
def frames(spark):
    m = _vecs(120)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(20, 120)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(5)],
        "query_id long, query_vec array<double>",
    )
    return corpus, queries


def test_planes_deterministic_and_bounded():
    p1 = rh_planes(8, DIM)
    p2 = rh_planes(8, DIM)
    assert p1 == p2
    assert all(-16 <= c <= 16 for row in p1 for c in row)
    # hashlib mirror of one coefficient
    h = int(hashlib.md5(b"rh|rhlsh|3|5").hexdigest()[:8], 16) % 33 - 16
    assert p1[3][5] == h


def test_results_subset_of_bruteforce_scores(spark, frames):
    corpus, queries = frames
    lsh = rh_lsh_topk(corpus, queries, dim=DIM, k=5).collect()
    exact = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in brute_force_topk(corpus, queries, k=100).collect()
    }
    for r in lsh:
        # verified scores must equal the exact cosine for that pair
        assert math.isclose(exact[(r.query_id, r.vec_id)], r.cos_sim, abs_tol=1e-6)
    # ranks are 1..n per query without gaps
    by_q = {}
    for r in lsh:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_near_duplicate_always_found(spark, frames):
    corpus, queries = frames
    # plant an exact duplicate of query 0 in the corpus: identical
    # vector -> identical signature -> every band collides
    dup = queries.filter(F.col("query_id") == 0).select(
        F.lit(999).alias("vec_id"), F.col("query_vec").alias("embedding")
    )
    out = rh_lsh_topk(corpus.unionByName(dup), queries, dim=DIM, k=3)
    top = [
        r.vec_id
        for r in out.filter(F.col("query_id") == 0).orderBy("rank").collect()
    ]
    assert top and top[0] == 999


def test_recall_on_planted_neighbors(spark):
    # the case LSH exists for: true near neighbors (cos ~0.97+) hiding
    # in random noise. 3 perturbed copies per query planted in a
    # random corpus; high-cosine pairs collide in >= 1 band with high
    # probability, so recall of the planted set must be high — while
    # random noise (cos ~0) almost never collides.
    rng = np.random.RandomState(11)
    qm = rng.randn(5, DIM)
    rows, planted = [], {}
    for qi in range(5):
        planted[qi] = []
        for c in range(3):
            vid = 1000 + qi * 10 + c
            v = qm[qi] + 0.05 * rng.randn(DIM)
            rows.append((vid, [float(x) for x in v]))
            planted[qi].append(vid)
    noise = rng.randn(200, DIM)
    rows += [(i, [float(x) for x in noise[i]]) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(qi, [float(x) for x in qm[qi]]) for qi in range(5)],
        "query_id long, query_vec array<double>",
    )
    out = rh_lsh_topk(corpus, queries, dim=DIM, k=3).collect()
    found = {}
    for r in out:
        found.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(
        len(found.get(qi, set()) & set(planted[qi])) for qi in range(5)
    )
    assert hits >= 12, (hits, found)  # >= 80% of the 15 planted neighbors


def test_partitioning_invariance(spark, frames):
    corpus, queries = frames
    a = sorted(
        map(tuple, rh_lsh_topk(corpus.repartition(1), queries, dim=DIM, k=4).collect())
    )
    b = sorted(
        map(tuple, rh_lsh_topk(corpus.repartition(13), queries, dim=DIM, k=4).collect())
    )
    assert a == b


def test_band_size_divisibility_enforced(spark, frames):
    corpus, queries = frames
    with pytest.raises(ValueError, match="divisible"):
        rh_lsh_topk(corpus, queries, dim=DIM, num_planes=20, band_size=8)


def test_zero_norm_corpus_vector_never_ranks(spark, frames):
    """An all-zero corpus vector must not surface as a top hit: NaN
    cosine orders above every number in Spark, so the guard (NULL +
    filter) is load-bearing."""
    corpus, queries = frames
    zero = corpus.sparkSession.createDataFrame(
        [(999, [0.0] * DIM)], "vec_id long, embedding array<double>"
    )
    out = rh_lsh_topk(corpus.unionByName(zero), queries, dim=DIM, k=3)
    assert all(r.vec_id != 999 for r in out.collect())
    assert all(not math.isnan(r.cos_sim) for r in out.collect())
