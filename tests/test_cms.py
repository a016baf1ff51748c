"""Count-min-sketch heavy hitters (operators/sketches.cms_heavy_hitters).

The mirror rebuilds the deterministic md5 grid in pure python, so the
Spark estimates must match bit-for-bit; separate tests pin the two CMS
guarantees (est >= true; no false negatives).
"""
import hashlib
from collections import Counter, defaultdict

import pytest

from claims_data_spark.operators.sketches import cms_heavy_hitters


def _bucket(item, j, width, seed="cms"):
    h = hashlib.md5(f"{item}\x1f{seed}\x1f{j}".encode()).hexdigest()[:8]
    return int(h, 16) % width


def _mirror(items, threshold, depth=4, width=8192, seed="cms"):
    grid = defaultdict(int)
    for it in items:
        for j in range(depth):
            grid[(j, _bucket(it, j, width, seed))] += 1
    out = {}
    for it in set(items):
        est = min(grid[(j, _bucket(it, j, width, seed))] for j in range(depth))
        if est >= threshold:
            out[it] = est
    return out


ITEMS = (
    ["the"] * 40 + ["cookie banner"] * 25 + ["nav"] * 12
    + [f"rare{i}" for i in range(50)] * 2
)


@pytest.fixture(scope="module")
def hh(spark):
    df = spark.createDataFrame([(x,) for x in ITEMS], "item string")
    out = cms_heavy_hitters(df, "item", threshold=10, hash_family="md5")
    return {r.item: r.est_count for r in out.collect()}


def test_matches_python_mirror_exactly(hh):
    assert hh == _mirror(ITEMS, 10)


def test_no_false_negatives_and_upper_bound(hh):
    true = Counter(ITEMS)
    for it, n in true.items():
        if n >= 10:
            assert it in hh            # every true heavy hitter survives
    for it, est in hh.items():
        assert est >= true[it]         # CMS never underestimates


def test_tiny_width_forces_collisions_but_still_overestimates(spark):
    df = spark.createDataFrame([(x,) for x in ITEMS], "item string")
    out = {
        r.item: r.est_count
        for r in cms_heavy_hitters(
            df, "item", threshold=1, width=4, hash_family="md5"
        ).collect()
    }
    true = Counter(ITEMS)
    assert len(out) == len(true)       # threshold 1 keeps everything
    assert all(out[i] >= n for i, n in true.items())
    assert any(out[i] > n for i, n in true.items())  # width 4 must collide


def test_xxhash_family_same_guarantees(spark):
    # production path: different buckets, identical CMS contracts
    df = spark.createDataFrame([(x,) for x in ITEMS], "item string")
    out = {
        r.item: r.est_count
        for r in cms_heavy_hitters(df, "item", threshold=10).collect()
    }
    true = Counter(ITEMS)
    for it, n in true.items():
        if n >= 10:
            assert it in out
    for it, est in out.items():
        assert est >= true[it]


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "item string")
    out = cms_heavy_hitters(df, "item", threshold=1).collect()
    assert {r.item for r in out} == {"a"}
    assert out[0].est_count == 2
