"""Winnowing fingerprints (Schleimer et al. 2003, MOSS) — exact
mirror tests against a pure-python implementation, the k+w-1
any-alignment detection guarantee, bucket-cap semantics, and plan
shape (map-only fingerprinting, no all-pairs join)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from claims_data_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_near_dup_pairs,
)


def _norm(t: str) -> str:
    import re
    return re.sub(r"\s+", " ", t.strip().lower())


def _py_winnow(text: str, k: int, w: int) -> list:
    t = _norm(text)
    if len(t) < k:
        return None
    hs = [
        int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(t) - k + 1)
    ]
    if len(hs) >= w:
        mins = [min(hs[j:j + w]) for j in range(len(hs) - w + 1)]
    else:
        mins = [min(hs)]
    return sorted(set(mins))


_DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river"),
    (2, "the   QUICK brown fox jumps over the lazy dog near the river"),
    (3, "completely different content with no overlap whatsoever here"),
    (4, "short"),          # < k grams at k=8? len 5 < 8 -> excluded
    (5, ""),               # empty -> excluded
    (6, None),             # null -> excluded
    (7, "exactly8!"),      # 9 chars -> 2 grams, < w window -> fallback
]


def test_winnow_fingerprints_match_python_mirror(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (list(r["fps"]), r["n_fps"])
        for r in winnow_fingerprints(df, k=8, w=4).collect()
    }
    for doc_id, text in _DOCS:
        exp = _py_winnow(text, 8, 4) if text is not None else None
        if exp is None or text is None or len(_norm(text)) < 8:
            assert doc_id not in got
        else:
            assert got[doc_id] == (exp, len(exp)), doc_id


def test_winnow_detection_guarantee_any_alignment(spark):
    """Any shared substring of length >= k + w - 1 shares a selected
    fingerprint REGARDLESS of alignment — the property the strided
    grid of substring_dup_spans lacks. Plant a 40-char passage at
    every offset 0..9 of otherwise-disjoint documents."""
    k, w = 8, 6
    passage = "zq" * 20                       # 40 >= k + w - 1 = 13
    rows = [(0, "base text before " + passage + " and after text")]
    for off in range(1, 10):
        prefix = "".join(chr(ord("a") + (off * 7 + j) % 26)
                         for j in range(off))
        rows.append((off, prefix + passage + f" tail{off} unique bits"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_near_dup_pairs(
        df, k=k, w=w, min_shared=1, max_bucket_docs=1000
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for off in range(1, 10):
        assert (0, off) in found or (off, 0) in found, off


def test_winnow_pairs_match_python_mirror(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]):
            (r["shared_fps"], r["n_a"], r["n_b"], r["jaccard_est"])
        for r in winnow_near_dup_pairs(
            df, k=8, w=4, min_shared=1, max_bucket_docs=64
        ).collect()
    }
    fps = {
        d: set(_py_winnow(t, 8, 4))
        for d, t in _DOCS if t is not None and len(_norm(t)) >= 8
    }
    exp = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = len(fps[a] & fps[b])
            if shared >= 1:
                exp[(a, b)] = (
                    shared, len(fps[a]), len(fps[b]),
                    shared / (len(fps[a]) + len(fps[b]) - shared),
                )
    assert got == exp
    # docs 1 and 2 differ only in case/whitespace -> near-identical
    assert got[(1, 2)][3] > 0.9


def test_winnow_bucket_cap_drops_universal_fingerprints(spark):
    # 70 docs sharing one passage: with cap 64 the shared fp buckets
    # drop, so no pairs from the universal passage
    rows = [(i, f"unique head {i} " + "common boilerplate passage here")
            for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_near_dup_pairs(
        df, k=8, w=4, min_shared=1, max_bucket_docs=64
    )
    # pairs may exist only via fps NOT shared by >64 docs; the
    # boilerplate fps are shared by all 70 -> dropped
    assert out.filter(F.col("shared_fps") > 3).count() == 0


def test_winnow_partitioning_invariance(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i} with some shared trailing words here")
         for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, winnow_near_dup_pairs(df, k=8, w=4).collect()))
    b = sorted(map(tuple, winnow_near_dup_pairs(
        df.repartition(17), k=8, w=4).collect()))
    assert a == b


def test_winnow_xxhash64_family_same_shape(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    md5 = winnow_fingerprints(df, k=8, w=4).collect()
    xx = winnow_fingerprints(df, k=8, w=4, hash_family="xxhash64").collect()
    # same docs selected, same density CLASS, different streams
    assert {r["doc_id"] for r in md5} == {r["doc_id"] for r in xx}
    m1 = {r["doc_id"]: list(r["fps"]) for r in md5}
    x1 = {r["doc_id"]: list(r["fps"]) for r in xx}
    assert m1 != x1
    with pytest.raises(ValueError, match="hash_family"):
        winnow_fingerprints(df, hash_family="sha1")


def test_winnow_fingerprint_plan_map_only(spark):
    df = spark.createDataFrame([(0, "x" * 40)], "doc_id long, text string")
    plan = winnow_fingerprints(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan.lower()
