"""Hashed linear quality classifier (operators/classify).

The python mirror recomputes the integer scoring exactly — hashlib.md5
and Spark's md5 agree byte-for-byte, and every arithmetic op is
integer, so the Spark logits must match the mirror bit-for-bit.
"""
import hashlib
import re

import pytest
from pyspark.sql import functions as F

from claims_data_spark.operators.classify import (
    hashed_linear_logit,
    quality_classify,
)

WEIGHTS = [((i * 37) % 17) - 8 for i in range(64)]  # ints in [-8, 8]


def _bucket(tok, dim, seed="hlc"):
    return int(hashlib.md5((tok + seed).encode()).hexdigest()[:8], 16) % dim


def _mirror(text, weights, bias=0, word_ngrams=1, seed="hlc"):
    words = [w for w in re.sub(r"\s+", " ", text.strip().lower()).split(" ") if w]
    feats = list(words)
    if word_ngrams == 2:
        feats += [f"{a} {b}" for a, b in zip(words, words[1:])]
    return bias + sum(weights[_bucket(t, len(weights), seed)] for t in feats)


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "  BUY   cheap   pills ONLINE now!!  ",
    "a",
    "",
    "repeated repeated repeated repeated",
]


@pytest.mark.parametrize("ngrams", [1, 2])
def test_matches_integer_mirror(spark, ngrams):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "i int, text string")
    out = {
        r.i: r.logit
        for r in df.select(
            "i",
            hashed_linear_logit("text", WEIGHTS, bias=3, word_ngrams=ngrams).alias("logit"),
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        assert out[i] == _mirror(t, WEIGHTS, bias=3, word_ngrams=ngrams), (i, t)


def test_empty_text_scores_bias(spark):
    df = spark.createDataFrame([("",), ("   ",)], "text string")
    vals = [
        r.l for r in df.select(hashed_linear_logit("text", WEIGHTS, bias=7).alias("l")).collect()
    ]
    assert vals == [7, 7]


def test_term_frequency_weighting(spark):
    # each occurrence contributes: 4x one word == 4 * 1x
    df = spark.createDataFrame([("spam spam spam spam",), ("spam",)], "text string")
    a, b = [
        r.l for r in df.select(hashed_linear_logit("text", WEIGHTS).alias("l")).collect()
    ]
    assert a == 4 * b


def test_quality_classify_threshold_gate(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "i int, text string")
    out = quality_classify(df, "text", WEIGHTS, bias=0, threshold=1)
    for r in out.collect():
        assert r.keep == (r.logit_fp >= 1)


def test_map_only_plan(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    plan = quality_classify(df, "text", WEIGHTS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_word_ngrams_validated(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        hashed_linear_logit("text", WEIGHTS, word_ngrams=3)
        quality_classify(df, "text", WEIGHTS, word_ngrams=3).collect()


def test_threshold_sweep_matches_python_mirror(spark):
    """Exact PR/F1 values vs a pure-python mirror, plus the curve
    invariants: recall non-increasing and kept non-increasing as the
    threshold rises."""
    import math

    from claims_data_spark.operators.classify import threshold_sweep

    n_bins = 10
    rows = []
    for i in range(500):
        # deterministic scores spread over [0,1] incl. the clamp edges
        score = ((i * 37) % 101) / 100.0 + (0.02 if i % 17 == 0 else 0.0)
        label = 1 if (i * 7) % 10 < (score * 10) else 0
        rows.append((score, label))
    df = spark.createDataFrame(rows, "score double, label int")
    got = {
        r["threshold"]: r
        for r in threshold_sweep(df, "score", "label", n_bins).collect()
    }

    # python mirror
    bins = {}
    for score, label in rows:
        b = min(max(math.floor(score * n_bins), 0), n_bins - 1)
        n, p = bins.get(b, (0, 0))
        bins[b] = (n + 1, p + label)
    allpos = sum(p for _, p in bins.values())
    kept = tp = 0
    exp = {}
    for b in sorted(bins, reverse=True):
        n, p = bins[b]
        kept += n
        tp += p
        exp[b / n_bins] = (kept, tp, tp / kept, tp / allpos,
                           2 * tp / (kept + allpos))
    assert set(got) == set(exp)
    for t, (k, tpos, prec, rec, f1) in exp.items():
        r = got[t]
        assert (r["kept"], r["true_pos"]) == (k, tpos)
        assert abs(r["precision"] - prec) < 1e-12
        assert abs(r["recall"] - rec) < 1e-12
        assert abs(r["f1"] - f1) < 1e-12
    # invariants across rising thresholds
    ordered = [got[t] for t in sorted(got)]
    for a, b in zip(ordered, ordered[1:]):
        assert a["kept"] >= b["kept"]
        assert a["recall"] >= b["recall"]

    with pytest.raises(ValueError):
        threshold_sweep(df, "score", "label", 0)
