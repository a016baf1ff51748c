"""Round-10 gram-builder equivalence pins.

The optimization round swapped two interpreted higher-order-function
gram builders for compiled forms:

- ``word_shingles`` (and its frame wrapper ``word_shingles_frame``)
  now builds the sliding window as ``arrays_zip`` of k shifted
  ``slice`` views (k=1: plain ``array_distinct`` of the words),
  replacing the ``transform(sequence(...), i ->
  concat_ws(slice(...)))`` lambda;
- ``lm._adjacent_pairs`` (``arrays_zip`` of shifted ``slice`` views)
  replaces the ``transform(... element_at i, i+1 ...)`` struct lambda.

These tests pin exact value equivalence against the legacy
expressions, including the edge cases an sf sweep may not cover:
NULL text, empty text, whitespace-only text, fewer-than-k words
(whole-text shingle), exactly k words, and repeated words
(array_distinct first-occurrence order).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from claims_data_spark.operators.dedup import (
    _norm_words,
    word_shingles,
    word_shingles_frame,
)
from claims_data_spark.operators.lm import _adjacent_pairs

EDGE_TEXTS = [
    (1, None),
    (2, ""),
    (3, "   "),
    (4, "one"),
    (5, "one two"),
    (6, "one two three"),
    (7, "one two three four five"),
    (8, "a b a b a"),
    (9, "  Mixed   CASE\twith\nodd   spacing  "),
    (10, "x " * 50 + "y"),
]


def _legacy_shingles(text_col: str, k: int):
    """The pre-round-10 word_shingles expression, verbatim."""
    words = _norm_words(F.col(text_col))
    n = F.size(words)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.array_distinct(sh)


def test_word_shingles_k1_fast_path_matches_legacy(spark):
    df = spark.createDataFrame(EDGE_TEXTS, ["id", "text"])
    out = df.select(
        "id",
        word_shingles("text", 1).alias("new"),
        _legacy_shingles("text", 1).alias("old"),
    )
    bad = out.filter(~F.col("new").eqNullSafe(F.col("old"))).collect()
    assert bad == [], bad


def test_word_shingles_frame_matches_legacy_all_k(spark):
    df = spark.createDataFrame(EDGE_TEXTS, ["id", "text"])
    for k in (1, 2, 3, 5):
        out = word_shingles_frame(df, "text", k, "_new").withColumn(
            "_old", _legacy_shingles("text", k)
        )
        bad = out.filter(~F.col("_new").eqNullSafe(F.col("_old"))).collect()
        assert bad == [], (k, bad)


def test_word_shingles_frame_null_and_short_text_values(spark):
    """Absolute values, not just old==new: NULL/empty text yields
    [''] and a shorter-than-k text yields its single whole-text
    shingle (the greatest(..., 1) contract the banding relies on)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two")], ["id", "text"]
    )
    rows = {
        r["id"]: r["_sh"]
        for r in word_shingles_frame(df, "text", 3, "_sh").collect()
    }
    assert rows[1] == [""]
    assert rows[2] == [""]
    assert rows[3] == ["one two"]


def _legacy_pairs(df, a: str, b: str):
    return df.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("_w"), i).alias(a),
                    F.element_at(F.col("_w"), i + 1).alias(b),
                ),
            )
        ).alias("p"),
    ).select("id", f"p.{a}", f"p.{b}")


def test_adjacent_pairs_matches_legacy_stream(spark):
    texts = [
        (1, "a b"),
        (2, "a b c"),
        (3, "a a a a"),
        (4, "one two three four five six"),
    ]
    df = spark.createDataFrame(texts, ["id", "text"]).select(
        "id", F.split("text", " ").alias("_w")
    )
    new = df.select("id", _adjacent_pairs("w1", "w2").alias("p")).select(
        "id", "p.w1", "p.w2"
    )
    old = _legacy_pairs(df, "w1", "w2")
    assert (
        new.exceptAll(old).count() == 0 and old.exceptAll(new).count() == 0
    )
    assert new.count() == old.count()
    # positional order within a doc is preserved too
    got = [
        (r["w1"], r["w2"])
        for r in new.filter(F.col("id") == 4).collect()
    ]
    assert got == [
        ("one", "two"), ("two", "three"), ("three", "four"),
        ("four", "five"), ("five", "six"),
    ]
