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


def _legacy_fasttext_bigrams(words):
    """The pre-round-10 classify/selection bigram expression."""
    n = F.size(words)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def test_hashed_feature_bigrams_match_legacy(spark):
    """classify.hashed_linear_logit and selection.hashed_features
    share the fastText bigram builder, now zip_with of two shifted
    slices — pin both against the legacy transform(sequence) form
    (feature ARRAYS equal, so any downstream hash/weight sum is
    equal too)."""
    from claims_data_spark.operators.dedup import _norm_words
    from claims_data_spark.operators.selection import hashed_features

    df = spark.createDataFrame(EDGE_TEXTS, ["id", "text"])
    words = F.filter(
        _norm_words(F.col("text")), lambda w: F.length(w) > 0
    )
    legacy = F.concat(words, _legacy_fasttext_bigrams(words))
    out = df.select(
        "id",
        hashed_features(F.col("text"), word_ngrams=2).alias("new"),
        legacy.alias("old"),
    )
    bad = out.filter(~F.col("new").eqNullSafe(F.col("old"))).collect()
    assert bad == [], bad


def test_hashed_linear_logit_bigrams_match_legacy(spark):
    from claims_data_spark.operators.classify import (
        _bucket,
        hashed_linear_logit,
    )
    from claims_data_spark.operators.dedup import _norm_words

    weights = [((i * 37) % 17) - 8 for i in range(64)]
    words = F.filter(
        _norm_words(F.col("text")), lambda w: F.length(w) > 0
    )
    feats = F.concat(words, _legacy_fasttext_bigrams(words))
    w = F.lit(weights)
    legacy = F.aggregate(
        F.transform(
            feats,
            lambda tok: F.element_at(
                w, _bucket(tok, len(weights), "hlc") + 1
            ).cast("long"),
        ),
        F.lit(3).cast("long"),
        lambda acc, x: acc + x,
    )
    df = spark.createDataFrame(EDGE_TEXTS, ["id", "text"]).filter(
        F.col("text").isNotNull()
    )
    out = df.select(
        "id",
        hashed_linear_logit(
            "text", weights, bias=3, word_ngrams=2
        ).alias("new"),
        legacy.alias("old"),
    )
    bad = out.filter(~F.col("new").eqNullSafe(F.col("old"))).collect()
    assert bad == [], bad


def test_repetition_stats_gram_stream_matches_legacy(spark):
    """repetition_stats' non-distinct bigram explode moved to the
    zipped-slices form — pin the (id, gram) count table against the
    legacy transform(sequence) stream (counts pin both multiset AND
    per-doc membership; gram order does not reach the output)."""
    from claims_data_spark.operators.corpus import repetition_stats

    df = spark.createDataFrame(EDGE_TEXTS, ["id", "text"])
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    k = F.size(words) - F.lit(1)
    legacy = df.select(
        "id",
        F.explode(
            F.when(
                F.col("text").isNotNull() & (k >= 1),
                F.transform(
                    F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_g"),
    ).groupBy("id", "_g").count()
    # the new stream, built exactly as repetition_stats now does
    zipped = F.arrays_zip(
        F.slice(words, 1, k).alias("g0"), F.slice(words, 2, k).alias("g1")
    )
    new_stream = df.select(
        "id",
        F.explode(
            F.when(
                F.col("text").isNotNull() & (k >= 1),
                F.transform(
                    zipped, lambda x: F.concat_ws(" ", x["g0"], x["g1"])
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_g"),
    ).groupBy("id", "_g").count()
    assert (
        new_stream.exceptAll(legacy).count() == 0
        and legacy.exceptAll(new_stream).count() == 0
    )
    # and the operator output itself stays one row per doc
    assert repetition_stats(df, "id", "text").count() == df.count()


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


def test_repetition_stats_line_fracs_match_legacy_quadratic(spark):
    """Round-10: uniq_chars (chars in lines occurring exactly once)
    moved from the nested-filter O(L²) form to the sorted-neighbor
    O(L log L) form. Pin both line fractions against the legacy
    expression on multi-line edge cases (the shared fixture texts are
    single-line, so a dedicated multi-line set is used here)."""
    from claims_data_spark.operators.corpus import repetition_stats

    texts = [
        (1, None),
        (2, ""),
        (3, "\n\n   \n"),                      # blank lines only
        (4, "solo line"),
        (5, "dup\ndup"),                        # all duplicated
        (6, "a\nb\nc"),                         # all unique
        (7, "a\nb\na\nc\nb\nd"),                # interleaved dups
        (8, "x\n x \nx"),                       # trim does NOT rewrite the line
        (9, "long line here\nshort\nlong line here\nother"),
        (10, "\n".join(f"l{i % 7}" for i in range(40))),  # many dups
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])

    lines = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), r"\n"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    n_lines = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(lines, F.lit(0), lambda acc, x: acc + F.length(x))
    legacy_uniq = F.aggregate(
        F.filter(
            lines,
            lambda x: F.size(F.filter(lines, lambda y: y == x)) == 1,
        ),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    legacy = df.select(
        "doc_id",
        F.round(
            F.when(n_lines > 0, (n_lines - n_dist) / n_lines)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.when(line_chars > 0, (line_chars - legacy_uniq) / line_chars)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_char_frac"),
    )
    new = repetition_stats(df, "doc_id", "text").select(
        "doc_id", "dup_line_frac", "dup_line_char_frac"
    )
    joined = new.alias("n").join(legacy.alias("l"), "doc_id")
    bad = joined.filter(
        ~F.col("n.dup_line_frac").eqNullSafe(F.col("l.dup_line_frac"))
        | ~F.col("n.dup_line_char_frac").eqNullSafe(
            F.col("l.dup_line_char_frac")
        )
    ).collect()
    assert bad == [], bad
    assert new.count() == len(texts)
