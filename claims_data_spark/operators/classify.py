"""Hashed linear text classification — fastText-style quality scoring.

The production corpus-quality gate (CCNet, LLaMA, RefinedWeb) is a
linear classifier over hashed bag-of-words features: score a document
against a "looks like wikipedia" model and keep/boost high scorers.
Training happens offline; what the 100 TB engine needs is INFERENCE
over every document, and that is a map-only expression:

* features are word unigrams (optionally + word bigrams, the fastText
  default) hashed into ``dim`` buckets with the repo's portable md5
  family — no vocabulary join, no broadcast map, fixed memory;
* the weight vector is an INT (quantized) array carried as a plan
  literal, looked up per token with ``element_at`` in whole-stage
  codegen;
* the score is the integer sum ``bias + Σ w[h(tok)]`` — a BIGINT
  logit in fixed-point units (the caller's quantization scale).

Integer weights are not a compromise: int8/int16 quantization is how
these classifiers ship anyway (the margin matters, not the 7th
decimal), and fixed-point makes the score retry-stable under any
partitioning and bit-identical in any engine — the same argument as
``operators/graph.pagerank``.

The reference repo has no classifier; this is an engine extension for
the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from claims_data_spark.operators.dedup import _norm_words


def _bucket(tok: Column, dim: int, seed: str) -> Column:
    """md5-family hash bucket in [0, dim) — hashlib-reproducible
    (driver/test twin) and expressible in DuckDB
    (``CAST(concat('0x', substr(md5(..), 1, 8)) AS BIGINT) % dim``)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(tok, F.lit(seed))), 1, 8), 16, 10
        ).cast("long")
        % F.lit(dim)
    ).cast("int")


def hashed_linear_logit(
    text_col: Column | str,
    weights: list[int],
    bias: int = 0,
    word_ngrams: int = 1,
    seed: str = "hlc",
) -> Column:
    """BIGINT logit of the hashed linear model over ``text_col``.

    Tokens are the normalized words (lowercase, whitespace-collapsed);
    ``word_ngrams=2`` adds joined word-bigram features (fastText's
    default quality setup). Each token occurrence contributes its
    bucket weight — natural term-frequency weighting. Entirely
    row-local codegen: split → transform(md5 bucket → element_at) →
    aggregate sum. Zero-length token lists score exactly ``bias``.
    """
    if word_ngrams not in (1, 2):
        raise ValueError("word_ngrams must be 1 or 2")
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(_norm_words(t), lambda w: F.length(w) > 0)
    feats = words
    if word_ngrams == 2:
        # round-10: sliding bigrams as zip_with of two shifted slice
        # views (compiled) instead of transform(sequence(...)) whose
        # lambda Catalyst interprets per element — value-identical
        # (pinned in tests/test_dedup_gram_builders.py)
        n = F.size(words)
        bigrams = F.when(
            n >= 2,
            F.zip_with(
                F.slice(words, 1, n - 1),
                F.slice(words, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        feats = F.concat(words, bigrams)
    dim = len(weights)
    w = F.lit(weights)
    return F.aggregate(
        F.transform(
            feats,
            lambda tok: F.element_at(w, _bucket(tok, dim, seed) + 1).cast(
                "long"
            ),
        ),
        F.lit(bias).cast("long"),
        lambda acc, x: acc + x,
    )


def quality_classify(
    df: DataFrame,
    text_col: str,
    weights: list[int],
    bias: int = 0,
    threshold: int = 0,
    word_ngrams: int = 1,
    seed: str = "hlc",
    logit_col: str = "logit_fp",
    keep_col: str = "keep",
) -> DataFrame:
    """Score every document and flag ``keep = logit >= threshold``.

    The threshold is in the SAME fixed-point units as the weights, so
    the gate is an integer compare — no sigmoid in the hot path (the
    sigmoid is monotone; thresholding the logit IS thresholding the
    probability, without the FP transcendental). Map-only at any
    scale: no joins, no shuffles, no state.
    """
    logit = hashed_linear_logit(
        text_col, weights, bias=bias, word_ngrams=word_ngrams, seed=seed
    )
    return df.withColumn(logit_col, logit).withColumn(
        keep_col, F.col(logit_col) >= F.lit(threshold)
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 100,
) -> DataFrame:
    """Filter-calibration report: precision / recall / F1 at every
    candidate threshold, the table an engineer reads to pick the
    quality-gate cutoff before filtering a 100 TB corpus (the CCNet /
    RefinedWeb keep-fraction decision).

    ``score_col`` must be in [0, 1] (out-of-range values clamp into
    the edge bins — a score is a probability here; the fixed-point
    logit path thresholds integers directly and doesn't need a
    sweep). Scores bucket into ``n_bins`` equal bins — ONE hash
    aggregate with map-side partials whose state is bounded by
    ``n_bins``, never by corpus size — then the cumulative-from-top
    window runs over the BIN TABLE (n_bins rows: a dimension-sized
    sort, not a data-sized one). Row ``threshold = b/n_bins`` reports
    the filter "keep score >= threshold": kept count, true positives,
    precision, recall, F1 (0-division → NULL precision, the honest
    value for an empty keep set).

    Keeps every bin (even empty ones are absent, not zero-filled —
    join to a spine if a dense grid is needed). Engine extension
    (training-data pipeline family); deterministic: no sampling, no
    randomness.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col)
    b = F.least(
        F.greatest(F.floor(s * n_bins).cast("int"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    lab = F.col(label_col).cast("int")
    bins = df.select(
        b.alias("_bin"), lab.alias("_pos")
    ).groupBy("_bin").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_pos").alias("_npos"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = (
        bins.withColumn("_kept", F.sum("_n").over(w))
        .withColumn("_tp", F.sum("_npos").over(w))
        .withColumn("_allpos", F.sum("_npos").over(wall))
    )
    return out.select(
        (F.col("_bin").cast("double") / n_bins).alias("threshold"),
        F.col("_kept").cast("long").alias("kept"),
        F.col("_tp").cast("long").alias("true_pos"),
        (F.col("_tp") / F.col("_kept")).alias("precision"),
        (F.col("_tp") / F.col("_allpos")).alias("recall"),
        (
            F.lit(2) * F.col("_tp")
            / (F.col("_kept") + F.col("_allpos"))
        ).alias("f1"),
    )
