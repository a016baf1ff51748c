"""Distributed n-gram language-model scoring for corpus quality.

Engine extension beyond the reference's §2 surface (training-data
pipeline family): a perplexity-style score from a count-based LM
trained ON THE CORPUS ITSELF is the classic data-quality signal —
KenLM-filtering in CCNet/RefinedWeb, and the feature behind
importance-resampling selection (DSIR). Documents whose cross-entropy
under the corpus's own bigram statistics is high are boilerplate,
gibberish or wrong-language outliers.

Spark-first plan (train + score in one lazy DAG, no Python):

1. bigram extraction is a row-local ``arrays_zip`` of two shifted
   ``slice`` views + one explode — the only fact-grain fan-out,
   linear in token count and fully codegen'd;
2. the MODEL is two aggregates over the exploded bigrams: C(w1,w2)
   and its rollup C(w1) (context counts), plus the corpus vocabulary
   size — all bounded by vocabulary, orders below corpus grain;
3. scoring joins each document's bigrams back to the model on the
   bigram key. The model side is vocabulary-bounded, so AQE
   broadcasts it at small scale and falls back to a hash join on the
   bigram key at web scale — both shapes are shuffle-minimal (the
   fact side is already exploded; no second fan-out).

Add-α smoothing: P(w2|w1) = (C(w1,w2) + α) / (C(w1) + α·V), so
unseen continuations are finite and the score is defined for every
document the corpus can tokenize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: F.length(w) > 0,
    )


def _adjacent_pairs(w1_name: str, w2_name: str):
    """Exploded adjacent-token pairs of the ``_w`` array as
    ``arrays_zip(slice(_w, 1, n−1), slice(_w, 2, n−1))`` — regular
    codegen expressions end to end, replacing the
    ``transform(sequence(...), i → struct(element_at ...))`` form whose
    lambda Catalyst interprets PER ELEMENT (higher-order functions have
    no codegen). Pair stream is value-identical (multiset equality per
    doc verified at sf0.1: 0 mismatches; pinned in
    ``tests/test_dedup_gram_builders.py``); measured 0.311 → 0.246 s for the
    sf0.1 fan-out over the persisted token table."""
    n1 = F.size("_w") - 1
    return F.explode(
        F.arrays_zip(
            F.slice("_w", 1, n1).alias(w1_name),
            F.slice("_w", 2, n1).alias(w2_name),
        )
    )


def bigram_lm_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
    round_to: int = 4,
) -> DataFrame:
    """Per-document bigram cross-entropy under the corpus's own
    add-α-smoothed bigram model.

    Returns ``(id, n_bigrams, xent, ppl)`` where ``xent`` is the mean
    of −ln P(w2|w1) over the document's bigrams (rounded to
    ``round_to`` decimals for exact cross-engine comparison) and
    ``ppl`` = round(exp(xent), 2) of the ROUNDED xent, so it is a
    deterministic function of the published score. Documents with
    fewer than two tokens have no bigrams and are excluded.
    """
    toks = _tokens(text_col)
    # tokenize ONCE: the regex split feeds three consumers (the bigram
    # fan-out twice — model aggregation and scoring join — plus the
    # vocabulary count). Catalyst re-derives the split per subtree and
    # AQE's runtime stage reuse only covers the two whose shuffle
    # subtrees canonicalize identically, so persist the 1-row/doc token
    # table (the simhash/semantic "persist derived bases before
    # self-consumption" rule; measured sf0.1 interleaved: 1.83 ->
    # 1.37 s best-of-3 together with the c12 persist below).
    base0 = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), toks.alias("_w")
    ).persist()
    base = base0.filter(F.size("_w") >= 2)
    bigrams = base.select(
        id_col, _adjacent_pairs("w1", "w2").alias("_bg")
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))

    # the model is vocabulary-bounded: persist it so the context-count
    # rollup and the scoring join read the aggregate instead of
    # re-walking the corpus-grain explode
    c12 = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("_c12")
    ).persist()
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    # vocabulary: distinct tokens anywhere in the corpus (w1 of every
    # bigram plus each document's final token = every token position);
    # derived from the persisted token table, NOT a fourth corpus scan
    vocab = (
        base0.select(F.explode("_w").alias("_t"))
        .agg(F.count_distinct("_t").cast("double").alias("_v"))
    )
    logp = F.log(
        (F.col("_c12") + F.lit(alpha))
        / (F.col("_c1") + F.lit(alpha) * F.col("_v"))
    )
    return (
        bigrams.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(-logp), round_to).alias("xent"),
        )
        .withColumn("ppl", F.round(F.exp(F.col("xent")), 2))
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """PMI collocation mining: the word pairs that co-occur far more
    than chance — phrase discovery ("new york", "machine learning")
    ahead of vocabulary induction (feed winners to ``learn_bpe`` /
    the wordpiece vocab) or query expansion.

    ``pmi = ln(C(a,b) * N / (C(a) * C(b)))`` over adjacent pairs,
    gated by ``C(a,b) >= min_count`` (raw PMI is maximized by hapax
    pairs — the count gate is how every collocation extractor tames
    that bias). Returns the global ``top_k`` by (rounded pmi desc,
    pair asc) with all counts attached.

    Plan: one map-only bigram fan-out; the pair-count aggregate is the
    single corpus-grain exchange; unigram counts are its vocabulary-
    bounded rollup and broadcast back onto the pair table; the final
    top-k is TakeOrdered over the (already tiny) gated pair table.
    ln runs on exact integer ratios and is rounded before ranking, so
    cross-engine 1-ulp drift cannot flip an ordering (the
    ``weighted_sample`` precedent).
    """
    toks = _tokens(text_col)
    base = docs.filter(F.col(text_col).isNotNull()).select(toks.alias("_w")).filter(
        F.size("_w") >= 2
    )
    pairs = base.select(_adjacent_pairs("a", "b").alias("p")).select(
        "p.a", "p.b"
    )
    # persist the vocabulary-bounded pair table: its three rollups
    # (left/right marginals + total) and the gated join probe would
    # otherwise each re-derive the corpus-grain explode — AQE stage
    # reuse catches only the canonically-identical subtrees (measured
    # sf0.1 interleaved: 1.81 -> 1.42 s best-of-3)
    pair_counts = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("pair_n")
    ).persist()
    # left-position and right-position unigram marginals + total, all
    # derived from the SAME pair table (vocabulary-bounded rollups)
    left = pair_counts.groupBy("a").agg(F.sum("pair_n").alias("a_n"))
    right = pair_counts.groupBy("b").agg(F.sum("pair_n").alias("b_n"))
    total = pair_counts.agg(F.sum("pair_n").alias("n_total"))
    scored = (
        pair_counts.filter(F.col("pair_n") >= min_count)
        .join(F.broadcast(left), "a")
        .join(F.broadcast(right), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a", "b",
            F.col("pair_n").cast("long").alias("pair_n"),
            F.col("a_n").cast("long").alias("a_n"),
            F.col("b_n").cast("long").alias("b_n"),
            F.round(
                F.log(
                    F.col("pair_n").cast("double")
                    * F.col("n_total").cast("double")
                    / (F.col("a_n").cast("double") * F.col("b_n").cast("double"))
                ),
                round_to,
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(top_k)
    )
