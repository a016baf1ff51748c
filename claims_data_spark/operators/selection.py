"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick the k raw-corpus documents that look most like
a small TARGET corpus, by importance weights from two hashed bag-of-
n-gram language models.

The production recipe behind "pretrain on data that looks like
Wikipedia/books": fit unigram bucket models over hashed features for
the target and the raw pool, weight every raw document by
``log p_target(doc) - log p_raw(doc)``, then Gumbel-top-k resample
without replacement proportionally to the weights.

Spark-first shape (100 TB lens):

* feature counts are TWO corpus passes, each `explode -> groupBy(
  bucket)` with map-side partial aggregation — the exchange is
  ``dim``-bounded (a few thousand rows) regardless of corpus bytes;
* the per-bucket log-ratio table λ is bounded metadata: the integer
  counts collect to the driver (engine-exact), and λ compiles into
  the scoring plan as ONE literal-array expression evaluated by
  constant folding — scoring is then map-only codegen (token ->
  md5 bucket -> element_at), no join, no broadcast state;
* resampling is the Gumbel-top-k identity (equivalent to the
  Efraimidis–Spirakis reservoir `operators/corpus.weighted_sample`
  uses): key = logw + Gumbel(0,1) with an md5-pinned uniform, global
  top-k plans as TakeOrderedAndProject — O(k) driver state, no sort.

Determinism contract (the repo's fixed-point discipline): counts are
integers, every ln() runs over exact integer ratios and ROUNDS to 6
decimals before use (the `collocations`/`weighted_sample` precedent —
libm ln may differ by 1 ulp across engines; the round quashes it),
and per-document sums fold over the token array in sequence order, so
a DuckDB oracle reproduces scores and the selected set value-for-
value. The reference repo has no data-selection operator; this is an
engine extension for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.operators.classify import _bucket
from claims_data_spark.operators.corpus import _md5_uniform
from claims_data_spark.operators.dedup import _norm_words


def _fast_bucket(tok: Column, dim: int, seed: str) -> Column:
    """xxhash64 bucket — the production-speed twin of the md5 family
    (the minhash portable/fast dual): whole-stage-codegen hashing at
    ~10x the md5+hex-conv path's throughput, still deterministic and
    retry-stable, but NOT reproducible outside the JVM — use when the
    run doesn't need an external oracle."""
    return (
        F.pmod(F.xxhash64(tok, F.lit(seed)), F.lit(dim))
    ).cast("int")


def _bucket_fn(portable: bool):
    return _bucket if portable else _fast_bucket


def hashed_features(text: Column | str, word_ngrams: int = 1) -> Column:
    """Normalized word unigrams (optionally + joined word bigrams) —
    the same feature map as the hashed quality classifier."""
    if word_ngrams not in (1, 2):
        raise ValueError("word_ngrams must be 1 or 2")
    t = F.col(text) if isinstance(text, str) else text
    words = F.filter(_norm_words(t), lambda w: F.length(w) > 0)
    if word_ngrams == 1:
        return words
    # round-10: sliding bigrams as zip_with of two shifted slice views
    # (compiled) instead of transform(sequence(...)) whose lambda
    # Catalyst interprets per element — value-identical (pinned in
    # tests/test_dedup_gram_builders.py)
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(words, bigrams)


def bucket_counts(
    df: DataFrame,
    text_col: str,
    dim: int,
    seed: str = "dsir",
    word_ngrams: int = 1,
    portable: bool = True,
) -> dict[int, int]:
    """Per-bucket feature-occurrence counts as a driver dict —
    ``dim``-bounded metadata (the exchange carries at most ``dim``
    rows per task thanks to partial aggregation)."""
    from claims_data_spark.session import spread

    rows = (
        spread(df.select(F.col(text_col)))
        .select(
            F.explode(hashed_features(F.col(text_col), word_ngrams))
            .alias("_tok")
        )
        .select(_bucket_fn(portable)(F.col("_tok"), dim, seed).alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    return {int(r["_b"]): int(r["_n"]) for r in rows}


def dsir_log_ratios(
    target_counts: dict[int, int],
    raw_counts: dict[int, int],
    dim: int,
) -> Column:
    """λ as a plan-literal array: λ_b = round(ln p_t(b) − ln p_r(b), 6)
    with Laplace(+1) smoothing. Built as ONE SQL text whose ln() runs
    JVM-side over exact integer ratios at constant-folding time — the
    integers embed exactly, so the oracle reproduces every λ from its
    own counts."""
    tot_t = sum(target_counts.values()) + dim
    tot_r = sum(raw_counts.values()) + dim
    terms = []
    for b in range(dim):
        ct = target_counts.get(b, 0) + 1
        cr = raw_counts.get(b, 0) + 1
        terms.append(
            f"round(ln(CAST({ct} AS DOUBLE) / CAST({tot_t} AS DOUBLE))"
            f" - ln(CAST({cr} AS DOUBLE) / CAST({tot_r} AS DOUBLE)), 6)"
        )
    return F.expr("array(" + ", ".join(terms) + ")")


def dsir_score(
    df: DataFrame,
    text_col: str,
    lam: Column,
    dim: int,
    seed: str = "dsir",
    word_ngrams: int = 1,
    out_col: str = "logw",
    portable: bool = True,
) -> DataFrame:
    """Per-document importance log-weight: sequential fold of λ over
    the document's hashed features (map-only codegen; empty docs score
    exactly 0)."""
    feats = hashed_features(F.col(text_col), word_ngrams)
    score = F.aggregate(
        F.transform(
            feats,
            lambda tok: F.element_at(
                lam, _bucket_fn(portable)(tok, dim, seed) + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn(out_col, F.round(score, 6))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    dim: int = 1024,
    seed: str = "dsir",
    word_ngrams: int = 1,
    portable: bool = True,
) -> DataFrame:
    """Full DSIR: fit both hashed bucket models, score every raw
    document, Gumbel-top-k resample ``k`` documents without
    replacement with probability ∝ exp(logw).

    Gumbel key = logw + (−ln(−ln u)) with u md5-pinned to the row id —
    identical across retries/engines, and working in log space never
    under/overflows exp(logw). Returns the selected rows with
    ``logw``, ``samp_key`` and 1-based ``rank``.

    Hashing shape: the raw pool is the corpus-sized side and its
    tokens feed BOTH passes (the raw-model counts, then the scoring
    fold), so the tokenize→md5-bucket work — the measured wall
    dominator at sf10 — runs ONCE into a narrow (id, bucket-array)
    frame persisted MEMORY_AND_DISK; the count pass explodes the
    cached ints and the scoring fold reads them back, halving the
    portable-hash cost and skipping the second regex tokenization
    entirely. The heavy path stays narrow (ids + int arrays, ~4
    bytes/token); the k winners broadcast-join back to the full raw
    rows at the end, so no corpus-grain exchange ever carries text.
    The selection itself is computed eagerly (it is k-bounded driver
    metadata, like the λ counts) so the cache can be released before
    returning — callers get a k-row plan, not a pinned corpus cache.
    Values are bit-identical to the two-pass form: same bucket
    function, same sequential fold order, same 6dp rounds.
    """
    from pyspark import StorageLevel

    tc = bucket_counts(target, text_col, dim, seed, word_ngrams, portable)
    feats = hashed_features(F.col(text_col), word_ngrams)
    bk = F.transform(
        feats, lambda tok: _bucket_fn(portable)(tok, dim, seed)
    )
    # spread the NARROW (id, text) frame BEFORE the bucket projection
    # (the corpus.py pattern: repartitioning after would push the
    # whole tokenize tree below the exchange back onto the scan's
    # effective tasks — which a single-row-group input serializes;
    # round-9 spread() row-group probe, SCALE.md addendum 2)
    from claims_data_spark.session import spread

    rawb = (
        spread(raw.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), bk.alias("_bk"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rc = {
        int(r["_b"]): int(r["_n"])
        for r in (
            rawb.select(F.explode("_bk").alias("_b"))
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
    }
    lam = dsir_log_ratios(tc, rc, dim)
    score = F.aggregate(
        F.transform("_bk", lambda b: F.element_at(lam, b + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # the pinned uniform lands in (0,1]; u == 1 would make the Gumbel
    # -ln(-ln 1) = +inf, so clamp to the open interval (1 - 2^-33 is
    # exact in doubles and below the uniform's own 2^-32 grid step)
    u = F.least(
        _md5_uniform(id_col, seed + "|gumbel", open_zero=True),
        F.lit(1.0 - 2.0 ** -33),
    )
    scored = rawb.withColumn("logw", F.round(score, 6))
    key = F.round(F.col("logw") - F.log(-F.log(u)), 6)
    sel = (
        scored.withColumn("samp_key", key)
        .select(id_col, "logw", "samp_key")
        .orderBy(F.col("samp_key").desc(), F.col(id_col).asc())
        .limit(k)  # plans as TakeOrderedAndProject — O(k) driver state
        .collect()
    )
    rawb.unpersist()
    spark = raw.sparkSession
    winners = spark.createDataFrame(
        [(r[id_col], r["logw"], r["samp_key"], i + 1)
         for i, r in enumerate(sel)],
        schema=(
            scored.select(id_col, "logw")
            .withColumn("samp_key", key)
            .withColumn("rank", F.lit(1).cast("long"))
            .schema
        ),
    )
    # enrich the k winners with the full raw row: broadcast the
    # k-bounded side, no corpus shuffle
    return raw.join(F.broadcast(winners), id_col).select(
        *raw.columns, "logw", "samp_key", "rank"
    )
