"""Composed training-corpus cleaning pipeline.

The individual stages (language ID, quality scoring, exact dedup,
near-dup banding) each exist as operators; this module composes them
the way a real LLM-training-data pipeline runs them — cheap row-local
filters FIRST so the one shuffle (the dedup fingerprint window) only
sees survivors, and every rejected row keeps an attributed status so
the pipeline is auditable (what fraction died at which gate).

Plan shape: one narrow projection (quality + language hits +
fingerprint, all codegen), one window shuffle on the fingerprint over
the gate-passing subset, one tiny aggregate for the report. At 100 TB
the quality/language gates typically drop 30-60% of rows BEFORE the
shuffle — filter-first ordering is the difference between shuffling
the whole corpus and shuffling the half that can still win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.functions.text import (
    doc_fingerprint,
    lang_marker_hits,
    quality_score,
)


def clean_corpus_status(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
    min_lang_hits: int = 1,
) -> DataFrame:
    """One row per input document with its gate outcome:
    ``low_quality`` | ``wrong_lang`` | ``duplicate`` | ``kept``.

    Gate order matches pipeline practice (cheap row-local first):
    quality < ``min_quality`` rejects before language, language before
    dedup; among gate-passing rows sharing a content fingerprint the
    lowest id survives (``exact_dedup``'s keep-min rule). NULL text is
    low-quality by definition.
    """
    q = quality_score(text_col)
    hits = lang_marker_hits(text_col, lang)
    fp = F.when(
        F.col(text_col).isNotNull(), doc_fingerprint(text_col)
    )
    base = df.select(
        F.col(id_col),
        F.coalesce(q, F.lit(0.0)).alias("quality"),
        F.coalesce(hits, F.lit(0)).alias("_hits"),
        fp.alias("_fp"),
    )
    eligible = (
        (F.col("quality") >= min_quality)
        & (F.col("_hits") >= min_lang_hits)
        & F.col("_fp").isNotNull()
    )
    # rank only the eligible rows per fingerprint. Ineligible rows
    # must NOT share one partition key (a NULL key would funnel every
    # rejected row — possibly half the corpus — through a single
    # window task); each gets its own id-derived key so its partition
    # is a singleton.
    w = Window.partitionBy(
        F.when(eligible, F.col("_fp")).otherwise(
            F.concat(F.lit("__rej__"), F.col(id_col).cast("string"))
        )
    ).orderBy(F.col(id_col).asc())
    ranked = base.withColumn(
        "_rn", F.when(eligible, F.row_number().over(w))
    )
    status = (
        F.when(F.col("quality") < min_quality, "low_quality")
        .when(F.col("_hits") < min_lang_hits, "wrong_lang")
        .when(F.col("_rn") > 1, "duplicate")
        .otherwise("kept")
    )
    return ranked.select(id_col, "quality", status.alias("status"))


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **gates,
) -> tuple[DataFrame, DataFrame]:
    """(surviving documents, per-status report). The survivors keep
    every input column; the report is one tiny aggregate of the status
    frame (rows + share of corpus per gate outcome)."""
    status = clean_corpus_status(df, id_col, text_col, **gates)
    kept = df.join(
        status.filter(F.col("status") == "kept").select(id_col),
        id_col,
        "left_semi",
    )
    report = (
        status.groupBy("status")
        .agg(F.count(F.lit(1)).alias("docs"))
        .select(
            "status", "docs",
            F.round(
                F.col("docs") * 100.0
                / F.sum("docs").over(Window.partitionBy()),
                2,
            ).alias("pct"),
        )
    )
    return kept, report
