"""LIKE-prefix join rewritten as an equi-join (SURVEY.md §4 item 1).

The reference joins distinct diagnosis codes to an e-code reference by
``a.icdcm_norm LIKE b.icdcm + '%'``
(``load_stage.mcaid_claim_header.R:556-579``). A theta join like that
is a broadcast-nested-loop in Spark — O(n·m) comparisons. Because the
reference side stores *prefixes*, the deterministic rewrite is:

1. collect the distinct prefix LENGTHS present in the ref table
   (a handful of integers — safe driver-side),
2. for each length k, equi-join ``substring(fact_code, 1, k) =
   ref_prefix`` restricted to ref rows of length k,
3. union the per-length joins.

Catalyst sees plain equi-joins (broadcastable, shuffle-free on the
fact side), and the result is identical to the LIKE join whenever
prefixes are what the ref stores.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_join(
    fact: DataFrame,
    ref: DataFrame,
    fact_code: str,
    ref_prefix: str,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to ref rows where ``fact_code`` starts with
    ``ref_prefix``, as a union of per-prefix-length equi-joins.

    If a fact code matches multiple ref prefixes (different lengths),
    all matches are returned — same as the LIKE join. ``how`` may be
    'inner' or 'left' ('left' returns unmatched fact rows once with
    null ref columns).
    """
    lengths = [
        r[0]
        for r in ref.select(F.length(ref_prefix).alias("l")).distinct().collect()
        if r[0] is not None
    ]
    pieces = []
    for k in sorted(lengths):
        ref_k = ref.filter(F.length(ref_prefix) == k).withColumnRenamed(
            ref_prefix, "_pfx"
        )
        piece = (
            fact.withColumn("_key", F.substring(F.col(fact_code), 1, k))
            .join(F.broadcast(ref_k), F.col("_key") == F.col("_pfx"), "inner")
            .drop("_key")
            .withColumnRenamed("_pfx", ref_prefix)
        )
        pieces.append(piece)
    if not pieces:
        # empty/all-null ref: preserve the full output schema (fact +
        # ref columns) — inner yields zero rows, left yields every
        # fact row with null ref columns
        return fact.join(F.broadcast(ref), F.lit(False), how)
    matched = reduce(lambda a, b: a.unionByName(b), pieces)
    if how == "inner":
        return matched
    if how == "left":
        unmatched = fact.join(
            matched.select(fact_code).distinct(), fact_code, "left_anti"
        )
        for c in matched.columns:
            if c not in unmatched.columns:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(matched.schema[c].dataType)
                )
        return matched.unionByName(unmatched.select(matched.columns))
    raise ValueError(how)
