"""Mode (most-frequent / most-weighted value) selection with pinned
tie-breaking (SURVEY.md §2.4 A4-A6).

The reference computes per-person "best" values three ways:
- A4 most-frequent with recency tiebreak (DOB,
  ``load_stage.mcaid_elig_demo.R:93-118``)
- A5 most-person-time value (weight = coverage days,
  ``R/claims_elig.R:807-881`` — generated ~20× per query)
- A6 most-frequent with random tiebreak (language,
  ``load_stage.mcaid_elig_demo.R:443-478`` uses ``NEWID()``; we pin a
  deterministic hash so results are stable and oracle-comparable)

All compile to the same two-stage plan: groupBy(keys, value) partial
aggregate (map-side combined), then one row_number window over the much
smaller (keys × distinct-value) set. The window input is the aggregate,
not the raw rows — at 100 TB the heavy table is touched once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mode_value(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight: Column | None = None,
    tiebreak: list[Column] | None = None,
    out_col: str | None = None,
    keep_weight_as: str | None = None,
) -> DataFrame:
    """One row per ``keys`` with the modal ``value_col``.

    ``weight``: optional Column aggregated with SUM as the vote weight
    (None -> COUNT(*), plain frequency). ``tiebreak``: ordered Columns
    (referencing aggregated columns or the value itself) applied after
    descending weight; defaults to ascending value for determinism.
    ``keep_weight_as``: also emit the winning weight (the reference's
    ``_t`` day-count companion columns).
    """
    agg_weight = F.sum(weight).alias("_w") if weight is not None else F.count(
        F.lit(1)
    ).alias("_w")
    grouped = df.filter(F.col(value_col).isNotNull()).groupBy(
        *keys, value_col
    ).agg(agg_weight)

    order: list[Column] = [F.col("_w").desc()]
    order += tiebreak if tiebreak else [F.col(value_col).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    ranked = grouped.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    out = ranked.drop("_rn")
    if out_col and out_col != value_col:
        out = out.withColumnRenamed(value_col, out_col)
    if keep_weight_as:
        out = out.withColumnRenamed("_w", keep_weight_as)
    else:
        out = out.drop("_w")
    return out


def deterministic_tiebreak(*cols: str) -> list[Column]:
    """Reproducible stand-in for the reference's ``NEWID()`` random
    tiebreak: order by md5 of the concatenated key columns. Stable
    across runs and engines (md5 is engine-portable), unlike
    ``rand()``."""
    return [F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))]
