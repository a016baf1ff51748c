"""Multi-stat grouped tabulation, zero-fill, and small-cell suppression
(SURVEY.md §2.4 A9-A11 — the reference's ``tabloop_f``,
``R/tabloop.R:47-624``, and ``suppress_f``,
``R/helper_functions.R:143-175``).

``tabloop`` runs, for each loop variable, a grouped aggregation over
the fixed columns × that variable, then stacks results long with
``group_cat``/``group`` labels. Each loop var is one independent
groupBy (partial-aggregated); the union is plan-level, not a barrier.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAT_BUILDERS = {
    "count": lambda c: F.count(F.lit(1)),
    "count_distinct": lambda c: F.countDistinct(c),
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "median": lambda c: F.expr(f"percentile(`{c}`, 0.5)"),
}


def tabloop(
    df: DataFrame,
    fixed: list[str],
    loop_vars: list[str],
    stats: dict[str, tuple[str, str]],
) -> DataFrame:
    """For each loop var, groupBy(fixed + [var]) computing ``stats``
    ({out_col: (stat_name, value_col)}), stacked long with
    ``group_cat`` = loop var name and ``group`` = its value (cast to
    string so heterogeneous loop vars stack)."""
    pieces = []
    for lv in loop_vars:
        aggs = [
            STAT_BUILDERS[stat](val).alias(out)
            for out, (stat, val) in stats.items()
        ]
        piece = (
            df.groupBy(*fixed, lv)
            .agg(*aggs)
            .withColumn("group_cat", F.lit(lv))
            .withColumn("group", F.col(lv).cast("string"))
            .drop(lv)
        )
        pieces.append(piece)
    return reduce(lambda a, b: a.unionByName(b), pieces)


def zero_fill(
    results: DataFrame,
    dims: list[DataFrame],
    fill_cols: dict[str, object],
) -> DataFrame:
    """Left-join a full dimension matrix (cross join of the given
    dimension DataFrames) to ``results`` and fill gaps — the
    reference's full_join-by-link matrix (``R/tabloop.R:65-134``).
    Dimension frames are tiny; the cross join is broadcast."""
    matrix = dims[0]
    for d in dims[1:]:
        matrix = matrix.crossJoin(F.broadcast(d))
    keys = [c for c in matrix.columns]
    return matrix.join(results, on=keys, how="left").fillna(fill_cols)


def suppress(
    df: DataFrame,
    cols: list[str],
    lower: int = 1,
    upper: int = 10,
    row_wise: bool = False,
) -> DataFrame:
    """Small-cell suppression (``R/helper_functions.R:143-175``):
    values in [lower, upper] become NULL; ``row_wise=True`` nulls every
    listed column when ANY of them is in range (so a suppressed count
    can't be reconstructed from its siblings)."""
    if row_wise:
        any_small = reduce(
            lambda a, b: a | b,
            [F.col(c).between(lower, upper) for c in cols],
        )
        out = df
        for c in cols:
            out = out.withColumn(
                c, F.when(any_small, F.lit(None)).otherwise(F.col(c))
            )
        return out
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(F.col(c).between(lower, upper), F.lit(None)).otherwise(F.col(c)),
        )
    return out
