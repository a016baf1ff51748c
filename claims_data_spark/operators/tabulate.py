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


# R/tabloop.R:569-571 — categorical loop vars whose EVERY level is
# meaningful; all other (flag) vars keep only the group == '1' rows
# when filter=True
TABLOOP_KEEP_CATS = [
    "cov_cohort", "cov_cohort3", "age_grp7", "gender_mx", "race_eth_mx",
    "race_mx", "tractce10", "zip_new", "hra_id", "hra", "region_id",
    "region", "maxlang", "overall", "year",
]

# R/tabloop.R:575-612 — dashboard display names per loop-var family
_TABLOOP_TITLE_CATS = [
    "male", "female", "gender_unk", "aian", "asian", "black", "nhpi",
    "white", "latino", "race_unk", "english", "spanish", "vietnamese",
    "chinese", "somali", "russian", "arabic", "korean", "ukrainian",
    "amharic", "lang_unk", "new_adult", "apple_kids", "older_adults",
    "family_med", "family_planning", "former_foster", "foster",
    "caretaker_adults", "partial_duals", "disabled", "pregnancy",
    "dual_flag",
]
TABLOOP_CAT_LABELS = {
    **{c: "Gender, inclusive" for c in ("male", "female", "gender_unk")},
    "age_grp7": "Age",
    "gender_mx": "Gender, exclusive",
    **{c: "Race/ethnicity, inclusive" for c in (
        "aian", "asian", "black", "nhpi", "white", "latino", "race_unk")},
    "race_eth_mx": "Race/ethnicity, Latino included, exclusive",
    "race_mx": "Race/ethnicity, Latino excluded, exclusive",
    **{c: "Language" for c in (
        "english", "spanish", "vietnamese", "chinese", "somali",
        "russian", "arabic", "korean", "ukrainian", "amharic",
        "lang_unk")},
    **{c: "Coverage group" for c in (
        "new_adult", "apple_kids", "older_adults", "family_med",
        "family_planning", "former_foster", "foster",
        "caretaker_adults", "partial_duals", "disabled", "pregnancy",
        "dual_flag")},
    "cov_cohort": "Coverage cohort",
    "cov_cohort3": "Coverage cohort",
    "zip_new": "ZIP code",
    "hra": "HRA",
    "tractce10": "Census tract",
    "region": "Region",
    "maxlang": "Preferred language",
    "overall": "_Overall",
    "year": "Year",
}


def tabloop(
    df: DataFrame,
    fixed: list[str],
    loop_vars: list[str],
    stats: dict[str, tuple[str, str]],
    filter: bool = False,
    rename: bool = False,
    keep_cats: list[str] | None = None,
) -> DataFrame:
    """For each loop var, groupBy(fixed + [var]) computing ``stats``
    ({out_col: (stat_name, value_col)}), stacked long with
    ``group_cat`` = loop var name and ``group`` = its value (cast to
    string so heterogeneous loop vars stack).

    ``filter=True`` (R/tabloop.R:569-571): keep every level of the
    categorical vars in ``keep_cats`` (default: the reference's
    dashboard list, ``TABLOOP_KEEP_CATS``) but only the ``group ==
    '1'`` rows of flag vars — the "count the 1s, drop the 0s" rule
    for indicator columns. ``rename=True`` (R :575-612): flag-var
    levels title-case into ``group`` and each loop-var family gets
    its dashboard display name in ``group_cat`` (overall → _Overall
    so it sorts first, the reference's convention). Both compile to
    literal CASE/IN expressions — no joins."""
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
    out = reduce(lambda a, b: a.unionByName(b), pieces)
    if filter:
        keep = keep_cats if keep_cats is not None else TABLOOP_KEEP_CATS
        # numeric compare, not string: the reference keeps group == 1
        # numerically, so a double-typed flag that stacks as '1.0'
        # must still qualify (try_cast: non-numeric levels -> NULL,
        # never an ANSI cast error). Intentional widening vs the R
        # (round-8 advice): when the R column is CHARACTER, its
        # `group == 1` coerces 1 to '1' and drops levels like '01',
        # ' 1', '1e0' that this numeric coercion keeps — those levels
        # are numerically the flag value 1, and a flag column whose
        # string rendering varies by source should tabulate as one
        # level, not silently vanish. Callers needing R-exact string
        # semantics pass keep_cats explicitly.
        out = out.filter(
            F.col("group_cat").isin(keep)
            | (F.col("group").try_cast("double") == 1)
        )
    if rename:
        # R tools::toTitleCase on these single-word tokens capitalizes
        # the first letter and leaves underscores ('dual_flag' ->
        # 'Dual_flag') — Spark initcap matches exactly (space-split)
        group = F.when(
            F.col("group_cat").isin(_TABLOOP_TITLE_CATS),
            F.initcap(F.col("group_cat")),
        ).when(
            F.lower(F.col("group_cat")) == "overall", F.lit("_Overall")
        ).otherwise(F.col("group"))
        cat = F.col("group_cat")
        for src, label in TABLOOP_CAT_LABELS.items():
            # 'overall' matches case-insensitively (R/tabloop.R:608
            # maps Overall/OVERALL too, and the group-side rename
            # above already lowercases for its overall check)
            src_col = (
                F.lower(F.col("group_cat")) if src == "overall"
                else F.col("group_cat")
            )
            cat = F.when(src_col == src, F.lit(label)).otherwise(cat)
        out = out.withColumn("group", group).withColumn("group_cat", cat)
    return out


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
