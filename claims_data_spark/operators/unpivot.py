"""Wide→long reshape (SURVEY.md §2.8 R1-R2): diagnosis/procedure
column fan-out.

The reference unpivots 13 dx columns and 12 px columns into long child
tables (``load_stage.mcaid_claim_icdcm_header.R:107-134``,
``load_stage.mcaid_claim_procedure.R:74-130``). Spark-first this is
``stack`` (UNPIVOT) — a narrow, shuffle-free transformation that
whole-stage-codegens; NULL positions are dropped inline so the long
table never materializes empty slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    value_cols: dict[str, str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_nulls: bool = True,
) -> DataFrame:
    """Unpivot ``value_cols`` ({source_col: label}) into
    (``var_name``, ``value_name``) rows.

    Uses the ``stack`` table-generating expression — no shuffle, no
    Python. ``drop_nulls=True`` mirrors the reference's WHERE col IS
    NOT NULL per branch.
    """
    n = len(value_cols)
    # labels/columns are interpolated into SQL: escape quotes in labels
    # and reject backticks in column names rather than corrupt the plan
    for col in value_cols:
        if "`" in col:
            raise ValueError(f"column name may not contain backtick: {col!r}")
    pairs = ", ".join(
        "'{}', `{}`".format(str(label).replace("'", "''"), col)
        for col, label in value_cols.items()
    )
    stacked = df.select(
        *id_cols,
        F.expr(f"stack({n}, {pairs}) as (`{var_name}`, `{value_name}`)"),
    )
    if drop_nulls:
        stacked = stacked.filter(F.col(value_name).isNotNull())
    return stacked


def unpivot_with_fanout(
    df: DataFrame,
    id_cols: list[str],
    value_cols: dict[str, str],
    fanout_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    fanout_name: str = "modifier",
) -> DataFrame:
    """Unpivot plus per-row array fan-out — the procedure × modifier
    pattern (``load_stage.mcaid_claim_procedure.R:74-130``): each long
    procedure row replicates once per non-null modifier (explode of the
    modifier array), keeping a NULL-modifier row when none exist."""
    long_df = unpivot(df.select(*id_cols, *value_cols, *fanout_cols),
                      id_cols + fanout_cols, value_cols, var_name, value_name)
    mods = F.filter(
        F.array(*[F.col(c) for c in fanout_cols]), lambda m: m.isNotNull()
    )
    padded = F.when(F.size(mods) == 0, F.array(F.lit(None).cast("string"))).otherwise(mods)
    return (
        long_df.withColumn(fanout_name, F.explode(padded))
        .drop(*fanout_cols)
    )
