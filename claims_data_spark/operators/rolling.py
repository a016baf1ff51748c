"""Person-month densification and rolling month frames
(SURVEY.md §2.5 W6, §2.4 A13 — the perf-measure layer:
``sp_mcaid_perf_enroll_denom.sql:44-80``, ``sp_perf_measures.sql``).

The reference densifies to a full member × month grid (cross join to a
month dimension) and then runs ``ROWS BETWEEN 11 PRECEDING AND CURRENT
ROW`` style frames. Densification is what makes row-based frames equal
time-based frames; we keep that design because a dense month grid is
also the cheap path in Spark (the grid join is a broadcast of the tiny
month dimension; the window then needs only the one shuffle on id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import yyyymm_to_date


def month_grid(spark, ym_min: int, ym_max: int) -> DataFrame:
    """All int yyyymm values in [ym_min, ym_max] — built with
    sequence+explode like the reference's date dimension
    (``load_ref.date.sql``), one row per month."""
    start = yyyymm_to_date(F.lit(ym_min))
    end = yyyymm_to_date(F.lit(ym_max))
    return spark.range(1).select(
        F.explode(F.sequence(start, end, F.expr("interval 1 month"))).alias("_m")
    ).select((F.year("_m") * 100 + F.month("_m")).cast("int").alias("year_month"))


def densify_months(
    df: DataFrame,
    id_cols: list[str],
    ym_col: str,
    ym_min: int,
    ym_max: int,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Cross-join distinct ids with the month grid and left-join facts,
    zero/default-filling gaps (reference: ``ref.perf_year_month CROSS
    JOIN stage.perf_distinct_member``, ``sp_perf_measures.sql:90-92``)."""
    spark = df.sparkSession
    grid = month_grid(spark, ym_min, ym_max).withColumnRenamed("year_month", ym_col)
    ids = df.select(*id_cols).distinct()
    dense = ids.crossJoin(F.broadcast(grid))
    out = dense.join(df, on=id_cols + [ym_col], how="left")
    if fill:
        out = out.fillna(fill)
    return out


def rolling_month_agg(
    df: DataFrame,
    id_cols: list[str],
    ym_col: str,
    aggs: dict[str, tuple[str, int, int]],
) -> DataFrame:
    """Add rolling-frame columns over a DENSE month series.

    ``aggs``: {out_col: (value_col, preceding, following)} — e.g. the
    reference's 12-month enrollment ``(-11, 0)``, prior-year
    ``(-23, -12)``, and lookahead ``(0, 1)`` frames
    (``sp_mcaid_perf_enroll_denom.sql:53-80``). Caller must densify
    first (``densify_months``) so ROWS frames equal month frames.
    """
    w = Window.partitionBy(*id_cols).orderBy(ym_col)
    out = df
    for out_col, (value_col, prec, foll) in aggs.items():
        out = out.withColumn(
            out_col, F.sum(value_col).over(w.rowsBetween(prec, foll))
        )
    return out
