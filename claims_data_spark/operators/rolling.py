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


def sparse_rolling_month_sum(
    df: DataFrame,
    id_cols: list[str],
    ym_col: str,
    window_months: int,
    ym_min: int,
    ym_max: int,
    value=None,
    out_col: str = "rolling_sum",
    current_col: str | None = None,
) -> DataFrame:
    """Trailing ``window_months`` rolling sum over a SPARSE month series
    as scatter-gather — the scale path for the densify-then-window
    pattern above.

    Equivalent to ``densify_months`` + ``rolling_month_agg`` with frame
    ``(-(window_months-1), 0)`` restricted to the rows whose rolling sum
    is non-zero, but with a fundamentally cheaper physical plan: each
    fact month scatters its value to the ``window_months`` target months
    it contributes to (``explode(sequence(...))``), and one hash
    aggregate gathers per ``(id, target_month)``.  No dense
    id × month grid, no window sort — the whole operator is ONE
    shuffle of narrow fact rows, which is the plan that survives
    100 TB (the reference's dense grid at
    ``sp_mcaid_perf_enroll_denom.sql:44-80`` materializes
    members × months regardless of activity).

    ``value`` defaults to ``lit(1)`` (count). ``current_col``, if set,
    also emits the value sum of the target month itself (0 where the
    month had no facts) — the ``n_orders`` companion column.

    The one exchange moves the NARROW raw rows, before the explode:
    ``repartition(N, id)`` with an explicit partition count (AQE
    coalescing would see only the deceptively small pre-explode bytes
    and squeeze the heavy explode+aggregate onto too few tasks — with
    an explicit N it is respected).  ``HashPartitioning(id)`` satisfies
    the clustering requirement of ``groupBy(id, target)``, so the
    fan-out and both aggregate passes run on that partitioning with no
    further shuffle and no sort.
    """
    spark_val = F.lit(1) if value is None else value
    n_part = df.sparkSession.sparkContext.defaultParallelism
    src = (
        df.filter(F.col(ym_col).between(F.lit(ym_min), F.lit(ym_max)))
        .select(*id_cols, F.col(ym_col).alias("_ym"), spark_val.alias("_v"))
        .repartition(n_part, *[F.col(c) for c in id_cols])
    )
    scattered = src.select(
        *id_cols,
        "_ym",
        "_v",
        F.explode(
            F.sequence(F.lit(0), F.lit(window_months - 1))
        ).alias("_off"),
    ).withColumn(
        "_target",
        (
            F.year(F.add_months(yyyymm_to_date(F.col("_ym")), F.col("_off"))) * 100
            + F.month(F.add_months(yyyymm_to_date(F.col("_ym")), F.col("_off")))
        ).cast("int"),
    ).filter(F.col("_target") <= F.lit(ym_max))
    aggs = [F.sum("_v").alias(out_col)]
    if current_col is not None:
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("_off") == 0, F.col("_v"))), F.lit(0)
            ).alias(current_col)
        )
    return (
        scattered.groupBy(*id_cols, F.col("_target").alias(ym_col))
        .agg(*aggs)
    )
