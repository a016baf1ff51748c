"""Person-month eligibility table (reference:
``load_stage.mcaid_elig_month.R`` — one row per member-month with
coverage-day counts; Synapse HASH-distributes on id, we shuffle once on
id and keep the partitioning for the downstream perf layer)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_elig_month(timevar: DataFrame) -> DataFrame:
    """timevar intervals -> member-month rows with cov_days per month.

    Explodes each interval into its overlapped months via
    sequence(month(from), month(to)) — bounded fan-out (months per
    interval), no per-day explosion (the reference benchmarked per-day
    explosion at ~18× slower, ``load_stage.mcaid_mcare_elig_timevar.R:99-104``).
    """
    months = F.sequence(
        F.trunc("from_date", "month"),
        F.trunc("to_date", "month"),
        F.expr("interval 1 month"),
    )
    exploded = timevar.withColumn("_m", F.explode(months))
    month_start = F.col("_m")
    month_end = F.last_day("_m")
    return exploded.select(
        "id_mcaid",
        (F.year("_m") * 100 + F.month("_m")).cast("int").alias("year_month"),
        F.greatest(F.col("from_date"), month_start).alias("cov_from"),
        F.least(F.col("to_date"), month_end).alias("cov_to"),
        *[c for c in ("rac_code", "bsp_group_cid", "cov_type", "dual") if c in timevar.columns],
    ).withColumn(
        "cov_days", F.datediff("cov_to", "cov_from") + F.lit(1)
    ).withColumn(
        "enrolled_any", F.lit(1)
    )
