"""Performance-measure layer (reference:
``create_stage.sp_mcaid_perf_enroll_denom.sql``,
``create_stage.sp_perf_measures.sql`` — stored-proc batches over a
dense member-month grid with rolling 12/24-month frames).

Measures are registered as (numerator-builder, denominator rule)
pairs; the engine densifies once and runs every measure's frames over
the same id-partitioned window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claims_data_spark.operators.rolling import densify_months, rolling_month_agg


def build_enroll_denom(
    elig_month: DataFrame,
    ym_min: int,
    ym_max: int,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """Dense member-month enrollment with the reference's rolling
    frames (``sp_mcaid_perf_enroll_denom.sql:53-80``):
    enrolled_any_t_12_m (11 preceding..current), prior-year
    (23..12 preceding), and lookahead (current..1 following)."""
    monthly = elig_month.groupBy(id_col, "year_month").agg(
        F.max("enrolled_any").alias("enrolled_any"),
        F.sum("cov_days").alias("cov_days"),
    )
    dense = densify_months(
        monthly, [id_col], "year_month", ym_min, ym_max,
        fill={"enrolled_any": 0, "cov_days": 0},
    )
    return rolling_month_agg(
        dense,
        [id_col],
        "year_month",
        {
            "enrolled_any_t_12_m": ("enrolled_any", -11, 0),
            "enrolled_prior_t_12_m": ("enrolled_any", -23, -12),
            "enrolled_ahead_2_m": ("enrolled_any", 0, 1),
        },
    )


def follow_up_after_ed(
    header: DataFrame,
    follow_up_days: int = 30,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """FUA/FUM-style measure component (reference:
    ``fn_perf_fua_ed_index_visit.sql`` + ``fn_perf_fum_follow_up_visit.sql``):
    for each index ED episode, did a qualifying follow-up visit occur
    within N days after discharge?

    Index events = one row per ``ed_pophealth_id`` (episode end date);
    follow-ups = non-ED primary-care/telehealth visits. The match is a
    forward as-of join per person — one shuffle on the id, no range
    join (``operators/asof.asof_join`` direction='forward').
    """
    from claims_data_spark.operators.asof import asof_join

    index_visits = (
        header.filter(F.col("ed_pophealth_id").isNotNull())
        .groupBy(id_col, "ed_pophealth_id")
        .agg(F.max("first_service_date").alias("index_date"))
    )
    # telehealth_flag only exists when claim_header was built with the
    # telehealth ref; the measure degrades to pc visits without it
    qualifies = F.col("pc_visit_flag") == 1
    if "telehealth_flag" in header.columns:
        qualifies = qualifies | (F.col("telehealth_flag") == 1)
    follow_ups = header.filter((F.col("ed_flag") == 0) & qualifies).select(
        id_col,
        F.col("first_service_date").alias("fu_date"),
    )
    matched = asof_join(
        index_visits,
        follow_ups,
        [id_col],
        left_ts="index_date",
        right_ts="fu_date",
        right_payload=["fu_date"],
        direction="forward",
    )
    # forward as-of guarantees fu_date >= index_date when matched, and
    # a null fu_date null-propagates through datediff into otherwise(0)
    return matched.select(
        id_col,
        "ed_pophealth_id",
        "index_date",
        F.when(F.datediff("fu_date", "index_date") <= follow_up_days, 1)
        .otherwise(0)
        .alias("followed_up"),
        "fu_date",
    )


def build_measure(
    denom: DataFrame,
    events: DataFrame,
    measure_name: str,
    end_month: int,
    months_enrolled_min: int = 11,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """One measure batch (the ``@measure_name/@end_month_int`` stored
    procedure contract, ``sp_perf_measures.sql:44-58``): members
    continuously enrolled per the rolling denominator at ``end_month``,
    numerator = any qualifying event in the 12-month window. The
    delete-then-recompute refresh becomes "recompute this
    (measure, end_month) slice" — idempotent by construction."""
    eligible = denom.filter(
        (F.col("year_month") == end_month)
        & (F.col("enrolled_any_t_12_m") >= months_enrolled_min)
    ).select(id_col)
    start_month = end_month - 100  # same month, prior year (yyyymm)
    window_events = events.filter(
        (F.col("year_month") > start_month) & (F.col("year_month") <= end_month)
    )
    numer = window_events.join(eligible, id_col, "left_semi").select(id_col).distinct()
    return eligible.join(
        numer.withColumn("numerator", F.lit(1)), id_col, "left"
    ).select(
        F.lit(measure_name).alias("measure_name"),
        F.lit(end_month).alias("end_year_month"),
        id_col,
        F.coalesce("numerator", F.lit(0)).alias("numerator"),
        F.lit(1).alias("denominator"),
    )
