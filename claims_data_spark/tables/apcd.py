"""APCD (All-Payer Claims Database) eligibility timeline (reference:
``load_stage.apcd_elig_timevar.R:20-104`` — covgrp derivation from
nullable eligibility-id columns, then gaps-and-islands idiom B).

The member-month detail carries nine nullable eligibility-id columns
(med/rx/dental × medicaid/medicare/commercial). ``covgrp`` classifies
each month into one of 9 coverage groups; the empirical ``dual_flag``
marks months with both Medicaid and Medicare medical coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import yyyymm_to_date
from claims_data_spark.operators.intervals import collapse_islands


def _nn(col: str):
    return F.col(col).isNotNull()


def _any_payer(df: DataFrame, payer: str):
    """Any of the med/rx/dental eligibility ids for a payer non-null
    (guarded on column presence — extracts vary in which id columns
    they carry)."""
    cols = [
        c
        for c in (
            f"med_{payer}_eligibility_id",
            f"rx_{payer}_eligibility_id",
            f"dental_{payer}_eligibility_id",
        )
        if c in df.columns
    ]
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNotNull()
    return cond


def derive_covgrp(df: DataFrame) -> DataFrame:
    """Add ``covgrp`` (0-8) + ``dual_flag`` per the reference's case
    cascade (``load_stage.apcd_elig_timevar.R:30-66``): covgrp from
    MEDICAL coverage by payer combination (0 = none); the empirical
    ``dual_flag`` from ANY (med/rx/dental) Medicaid id together with
    ANY Medicare id (``:29-33``)."""
    med_mcaid = _nn("med_medicaid_eligibility_id")
    med_mcare = _nn("med_medicare_eligibility_id")
    med_comm = _nn("med_commercial_eligibility_id")
    covgrp = (
        F.when(med_mcaid & med_mcare & med_comm, 7)
        .when(med_mcaid & med_mcare, 4)
        .when(med_mcaid & med_comm, 5)
        .when(med_mcare & med_comm, 6)
        .when(med_mcaid, 1)
        .when(med_mcare, 2)
        .when(med_comm, 3)
        .when(_nn("rx_medicaid_eligibility_id") | _nn("dental_medicaid_eligibility_id"), 8)
        .otherwise(0)
    )
    return df.withColumn("covgrp", covgrp).withColumn(
        "dual_flag",
        (_any_payer(df, "medicaid") & _any_payer(df, "medicare")).cast("int"),
    )


def build_apcd_elig_timevar(member_month: DataFrame) -> DataFrame:
    """member-month rows -> contiguous-coverage intervals per
    (member, covgrp, dual_flag, zip).

    The reference collapses with idiom B (months-since-epoch minus
    row_number, ``:83-104``); ``collapse_islands`` produces identical
    islands with one cumulative window (SURVEY.md §2.5 W3).
    """
    with_grp = derive_covgrp(member_month).filter(F.col("covgrp") != 0)
    months = with_grp.select(
        F.col("internal_member_id").alias("id_apcd"),
        yyyymm_to_date("year_month").alias("from_date"),
        F.last_day(yyyymm_to_date("year_month")).alias("to_date"),
        "covgrp",
        "dual_flag",
        F.col("zip_code").alias("geo_zip"),
    )
    return collapse_islands(
        months,
        ["id_apcd"],
        "from_date",
        "to_date",
        group_cols=["covgrp", "dual_flag", "geo_zip"],
        max_gap_days=1,
    ).withColumnRenamed("island_days", "cov_time_day")
