"""Measure staging dispatcher: component views → ``stage.perf_staging``
/ ``stage.perf_staging_event_date`` rows, one batch per measure
(reference: ``create_stage.sp_perf_staging.sql`` — the per-measure
IF-batch stored procedure that pre-aggregates utilization to
person-month or person-event-date grain before the final calculation
in ``sp_perf_measures`` / ``tables.perf_registry``).

Each ``stage_*`` builder takes the matching component output from
``tables.perf`` and emits the staging shape:

* month grain: ``(id, year_month, measure_id, num_denom,
  measure_value)``
* event grain: ``(id, year_month, event_date, measure_id,
  denominator, numerator)``

``build_perf_staging`` dispatches on the reference's measure names so
a caller can run the same loop the stored procedure ran.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import date_to_yyyymm


def _month_rows(
    df: DataFrame,
    measure_id: int,
    value_expr,
    agg,
    num_denom: str = "N",
    id_col: str = "id_mcaid",
    date_col: str = "first_service_date",
) -> DataFrame:
    ym = (
        F.col("year_month")
        if "year_month" in df.columns
        else date_to_yyyymm(F.col(date_col))
    )
    return (
        df.withColumn("_ym", ym)
        .groupBy(id_col, "_ym")
        .agg(agg(value_expr).cast("int").alias("measure_value"))
        .select(
            id_col,
            F.col("_ym").alias("year_month"),
            F.lit(measure_id).alias("measure_id"),
            F.lit(num_denom).alias("num_denom"),
            "measure_value",
        )
    )


def stage_all_cause_ed(ed_visits: DataFrame, id_col: str = "id_mcaid") -> DataFrame:
    """``sp_perf_staging.sql:68-106``: person-month SUM of qualifying
    ED visits from ``perf.ed_visit_num`` output."""
    return _month_rows(
        ed_visits, 1, F.col("ed_visit_num"), F.sum, "N", id_col
    )


def stage_acute_hospital(
    discharges: DataFrame, id_col: str = "id_mcaid"
) -> DataFrame:
    """``sp_perf_staging.sql:108-146``: person-month SUM of total
    discharges from the classified (non-excluded) AH discharge set."""
    return _month_rows(
        discharges, 2, F.lit(1), F.sum, "N", id_col
    )


def stage_tx_pen(
    num_claims: DataFrame,
    den_claims: DataFrame,
    measure_id: int,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """``sp_perf_staging.sql:415-651`` (TPM/TPS/TPO): numerator AND
    denominator person-month MAX(flag) rows from the
    ``perf.tx_pen_claim_sets`` outputs, stacked long."""
    return _month_rows(
        num_claims, measure_id, F.lit(1), F.max, "N", id_col
    ).unionByName(
        _month_rows(den_claims, measure_id, F.lit(1), F.max, "D", id_col)
    )


def stage_cap(
    ambulatory_claims: DataFrame, id_col: str = "id_mcaid"
) -> DataFrame:
    """``sp_perf_staging.sql:706-760``: person-month MAX(1) ambulatory
    -visit flag from the CAP HEDIS value-set gate."""
    return _month_rows(
        ambulatory_claims, 13, F.lit(1), F.max, "N", id_col
    )


def _event_rows(
    joined: DataFrame,
    measure_ids: dict[str, int],
    denominator_col: str,
    id_col: str,
    date_col: str,
) -> DataFrame:
    """One staging row per (event, horizon-measure): the reference
    UNION-ALLs a 7-day and a 30-day copy of the join-step output with
    the respective measure_id (``sp_perf_staging.sql:186-216``)."""
    out = None
    for numerator_col, measure_id in measure_ids.items():
        rows = joined.select(
            F.col(id_col).alias(id_col),
            date_to_yyyymm(F.col(date_col)).alias("year_month"),
            F.col(date_col).alias("event_date"),
            F.lit(measure_id).alias("measure_id"),
            F.col(denominator_col).cast("int").alias("denominator"),
            F.col(numerator_col).cast("int").alias("numerator"),
        )
        out = rows if out is None else out.unionByName(rows)
    return out


def stage_followup_ed(
    join_step: DataFrame,
    measure: str,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """FUA / FUM event-date staging from ``perf.ed_followup_measure``
    output; emits one row per index event per horizon (7/30 day)."""
    ids = {"FUA": {"follow_up_7_day": 3, "follow_up_30_day": 4},
           "FUM": {"follow_up_7_day": 5, "follow_up_30_day": 6}}[measure]
    joined = join_step.withColumn("ed_index_visit", F.lit(1))
    return _event_rows(
        joined, ids, "ed_index_visit", id_col, "first_service_date"
    )


def stage_followup_fuh(
    join_step: DataFrame, id_col: str = "id_mcaid"
) -> DataFrame:
    """FUH event-date staging from ``perf.fuh_measure`` output (the
    index grain is the inpatient discharge; event date = discharge)."""
    joined = join_step.withColumn("inpatient_index_stay", F.lit(1))
    return _event_rows(
        joined,
        {"follow_up_7_day": 7, "follow_up_30_day": 8},
        "inpatient_index_stay",
        id_col,
        "discharge_date",
    )


def stage_pcr(
    readmissions: DataFrame, id_col: str = "id_mcaid"
) -> DataFrame:
    """PCR event-date staging from ``perf.pcr_readmission`` output:
    denominator = index stay, numerator = 30-day readmission flag,
    event date = index discharge date."""
    joined = readmissions.withColumn("index_stay", F.lit(1))
    return _event_rows(
        joined,
        {"readmission_flag": 12},
        "index_stay",
        id_col,
        "discharge_date",
    )


def stage_tx_pen_by_dx(
    claim_sets: dict[int, tuple[DataFrame, DataFrame]],
    id_col: str = "id_mcaid",
) -> DataFrame:
    """By-diagnosis TPM staging (measure ids 30-36,
    ``v_perf_tpm_by_dx_numerator/denominator.sql``): one (num, den)
    claim-set pair per sub-measure id, stacked into one long frame."""
    out = None
    for measure_id, (num, den) in sorted(claim_sets.items()):
        rows = stage_tx_pen(num, den, measure_id, id_col=id_col)
        out = rows if out is None else out.unionByName(rows)
    return out


#: measure_name -> (stage builder, grain) — mirrors the stored
#: procedure's IF-dispatch (sp_perf_staging.sql:7-16)
STAGING_BATCHES = {
    "All-Cause ED Visits": (stage_all_cause_ed, "month"),
    "Acute Hospital Utilization": (stage_acute_hospital, "month"),
    "Follow-up ED visit for Alcohol/Drug Abuse": (
        lambda df, **kw: stage_followup_ed(df, "FUA", **kw), "event"),
    "Follow-up ED visit for Mental Illness": (
        lambda df, **kw: stage_followup_ed(df, "FUM", **kw), "event"),
    "Follow-up Hospitalization for Mental Illness": (
        stage_followup_fuh, "event"),
    "Mental Health Treatment Penetration": (
        lambda num, den, **kw: stage_tx_pen(num, den, 9, **kw), "month"),
    "SUD Treatment Penetration": (
        lambda num, den, **kw: stage_tx_pen(num, den, 10, **kw), "month"),
    "SUD Treatment Penetration (Opioid)": (
        lambda num, den, **kw: stage_tx_pen(num, den, 11, **kw), "month"),
    "Plan All-Cause Readmissions (30 days)": (stage_pcr, "event"),
    "Child and Adolescent Access to Primary Care": (stage_cap, "month"),
    "MH Treatment Penetration by Diagnosis": (stage_tx_pen_by_dx, "month"),
}


def build_perf_staging(measure_name: str, *component_frames, **kw):
    """Run one staging batch by its reference measure name, returning
    ``(staging_rows, grain)`` where grain is 'month' or 'event'."""
    if measure_name not in STAGING_BATCHES:
        raise ValueError(
            f"unknown measure {measure_name!r}; known: "
            f"{sorted(STAGING_BATCHES)}"
        )
    builder, grain = STAGING_BATCHES[measure_name]
    return builder(*component_frames, **kw), grain


# measure_name -> the short names its final-calc slice(s) run under
# (follow-up batches produce a 7-day and a 30-day measure each)
_FINAL_SLICES = {
    "All-Cause ED Visits": ["ED"],
    "Acute Hospital Utilization": ["AH"],
    "Follow-up ED visit for Alcohol/Drug Abuse": ["FUA_7", "FUA_30"],
    "Follow-up ED visit for Mental Illness": ["FUM_7", "FUM_30"],
    "Follow-up Hospitalization for Mental Illness": ["FUH_7", "FUH_30"],
    "Mental Health Treatment Penetration": ["TPM"],
    "SUD Treatment Penetration": ["TPS"],
    "SUD Treatment Penetration (Opioid)": ["TPO"],
    "Plan All-Cause Readmissions (30 days)": ["PCR"],
    "Child and Adolescent Access to Primary Care": ["CAP"],
    "MH Treatment Penetration by Diagnosis": [
        "TPM_ADHD", "TPM_Adjustment", "TPM_Anxiety", "TPM_Depression",
        "TPM_Impulse", "TPM_Bipolar", "TPM_Psychotic",
    ],
}


def run_perf_measures(
    member_month: DataFrame,
    components: dict,
    end_month: int,
    ym_min: int | None = None,
    id_col: str = "id_mcaid",
    already_dense: bool = False,
) -> DataFrame:
    """End-to-end measure run (the reference's EXEC loop over
    ``sp_perf_staging`` + ``sp_perf_measures`` for one measurement
    year): build the enrollment denominator once, stage each requested
    measure from its component frames, run every final-calc slice, and
    union the ``mcaid_perf_measure``-shaped results.

    ``components`` maps a reference measure name to the tuple of
    component frames its staging batch consumes (see
    ``STAGING_BATCHES``). The denominator spans 24 months ending at
    ``end_month`` unless ``ym_min`` widens it."""
    from claims_data_spark.tables.perf_registry import (
        build_enroll_denom_full,
        perf_measure_cap,
        perf_measure_event,
        perf_measure_month,
        ref_age_grp,
        ref_perf_measure,
        yyyymm_add_py,
    )

    spark = member_month.sparkSession
    denom = build_enroll_denom_full(
        member_month,
        ym_min if ym_min is not None else yyyymm_add_py(end_month, -23),
        end_month,
        id_col=id_col,
        already_dense=already_dense,
    )
    ref, age = ref_perf_measure(spark), ref_age_grp(spark)

    out = None
    for measure_name, frames in components.items():
        if not isinstance(frames, (list, tuple)):
            frames = (frames,)
        staging, grain = build_perf_staging(
            measure_name, *frames, id_col=id_col
        )
        for short in _FINAL_SLICES[measure_name]:
            if short == "CAP":
                rows = perf_measure_cap(
                    staging, denom, ref, age, end_month, id_col=id_col
                )
            elif grain == "event":
                rows = perf_measure_event(
                    staging, denom, ref, age, end_month, short, id_col=id_col
                )
            else:
                rows = perf_measure_month(
                    staging, denom, ref, age, end_month, short, id_col=id_col
                )
            out = rows if out is None else out.unionByName(rows)
    return out
