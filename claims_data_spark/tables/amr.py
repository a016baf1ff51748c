"""Asthma Medication Ratio (HEDIS AMR) measure
(reference: ``load_stage.mcaid_perf_measure_amr.R:1-995``).

One measurement-year slice: the denominator is members 5-64 with
persistent asthma (inclusion criteria met in the measurement year AND
the year prior), 11+ full-benefit non-dual months, at least one
asthma medication event, and none of the COPD-family exclusion
diagnoses; the numerator is a controller-to-total medication-unit
ratio ≥ 0.5.

Spark-first shape: every per-person criterion is one aggregation over
the window-filtered claim/pharm subsets (broadcast-joined against the
HEDIS code lists), combined with person-keyed outer joins — the
reference loops per-year INSERT batches into temp tables; here each
"temp table" is a lazy frame and the year loop is the caller's
end-month parameter.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# value sets whose presence at ANY time before the end month excludes
# a member (amr.R:812-860)
AMR_EXCLUSION_SETS = [
    "Emphysema", "Other Emphysema", "COPD",
    "Obstructive Chronic Bronchitis",
    "Chronic Respiratory Conditions Due To Fumes/Vapors",
    "Cystic Fibrosis", "Acute Respiratory Failure",
]

_MED_LISTS = ("Asthma Controller Medications", "Asthma Reliever Medications")


def _year_window(end_month: str):
    end = _dt.date.fromisoformat(end_month)
    start = _dt.date(end.year - 1, end.month, end.day) + _dt.timedelta(days=1)
    return F.lit(str(start)).cast("date"), F.lit(str(end)).cast("date")


def _dx_version(code_system):
    """``CASE WHEN SUBSTRING(code_system, 4, 1) = '9' THEN 9 ELSE 10``
    (amr.R:137) — 'ICD9CM' vs 'ICD10CM'."""
    return F.when(F.substring(code_system, 4, 1) == "9", 9).otherwise(10)


def _asthma_dx(header, icdcm, hedis_value_sets, id_col):
    """Claims carrying an Asthma value-set diagnosis (amr.R:127-145)."""
    codes = hedis_value_sets.filter(
        F.col("value_set_name") == "Asthma"
    ).select(
        F.col("code").alias("icdcm_norm"),
        _dx_version(F.col("code_system")).alias("icdcm_version"),
    ).distinct()
    return (
        header.select(id_col, "claim_header_id", "first_service_date")
        .join(
            icdcm.select(
                id_col, "claim_header_id", "icdcm_norm",
                "icdcm_version", "icdcm_number",
            ),
            [id_col, "claim_header_id"],
        )
        .join(F.broadcast(codes), ["icdcm_norm", "icdcm_version"])
        .select(id_col, "claim_header_id", "first_service_date", "icdcm_number")
    )


def _med_events(pharm, med_list, start, end, id_col):
    """Per-person dispensing-event count + the leukotriene/antibody
    dx-requirement tally (amr.R:284-545).

    Event counting differs by route: oral = FLOOR(days/30) with a
    1-event floor, per generic product per fill date; inhalation = one
    event per distinct generic per fill date; injection = one event
    per distinct NDC per fill date."""
    meds = med_list.filter(
        F.col("medication_list_name").isin(*_MED_LISTS)
        & (F.col("code_system") == "NDC")
    ).select(
        F.col("code").alias("ndc"), "medication_list_name",
        "generic_product_name", "route", "drug_class",
    ).distinct()
    fills = (
        pharm.filter(F.col("rx_fill_date").between(start, end))
        .select(id_col, "ndc", "rx_fill_date", "rx_days_supply")
        .join(F.broadcast(meds), "ndc")
    )
    oral = (
        fills.filter(F.col("route") == "oral")
        .groupBy(
            id_col, "rx_fill_date", "generic_product_name",
            (F.col("drug_class") == "Leukotriene modifiers").alias("_lk"),
        )
        .agg(F.sum("rx_days_supply").alias("_days"))
        .select(
            id_col, "rx_fill_date",
            F.when(F.col("_days") <= 30, 1)
            .otherwise(F.floor(F.col("_days") / 30))
            .alias("_events"),
            F.col("_lk").alias("_needs_dx"),
        )
    )
    inhaler = (
        fills.filter(F.col("route") == "inhalation")
        .groupBy(id_col, "rx_fill_date")
        .agg(F.countDistinct("generic_product_name").alias("_events"))
        .select(id_col, "rx_fill_date", "_events", F.lit(False).alias("_needs_dx"))
    )
    inject = (
        fills.filter(F.col("route").isin("intravenous", "subcutaneous"))
        .groupBy(
            id_col, "rx_fill_date",
            (F.col("drug_class") == "Antibody inhibitor").alias("_antib"),
        )
        .agg(F.countDistinct("ndc").alias("_events"))
        .select(id_col, "rx_fill_date", "_events", F.col("_antib").alias("_needs_dx"))
    )
    long = oral.unionByName(inhaler).unionByName(inject)
    # dx_needed = EVERY event is a leukotriene-only or antibody-only
    # dispensing (amr.R:458-459: SUM(events) == SUM(dx_needed_cnt))
    return long.groupBy(id_col).agg(
        F.sum("_events").alias("events_rx"),
        (
            F.sum("_events")
            == F.sum(F.when(F.col("_needs_dx"), F.col("_events")).otherwise(0))
        ).cast("int").alias("dx_needed"),
    )


def _asthma_criteria(
    header, icdcm, procedure, pharm, hedis_value_sets, hedis_med_list,
    end_month, id_col,
):
    """Per-person inclusion flags for ONE year ending ``end_month``
    (the ``##asthma_any`` stage, amr.R:606-670)."""
    start, end = _year_window(end_month)
    dx = _asthma_dx(header, icdcm, hedis_value_sets, id_col)

    win_claims = header.filter(
        F.col("first_service_date").between(start, end)
    )
    ed_inpat = (
        win_claims.filter((F.col("ed_perform") == 1) | (F.col("inpatient") == 1))
        .join(
            dx.filter(F.col("icdcm_number") == "01")
            .select(id_col, "claim_header_id").distinct(),
            [id_col, "claim_header_id"],
        )
        .groupBy(id_col)
        .agg(
            F.sum("ed_perform").alias("ed_cnt"),
            F.sum("inpatient").alias("inpat_cnt"),
        )
    )
    outpat_codes = hedis_value_sets.filter(
        F.col("value_set_name") == "Outpatient"
    ).select(F.col("code").alias("procedure_code")).distinct()
    outpat = (
        win_claims.select(id_col, "claim_header_id", "first_service_date")
        .join(dx.select(id_col, "claim_header_id").distinct(),
              [id_col, "claim_header_id"])
        .join(procedure.select(id_col, "claim_header_id", "procedure_code"),
              [id_col, "claim_header_id"])
        .join(F.broadcast(outpat_codes), "procedure_code")
        .groupBy(id_col)
        .agg(F.countDistinct("first_service_date").alias("outpat_cnt"))
    )
    rx = _med_events(pharm, hedis_med_list, start, end, id_col)
    dx_made = (
        dx.filter(F.col("first_service_date").between(start, end))
        .select(id_col).distinct().withColumn("dx_made", F.lit(1))
    )

    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    combined = (
        ed_inpat.join(outpat, id_col, "full")
        .join(rx, id_col, "full")
        .join(dx_made, id_col, "left")
        .select(
            id_col,
            (z("ed_cnt") > 0).cast("int").alias("ed_flag"),
            (z("inpat_cnt") > 0).cast("int").alias("inpat_flag"),
            # the reference's outpatient arm (amr.R:622): any asthma
            # outpatient visit plus 3+ dispensing events
            ((z("outpat_cnt") > 0) & (z("events_rx") > 2)).cast("int")
            .alias("outpat_flag"),
            (
                (z("events_rx") >= 4)
                & ((z("dx_needed") == 0) | (z("dx_made") == 1))
            ).cast("int").alias("rx_flag"),
            (z("events_rx") > 0).cast("int").alias("rx_any"),
        )
        .filter(
            (F.col("ed_flag") == 1) | (F.col("inpat_flag") == 1)
            | (F.col("outpat_flag") == 1) | (F.col("rx_flag") == 1)
        )
    )
    return combined


def _med_units(pharm, med_list, start, end, id_col):
    """Controller / reliever medication units (amr.R:878-921): oral =
    CEILING(days/30) with a 1-unit floor, injection =
    CEILING(quantity / package size), inhalation = 1 per fill row."""
    meds = med_list.filter(
        F.col("medication_list_name").isin(*_MED_LISTS)
        & (F.col("code_system") == "NDC")
    ).select(
        F.col("code").alias("ndc"), "medication_list_name",
        "generic_product_name", "route", "package_size",
    ).distinct()
    fills = (
        pharm.filter(F.col("rx_fill_date").between(start, end))
        .select(id_col, "ndc", "rx_fill_date", "rx_days_supply", "rx_quantity")
        .join(F.broadcast(meds), "ndc")
    )
    per_group = fills.groupBy(
        id_col, "medication_list_name", "rx_fill_date", "route",
        "generic_product_name", "rx_quantity", "package_size",
    ).agg(F.sum("rx_days_supply").alias("_days"))
    units = per_group.select(
        id_col,
        "medication_list_name",
        F.when(
            (F.col("route") == "oral") & (F.col("_days") <= 30), 1
        )
        .when(F.col("route") == "oral", F.ceil(F.col("_days") / 30))
        .when(
            F.col("route").isin("intravenous", "subcutaneous"),
            F.ceil(F.col("rx_quantity") / F.col("package_size")),
        )
        .when(F.col("route") == "inhalation", 1)
        .alias("med_units"),
    )
    return units.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("medication_list_name") == "Asthma Controller Medications",
                F.col("med_units"),
            )
        ).alias("meds_control"),
        F.sum(
            F.when(
                F.col("medication_list_name") == "Asthma Reliever Medications",
                F.col("med_units"),
            )
        ).alias("meds_relief"),
    )


def amr_measure(
    enroll_denom: DataFrame,
    header: DataFrame,
    icdcm: DataFrame,
    procedure: DataFrame,
    pharm: DataFrame,
    hedis_value_sets: DataFrame,
    hedis_med_list: DataFrame,
    end_month: str,
    age_grp: DataFrame | None = None,
    require_persistent: bool = True,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """One AMR measurement-year slice ending at ``end_month`` (a
    'YYYY-MM-DD' month-end date).

    ``require_persistent=True`` is the full HEDIS measure (criteria in
    the measurement year AND the prior year; measure_id 19);
    ``False`` is the reference's relaxed one-year variant
    (measure_id 20, amr.R:960-995).

    Documented divergence: the T-SQL ``meds_control / (meds_control +
    meds_relief)`` integer-divides when both unit sums are INT
    columns; we compute the true ratio, which is the HEDIS intent."""
    from claims_data_spark.tables.perf_registry import yyyymm_add_py

    end = _dt.date.fromisoformat(end_month)
    end_ym = end.year * 100 + end.month
    beg_ym_total = yyyymm_add_py(end_ym, -11)
    prior_end = _dt.date(end.year - 1, end.month, end.day)

    pop = enroll_denom.filter(
        (F.col("year_month") == end_ym)
        & (F.col("full_benefit_t_12_m") >= 11)
        & (F.col("dual_t_12_m") == 0)
        & F.col("end_month_age").between(5, 64)
    ).select(id_col, "end_month_age")

    current = _asthma_criteria(
        header, icdcm, procedure, pharm, hedis_value_sets, hedis_med_list,
        end_month, id_col,
    )
    out = pop.join(current, id_col)
    if require_persistent:
        prior = _asthma_criteria(
            header, icdcm, procedure, pharm, hedis_value_sets, hedis_med_list,
            str(prior_end), id_col,
        ).select(id_col)
        out = out.join(prior, id_col, "left_semi")

    # exclusions: any COPD-family dx at ANY time up to the end month
    excl_codes = hedis_value_sets.filter(
        F.col("value_set_name").isin(*AMR_EXCLUSION_SETS)
    ).select(
        F.col("code").alias("icdcm_norm"),
        _dx_version(F.col("code_system")).alias("icdcm_version"),
    ).distinct()
    excluded = (
        header.select(id_col, "claim_header_id", "first_service_date")
        .filter(F.col("first_service_date") <= F.lit(end_month).cast("date"))
        .join(icdcm.select(id_col, "claim_header_id", "icdcm_norm",
                           "icdcm_version"),
              [id_col, "claim_header_id"])
        .join(F.broadcast(excl_codes), ["icdcm_norm", "icdcm_version"])
        .select(id_col).distinct()
    )
    out = out.filter(F.col("rx_any") == 1).join(excluded, id_col, "left_anti")

    start, end_lit = _year_window(end_month)
    units = _med_units(pharm, hedis_med_list, start, end_lit, id_col)
    ratio = F.coalesce(
        F.col("meds_control")
        / (F.col("meds_control") + F.coalesce("meds_relief", F.lit(0))),
        F.lit(0.0),
    )
    out = out.join(units, id_col, "left").withColumn("amr", ratio)

    measure_id = 19 if require_persistent else 20
    result = out.select(
        F.lit(beg_ym_total).alias("beg_year_month"),
        F.lit(end_ym).alias("end_year_month"),
        id_col,
        "end_month_age",
        F.lit(measure_id).alias("measure_id"),
        F.lit(1).cast("long").alias("denominator"),
        (F.coalesce(F.col("amr"), F.lit(0.0)) >= 0.5)
        .cast("long").alias("numerator"),
    )
    if age_grp is not None:
        result = result.join(
            F.broadcast(
                age_grp.select("age", F.col("age_grp_10").alias("age_grp"))
            ),
            result["end_month_age"] == F.col("age"),
            "left",
        ).drop("age")
    return result
