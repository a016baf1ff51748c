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


# ---------------------------------------------------------------------------
# APCD claim-side analytic tables
# (reference: ``load_stage.apcd_claim_header.R:1-1251``)
# ---------------------------------------------------------------------------

# OnPoint service-type flags carried through when present (``:38-63``)
SERVICE_FLAGS = [
    "cardiac_imaging_and_tests_flag", "chiropractic_flag", "consultations_flag",
    "covid19_flag", "dialysis_flag", "durable_medical_equip_flag",
    "echography_flag", "endoscopic_procedure_flag",
    "evaluation_and_management_flag", "health_home_utilization_flag",
    "hospice_utilization_flag", "imaging_advanced_flag",
    "imaging_standard_flag", "inpatient_acute_flag",
    "inpatient_nonacute_flag", "lab_and_pathology_flag",
    "oncology_and_chemotherapy_flag", "physical_therapy_rehab_flag",
    "preventive_screenings_flag", "preventive_vaccinations_flag",
    "preventive_visits_flag", "psychiatric_visits_flag",
    "surgery_and_anesthesia_flag", "telehealth_flag",
]

# primary + secondary claim statuses (``:126,451``)
PRIMARY_SECONDARY_STATUS = [-1, -2, 1, 5, 2, 6]

# inpatient / swing-bed / free-standing-ambulatory settings excluded
# from the Oregon primary-care definition (``:452``)
PC_EXCLUDED_SETTINGS = ["1.1.1", "1.1.14", "1.1.2", "2.3.8", "2.3.2", "1.2.8"]


def _null_if_sentinel(col, sentinels=("-1", "-2")):
    c = F.col(col).cast("string")
    return F.when(c.isin(*sentinels), F.lit(None)).otherwise(c)


def build_apcd_claim_header(
    header: DataFrame,
    line: DataFrame,
    icdcm: DataFrame,
    procedure: DataFrame,
    ref_claim_status: DataFrame | None = None,
    ref_xwalk: DataFrame | None = None,
    ref_icdcm: DataFrame | None = None,
    ref_pc_oregon: DataFrame | None = None,
    provider: DataFrame | None = None,
    ref_provider_npi: DataFrame | None = None,
    ref_provider_master: DataFrame | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """APCD claim_header analytic table
    (``load_stage.apcd_claim_header.R:74-1105``).

    Spark-first plan: every per-claim concept (line rollup, ED px
    flag, primary dx, PC flags, BH flags) is one groupBy on
    claim_header_id, so all intermediate frames share the same shuffle
    key and the final assembly is a chain of co-partitioned left
    joins; reference tables broadcast. Utilization event ids
    (pc_visit_id / inpatient_id / ed_perform_id / ed_pophealth_id)
    use the two-phase global dense ranking, not the reference's
    single-partition DENSE_RANK (``:536-560,1012-1018``).
    """
    # STEP 1: header projection; drop denied/orphaned claims (``:148``)
    hdr = header.filter(
        (F.col("denied_header_flag") == "N")
        & (F.col("orphaned_header_flag") == "N")
    )
    flags = [c for c in SERVICE_FLAGS if c in header.columns]
    # claim_type_apcd_id concatenation is NULL-propagating like the
    # reference's '+' (``:111-115``): a -1/-2 place-of-setting nulls
    # the whole concatenated id
    claim_type_apcd_id = F.concat(
        F.col("claim_type_id").cast("string"), F.lit("."),
        F.col("type_of_setting_id").cast("string"), F.lit("."),
        _null_if_sentinel("place_of_setting_id"),
    )
    hdr = hdr.select(
        F.col("internal_member_id").alias("id_apcd"),
        F.col("medical_claim_header_id").alias("claim_header_id"),
        F.when(F.col("product_code_id").isin(-1, -2), None)
        .otherwise(F.col("product_code_id")).alias("product_code_id"),
        F.col("first_service_dt").alias("first_service_date"),
        F.col("last_service_dt").alias("last_service_date"),
        F.col("first_paid_dt").alias("first_paid_date"),
        F.col("last_paid_dt").alias("last_paid_date"),
        F.col("charge_amt"),
        _null_if_sentinel("type_of_bill_code").alias("type_of_bill_code"),
        claim_type_apcd_id.alias("claim_type_apcd_id"),
        (F.col("emergency_room_flag") == "Y").cast("int").alias("ed_perform_temp"),
        F.col("header_status"),
        F.col("claim_type_id").cast("string").alias("_ct"),
        F.col("type_of_setting_id").cast("string").alias("_ts"),
        _null_if_sentinel("place_of_setting_id").alias("_ps"),
        *flags,
    )
    if ref_claim_status is not None:
        hdr = hdr.join(
            F.broadcast(
                ref_claim_status.select(
                    F.col("claim_status_code").alias("header_status"),
                    "claim_status_id",
                )
            ),
            "header_status",
            "left",
        )
    else:
        hdr = hdr.withColumn("claim_status_id", F.lit(None).cast("long"))
    hdr = hdr.drop("header_status")

    # line rollup: discharge date + ED place/revenue flags (``:134-140``)
    line_agg = line.groupBy("claim_header_id").agg(
        F.max("discharge_date").alias("discharge_date"),
        F.max((F.col("place_of_service_code") == "23").cast("int")).alias("ed_pos_temp"),
        F.max(
            (
                F.col("revenue_code").rlike("^045[01269]$")
                | (F.col("revenue_code") == "0981")
            ).cast("int")
        ).alias("ed_revenue_code_temp"),
    )

    # STEP 2: ED procedure-code flag (``:169-183``)
    ed_px = procedure.groupBy("claim_header_id").agg(
        F.max(
            (
                F.col("procedure_code").rlike("^9928[1-5]$")
                | (F.col("procedure_code") == "99291")
            ).cast("int")
        ).alias("ed_procedure_code_temp")
    )

    # STEP 4: primary diagnosis — reference takes independent MINs when
    # >1 primary per header (``:283-289``)
    icd1 = icdcm.filter(F.col("icdcm_number") == "01").groupBy("claim_header_id").agg(
        F.min("icdcm_norm").alias("primary_diagnosis"),
        F.min("icdcm_version").alias("icdcm_version"),
    )

    # STEP 3: Oregon primary-care visit flags (``:188-258``)
    pc = None
    if ref_pc_oregon is not None:
        pc_px_codes = ref_pc_oregon.filter(
            F.col("code_system").isin("cpt", "hcpcs")
        ).select(F.col("code").alias("procedure_code"))
        pc_px = (
            procedure.join(F.broadcast(pc_px_codes), "procedure_code")
            .select("claim_header_id").distinct()
            .withColumn("pc_procedure_temp", F.lit(1))
        )
        pc_dx_codes = ref_pc_oregon.filter(
            F.col("code_system") == "icd10cm"
        ).select(F.col("code").alias("icdcm_norm"))
        pc_dx = (
            icdcm.filter(F.col("icdcm_version") == 10)
            .join(F.broadcast(pc_dx_codes), "icdcm_norm")
            .select("claim_header_id").distinct()
            .withColumn("pc_zcode_temp", F.lit(1))
        )
        pc = pc_px.join(pc_dx, "claim_header_id", "full")
        if (
            provider is not None
            and ref_provider_npi is not None
            and ref_provider_master is not None
        ):
            tax_codes = ref_pc_oregon.filter(
                F.col("code_system") == "provider_taxonomy"
            ).select(F.col("code").alias("_tax"))
            pc_tax = (
                provider.filter(F.col("provider_type").isin("rendering", "attending"))
                .join(F.broadcast(ref_provider_npi), "provider_id_apcd")
                .join(F.broadcast(ref_provider_master), "npi")
                .join(
                    F.broadcast(tax_codes),
                    (F.col("primary_taxonomy") == F.col("_tax"))
                    | (F.col("secondary_taxonomy") == F.col("_tax")),
                )
                .select("claim_header_id").distinct()
                .withColumn("pc_taxonomy_temp", F.lit(1))
            )
            pc = pc.join(pc_tax, "claim_header_id", "full")
        else:
            pc = pc.withColumn("pc_taxonomy_temp", F.lit(None).cast("int"))

    # STEP 5/6: assemble + kc claim-type crosswalk + CCS columns
    out = (
        hdr.join(line_agg, "claim_header_id", "left")
        .join(ed_px, "claim_header_id", "left")
        .join(icd1, "claim_header_id", "left")
    )
    if pc is not None:
        out = out.join(pc, "claim_header_id", "left")
    else:
        out = (
            out.withColumn("pc_procedure_temp", F.lit(None).cast("int"))
            .withColumn("pc_zcode_temp", F.lit(None).cast("int"))
            .withColumn("pc_taxonomy_temp", F.lit(None).cast("int"))
        )

    if ref_xwalk is not None:
        xw = ref_xwalk
        if "source_desc" in xw.columns:
            xw = xw.filter(F.col("source_desc") == "apcd")
        out = out.join(
            F.broadcast(
                xw.select(
                    F.col("source_clm_type_id").cast("string").alias(
                        "claim_type_apcd_id"
                    ),
                    F.col("kc_clm_type_id").alias("claim_type_id"),
                )
            ),
            "claim_type_apcd_id",
            "left",
        )
    else:
        out = out.withColumn("claim_type_id", F.lit(None).cast("int"))

    if ref_icdcm is not None:
        ccs_cols = [
            c for c in (
                "ccs_superlevel_desc", "ccs_broad_desc", "ccs_broad_code",
                "ccs_midlevel_desc", "ccs_detail_desc", "ccs_detail_code",
            ) if c in ref_icdcm.columns
        ]
        if ccs_cols:
            out = out.join(
                F.broadcast(
                    ref_icdcm.select(
                        F.col("icdcm").alias("primary_diagnosis"),
                        F.col("icdcm_version"),
                        *ccs_cols,
                    )
                ),
                ["primary_diagnosis", "icdcm_version"],
                "left",
            )

    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    kc = F.col("claim_type_id")
    out = (
        out.withColumn(
            "ed_perform",
            ((F.col("ed_perform_temp") == 1) & (kc == 4)).cast("int"),
        )
        # Yale ED definition (``:432-444``)
        .withColumn(
            "ed_yale_carrier",
            (
                (kc == 5)
                & (
                    ((z("ed_procedure_code_temp") == 1) & (z("ed_pos_temp") == 1))
                    | (z("ed_revenue_code_temp") == 1)
                )
            ).cast("int"),
        )
        .withColumn(
            "ed_yale_opt",
            (
                (kc == 4)
                & (
                    (z("ed_revenue_code_temp") == 1)
                    | (z("ed_pos_temp") == 1)
                    | (z("ed_procedure_code_temp") == 1)
                )
            ).cast("int"),
        )
        .withColumn(
            "ed_yale_ipt",
            (
                (kc == 1)
                & (
                    (z("ed_revenue_code_temp") == 1)
                    | (z("ed_pos_temp") == 1)
                    | (z("ed_procedure_code_temp") == 1)
                )
            ).cast("int"),
        )
        # inpatient stay (``:125-129``)
        .withColumn(
            "inpatient",
            (
                (F.col("_ct") == "1") & (F.col("_ts") == "1")
                & (F.col("_ps") == "1")
                & F.col("claim_status_id").isin(*PRIMARY_SECONDARY_STATUS)
                & F.col("discharge_date").isNotNull()
            ).cast("int"),
        )
        # Oregon primary-care visit (``:448-455``)
        .withColumn(
            "pc_visit",
            (
                ((z("pc_procedure_temp") == 1) | (z("pc_zcode_temp") == 1))
                & (z("pc_taxonomy_temp") == 1)
                & ~F.coalesce(
                    F.col("claim_type_apcd_id").isin(*PC_EXCLUDED_SETTINGS),
                    F.lit(False),
                )
                & F.col("claim_status_id").isin(*PRIMARY_SECONDARY_STATUS)
            ).cast("int"),
        )
        .drop("_ct", "_ts", "_ps")
    )

    # STEP 8: BH flags (``:586-600``)
    if ref_icdcm is not None and "mh_any" in ref_icdcm.columns:
        bh_ref = ref_icdcm.select(
            F.col("icdcm").alias("icdcm_norm"), "icdcm_version",
            "mh_any", "sud_any",
        )
        bh = (
            icdcm.join(F.broadcast(bh_ref), ["icdcm_norm", "icdcm_version"])
            .groupBy("claim_header_id")
            .agg(
                F.max(
                    ((F.col("icdcm_number") == "01") & (F.col("mh_any") == 1)).cast("int")
                ).alias("mh_primary"),
                F.max(F.col("mh_any")).alias("mh_any"),
                F.max(
                    ((F.col("icdcm_number") == "01") & (F.col("sud_any") == 1)).cast("int")
                ).alias("sud_primary"),
                F.max(F.col("sud_any")).alias("sud_any"),
            )
        )
        out = out.join(bh, "claim_header_id", "left")
        for c in ("mh_primary", "mh_any", "sud_primary", "sud_any"):
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))

    # STEP 9: injury nature/cause surveillance columns
    if ref_icdcm is not None and "intent" in ref_icdcm.columns:
        out = out.join(
            apcd_injury_flags(icdcm, ref_icdcm), "claim_header_id", "left"
        )
        for c in ("injury_nature_narrow", "injury_nature_broad"):
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))

    # STEP 7 + 10: utilization event ids via scalable dense ranking.
    # The assembled frame feeds FOUR dense-id subqueries plus the final
    # result; persist it once so the join/window upstream is computed
    # once, not per event-id (callers can pass cache_registry and
    # unpersist after materializing — see dense_id.py's contract).
    from claims_data_spark.operators.dense_id import dense_global_id
    from claims_data_spark.operators.episodes import within_person_episodes

    out = out.persist()
    if cache_registry is not None:
        cache_registry.append(out)

    def _event_id(flag_col: str, out_col: str) -> DataFrame:
        sub = out.filter(F.col(flag_col) == 1).select(
            "claim_header_id", "id_apcd", "first_service_date"
        )
        return dense_global_id(
            sub, ["id_apcd", "first_service_date"], out_col=out_col,
            cache_registry=cache_registry,
        ).select("claim_header_id", out_col)

    out = (
        out.join(_event_id("pc_visit", "pc_visit_id"), "claim_header_id", "left")
        .join(_event_id("inpatient", "inpatient_id"), "claim_header_id", "left")
        .join(_event_id("ed_perform", "ed_perform_id"), "claim_header_id", "left")
    )

    # ED population health (Yale) 1-day episode clustering (``:984-1018``)
    ed = out.filter(
        (F.col("ed_yale_carrier") == 1)
        | (F.col("ed_yale_opt") == 1)
        | (F.col("ed_yale_ipt") == 1)
    ).select("claim_header_id", "id_apcd", "first_service_date")
    eps = within_person_episodes(
        ed, ["id_apcd"], "first_service_date", merge_gap_days=1
    )
    pophealth = dense_global_id(
        eps, ["id_apcd", "within_person_episode_id"],
        out_col="ed_pophealth_id", cache_registry=cache_registry,
    ).select("claim_header_id", "ed_pophealth_id")
    out = out.join(pophealth, "claim_header_id", "left")
    return out


def _injury_nature_match(code: F.Column, version: F.Column) -> F.Column:
    """CDC injury-hospitalization surveillance inclusion predicate
    (``load_stage.apcd_claim_header.R:633-668``; 2019 NHSR report).

    ICD-9-CM: 800-9949 range plus 9955x and 99580-99585, excluding
    9093x/9095x. ICD-10-CM: S-codes and the T/O9A/M97 ranges, with
    initial-encounter 7th character A/B/C or absent. Pure string
    predicates -> whole-stage codegen, evaluated on the DISTINCT code
    dimension, never the fact table.
    """
    c7 = F.substring(code, 7, 1)
    c6 = F.substring(code, 6, 1)
    c5 = F.substring(code, 5, 1)
    init_enc = c7.isin("A", "B", "C", "")
    v9 = (version == 9) & (
        (
            code.substr(1, 3).between("800", "994")
            | code.rlike("^9955")
            | code.between("99580", "99585")
        )
        & ~code.rlike("^9093")
        & ~code.rlike("^9095")
    )
    v10 = (version == 10) & init_enc & (
        code.rlike("^S")
        | (code.between("T07", "T3499XS") & code.rlike("^T(0[7-9]|[12][0-9]|3[0-4])"))
        | (
            code.between("T36", "T50996S")
            & code.rlike("^T(3[6-9]|4[0-9]|50)")
            & c6.isin("1", "2", "3", "4")
        )
        | (code.rlike("^T3[679]9") & c5.isin("1", "2", "3", "4"))
        | (code.rlike("^T4(14|27)") & c5.isin("1", "2", "3", "4"))
        | (code.rlike("^T4[3579]9") & c5.isin("1", "2", "3", "4"))
        | (code.between("T51", "T6594XS") & code.rlike("^T(5[1-9]|6[0-5])"))
        | (code.between("T66", "T7692XS") & code.rlike("^T(6[6-9]|7[0-6])"))
        | code.rlike("^T79")
        | (code.between("O9A2", "O9A53") & code.rlike("^O9A[2-5]"))
        | code.rlike("^T8404")
        | code.rlike("^M97")
    )
    return v9 | v10


def apcd_injury_flags(icdcm: DataFrame, ref_icdcm: DataFrame) -> DataFrame:
    """Per-claim injury columns (``:604-952``): narrow/broad nature
    flags, rank-1 nature-of-injury code, and the rank-1 external-cause
    code with intent/mechanism via the LIKE-prefix join against the
    e-code reference (``:703-768``)."""
    from pyspark.sql import Window

    from claims_data_spark.plans.prefix_join import prefix_join

    nature = icdcm.filter(
        _injury_nature_match(F.col("icdcm_norm"), F.col("icdcm_version"))
    ).select("claim_header_id", "icdcm_norm", "icdcm_version", "icdcm_number")

    w = Window.partitionBy("claim_header_id").orderBy("icdcm_number")
    nature_ranked = nature.withColumn("_rn", F.row_number().over(w))
    per_claim = nature_ranked.groupBy("claim_header_id").agg(
        F.max((F.col("icdcm_number") == "01").cast("int")).alias(
            "injury_nature_narrow"
        ),
        F.lit(1).alias("injury_nature_broad"),
        F.min(F.when(F.col("_rn") == 1, F.col("icdcm_norm"))).alias(
            "injury_nature_icdcm"
        ),
    )

    ecode_ref = ref_icdcm.filter(F.col("intent").isNotNull()).select(
        F.col("icdcm").alias("pfx"), "intent", "mechanism"
    )
    cause = prefix_join(
        nature.select("claim_header_id", "icdcm_number", "icdcm_norm"),
        ecode_ref,
        fact_code="icdcm_norm",
        ref_prefix="pfx",
    )
    cause_1 = (
        cause.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "claim_header_id",
            F.col("icdcm_norm").alias("injury_ecode"),
            F.col("intent").alias("injury_intent"),
            F.col("mechanism").alias("injury_mechanism"),
        )
    )
    return per_claim.join(cause_1, "claim_header_id", "left")


def qa_apcd_claim_header(
    stage: DataFrame,
    raw_header: DataFrame,
    elig_demo: DataFrame | None = None,
    elig_timevar: DataFrame | None = None,
) -> list:
    """The reference's table-level QA invariant suite
    (``load_stage.apcd_claim_header.R:1112-1251`` — SURVEY §5 calls
    these the primary operator-correctness oracles), re-expressed so
    the row-local + event-id invariants run in ONE fused pass:

    - claim_header_id distinct (res1/res2)
    - stage rowcount == raw non-denied/orphaned rowcount (res3)
    - members exist in elig_demo / elig_timevar (res4/res5)
    - no null claim_type_id / claim_type_apcd_id (res6)
    - inpatient stays all carry a discharge date (res7)
    - each event id maps to one person (res8a-d)
    - ed_pophealth_id is dense (res9a/b)
    - ed_perform implies ed_pophealth (res10)
    - within an ed_pophealth episode, consecutive visits are <= 1 day
      apart (res11)
    """
    from pyspark.sql import Window

    from claims_data_spark.qa import check_referential, fused_table_qa

    w = Window.partitionBy("id_apcd", "ed_pophealth_id").orderBy(
        "first_service_date"
    )
    work = stage.withColumn(
        "_lag_fsd",
        F.when(
            F.col("ed_pophealth_id").isNotNull(),
            F.lag("first_service_date").over(w),
        ),
    )
    results = fused_table_qa(
        work,
        unique_keys=["claim_header_id"],
        event_id="ed_pophealth_id",
        person_id="id_apcd",
        extra_flags={
            "claim-type-matched": F.col("claim_type_id").isNull()
            | F.col("claim_type_apcd_id").isNull(),
            "ipt-has-discharge": F.col("inpatient_id").isNotNull()
            & F.col("discharge_date").isNull(),
            "ed-perform-implies-pophealth": F.col("ed_perform_id").isNotNull()
            & F.col("ed_pophealth_id").isNull(),
            "ed-pophealth-1day-window": F.col("_lag_fsd").isNotNull()
            & (
                F.abs(F.datediff("first_service_date", "_lag_fsd")) > 1
            ),
        },
    )
    # event-id one-person invariants for the other three id families
    for ev in ("pc_visit_id", "inpatient_id", "ed_perform_id"):
        results += [
            r for r in fused_table_qa(
                stage, event_id=ev, person_id="id_apcd"
            ) if r[0].startswith("one-person")
        ]

    n_stage = stage.count()
    n_raw = raw_header.filter(
        (F.col("denied_header_flag") == "N")
        & (F.col("orphaned_header_flag") == "N")
    ).count()
    results.append(
        ("stage-matches-raw-count", n_stage == n_raw,
         f"stage={n_stage} raw={n_raw}")
    )
    if elig_demo is not None:
        results.append(
            check_referential(
                stage.select("id_apcd"), elig_demo.select("id_apcd"),
                ["id_apcd"], name="members-in-elig-demo",
            )
        )
    if elig_timevar is not None:
        results.append(
            check_referential(
                stage.select("id_apcd"), elig_timevar.select("id_apcd"),
                ["id_apcd"], name="members-in-elig-timevar",
            )
        )
    return results


# ---------------------------------------------------------------------------
# APCD claim children (load_stage.apcd_claim_line.R,
# load_stage.apcd_claim_icdcm_header.R, load_stage.apcd_claim_procedure.R,
# load_stage.apcd_claim_provider.R)
# ---------------------------------------------------------------------------

def _live_claim_ids(header: DataFrame) -> DataFrame:
    """Non-denied, non-orphaned claim ids — every child table excludes
    the same headers the analytic header drops."""
    return header.filter(
        (F.col("denied_header_flag") == "N")
        & (F.col("orphaned_header_flag") == "N")
    ).select(
        F.col("medical_claim_header_id").alias("claim_header_id")
    ).distinct()


def build_apcd_claim_line(line_raw: DataFrame, header: DataFrame) -> DataFrame:
    """Line-grain projection with the nonsensical-discharge-date
    correction (``load_stage.apcd_claim_line.R:30-35``): a discharge
    before the admission (or, absent an admission, before the first
    service) falls back to the last service date."""
    fixed_discharge = (
        F.when(
            F.col("discharge_dt") < F.col("admission_dt"),
            F.col("last_service_dt"),
        )
        .when(
            F.col("admission_dt").isNull()
            & (F.col("discharge_dt") < F.col("first_service_dt")),
            F.col("last_service_dt"),
        )
        .otherwise(F.col("discharge_dt"))
    )
    return (
        line_raw.join(_live_claim_ids(header), "claim_header_id", "left_semi")
        .select(
            "id_apcd", "claim_header_id", "claim_line_id", "line_counter",
            F.col("first_service_dt").alias("first_service_date"),
            F.col("last_service_dt").alias("last_service_date"),
            "charge_amt", "revenue_code", "place_of_service_code",
            F.col("admission_dt").alias("admission_date"),
            fixed_discharge.alias("discharge_date"),
            "discharge_status_code", "admission_point_of_origin_code",
            "admission_type",
        )
        .distinct()
    )


def build_apcd_claim_icdcm_header(
    icdcm_raw: DataFrame, header: DataFrame
) -> DataFrame:
    """Diagnosis-grain projection (``load_stage.apcd_claim_icdcm_header.R``)."""
    return icdcm_raw.join(
        _live_claim_ids(header), "claim_header_id", "left_semi"
    ).select(
        "id_apcd", "claim_header_id",
        F.col("first_service_dt").alias("first_service_date"),
        F.col("last_service_dt").alias("last_service_date"),
        "icdcm_raw", "icdcm_norm", "icdcm_version", "icdcm_number",
    )


def build_apcd_claim_procedure(
    procedure_raw: DataFrame, header: DataFrame
) -> DataFrame:
    """Procedure-grain projection (``load_stage.apcd_claim_procedure.R``)."""
    return procedure_raw.join(
        _live_claim_ids(header), "claim_header_id", "left_semi"
    ).select(
        "id_apcd", "claim_header_id",
        F.col("first_service_dt").alias("first_service_date"),
        F.col("last_service_dt").alias("last_service_date"),
        "procedure_code", "modifier_code",
    )


def build_apcd_claim_provider(provider_raw: DataFrame) -> DataFrame:
    """Provider-role projection (``load_stage.apcd_claim_provider.R`` —
    no denied-claim filter in the reference)."""
    return provider_raw.select(
        "id_apcd", "claim_header_id",
        F.col("first_service_dt").alias("first_service_date"),
        F.col("last_service_dt").alias("last_service_date"),
        "provider_id_apcd", "provider_id_raw_apcd", "provider_type",
    )


def qa_apcd_child(
    child: DataFrame,
    elig_demo: DataFrame | None = None,
    elig_timevar: DataFrame | None = None,
    not_null_col: str | None = None,
) -> list:
    """The children's shared QA: members referenced in elig tables;
    key payload column never null (one fused pass for the row-local
    part)."""
    from claims_data_spark.qa import check_referential, fused_table_qa

    results = []
    if not_null_col is not None:
        results += fused_table_qa(
            child,
            extra_flags={f"{not_null_col}-not-null": F.col(not_null_col).isNull()},
        )
    if elig_demo is not None:
        results.append(
            check_referential(
                child.select("id_apcd"), elig_demo.select("id_apcd"),
                ["id_apcd"], name="members-in-elig-demo",
            )
        )
    if elig_timevar is not None:
        results.append(
            check_referential(
                child.select("id_apcd"), elig_timevar.select("id_apcd"),
                ["id_apcd"], name="members-in-elig-timevar",
            )
        )
    return results
