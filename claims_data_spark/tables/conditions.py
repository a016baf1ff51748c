"""Chronic-condition engines (reference: ``load_ccw.R`` — 31
config-driven CCW conditions, 20 min-2.5 h builds — and ``claim_bh.R``
— behavioral-health conditions incl. the OUD/MOUD as-of rule, ~3 h).

Both engines compile a per-condition plan from config rows:
diagnosis match (dx position rules) -> claim-type filter -> exclusion
anti-join -> 1-vs-2-claim qualification -> (id, condition) min/max
collapse. The per-condition plans share one scan of the dx table;
each is a filter + aggregate over the same shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import tsql_datediff_month
from claims_data_spark.operators.asof import join_to_running_min


def _dx_claims_for(
    icdcm: DataFrame,
    ref_icdcm: DataFrame,
    header: DataFrame,
    abbrev: str,
    dx_fields: str,
    claim_types: list[int] | None,
) -> DataFrame:
    """Claims whose diagnoses carry the condition flag, honoring the
    dx-position rule ('1', '1-2', 'any'; ``load_ccw.R:289-302``) and
    claim-type restriction."""
    flagged_codes = ref_icdcm.filter(F.col(abbrev) == 1).select(
        F.col("icdcm").alias("icdcm_norm"), F.col("icdcm_version")
    )
    dx = icdcm.join(F.broadcast(flagged_codes), ["icdcm_norm", "icdcm_version"])
    if dx_fields == "1":
        dx = dx.filter(F.col("icdcm_number") == "01")
    elif dx_fields == "1-2":
        dx = dx.filter(F.col("icdcm_number").isin("01", "02"))
    out = dx.select("id_mcaid", "claim_header_id", "first_service_date")
    if claim_types:
        hdr_types = header.select("claim_header_id", "claim_type_id")
        out = out.join(hdr_types, "claim_header_id").filter(
            F.col("claim_type_id").isin(*claim_types)
        ).drop("claim_type_id")
    return out


def build_claim_ccw(
    icdcm: DataFrame,
    header: DataFrame,
    ref_icdcm: DataFrame,
    ccw_lookup_rows: list[dict],
) -> DataFrame:
    """(id, condition, first_encounter_date, last_encounter_date) for
    every qualifying person × CCW condition.

    Config rows mirror ``ref_ccw_lookup`` (FIXTURES.md §10):
    ccw_abbrev, dx_fields, claim_type_1/2 (';'-separated), exclusion
    abbrev rows (``*_exclude``), condition_type 1|2, lookback_months.
    Type-2 conditions need two claims within the lookback window
    (``load_ccw.R:580-589``); exclusions are anti-joins at the claim
    level (``:411-465``).
    """
    results = []
    conditions = [
        r for r in ccw_lookup_rows if not r["ccw_abbrev"].endswith("_exclude1")
        and not r["ccw_abbrev"].endswith("_exclude2")
    ]
    for cfg in conditions:
        abbrev = cfg["ccw_abbrev"]
        types = []
        for key in ("claim_type_1", "claim_type_2"):
            if cfg.get(key):
                types += [int(x) for x in str(cfg[key]).split(";")]
        dx = _dx_claims_for(
            icdcm, ref_icdcm, header, abbrev, cfg.get("dx_fields", "any"),
            types or None,
        )

        # exclusion diagnoses on the same claim disqualify it (J12);
        # the reference carries up to two exclusion sets per condition
        # (load_ccw.R:43-56,293-296)
        for suffix in ("_exclude1", "_exclude2"):
            excl_abbrev = f"{abbrev}{suffix}"
            if excl_abbrev in ref_icdcm.columns:
                excl_claims = icdcm.join(
                    F.broadcast(
                        ref_icdcm.filter(F.col(excl_abbrev) == 1).select(
                            F.col("icdcm").alias("icdcm_norm"), "icdcm_version"
                        )
                    ),
                    ["icdcm_norm", "icdcm_version"],
                ).select("claim_header_id").distinct()
                dx = dx.join(excl_claims, "claim_header_id", "left_anti")

        if int(cfg.get("condition_type", 1)) == 2:
            # two-claim qualification: a DIFFERENT claim date within
            # lookback_months (boundary-crossing month diff, §2.9)
            lb = int(cfg.get("lookback_months", 24))
            dates = dx.select("id_mcaid", "first_service_date").distinct()
            a, b = dates.alias("a"), dates.alias("b")
            qualified_ids = (
                a.join(b, "id_mcaid")
                .filter(
                    (F.col("a.first_service_date") < F.col("b.first_service_date"))
                    & (
                        tsql_datediff_month(
                            F.col("a.first_service_date"),
                            F.col("b.first_service_date"),
                        )
                        <= lb
                    )
                )
                .select("id_mcaid")
                .distinct()
            )
            dx = dx.join(qualified_ids, "id_mcaid", "left_semi")

        results.append(
            dx.groupBy("id_mcaid").agg(
                F.lit(abbrev).alias("ccw_desc"),
                F.min("first_service_date").alias("first_encounter_date"),
                F.max("first_service_date").alias("last_encounter_date"),
            )
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "id_mcaid", "ccw_desc", "first_encounter_date", "last_encounter_date"
    )


def build_claim_bh(
    icdcm: DataFrame,
    pharm: DataFrame,
    procedure: DataFrame,
    ref_rda: DataFrame,
) -> DataFrame:
    """Behavioral-health person-condition table (``claim_bh.R``):
    dx-based ∪ NDC-based ∪ procedure-based matches per condition, with
    the MOUD as-of rule — procedure codes flagged ``oud_dx1_flag``
    qualify only when the person's earliest OUD diagnosis is on or
    before the service date (``claim_bh.R:324-347``, J14)."""
    dx_ref = ref_rda.filter(F.col("code_set").isin("ICD9CM", "ICD10CM")).select(
        F.col("code").alias("icdcm_norm"),
        F.col("icdcm_version"),
        F.col("sub_group_condition").alias("bh_cond"),
    )
    dx_hits = icdcm.join(F.broadcast(dx_ref), ["icdcm_norm", "icdcm_version"]).select(
        "id_mcaid", F.col("first_service_date").alias("svc_date"), "bh_cond"
    )

    ndc_ref = ref_rda.filter(F.col("code_set") == "NDC").select(
        F.col("code").alias("ndc"), F.col("sub_group_condition").alias("bh_cond")
    )
    rx_hits = pharm.join(F.broadcast(ndc_ref), "ndc").select(
        "id_mcaid", F.col("rx_fill_date").alias("svc_date"), "bh_cond"
    )

    px_ref = ref_rda.filter(
        F.col("code_set").isin("HCPCS", "CPT")
    ).select(
        F.col("code").alias("procedure_code"),
        F.col("sub_group_condition").alias("bh_cond"),
        "oud_dx1_flag",
    )
    px_hits_all = procedure.join(F.broadcast(px_ref), "procedure_code").select(
        "id_mcaid", F.col("first_service_date").alias("svc_date"), "bh_cond",
        "oud_dx1_flag",
    )
    px_plain = px_hits_all.filter(
        F.coalesce("oud_dx1_flag", F.lit(0)) == 0
    ).drop("oud_dx1_flag")

    # MOUD as-of rule: earliest OUD dx must be <= procedure date
    oud_dx = dx_hits.filter(F.col("bh_cond") == "sud_opioid")
    px_moud = (
        join_to_running_min(
            px_hits_all.filter(F.col("oud_dx1_flag") == 1),
            oud_dx.withColumnRenamed("svc_date", "dx_date"),
            key="id_mcaid",
            left_date="svc_date",
            right_date="dx_date",
            min_col="first_oud_dx",
        )
        .select("id_mcaid", "svc_date", "bh_cond")
    )

    all_hits = (
        dx_hits.unionByName(rx_hits).unionByName(px_plain).unionByName(px_moud)
    )
    return all_hits.groupBy("id_mcaid", "bh_cond").agg(
        F.min("svc_date").alias("first_encounter_date"),
        F.max("svc_date").alias("last_encounter_date"),
    )
