"""Claim child tables (reference: ``load_stage.mcaid_claim_line.R``,
``...icdcm_header.R``, ``...procedure.R``, ``...pharm.R``) — the
wide raw claim extract normalized into long child tables.

All four depend only on the raw extract (``master_mcaid_analytic.R:158-166``)
so they build in parallel from one scan; each is distinct-deduped at
its natural grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claims_data_spark.functions.strings import icdcm_version, normalize_icdcm
from claims_data_spark.operators.unpivot import unpivot, unpivot_with_fanout

DX_COLS = {
    "PRIMARY_DIAGNOSIS_CODE": "01",
    "DIAGNOSIS_CODE_2": "02",
    "DIAGNOSIS_CODE_3": "03",
    "ADMTNG_DIAGNOSIS_CODE": "admit",
}

PX_COLS = {"PRCDR_CODE_1": "01", "PRCDR_CODE_2": "02", "LINE_PRCDR_CODE": "line"}


def build_claim_line(raw: DataFrame) -> DataFrame:
    """One row per claim line (``load_stage.mcaid_claim_line.R:57-71``)."""
    return raw.select(
        F.col("MBR_H_SID").alias("id_mcaid"),
        F.col("TCN").alias("claim_header_id"),
        F.col("CLM_LINE_TCN").alias("claim_line_id"),
        F.col("REVENUE_CODE").alias("rev_code"),
        F.col("FROM_SRVC_DATE").alias("first_service_date"),
        F.col("TO_SRVC_DATE").alias("last_service_date"),
    ).distinct()


def build_claim_icdcm_header(raw: DataFrame) -> DataFrame:
    """Long diagnosis table: 13-dx unpivot + ICD-9/10 normalization
    (``load_stage.mcaid_claim_icdcm_header.R:66-134``)."""
    base = raw.select(
        F.col("MBR_H_SID").alias("id_mcaid"),
        F.col("TCN").alias("claim_header_id"),
        F.col("FROM_SRVC_DATE").alias("first_service_date"),
        F.col("TO_SRVC_DATE").alias("last_service_date"),
        *DX_COLS.keys(),
    ).distinct()
    long_dx = unpivot(
        base,
        ["id_mcaid", "claim_header_id", "first_service_date", "last_service_date"],
        DX_COLS,
        var_name="icdcm_number",
        value_name="icdcm_raw",
    )
    return long_dx.withColumn(
        "icdcm_norm", normalize_icdcm("icdcm_raw", "first_service_date")
    ).withColumn(
        "icdcm_version", icdcm_version("icdcm_raw", "first_service_date")
    )


def build_claim_procedure(raw: DataFrame) -> DataFrame:
    """Long procedure table with modifier fan-out
    (``load_stage.mcaid_claim_procedure.R:74-130``)."""
    base = raw.select(
        F.col("MBR_H_SID").alias("id_mcaid"),
        F.col("TCN").alias("claim_header_id"),
        F.col("FROM_SRVC_DATE").alias("first_service_date"),
        *PX_COLS.keys(),
        F.col("MDFR_CODE1").alias("m1"),
        F.col("MDFR_CODE2").alias("m2"),
    ).distinct()
    return unpivot_with_fanout(
        base,
        ["id_mcaid", "claim_header_id", "first_service_date"],
        PX_COLS,
        ["m1", "m2"],
        var_name="procedure_code_number",
        value_name="procedure_code",
        fanout_name="modifier_code",
    )


def build_claim_pharm(raw: DataFrame) -> DataFrame:
    """Pharmacy fills (``load_stage.mcaid_claim_pharm.R:45-90``):
    NDC-filtered, fill date coalesced to service date, prescriber-ID
    format classified (P10)."""
    from claims_data_spark.functions.strings import provider_id_format

    prescriber_class = provider_id_format("PRSCRBR_ID")
    return (
        raw.filter(F.col("NDC").isNotNull())
        .select(
            F.col("MBR_H_SID").alias("id_mcaid"),
            F.col("TCN").alias("claim_header_id"),
            F.col("NDC").alias("ndc"),
            F.coalesce("PRSCRPTN_FILLED_DATE", "TO_SRVC_DATE").alias("rx_fill_date"),
            F.col("DAYS_SUPPLY").alias("rx_days_supply"),
            F.col("SBMTD_DISPENSED_QUANTITY").alias("rx_quantity"),
            F.col("PRSCRBR_ID").alias("prescriber_id"),
            prescriber_class.alias("prescriber_id_format"),
        )
        .distinct()
    )
