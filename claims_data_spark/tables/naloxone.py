"""Naloxone distribution events (reference:
``load_stage.mcaid_claim_naloxone.R:1-166``): pharmacy fills matched
to the naloxone NDC list by a contains-join, unioned with
naloxone-administration procedure codes, carrying form / quantity /
dosage derivations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPRAY_PX = ("G1028", "G2215")
INJECTION_PX = ("G2216", "J2310", "J2311", "J2312")
UNKNOWN_PX = ("J3490",)  # unclassified drug J-code: HG/TG modifier only
SPRAY_NDC_SPECIAL = "00093216519"
INJECTION_NDC_SPECIAL = ("55150034510", "55150032710", "00409121525")


def build_claim_naloxone(
    pharm: DataFrame,
    procedure: DataFrame,
    ref_naloxone_ndc: DataFrame,
    ref_ndc_codes: DataFrame | None = None,
    min_year: int = 2016,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """(id, claim, code, date, quantity, form, location) naloxone
    events.

    ``id_col`` parameterizes the source layer — the Medicare variant
    (``load_stage.mcare_claim_naloxone.R``) runs the SAME match over
    ``id_mcare``; the output keeps the source id name.

    The reference LIKE-joins the full NDC dimension against
    '%code%' patterns (``:28-44``); here the DISTINCT observed NDCs
    (a small dimension) join the broadcast naloxone list with a
    ``contains`` condition, and the resulting exact-match reference
    drives a plain equi-join on the fact table — the claim-scale scan
    never sees a non-equi condition.

    Inputs: pharm(id_mcaid, claim_header_id, ndc, rx_fill_date,
    rx_quantity), procedure(id_mcaid, claim_header_id,
    procedure_code, modifier_code, last_service_date),
    ref_naloxone_ndc(ndc), optional ref_ndc_codes(ndc,
    proprietaryname, dosageformname).
    """
    if id_col != "id_mcaid":
        out = build_claim_naloxone(
            pharm.withColumnRenamed(id_col, "id_mcaid"),
            procedure.withColumnRenamed(id_col, "id_mcaid"),
            ref_naloxone_ndc,
            ref_ndc_codes,
            min_year,
        )
        return out.withColumnRenamed("id_mcaid", id_col)
    observed = pharm.select("ndc").distinct()
    nal_ndc = (
        observed.join(
            F.broadcast(
                ref_naloxone_ndc.select(F.col("ndc").alias("_pat"))
            ),
            F.col("ndc").contains(F.col("_pat")),
        )
        .select("ndc")
        .distinct()
    )

    rx = (
        pharm.join(nal_ndc, "ndc")
        .filter(
            (F.year("rx_fill_date") >= min_year)
            & (F.col("rx_quantity") >= 1.0)
        )
    )
    if ref_ndc_codes is not None:
        rx = rx.join(
            F.broadcast(
                ref_ndc_codes.select(
                    "ndc",
                    F.upper("proprietaryname").alias("description"),
                    F.upper("dosageformname").alias("_dosage_form"),
                )
            ),
            "ndc",
            "left",
        )
    else:
        rx = rx.withColumn("description", F.lit(None).cast("string")).withColumn(
            "_dosage_form", F.lit(None).cast("string")
        )
    rx_form = (
        F.when(
            F.col("_dosage_form").contains("SPRAY")
            | (F.col("ndc") == SPRAY_NDC_SPECIAL),
            "SPRAY",
        )
        .when(
            F.col("_dosage_form").contains("INJECTION")
            | F.col("ndc").isin(*INJECTION_NDC_SPECIAL),
            "INJECTION",
        )
    )
    rx_events = rx.select(
        "id_mcaid",
        "claim_header_id",
        F.col("ndc").alias("code"),
        "description",
        F.col("rx_fill_date").alias("date"),
        F.col("rx_quantity").cast("double").alias("quantity"),
        rx_form.alias("form"),
        F.lit("PHARMACY").alias("location"),
    )

    px = procedure.filter(
        (F.year("last_service_date") >= min_year)
        & (
            F.col("procedure_code").isin(*SPRAY_PX, *INJECTION_PX)
            | (
                F.col("procedure_code").isin(*UNKNOWN_PX)
                & F.col("modifier_code").isin("HG", "TG")
            )
        )
    )
    px_events = px.select(
        "id_mcaid",
        "claim_header_id",
        F.col("procedure_code").alias("code"),
        F.lit(None).cast("string").alias("description"),
        F.col("last_service_date").alias("date"),
        F.when(F.col("procedure_code").isin("G1028", "G2215"), 2.0)
        .when(
            F.col("procedure_code").isin("G2216", "J2310", "J2311", "J3490", "J2312"),
            1.0,
        )
        .alias("quantity"),
        F.when(F.col("procedure_code").isin(*SPRAY_PX), "SPRAY")
        .when(F.col("procedure_code").isin(*INJECTION_PX), "INJECTION")
        .when(F.col("procedure_code").isin(*UNKNOWN_PX), "UNKNOWN")
        .alias("form"),
        F.lit("PROCEDURE").alias("location"),
    )
    return rx_events.unionByName(px_events).distinct()


def build_mcare_claim_naloxone(
    pharm: DataFrame,
    procedure: DataFrame,
    ref_naloxone_ndc: DataFrame,
    ref_ndc_codes: DataFrame | None = None,
    min_year: int = 2016,
) -> DataFrame:
    """``load_stage.mcare_claim_naloxone.R``: the SAME naloxone event
    match over the Medicare layer, keyed by ``id_mcare``."""
    return build_claim_naloxone(
        pharm, procedure, ref_naloxone_ndc, ref_ndc_codes, min_year,
        id_col="id_mcare",
    )
