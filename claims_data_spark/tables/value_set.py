"""Materialized claim × value-set membership table
(reference: ``load_stage.mcaid_claim_value_set.R`` — nine INSERT
passes over procedure/header/dx/pharm/line against
``ref.rda_value_set`` plus the HEDIS code system).

Spark-first shape: each BIG claim-domain table is scanned ONCE and
broadcast-hash-joined against the small code list. The reference's
four diagnosis inserts (v9/v10 × primary-only/any-position) collapse
into one version-matched join whose primary-dx matches fan out to two
rows with ``explode`` — the dx table is read once, not four times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_COLS = [
    "value_set_group",
    "value_set_name",
    "data_source_type",
    "sub_group",
    "code_set",
    "primary_dx_only",
    "id_mcaid",
    "claim_header_id",
    "service_date",
]


def _match(
    df: DataFrame,
    rda: DataFrame,
    code_col: str,
    code_sets: list[str],
    date_col: str,
    id_col: str,
    extra_pred=None,
) -> DataFrame:
    r = rda.filter(F.col("code_set").isin(code_sets))
    if extra_pred is not None:
        r = r.filter(extra_pred)
    return df.join(
        F.broadcast(r), F.col(code_col) == F.col("code")
    ).select(
        "value_set_group",
        "value_set_name",
        "data_source_type",
        "sub_group",
        "code_set",
        F.lit(None).cast("string").alias("primary_dx_only"),
        id_col,
        "claim_header_id",
        F.col(date_col).alias("service_date"),
    )


def build_claim_value_set(
    rda: DataFrame,
    procedure: DataFrame | None = None,
    header: DataFrame | None = None,
    icdcm: DataFrame | None = None,
    pharm: DataFrame | None = None,
    line: DataFrame | None = None,
    hedis: DataFrame | None = None,
    hedis_value_sets: list[str] | None = None,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """Long ``(value set, claim)`` membership rows across every coded
    claim domain. Pass the domains you have; each contributes:

    - procedure × CPT/HCPCS/ICD9PCS/ICD10PCS
    - header.drvd_drg_code × DRG
    - icdcm × ICD9CM/ICD10CM, version-matched — any-position rows get
      ``primary_dx_only='N'``, and primary (icdcm_number='01') matches
      emit an additional ``'Y'`` row (the reference's dual insert)
    - pharm.ndc × NDC (active codes only)
    - line.rev_code × UBREV
    - hedis (code_system/value_set_name/code) × procedure and line,
      restricted to ``hedis_value_sets`` (FUH/TCM follow-up sets in
      the reference), under value_set_group='HEDIS'
    """
    parts = []
    if procedure is not None:
        parts.append(
            _match(
                procedure, rda, "procedure_code",
                ["CPT", "HCPCS", "ICD10PCS", "ICD9PCS"],
                "first_service_date", id_col,
            )
        )
    if header is not None:
        parts.append(
            _match(
                header, rda, "drvd_drg_code", ["DRG"],
                "first_service_date", id_col,
            )
        )
    if icdcm is not None:
        r = rda.filter(F.col("code_set").isin("ICD9CM", "ICD10CM"))
        cond = (F.col("icdcm_norm") == F.col("code")) & (
            ((F.col("icdcm_version") == 9) & (F.col("code_set") == "ICD9CM"))
            | (
                (F.col("icdcm_version") == 10)
                & (F.col("code_set") == "ICD10CM")
            )
        )
        dx = icdcm.join(F.broadcast(r), cond).select(
            "value_set_group",
            "value_set_name",
            "data_source_type",
            "sub_group",
            "code_set",
            F.explode(
                F.when(
                    F.col("icdcm_number") == "01",
                    F.array(F.lit("N"), F.lit("Y")),
                ).otherwise(F.array(F.lit("N")))
            ).alias("primary_dx_only"),
            id_col,
            "claim_header_id",
            F.col("first_service_date").alias("service_date"),
        )
        parts.append(dx)
    if pharm is not None:
        parts.append(
            _match(
                pharm, rda, "ndc", ["NDC"], "rx_fill_date", id_col,
                extra_pred=F.col("active") == "Y",
            )
        )
    if line is not None:
        parts.append(
            _match(
                line, rda, "rev_code", ["UBREV"],
                "first_service_date", id_col,
            )
        )
    if hedis is not None:
        hed = hedis.filter(
            F.col("value_set_name").isin(hedis_value_sets or [])
        ).select(
            F.lit("HEDIS").alias("value_set_group"),
            "value_set_name",
            F.lit(None).cast("string").alias("data_source_type"),
            F.lit(None).cast("string").alias("sub_group"),
            F.col("code_system").alias("code_set"),
            "code",
        )
        if procedure is not None:
            parts.append(
                procedure.join(
                    F.broadcast(
                        hed.filter(F.col("code_set").isin("CPT", "HCPCS"))
                    ),
                    F.col("procedure_code") == F.col("code"),
                ).select(
                    "value_set_group",
                    "value_set_name",
                    "data_source_type",
                    "sub_group",
                    "code_set",
                    F.lit(None).cast("string").alias("primary_dx_only"),
                    id_col,
                    "claim_header_id",
                    F.col("first_service_date").alias("service_date"),
                )
            )
        if line is not None:
            parts.append(
                line.join(
                    F.broadcast(hed.filter(F.col("code_set") == "UBREV")),
                    F.col("rev_code") == F.col("code"),
                ).select(
                    "value_set_group",
                    "value_set_name",
                    "data_source_type",
                    "sub_group",
                    "code_set",
                    F.lit(None).cast("string").alias("primary_dx_only"),
                    id_col,
                    "claim_header_id",
                    F.col("first_service_date").alias("service_date"),
                )
            )
    if not parts:
        raise ValueError("at least one claim domain is required")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*_OUT_COLS).distinct()


def build_ref_ahrq_value_set(raw: DataFrame) -> DataFrame:
    """AHRQ value-set reference table
    (``ref/tables/load_ref.ahrq_value_set.sql:21-40``): the spreadsheet
    rows land with a fixed 12-character prefix on ``code`` that the
    loader strips (``SUBSTRING(code, 13, ...)``); the table's primary
    key is (value_set_name, data_source_type, code_set, code), so the
    projection collapses to DISTINCT on those columns with the group
    label and description riding along (first-by-key, matching the
    clustered-PK insert)."""
    stripped = raw.select(
        "value_set_group",
        "value_set_name",
        "data_source_type",
        "code_set",
        F.expr("substring(code, 13)").alias("code"),
        "desc_1",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(
        "value_set_name", "data_source_type", "code_set", "code"
    ).orderBy("value_set_group", "desc_1")
    return (
        stripped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def qa_ahrq_value_set(df: DataFrame) -> dict:
    """PK uniqueness gate for the AHRQ reference table (the SQL
    enforces it via the clustered primary key; here it is an explicit
    one-aggregate check)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(
            "value_set_name", "data_source_type", "code_set", "code"
        ).alias("n_keys"),
    ).collect()[0]
    return {"rows": int(row["n"]), "distinct_keys": int(row["n_keys"]),
            "pk_unique": bool(row["n"] == row["n_keys"])}
