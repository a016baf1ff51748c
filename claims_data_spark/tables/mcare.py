"""Medicare claim tables + the combined mcaid_mcare layer
(reference: ``load_stage.mcare_claim_header.R:1-1000`` and
``load_stage.mcaid_mcare_claim_header.R:1-521``).

``build_mcare_claim_header`` mirrors the APCD/mcaid shape: one
groupBy per per-claim concept so every intermediate shares the
claim_header_id shuffle key, reference tables broadcast, and event
ids minted with the two-phase global dense ranking.

``build_mcaid_mcare_claim_header`` is the cross-source union: each
side routes through the person crosswalk to ``id_apde``, source
-specific columns null-fill, and the utilization event ids are
RE-MINTED over the combined person space — the reference's
dense_rank-with-sort-to-bottom idiom (``mcaid_mcare_claim_header.R:
150-175``) becomes a filtered two-phase ranking, and the Yale ED
1-day episode clustering re-runs across sources so a Medicaid visit
and a Medicare visit one day apart merge into one episode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claims_data_spark.operators.dense_id import dense_global_id
from claims_data_spark.operators.episodes import within_person_episodes

# ED definitions (load_stage.mcare_claim_header.R:379-399): the RDA
# 'perform' sets are narrower than the Yale 'pophealth' sets
ED_REV_PERFORM = "^045[01269]$"
ED_REV_POPHEALTH = "^045[01269]$|^0981$"
ED_PX_PERFORM = "^9928[123458]$"
ED_PX_POPHEALTH = "^9928[1-5]$|^99291$"

# swing-bed SNF + inpatient mcare claim types excluded from PC visits
# (``:666``)
PC_EXCLUDED_MCARE_TYPES = ("60", "30")


def build_mcare_claim_header(
    header: DataFrame,
    line: DataFrame,
    icdcm: DataFrame,
    procedure: DataFrame,
    ref_xwalk: DataFrame | None = None,
    ref_pc_oregon: DataFrame | None = None,
    provider: DataFrame | None = None,
    ref_provider_master: DataFrame | None = None,
) -> DataFrame:
    """Medicare claim_header analytic table.

    ``header`` is the unioned per-file frame (carrier/dme/hha/hospice/
    inpatient/outpatient/snf, ``:66-362``) with columns: id_mcare,
    claim_header_id (string — alpha ids), claim_type_mcare_id,
    filetype_mcare, first_service_date, last_service_date,
    patient_status_code. ``line`` carries revenue_code /
    place_of_service_code / discharge_date; ``provider`` carries
    (claim_header_id, provider_type, provider_npi).
    """
    hdr = header
    if ref_xwalk is not None:
        xw = ref_xwalk
        if "source_desc" in xw.columns:
            xw = xw.filter(F.col("source_desc") == "mcare")
        hdr = hdr.join(
            F.broadcast(
                xw.select(
                    F.col("source_clm_type_id").cast("string").alias(
                        "claim_type_mcare_id"
                    ),
                    F.col("kc_clm_type_id").alias("claim_type_id"),
                )
            ),
            "claim_type_mcare_id",
            "left",
        )
    else:
        hdr = hdr.withColumn("claim_type_id", F.lit(None).cast("int"))

    # line rollup (``:374-384``): discharge + ED pos/revenue flags
    line_agg = line.groupBy("claim_header_id").agg(
        F.max("discharge_date").alias("discharge_date"),
        F.max((F.col("place_of_service_code") == "23").cast("int")).alias("ed_pos"),
        F.max(F.col("revenue_code").rlike(ED_REV_PERFORM).cast("int")).alias(
            "ed_rev_code_perform"
        ),
        F.max(F.col("revenue_code").rlike(ED_REV_POPHEALTH).cast("int")).alias(
            "ed_rev_code_pophealth"
        ),
    )
    px_agg = procedure.groupBy("claim_header_id").agg(
        F.max(F.col("procedure_code").rlike(ED_PX_PERFORM).cast("int")).alias(
            "ed_procedure_code_perform"
        ),
        F.max(F.col("procedure_code").rlike(ED_PX_POPHEALTH).cast("int")).alias(
            "ed_procedure_code_pophealth"
        ),
    )
    icd1 = icdcm.filter(F.col("icdcm_number") == "01").groupBy("claim_header_id").agg(
        F.min("icdcm_norm").alias("primary_diagnosis"),
        F.min("icdcm_version").alias("icdcm_version"),
    )

    pc = None
    if ref_pc_oregon is not None:
        pc_px = (
            procedure.join(
                F.broadcast(
                    ref_pc_oregon.filter(
                        F.col("code_system").isin("cpt", "hcpcs")
                    ).select(F.col("code").alias("procedure_code"))
                ),
                "procedure_code",
            )
            .select("claim_header_id").distinct()
            .withColumn("pc_procedure_temp", F.lit(1))
        )
        pc_dx = (
            icdcm.filter(F.col("icdcm_version") == 10)
            .join(
                F.broadcast(
                    ref_pc_oregon.filter(F.col("code_system") == "icd10cm").select(
                        F.col("code").alias("icdcm_norm")
                    )
                ),
                "icdcm_norm",
            )
            .select("claim_header_id").distinct()
            .withColumn("pc_zcode_temp", F.lit(1))
        )
        pc = pc_px.join(pc_dx, "claim_header_id", "full")
        if provider is not None and ref_provider_master is not None:
            tax = ref_pc_oregon.filter(
                F.col("code_system") == "provider_taxonomy"
            ).select(F.col("code").alias("_tax"))
            pc_tax = (
                provider.filter(F.col("provider_type").isin("rendering", "attending"))
                .join(
                    F.broadcast(ref_provider_master),
                    provider["provider_npi"] == ref_provider_master["npi"],
                )
                .join(
                    F.broadcast(tax),
                    (F.col("primary_taxonomy") == F.col("_tax"))
                    | (F.col("secondary_taxonomy") == F.col("_tax")),
                )
                .select("claim_header_id").distinct()
                .withColumn("pc_taxonomy_temp", F.lit(1))
            )
            pc = pc.join(pc_tax, "claim_header_id", "full")
        else:
            pc = pc.withColumn("pc_taxonomy_temp", F.lit(None).cast("int"))

    out = (
        hdr.join(line_agg, "claim_header_id", "left")
        .join(px_agg, "claim_header_id", "left")
        .join(icd1, "claim_header_id", "left")
    )
    if pc is not None:
        out = out.join(pc, "claim_header_id", "left")
    else:
        for c in ("pc_procedure_temp", "pc_zcode_temp", "pc_taxonomy_temp"):
            out = out.withColumn(c, F.lit(None).cast("int"))

    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    kc = F.col("claim_type_id")
    out = (
        # inpatient stay: type 60 with discharge (``:55``)
        out.withColumn(
            "inpatient",
            (
                (F.col("claim_type_mcare_id") == "60")
                & F.col("discharge_date").isNotNull()
            ).cast("int"),
        )
        # ED performance — RDA (``:648-650``)
        .withColumn(
            "ed_perform",
            (
                (kc == 4)
                & (
                    (z("ed_rev_code_perform") == 1)
                    | (z("ed_procedure_code_perform") == 1)
                    | (z("ed_pos") == 1)
                )
            ).cast("int"),
        )
        # Yale ED trio (``:653-661``)
        .withColumn(
            "ed_yale_carrier",
            (
                (kc == 5)
                & (
                    ((z("ed_procedure_code_pophealth") == 1) & (z("ed_pos") == 1))
                    | (z("ed_rev_code_pophealth") == 1)
                )
            ).cast("int"),
        )
        .withColumn(
            "ed_yale_opt",
            (
                (kc == 4)
                & (
                    (z("ed_rev_code_pophealth") == 1)
                    | (z("ed_pos") == 1)
                    | (z("ed_procedure_code_pophealth") == 1)
                )
            ).cast("int"),
        )
        .withColumn(
            "ed_yale_ipt",
            (
                (kc == 1)
                & (
                    (z("ed_rev_code_pophealth") == 1)
                    | (z("ed_pos") == 1)
                    | (z("ed_procedure_code_pophealth") == 1)
                )
            ).cast("int"),
        )
        # Oregon PC visit (``:664-667``)
        .withColumn(
            "pc_visit",
            (
                ((z("pc_procedure_temp") == 1) | (z("pc_zcode_temp") == 1))
                & (z("pc_taxonomy_temp") == 1)
                & ~F.col("claim_type_mcare_id").isin(*PC_EXCLUDED_MCARE_TYPES)
            ).cast("int"),
        )
    )

    def _event_id(flag_col: str, out_col: str, date_col: str) -> DataFrame:
        sub = out.filter(F.col(flag_col) == 1).select(
            "claim_header_id", "id_mcare", date_col
        )
        return dense_global_id(
            sub, ["id_mcare", date_col], out_col=out_col
        ).select("claim_header_id", out_col)

    out = (
        out.join(
            _event_id("pc_visit", "pc_visit_id", "first_service_date"),
            "claim_header_id", "left",
        )
        .join(
            _event_id("inpatient", "inpatient_id", "discharge_date"),
            "claim_header_id", "left",
        )
        .join(
            _event_id("ed_perform", "ed_perform_id", "first_service_date"),
            "claim_header_id", "left",
        )
    )
    ed = out.filter(
        (F.col("ed_yale_carrier") == 1)
        | (F.col("ed_yale_opt") == 1)
        | (F.col("ed_yale_ipt") == 1)
    ).select("claim_header_id", "id_mcare", "first_service_date")
    eps = within_person_episodes(
        ed, ["id_mcare"], "first_service_date", merge_gap_days=1
    )
    pophealth = dense_global_id(
        eps, ["id_mcare", "within_person_episode_id"], out_col="ed_pophealth_id"
    ).select("claim_header_id", "ed_pophealth_id")
    return out.join(pophealth, "claim_header_id", "left")


# ---------------------------------------------------------------------------
# combined mcaid + mcare layer
# ---------------------------------------------------------------------------

_COMBINED_COLS = [
    "id_apde", "source_desc", "claim_header_id", "claim_type_id",
    "first_service_date", "last_service_date", "discharge_date",
    "primary_diagnosis", "icdcm_version",
]


def build_mcaid_mcare_claim_header(
    mcaid_header: DataFrame,
    mcare_header: DataFrame,
    xwalk: DataFrame,
) -> DataFrame:
    """Union both sources onto ``id_apde`` and re-mint every
    utilization event id over the combined person space
    (``load_stage.mcaid_mcare_claim_header.R:1-250``).

    Input contracts (columns beyond these null-fill):
    - mcaid: id_mcaid, claim_header_id, claim_type_id (kc),
      first/last_service_date, discharge_date?, primary_diagnosis?,
      icdcm_version?, ed_pophealth_id?, ed_perform_id?,
      inpatient_flag?/inpatient_id?, pc_visit_id?/pc_visit_flag?
    - mcare: same with id_mcare
    - xwalk: (id_apde, id_mcaid, id_mcare)
    """
    def _norm(df: DataFrame, src: str, id_col: str) -> DataFrame:
        d = df.join(
            xwalk.select(id_col, "id_apde").filter(F.col(id_col).isNotNull()),
            id_col,
            "left",
        ).withColumn("source_desc", F.lit(src))
        d = d.withColumn(
            "claim_header_id", F.col("claim_header_id").cast("string")
        )
        # event participation flags (null-safe across both sources'
        # conventions: *_id non-null, or *_flag == 1)
        def has(col_id, col_flag):
            parts = []
            if col_id in df.columns:
                parts.append(F.col(col_id).isNotNull() & (F.col(col_id).cast("long") != 0))
            if col_flag in df.columns:
                parts.append(F.col(col_flag) == 1)
            if not parts:
                return F.lit(False)
            cond = parts[0]
            for p in parts[1:]:
                cond = cond | p
            return cond

        d = (
            d.withColumn("_was_ed", has("ed_pophealth_id", "ed_flag"))
            .withColumn("_was_ed_perform", has("ed_perform_id", "_none"))
            .withColumn("_was_ipt", has("inpatient_id", "inpatient_flag"))
            .withColumn("_was_pc", has("pc_visit_id", "pc_visit_flag"))
        )
        for c in _COMBINED_COLS:
            if c not in d.columns:
                d = d.withColumn(c, F.lit(None))
        return d.select(
            *_COMBINED_COLS, "_was_ed", "_was_ed_perform", "_was_ipt", "_was_pc"
        )

    both = _norm(mcaid_header, "mcaid", "id_mcaid").unionByName(
        _norm(mcare_header, "mcare", "id_mcare")
    )

    # re-mint event ids over (id_apde, date) — the reference's
    # dense_rank with nulls sorted to the bottom is equivalent to
    # ranking only the participating rows (``:150-175``)
    def _remint(flag: str, out_col: str, date_col: str) -> DataFrame:
        sub = both.filter(F.col(flag)).select(
            "source_desc", "claim_header_id", "id_apde", date_col
        )
        return dense_global_id(
            sub, ["id_apde", date_col], out_col=out_col
        ).select("source_desc", "claim_header_id", out_col)

    join_key = ["source_desc", "claim_header_id"]
    out = (
        both.join(_remint("_was_ed_perform", "ed_perform_id", "first_service_date"),
                  join_key, "left")
        .join(_remint("_was_ipt", "inpatient_id", "discharge_date"),
              join_key, "left")
        .join(_remint("_was_pc", "pc_visit_id", "first_service_date"),
              join_key, "left")
    )

    # Yale trio from the prior-stage ED membership + kc type (``:155-157``)
    out = (
        out.withColumn(
            "ed_yale_carrier",
            (F.col("_was_ed") & (F.col("claim_type_id") == 5)).cast("int"),
        )
        .withColumn(
            "ed_yale_opt",
            (F.col("_was_ed") & (F.col("claim_type_id") == 4)).cast("int"),
        )
        .withColumn(
            "ed_yale_ipt",
            (F.col("_was_ed") & (F.col("claim_type_id") == 1)).cast("int"),
        )
    )

    # cross-source Yale episode clustering (``:205-330``): a Medicaid
    # and a Medicare ED visit ≤1 day apart merge into one episode
    ed = out.filter(
        (F.col("ed_yale_carrier") == 1)
        | (F.col("ed_yale_opt") == 1)
        | (F.col("ed_yale_ipt") == 1)
    ).select("source_desc", "claim_header_id", "id_apde", "first_service_date")
    eps = within_person_episodes(
        ed, ["id_apde"], "first_service_date", merge_gap_days=1
    )
    pophealth = dense_global_id(
        eps, ["id_apde", "within_person_episode_id"], out_col="ed_pophealth_id"
    ).select("source_desc", "claim_header_id", "ed_pophealth_id")
    out = out.join(pophealth, join_key, "left")
    return out.drop("_was_ed", "_was_ed_perform", "_was_ipt", "_was_pc")


def build_mcaid_mcare_union(
    mcaid_df: DataFrame,
    mcare_df: DataFrame,
    xwalk: DataFrame,
) -> DataFrame:
    """Generic combined-layer union for the mcaid+mcare child tables —
    claim_line / icdcm_header / procedure / elig layers
    (``load_stage.mcaid_mcare_claim_line.R:219-255`` and its
    icdcm_header/procedure twins share exactly this shape).

    Each source joins the person crosswalk on its own id to mint
    ``id_apde``, claim ids are cast to string (mcaid's are bigint,
    mcare's are char), columns present in only one source are
    null-filled with the other side's type, and rows are tagged
    ``source_desc``. The xwalk join is broadcast (person-dim sized
    relative to claims); the union is by name, never by position.
    """
    def _prep(df: DataFrame, src: str, id_col: str) -> DataFrame:
        out = df.join(
            F.broadcast(
                xwalk.select(id_col, "id_apde").filter(
                    F.col(id_col).isNotNull()
                )
            ),
            id_col,
            "left",
        ).drop(id_col)
        for c in ("claim_header_id", "claim_line_id"):
            if c in out.columns:
                out = out.withColumn(c, F.col(c).cast("string"))
        return out.withColumn("source_desc", F.lit(src))

    a = _prep(mcaid_df, "mcaid", "id_mcaid")
    b = _prep(mcare_df, "mcare", "id_mcare")
    for c in b.columns:
        if c not in a.columns:
            a = a.withColumn(
                c, F.lit(None).cast(b.schema[c].dataType)
            )
    for c in a.columns:
        if c not in b.columns:
            b = b.withColumn(
                c, F.lit(None).cast(a.schema[c].dataType)
            )
    return a.unionByName(b).distinct()
