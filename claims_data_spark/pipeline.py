"""Warehouse pipeline orchestrator (reference:
``db_loader/mcaid/master_mcaid_analytic.R`` — the master script that
builds every analytic table in dependency order with QA gates between
stages).

The reference's DAG (``:157-371``): elig_demo → elig_timevar →
elig_month; the four claim child tables depend only on the raw claims
extract; claim_header depends on all children; conditions depend on
header + icdcm. Here each stage is a lazy DataFrame; "promotion" is
the caller's choice of writer (``sources.io.write_table`` /
``write_bucketed``); QA gates run as assertions and are returned as a
log table like ``metadata.qa_mcaid``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claims_data_spark.qa import (
    fused_table_qa,
    qa_apcd_claim_provider,
    qa_ids_in_elig,
    qa_mcaid_claim_icdcm_header,
    qa_mcaid_claim_line,
    qa_mcaid_claim_pharm,
    qa_mcaid_claim_procedure,
    qa_mcaid_mcare_claim_ccw,
    qa_mcare_elig_timevar,
    QaResult,
    check_referential,
    run_qa,
    timevar_golden_qa,
)
from claims_data_spark.tables.claim_children import (
    build_claim_icdcm_header,
    build_claim_line,
    build_claim_pharm,
    build_claim_procedure,
)
from claims_data_spark.tables.claim_header import build_claim_header
from claims_data_spark.tables.conditions import build_claim_bh, build_claim_ccw
from claims_data_spark.tables.elig_demo import build_elig_demo
from claims_data_spark.tables.elig_month import build_elig_month
from claims_data_spark.tables.elig_timevar import build_elig_timevar


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame]
    qa: list[tuple[str, QaResult]] = field(default_factory=list)

    def qa_log(self, spark: SparkSession) -> DataFrame:
        by_table: dict[str, list[QaResult]] = {}
        for table, res in self.qa:
            by_table.setdefault(table, []).append(res)
        logs = [run_qa(spark, checks, table) for table, checks in by_table.items()]
        out = logs[0]
        for l in logs[1:]:
            out = out.unionByName(l)
        return out

    def failures(self) -> list[tuple[str, QaResult]]:
        return [(t, r) for t, r in self.qa if not r[1]]


def run_mcaid_pipeline(
    spark: SparkSession,
    raw_elig: DataFrame,
    raw_claim: DataFrame,
    ref_rac: DataFrame | None = None,
    ref_address: DataFrame | None = None,
    ref_geocode: DataFrame | None = None,
    ref_xwalk: DataFrame | None = None,
    ref_hedis: DataFrame | None = None,
    ref_telehealth: DataFrame | None = None,
    ref_icdcm: DataFrame | None = None,
    ref_rda: DataFrame | None = None,
    ccw_config: list[dict] | None = None,
    strict_qa: bool = True,
) -> PipelineResult:
    """Build the full Medicaid analytic layer in dependency order,
    running the reference's QA invariants after each stage.

    ``strict_qa=True`` raises on the first FAIL (the reference's
    master script stops the load and emails); ``False`` records the
    results and continues.
    """
    qa: list[tuple[str, QaResult]] = []

    def gate(table: str, *checks: QaResult) -> None:
        for c in checks:
            qa.append((table, c))
            if strict_qa and not c[1]:
                raise AssertionError(f"QA FAIL {table}: {c[0]} ({c[2]})")

    demo = build_elig_demo(raw_elig)
    gate("elig_demo", *fused_table_qa(demo, unique_keys=["id_mcaid"]))

    timevar = build_elig_timevar(raw_elig, ref_rac, ref_address, ref_geocode)
    # the reference's full table-level gate
    # (qa_stage.mcaid_elig_timevar.R): segment uniqueness + interval
    # validity + overlap in ONE action, plus the member-count and
    # date-range golden-record spot checks against the raw extract
    gate("elig_timevar", *timevar_golden_qa(timevar, raw_elig))

    elig_month = build_elig_month(timevar)

    line = build_claim_line(raw_claim)
    gate("claim_line", *fused_table_qa(line, unique_keys=["claim_line_id"]))
    # per-table reference suites (round 6): qa_stage.mcaid_claim_line/
    # pharm/procedure/icdcm_header.R, each one fused aggregate
    gate("claim_line", *qa_mcaid_claim_line(line, demo))
    icdcm = build_claim_icdcm_header(raw_claim)
    if ref_icdcm is not None:
        gate(
            "claim_icdcm_header",
            *qa_mcaid_claim_icdcm_header(icdcm, demo, ref_icdcm),
        )
    else:
        gate("claim_icdcm_header", *qa_ids_in_elig(icdcm, demo))
    procedure = build_claim_procedure(raw_claim)
    gate("claim_procedure", *qa_mcaid_claim_procedure(procedure, demo))
    pharm = build_claim_pharm(raw_claim)
    gate("claim_pharm", *qa_mcaid_claim_pharm(pharm, demo))

    header = build_claim_header(
        raw_claim, icdcm, ref_xwalk, ref_hedis, ref_telehealth, ref_icdcm
    )
    # uniqueness + event-id invariants fused into one action; the
    # referential check is inherently a join so it stays separate
    gate(
        "claim_header",
        *fused_table_qa(
            header,
            unique_keys=["claim_header_id"],
            event_id="ed_pophealth_id",
            person_id="id_mcaid",
        ),
        check_referential(
            header.select("id_mcaid"), timevar.select("id_mcaid"), ["id_mcaid"],
            name="claim-members-in-elig",
        ),
    )

    tables = {
        "elig_demo": demo,
        "elig_timevar": timevar,
        "elig_month": elig_month,
        "claim_line": line,
        "claim_icdcm_header": icdcm,
        "claim_procedure": procedure,
        "claim_pharm": pharm,
        "claim_header": header,
    }

    if ref_icdcm is not None and ccw_config:
        tables["claim_ccw"] = build_claim_ccw(icdcm, header, ref_icdcm, ccw_config)
    if ref_rda is not None:
        tables["claim_bh"] = build_claim_bh(icdcm, pharm, procedure, ref_rda)

    return PipelineResult(tables=tables, qa=qa)


def mcare_header_qa(header: DataFrame) -> list[QaResult]:
    """Medicare claim_header invariants, one fused action: header-id
    uniqueness plus one-person + dense checks for EVERY event-id
    family the builder mints (pc_visit / inpatient / ed_perform /
    ed_pophealth — the reference spot-checks these per family in
    ``qa_tmp.mcare_claim_ccw.sql`` and the mcaid header QA at
    ``load_stage.mcaid_claim_header.R:1226-1253``)."""
    return fused_table_qa(
        header,
        unique_keys=["claim_header_id"],
        person_id="id_mcare",
        event_ids=[
            "pc_visit_id", "inpatient_id", "ed_perform_id", "ed_pophealth_id"
        ],
    )


def combined_header_qa(header: DataFrame) -> list[QaResult]:
    """Combined mcaid+mcare claim_header invariants
    (``qa_stage.mcaid_mcare_claim_ccw.sql`` shape): (source, claim) key
    uniqueness plus one-person + dense checks for the four re-minted
    event-id families — all in one fused action."""
    return fused_table_qa(
        header,
        unique_keys=["source_desc", "claim_header_id"],
        person_id="id_apde",
        event_ids=[
            "pc_visit_id", "inpatient_id", "ed_perform_id", "ed_pophealth_id"
        ],
    )


def run_mcaid_mcare_pipeline(
    mcaid_tables: dict[str, DataFrame],
    mcare_tables: dict[str, DataFrame],
    match_cols: list[str] = ("dob", "name_hash"),
    pha_persons: DataFrame | None = None,
    ref_icdcm: DataFrame | None = None,
    ccw_lookup_rows: list[dict] | None = None,
    ref_rda: DataFrame | None = None,
) -> PipelineResult:
    """Combined-layer master orchestration
    (``db_loader/mcaid_mcare/master_mcaid_mcare_analytic.R``): identity
    linkage first, then elig tables, then the six claims tables in the
    reference's order — line, icdcm_header, procedure, provider,
    header, ccw (+bh when the RDA ref is supplied) — each child gated
    by the union row-count QA and the header by the fused
    event-family invariants.

    ``mcaid_tables`` / ``mcare_tables`` carry that source's FINAL
    tables keyed by short name: ``persons`` (id + match cols; feeds
    the crosswalk), ``demo``, ``claim_line``, ``claim_icdcm_header``,
    ``claim_procedure``, ``claim_provider``, ``claim_header`` — any
    absent key skips that stage, mirroring the master script's
    section-by-section reruns.

    Every stage stays lazy; QA gates are the only actions, exactly
    like the per-source pipeline above.
    """
    from claims_data_spark.tables.conditions import (
        build_mcaid_mcare_claim_bh,
        build_mcaid_mcare_claim_ccw,
    )
    from claims_data_spark.tables.mcare import (
        build_mcaid_mcare_claim_header,
        build_mcaid_mcare_claim_icdcm_header,
        build_mcaid_mcare_claim_procedure,
        build_mcaid_mcare_elig_demo,
        build_mcaid_mcare_union,
        combined_child_union_qa,
    )
    from claims_data_spark.tables.xwalk import build_xwalk

    tables: dict[str, DataFrame] = {}
    qa: list[tuple[str, QaResult]] = []

    # identity linkage (the reference runs this before everything)
    xwalk = build_xwalk(
        mcaid_tables["persons"], mcare_tables["persons"],
        match_cols=list(match_cols), pha_persons=pha_persons,
    )
    tables["xwalk_apde_mcaid_mcare_pha"] = xwalk

    if "demo" in mcaid_tables and "demo" in mcare_tables:
        tables["mcaid_mcare_elig_demo"] = build_mcaid_mcare_elig_demo(
            xwalk, mcaid_tables["demo"], mcare_tables["demo"]
        )

    def child(name: str, builder) -> None:
        if name in mcaid_tables and name in mcare_tables:
            out = builder(mcaid_tables[name], mcare_tables[name], xwalk)
            ok, counts = combined_child_union_qa(
                out, mcaid_tables[name], mcare_tables[name]
            )
            qa.append((
                f"mcaid_mcare_{name}",
                (f"row count == mcaid + mcare {counts}", ok),
            ))
            tables[f"mcaid_mcare_{name}"] = out

    child("claim_line", build_mcaid_mcare_union)
    child("claim_icdcm_header", build_mcaid_mcare_claim_icdcm_header)
    child("claim_procedure", build_mcaid_mcare_claim_procedure)
    child("claim_provider", build_mcaid_mcare_union)
    child("claim_pharm", build_mcaid_mcare_union)

    if "claim_header" in mcaid_tables and "claim_header" in mcare_tables:
        header = build_mcaid_mcare_claim_header(
            mcaid_tables["claim_header"], mcare_tables["claim_header"], xwalk
        )
        tables["mcaid_mcare_claim_header"] = header
        qa.extend(
            ("mcaid_mcare_claim_header", r)
            for r in combined_header_qa(header)
        )
        icdcm = tables.get("mcaid_mcare_claim_icdcm_header")
        if icdcm is not None and ref_icdcm is not None and ccw_lookup_rows:
            tables["mcaid_mcare_claim_ccw"] = build_mcaid_mcare_claim_ccw(
                icdcm, header, ref_icdcm, ccw_lookup_rows
            )
            # qa_stage.mcaid_mcare_claim_ccw.sql STEP 1: all configured
            # conditions ran, zero NULL-id_apde header claims, zero
            # mcare-source members missing from the xwalk
            expected = [
                r["ccw_abbrev"] for r in ccw_lookup_rows
                if not r["ccw_abbrev"].endswith("_exclude1")
                and not r["ccw_abbrev"].endswith("_exclude2")
                and r["ccw_abbrev"] in ref_icdcm.columns
            ]
            qa.extend(
                ("mcaid_mcare_claim_ccw", r)
                for r in qa_mcaid_mcare_claim_ccw(
                    tables["mcaid_mcare_claim_ccw"], header, xwalk,
                    expected,
                )
            )
        pharm = tables.get("mcaid_mcare_claim_pharm")
        proc = tables.get("mcaid_mcare_claim_procedure")
        if (icdcm is not None and ref_rda is not None
                and pharm is not None and proc is not None):
            tables["mcaid_mcare_claim_bh"] = build_mcaid_mcare_claim_bh(
                icdcm, pharm, proc, ref_rda
            )

    return PipelineResult(tables=tables, qa=qa)


def run_apcd_pipeline(
    member_month: DataFrame,
    eligibility: DataFrame | None = None,
    claim_header_raw: DataFrame | None = None,
    claim_line_raw: DataFrame | None = None,
    claim_icdcm_raw: DataFrame | None = None,
    claim_procedure_raw: DataFrame | None = None,
    claim_provider_raw: DataFrame | None = None,
    provider_master_raw: DataFrame | None = None,
    plr_years: list[int] | None = None,
    ref_claim_status: DataFrame | None = None,
    ref_xwalk: DataFrame | None = None,
    ref_icdcm: DataFrame | None = None,
    ref_ethnicity_race_map: DataFrame | None = None,
    ref_zip_group: DataFrame | None = None,
    ref_county_code: DataFrame | None = None,
    ccw_lookup_rows: list[dict] | None = None,
    strict: bool = True,
) -> PipelineResult:
    """APCD master orchestration
    (``db_loader/apcd/07_apcd_create_analytic_tables.R`` — twelve
    tables in dependency order): elig_demo -> elig_timevar ->
    elig_month -> per-year PLR -> the four claim children ->
    ref.apcd_provider_npi -> claim_header (gated by the reference's
    eleven-invariant QA suite) -> claim_ccw.  Claim stages are
    skipped when their raw extract is not supplied, mirroring the
    master script's section reruns; PLR builds once per year in
    ``plr_years`` (the reference's 2014-2024 unrolled calls).
    """
    from claims_data_spark.tables.apcd import (
        build_apcd_claim_header,
        build_apcd_claim_icdcm_header,
        build_apcd_claim_line,
        build_apcd_claim_procedure,
        build_apcd_claim_provider,
        build_apcd_elig_demo,
        build_apcd_elig_month,
        build_apcd_elig_plr_multi,
        build_apcd_elig_timevar_full,
        qa_apcd_child,
        qa_apcd_claim_header,
    )
    from claims_data_spark.tables.conditions import build_apcd_claim_ccw
    from claims_data_spark.tables.provider import build_ref_apcd_provider_npi

    tables: dict[str, DataFrame] = {}
    qa: list[tuple[str, QaResult]] = []

    def gate(table: str, checks: list) -> None:
        for res in checks:
            qa.append((table, res))
            if strict:
                assert res[1], f"QA FAIL {table}: {res[0]}"

    demo = None
    if eligibility is not None:
        demo = build_apcd_elig_demo(
            member_month, eligibility,
            ref_ethnicity_race_map=ref_ethnicity_race_map,
        )
        tables["apcd_elig_demo"] = demo
    timevar = build_apcd_elig_timevar_full(
        member_month, ref_zip_group=ref_zip_group,
        ref_county_code=ref_county_code,
    )
    tables["apcd_elig_timevar"] = timevar
    tables["apcd_elig_month"] = build_apcd_elig_month(
        member_month, ref_zip_group=ref_zip_group,
        ref_county_code=ref_county_code,
    )
    if plr_years and demo is not None:
        # one-pass multi-year PLR (a broadcast year dim range-joins the
        # intervals) instead of the reference master's unrolled
        # per-year calls — 11 timevar scans become one
        multi = build_apcd_elig_plr_multi(
            timevar, demo, list(plr_years), ref_zip_group=ref_zip_group
        )
        tables["apcd_elig_plr"] = multi
        for y in plr_years:
            tables[f"apcd_elig_plr_{y}"] = multi.filter(
                F.col("plr_year") == int(y)
            ).drop("plr_year")

    if claim_header_raw is None:
        return PipelineResult(tables=tables, qa=qa)

    # children BEFORE the header, exactly the reference's table order
    # (Tables 4-7 then Table 10): the header builder consumes the
    # staged child shapes (discharge_date, long dx/px grains), not the
    # raw extracts
    line_child = icdcm_child = procedure_child = None
    if claim_line_raw is not None:
        line_child = build_apcd_claim_line(claim_line_raw, claim_header_raw)
        tables["apcd_claim_line"] = line_child
    if claim_icdcm_raw is not None:
        icdcm_child = build_apcd_claim_icdcm_header(
            claim_icdcm_raw, claim_header_raw
        )
        tables["apcd_claim_icdcm_header"] = icdcm_child
        gate("apcd_claim_icdcm_header",
             qa_apcd_child(icdcm_child, elig_demo=demo,
                           not_null_col="icdcm_norm"))
    if claim_procedure_raw is not None:
        procedure_child = build_apcd_claim_procedure(
            claim_procedure_raw, claim_header_raw
        )
        tables["apcd_claim_procedure"] = procedure_child
    if claim_provider_raw is not None:
        tables["apcd_claim_provider"] = build_apcd_claim_provider(
            claim_provider_raw
        )
        # qa_stage.apcd_claim_provider.sql generalized: projection row
        # parity with raw, provider id non-null, members in elig
        gate("apcd_claim_provider",
             qa_apcd_claim_provider(
                 tables["apcd_claim_provider"], claim_provider_raw,
                 elig_demo=demo,
             ))
        if provider_master_raw is not None:
            tables["ref_apcd_provider_npi"] = build_ref_apcd_provider_npi(
                provider_master_raw, claim_provider_raw
            )

    header = build_apcd_claim_header(
        claim_header_raw,
        line_child,
        icdcm_child,
        procedure_child,
        ref_claim_status=ref_claim_status,
        ref_xwalk=ref_xwalk,
        ref_icdcm=ref_icdcm,
    )
    tables["apcd_claim_header"] = header
    gate("apcd_claim_header",
         qa_apcd_claim_header(header, claim_header_raw, elig_demo=demo))

    if ccw_lookup_rows and ref_icdcm is not None \
            and claim_icdcm_raw is not None:
        tables["apcd_claim_ccw"] = build_apcd_claim_ccw(
            tables["apcd_claim_icdcm_header"], header, ref_icdcm,
            ccw_lookup_rows,
        )
    return PipelineResult(tables=tables, qa=qa)


def run_mcare_pipeline(
    bene_enrollment: DataFrame,
    claim_sources: dict[str, DataFrame] | None = None,
    line_sources: dict[str, tuple[DataFrame, DataFrame | None]] | None = None,
    harmonized_header: DataFrame | None = None,
    harmonized_line: DataFrame | None = None,
    pde: DataFrame | None = None,
    pharm_char_raw: DataFrame | None = None,
    ref_geo_kc_zip: DataFrame | None = None,
    ref_xwalk: DataFrame | None = None,
    ref_pc_oregon: DataFrame | None = None,
    ref_icdcm: DataFrame | None = None,
    ccw_lookup_rows: list[dict] | None = None,
    ref_rda: DataFrame | None = None,
    ref_naloxone_ndc: DataFrame | None = None,
    oud_dx_codes: DataFrame | None = None,
    strict: bool = True,
) -> PipelineResult:
    """Medicare master orchestration
    (``db_loader/mcare/02_master_mcare_claims_analytic.R`` — fourteen
    tables): elig demo/timevar/month off the MBSF enrollment stage,
    then line / icdcm_header / procedure / provider / pharm /
    pharm_char off the per-filetype claim extracts, the header gated
    by the fused event-family invariants, then ccw / bh / moud /
    naloxone off the children.

    ``claim_sources`` maps filetype -> base-claims frame (the dx
    columns live there); ``line_sources`` maps filetype ->
    (base_claims, detail) pairs for the line/procedure/pharm grains —
    both exactly the per-builder contracts, so a section is skipped
    when its extract is absent (the master script's rerun pattern).
    """
    from claims_data_spark.tables.conditions import (
        build_mcare_claim_bh,
        build_mcare_claim_ccw,
    )
    from claims_data_spark.tables.mcare import (
        build_mcare_claim_header,
        build_mcare_claim_icdcm_header,
        build_mcare_claim_line,
        build_mcare_claim_pharm,
        build_mcare_claim_procedure,
        build_mcare_claim_provider,
    )
    from claims_data_spark.tables.mcare_elig import (
        build_mcare_elig_demo,
        build_mcare_elig_month,
        build_mcare_elig_timevar,
    )
    from claims_data_spark.tables.moud import build_mcare_claim_moud
    from claims_data_spark.tables.naloxone import build_mcare_claim_naloxone
    from claims_data_spark.tables.pharmacy import (
        build_mcare_claim_pharm_char,
    )

    tables: dict[str, DataFrame] = {}
    qa: list[tuple[str, QaResult]] = []

    def gate(table: str, checks: list) -> None:
        for res in checks:
            qa.append((table, res))
            if strict:
                assert res[1], f"QA FAIL {table}: {res[0]}"

    demo = build_mcare_elig_demo(
        bene_enrollment, ref_geo_kc_zip=ref_geo_kc_zip
    )
    tables["mcare_elig_demo"] = demo
    gate("mcare_elig_demo",
         fused_table_qa(demo, unique_keys=["id_mcare"]))
    tables["mcare_elig_timevar"] = build_mcare_elig_timevar(
        bene_enrollment, elig_demo=demo, ref_geo_kc_zip=ref_geo_kc_zip
    )
    # the reference's full timevar suite (qa_stage.mcare_elig_timevar.R):
    # dup-row/interval/overlap fused + distinct-id parity with MBSF
    gate("mcare_elig_timevar",
         qa_mcare_elig_timevar(tables["mcare_elig_timevar"],
                               bene_enrollment))
    tables["mcare_elig_month"] = build_mcare_elig_month(
        bene_enrollment, elig_demo=demo, ref_geo_kc_zip=ref_geo_kc_zip
    )

    if not claim_sources:
        return PipelineResult(tables=tables, qa=qa)
    enrollment = bene_enrollment.select(
        F.col("bene_id") if "bene_id" in bene_enrollment.columns
        else F.col("id_mcare").alias("bene_id")
    ).distinct()

    icdcm = build_mcare_claim_icdcm_header(claim_sources, enrollment)
    tables["mcare_claim_icdcm_header"] = icdcm
    procedure = pharm = None
    if line_sources:
        # claim_line's per-filetype contract is (line_df, base_df) —
        # the reverse of procedure's (base, detail) pairs
        tables["mcare_claim_line"] = build_mcare_claim_line(
            {k: (detail, base) for k, (base, detail) in
             line_sources.items() if detail is not None},
            enrollment,
        )
        procedure = build_mcare_claim_procedure(line_sources, enrollment)
        tables["mcare_claim_procedure"] = procedure
        facility_only = {
            k: (detail, base) for k, (base, detail) in line_sources.items()
            if detail is not None and k not in ("carrier", "dme")
        }
        pharm = build_mcare_claim_pharm(facility_only, pde, enrollment)
        tables["mcare_claim_pharm"] = pharm
    # standardize the CMS NPI role names per filetype before the
    # provider unpivot (the builder's contract is caller-side aliasing
    # because the vocabulary differs per vintage)
    _ROLE_ALIASES = {
        "at_physn_npi": "attending", "op_physn_npi": "operating",
        "ot_physn_npi": "other", "org_npi_num": "organization",
        "rndrng_physn_npi": "rendering",
        "carr_clm_blg_npi_num": "billing", "rfr_physn_npi": "referring",
    }
    prov_sources = {}
    for ft, df in claim_sources.items():
        renamed = df
        for src, role in _ROLE_ALIASES.items():
            if src in df.columns:
                renamed = renamed.withColumnRenamed(src, role)
        if any(r in renamed.columns for r in _ROLE_ALIASES.values()):
            prov_sources[ft] = renamed
    if prov_sources:
        tables["mcare_claim_provider"] = build_mcare_claim_provider(
            prov_sources
        )
    if pharm_char_raw is not None:
        tables["mcare_claim_pharm_char"] = build_mcare_claim_pharm_char(
            pharm_char_raw
        )

    # the header consumes the HARMONIZED cross-filetype union (the
    # raw->stage layer produced by mcare_facility_stage /
    # bcarrier/dme vintage maps), not the raw CMS extracts the child
    # builders take — mirror of the reference where Table 9 reads the
    # stage tables Tables 3-8 already built
    header = None
    if harmonized_header is not None:
        header = build_mcare_claim_header(
            harmonized_header, harmonized_line, icdcm, procedure,
            ref_xwalk=ref_xwalk, ref_pc_oregon=ref_pc_oregon,
        )
        tables["mcare_claim_header"] = header
        gate("mcare_claim_header", mcare_header_qa(header))

    if header is not None and ref_icdcm is not None and ccw_lookup_rows:
        tables["mcare_claim_ccw"] = build_mcare_claim_ccw(
            icdcm, header, ref_icdcm, ccw_lookup_rows
        )
    if ref_rda is not None and pharm is not None and procedure is not None:
        tables["mcare_claim_bh"] = build_mcare_claim_bh(
            icdcm, pharm, procedure, ref_rda
        )
    if header is not None and oud_dx_codes is not None \
            and procedure is not None:
        tables["mcare_claim_moud"] = build_mcare_claim_moud(
            procedure, header, pharm, oud_dx_codes
        )
    if ref_naloxone_ndc is not None and pharm is not None \
            and procedure is not None:
        tables["mcare_claim_naloxone"] = build_mcare_claim_naloxone(
            pharm, procedure, ref_naloxone_ndc
        )
    return PipelineResult(tables=tables, qa=qa)
