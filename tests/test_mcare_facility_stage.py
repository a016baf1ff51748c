"""Medicare facility raw->stage harmonization
(load_stage.mcare_*_base_claims.R / *_revenue_center.R)."""

from __future__ import annotations

from claims_data_spark.tables.mcare_facility_stage import (
    BASE_CLAIMS_TARGETS,
    RC_TARGETS,
    build_mcare_base_claims,
    build_mcare_revenue_center,
    harmonized_stage_union,
)

RC_2014_SCHEMA = (
    "bene_id string, clm_id string, clm_line_num string, rev_cntr string,"
    " hcpcs_cd string, rev_cntr_ndc_qty string,"
    " rev_cntr_ndc_qty_qlfr_cd string, rndrng_physn_npi string"
)
RC_2015_SCHEMA = (
    "bene_id string, clm_id string, clm_line_num string, rev_cntr string,"
    " hcpcs_cd string, hcpcs_1st_mdfr_cd string, hcpcs_2nd_mdfr_cd string,"
    " rev_cntr_ide_ndc_upc_num string, rev_cntr_ndc_qty string,"
    " rev_cntr_ndc_qty_qlfr_cd string"
)


def test_revenue_center_vintage_union(spark):
    raw14 = spark.createDataFrame(
        [("B1", "C1", "1", "0450", "99281", "5", "UN", "NPI9")],
        RC_2014_SCHEMA,
    )
    raw15 = spark.createDataFrame(
        [
            ("B2", "C2", "1", "0300", "80053", "25", "59", "NDC1", "2", "ML"),
            # exact duplicate collapses through the single DISTINCT
            ("B2", "C2", "1", "0300", "80053", "25", "59", "NDC1", "2", "ML"),
        ],
        RC_2015_SCHEMA,
    )
    out = build_mcare_revenue_center([(raw14, "2014"), (raw15, "2015+")])
    assert out.columns == RC_TARGETS + ["last_run"]
    rows = {r["id_mcare"]: r for r in out.collect()}
    assert len(rows) == 2
    # 2014 vintage: no modifiers/ndc, rendering NPI present
    assert rows["B1"]["procedure_code_hcps_modifier_1"] is None
    assert rows["B1"]["ndc_code"] is None
    assert rows["B1"]["provider_rendering_npi"] == "NPI9"
    # 2015+ vintage: the reverse
    assert rows["B2"]["procedure_code_hcps_modifier_1"] == "25"
    assert rows["B2"]["ndc_code"] == "NDC1"
    assert rows["B2"]["provider_rendering_npi"] is None


def test_base_claims_dx_pc_fanout_and_specialties(spark):
    cols14 = {
        "bene_id": "B1",
        "clm_id": "C1",
        "clm_from_dt": "2014-01-01",
        "clm_thru_dt": "2014-01-05",
        "prncpal_dgns_cd": "I10",
        "icd_dgns_cd1": "E119",
        "icd_prcdr_cd1": "0016070",
    }
    cols15 = {
        "bene_id": "B2",
        "clm_id": "C2",
        "clm_from_dt": "2015-06-01",
        "clm_thru_dt": "2015-06-02",
        "prncpal_dgns_cd": "J189",
        "at_physn_spclty_cd": "01",
        "rndrng_physn_npi": "NPIX",
    }
    raw14 = spark.createDataFrame(
        [tuple(cols14.values())],
        ", ".join(f"{c} string" for c in cols14),
    )
    raw15 = spark.createDataFrame(
        [tuple(cols15.values())],
        ", ".join(f"{c} string" for c in cols15),
    )
    out = build_mcare_base_claims([(raw14, "2014"), (raw15, "2015+")])
    assert out.columns == BASE_CLAIMS_TARGETS + ["last_run"]
    rows = {r["id_mcare"]: r for r in out.collect()}
    assert rows["B1"]["dx01"] == "I10"
    assert rows["B1"]["dx02"] == "E119"   # icd_dgns_cd1 -> dx02
    assert rows["B1"]["pc01"] == "0016070"
    assert rows["B1"]["provider_attending_specialty"] is None  # 2014
    assert rows["B2"]["provider_attending_specialty"] == "01"
    assert rows["B2"]["provider_rendering_npi"] == "NPIX"
    assert rows["B2"]["dx26"] is None


def test_harmonizer_same_name_default_and_extras(spark):
    raw = spark.createDataFrame(
        [("B1", "Z1")], "id_mcare string, custom_col string"
    )
    out = harmonized_stage_union(
        [(raw, {})], ["id_mcare", "custom_col", "absent_col"]
    )
    r = out.collect()[0]
    assert r["id_mcare"] == "B1"
    assert r["custom_col"] == "Z1"   # same-name convention
    assert r["absent_col"] is None
