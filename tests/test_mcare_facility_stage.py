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


def test_bcarrier_claims_three_vintage_union(spark):
    from claims_data_spark.tables.mcare_facility_stage import (
        BCARRIER_CLAIMS_TARGETS,
        build_mcare_bcarrier_claims,
    )

    raw14 = spark.createDataFrame(
        [{
            "encrypted723beneficiaryid": "B1",
            "encryptedclaimid": "C1",
            "claimfromdate": "2014-02-01",
            "claimthroughdatedeterminesyearof": "2014-02-01",
            "nchclaimtypecode": "71",
            "carrierclaimpaymentdenialcode": "1",
            "carrierclaimreferingphysiciannpi": "NPI-R",
            "primaryclaimdiagnosiscode": "4019",
            "primaryclaimdiagnosiscodediagnos": "9",
            "claimdiagnosiscodei": "25000",
            "claimdiagnosiscodeidiagnosisvers": "9",
        }]
    )
    raw15 = spark.createDataFrame(
        [{
            "bene_id": "B2", "clm_id": "C2", "from_dt": "2015-03-01",
            "thru_dt": "2015-03-01", "clm_type": "71", "pmtdnlcd": "1",
            "carr_clm_blg_npi_num": "NPI-B", "rfr_npi": "NPI-R2",
            "cpo_org_npi_num": "NPI-C", "carr_clm_sos_npi_num": "NPI-S",
            "prncpal_dgns_cd": "I10", "prncpal_dgns_vrsn_cd": "0",
        }]
    )
    raw16 = spark.createDataFrame(
        [{
            "bene_id": "B3", "clm_id": "C3", "clm_from_dt": "2016-04-01",
            "clm_thru_dt": "2016-04-01", "nch_clm_type_cd": "71",
            "carr_clm_pmt_dnl_cd": "1", "carr_clm_blg_npi_num": "NPI-B3",
            "rfr_physn_npi": "NPI-R3",
            "prncpal_dgns_cd": "E119", "prncpal_dgns_vrsn_cd": "0",
            "icd_dgns_cd1": "I10", "icd_dgns_vrsn_cd1": "0",
        }]
    )
    out = build_mcare_bcarrier_claims(
        [(raw14, "2014"), (raw15, "2015"), (raw16, "2016+")]
    )
    assert out.columns == BCARRIER_CLAIMS_TARGETS + ["last_run"]
    rows = {r["id_mcare"]: r for r in out.collect()}
    assert len(rows) == 3
    # 2014: no billing NPI vintage-wide; dx02 maps the roman-numeral col
    assert rows["B1"]["provider_billing_npi"] is None
    assert rows["B1"]["dx02"] == "25000" and rows["B1"]["dx02_ver"] == "9"
    # 2015 abbreviated names land on the same targets
    assert rows["B2"]["denial_code"] == "1"
    assert rows["B2"]["provider_sos_npi"] == "NPI-S"
    # 2016+ ResDAC names; dx02 from icd_dgns_cd1
    assert rows["B3"]["dx01"] == "E119" and rows["B3"]["dx02"] == "I10"


def test_bcarrier_line_and_dme_maps(spark):
    from claims_data_spark.tables.mcare_facility_stage import (
        BCARRIER_LINE_TARGETS,
        DME_LINE_TARGETS,
        build_mcare_bcarrier_line,
        build_mcare_dme_line,
    )

    line14 = spark.createDataFrame(
        [{
            "encrypted723beneficiaryid": "B1", "encryptedclaimid": "C1",
            "claimlinenumber": "1",
            "carrierlineperformingnpinumber": "NPI-P",
            "linehealthcarecommonprocedurecod": "99213",
            "linehcpcsinitialmodifiercode": "25",
        }]
    )
    line16 = spark.createDataFrame(
        [{
            "bene_id": "B2", "clm_id": "C2", "line_num": "1",
            "prf_physn_npi": "NPI-P2", "hcpcs_cd": "99214",
            "physn_zip_cd": "98101",
        }]
    )
    out = build_mcare_bcarrier_line([(line14, "2014"), (line16, "2016+")])
    assert out.columns == BCARRIER_LINE_TARGETS + ["last_run"]
    rows = {r["id_mcare"]: r for r in out.collect()}
    # 2014 has no billing zip; both HCPCS land in one target column
    assert rows["B1"]["provider_billing_zip"] is None
    assert rows["B1"]["procedure_code_hcpcs"] == "99213"
    assert rows["B2"]["provider_billing_zip"] == "98101"

    dme = spark.createDataFrame(
        [{
            "bene_id": "B9", "clm_id": "C9", "line_num": "2",
            "hcpcs_cd": "E0601", "hcpcs_3rd_mdfr_cd": "NU",
            "prvdr_npi": "NPI-D",
        }]
    )
    dout = build_mcare_dme_line([dme])
    assert dout.columns == DME_LINE_TARGETS + ["last_run"]
    r = dout.collect()[0]
    assert r["procedure_code_hcps_modifier_3"] == "NU"
    assert r["provider_supplier_npi"] == "NPI-D"
