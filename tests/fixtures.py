"""Deterministic synthetic claims fixtures per FIXTURES.md.

Small, hand-designed inputs that exercise every branch the table
builders have: multi-RAC months, conflicting dual indicators, sub-month
RAC spans, address changes, DOB conflicts, language ties, ICD-9/10
cutover codes, ED visits 0/1/2 days apart, HEDIS overlap codes,
telehealth modifier combos, type-1/type-2 CCW conditions with
exclusions, and OUD/MOUD as-of ordering.
"""

from __future__ import annotations

import datetime as dt


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


ELIG_SCHEMA = (
    "CLNDR_YEAR_MNTH int, MBR_H_SID string, BIRTH_DATE date, GENDER string, "
    "RACE1_NAME string, RACE2_NAME string, HISPANIC_ORIGIN_NAME string, "
    "SPOKEN_LNG_NAME string, WRTN_LNG_NAME string, RAC_CODE int, "
    "RPRTBL_BSP_GROUP_CID int, RAC_FROM_DATE date, RAC_TO_DATE date, "
    "COVERAGE_TYPE_IND string, MC_PRVDR_ID string, DUALELIGIBLE_INDICATOR string, "
    "HEALTH_HOME_CLINICAL_INDICATOR string, geo_hash_raw string"
)


def raw_mcaid_elig(spark):
    H1, H2 = "hashA" + "0" * 59, "hashB" + "0" * 59
    rows = [
        # p1: 2017-01..03 contiguous, address change inside Feb -> island split
        (201701, "p1", d("1990-05-15"), "Female", "WHITE", None, None, "ENGLISH", "ENGLISH", 1001, 10, d("2017-01-01"), d("2017-01-31"), "FFS", None, "N", "N", H1),
        (201702, "p1", d("1990-05-15"), "Female", "WHITE", None, None, "ENGLISH", "ENGLISH", 1001, 10, d("2017-02-01"), d("2017-02-28"), "FFS", None, "N", "N", H2),
        (201703, "p1", d("1990-05-15"), "Female", "WHITE", None, None, "ENGLISH", "ENGLISH", 1001, 10, d("2017-03-01"), d("2017-03-31"), "FFS", None, "N", "N", H2),
        # gap (April), then May-June
        (201705, "p1", d("1990-05-15"), "Female", "WHITE", None, None, "ENGLISH", "ENGLISH", 1001, 10, d("2017-05-01"), d("2017-05-31"), "FFS", None, "N", "N", H2),
        (201706, "p1", d("1990-05-15"), "Female", "WHITE", None, None, "ENGLISH", "ENGLISH", 1001, 10, d("2017-06-01"), d("2017-06-30"), "FFS", None, "N", "N", H2),
        # p2: dual-RAC month (1002 secondary must drop), conflicting
        # dual indicator WITHIN the rac-1001 covariate tuple ('N/A' +
        # 'Y' -> max rule picks 'Y'), DOB conflict (1985-01-01 beats
        # 1985-01-02), language tie EN/ES, gender switch -> Multiple,
        # race OTHER -> null
        (201701, "p2", d("1985-01-01"), "Male", "OTHER", "ASIAN", None, "SPANISH", "ENGLISH", 1001, 10, d("2017-01-01"), d("2017-01-31"), "MC", "m1", "N/A", "Y", H1),
        (201701, "p2", d("1985-01-01"), "Male", "OTHER", "ASIAN", None, "SPANISH", "ENGLISH", 1001, 10, d("2017-01-01"), d("2017-01-31"), "MC", "m1", "Y", "Y", H1),
        (201701, "p2", d("1985-01-01"), "Male", "OTHER", "ASIAN", None, "SPANISH", "ENGLISH", 1002, 11, d("2017-01-01"), d("2017-01-31"), "MC", "m1", "Y", "Y", H1),
        (201702, "p2", d("1985-01-02"), "Female", "OTHER", "ASIAN", None, "ENGLISH", "SPANISH", 1001, 10, d("2017-02-01"), d("2017-02-28"), "MC", "m1", "N", "Y", H1),
        # p3: sub-month RAC span (Jan 10-20) -> clipped interval
        (201701, "p3", d("2000-12-31"), "Male", "BLACK", None, "NOT HISPANIC", "SOMALI", None, 1003, 12, d("2017-01-10"), d("2017-01-20"), "FFS", None, "N", None, H2),
    ]
    return spark.createDataFrame(rows, ELIG_SCHEMA)


CLAIM_SCHEMA = (
    "MBR_H_SID string, TCN long, CLM_LINE_TCN long, CLM_TYPE_CID int, "
    "FROM_SRVC_DATE date, TO_SRVC_DATE date, REVENUE_CODE string, "
    "TYPE_OF_BILL string, CLAIM_STATUS int, "
    "PRIMARY_DIAGNOSIS_CODE string, DIAGNOSIS_CODE_2 string, DIAGNOSIS_CODE_3 string, "
    "ADMTNG_DIAGNOSIS_CODE string, "
    "PRCDR_CODE_1 string, PRCDR_CODE_2 string, LINE_PRCDR_CODE string, "
    "MDFR_CODE1 string, MDFR_CODE2 string, "
    "NDC string, PRSCRPTN_FILLED_DATE date, DAYS_SUPPLY int, "
    "SBMTD_DISPENSED_QUANTITY decimal(19,3), PRSCRBR_ID string, "
    "NPI long, BLNG_NATIONAL_PRVDR_IDNTFR long, FCLTY_TYPE_CODE string, "
    "ADMSN_DATE date, ADMSN_HOUR int, DSCHRG_DATE date, PATIENT_STATUS_LKPCD string"
)


def raw_mcaid_claim(spark):
    from decimal import Decimal

    q = Decimal("10.000")
    rows = [
        # p1 ED visits d, d+1, d+3 (FIXTURES §14.3): TCN 1,2,3; facility ED (rev 0450)
        ("p1", 1, 101, 3, d("2017-01-05"), d("2017-01-05"), "0450", "0111", 71, "25000", "E9501", None, None, "99284", None, None, None, None, None, None, None, None, "1234567890", 111, 111, "23", d("2017-01-05"), 1330, d("2017-01-06"), "01"),
        ("p1", 2, 102, 3, d("2017-01-06"), d("2017-01-06"), "0451", "0111", 71, "25000", None, None, None, "99285", None, None, None, None, None, None, None, None, "1234567890", 111, 111, "23", None, None, None, None),
        ("p1", 3, 103, 3, d("2017-01-08"), d("2017-01-08"), "0456", "0111", 71, "V100", None, None, None, "99281", None, None, None, None, None, None, None, None, "1234567890", 111, 111, "23", None, None, None, None),
        # p1 inpatient claim w/ HEDIS rev 'IPREV' code + acute TOB
        ("p1", 4, 104, 1, d("2017-02-10"), d("2017-02-14"), "0100", "0111", 71, "25000", "F329", None, "25000", None, None, None, None, None, None, None, None, None, "AB1234567", 111, 111, "21", d("2017-02-10"), 900, d("2017-02-14"), "01"),
        # p2 inpatient excluded by nonacute TOB (HEDIS except path)
        ("p2", 5, 105, 1, d("2017-01-15"), d("2017-01-20"), "0100", "0118", 71, "4019", None, None, None, None, None, None, None, None, None, None, None, None, "5123456787", 222, 222, "21", d("2017-01-15"), 800, d("2017-01-20"), "01"),
        # p2 telehealth professional claim (px + GT modifier), status 83 w/ null NPI
        ("p2", 6, 106, 5, d("2017-02-03"), d("2017-02-03"), None, None, 83, "F329", None, None, None, None, None, "99213", "GT", None, None, None, None, None, "XZ99", None, 333, "02", None, None, None, None),
        # p2 pharmacy claim (NDC, null filled date -> coalesce to TO_SRVC)
        ("p2", 7, 107, 27, d("2017-02-20"), d("2017-02-20"), None, None, 71, None, None, None, None, None, None, None, None, None, "00002323401", None, 30, q, "1987654321", 444, 444, "01", None, None, None, None),
        # p2 OUD dx claim (March) then MOUD procedure claim (April: qualifies),
        # p3 MOUD procedure claim with no prior OUD dx (must NOT qualify)
        ("p2", 8, 108, 5, d("2017-03-02"), d("2017-03-02"), None, None, 71, "F1120", None, None, None, None, None, "99214", None, None, None, None, None, None, None, None, 333, "11", None, None, None, None),
        ("p2", 9, 109, 5, d("2017-04-10"), d("2017-04-10"), None, None, 71, "F1120", None, None, None, "H0020", None, None, None, None, None, None, None, None, None, None, 333, "11", None, None, None, None),
        ("p3", 10, 110, 5, d("2017-04-12"), d("2017-04-12"), None, None, 71, "Z001", None, None, None, "H0020", None, None, None, None, None, None, None, None, None, None, 333, "11", None, None, None, None),
        # p3 two diabetes claims 2 months apart (type-2 CCW qualification);
        # second has exclusion dx in dx2 for the ccw_excl condition test
        ("p3", 11, 111, 5, d("2017-01-12"), d("2017-01-12"), None, None, 71, "25000", None, None, None, None, None, "99213", None, None, None, None, None, None, None, None, 333, "11", None, None, None, None),
        ("p3", 12, 112, 5, d("2017-03-15"), d("2017-03-15"), None, None, 71, "25000", "64891", None, None, None, None, "99213", None, None, None, None, None, None, None, None, 333, "11", None, None, None, None),
        # multi-line claim: two lines same header (line distinctness)
        ("p1", 13, 113, 5, d("2017-05-20"), d("2017-05-20"), None, None, 71, "4019", None, None, None, "99213", "93000", None, "25", None, None, None, None, None, "1122334455", 111, 111, "11", None, None, None, None),
        ("p1", 13, 114, 5, d("2017-05-20"), d("2017-05-20"), None, None, 71, "4019", None, None, None, "99213", "93000", "36415", "59", None, None, None, None, None, "1122334455", 111, 111, "11", None, None, None, None),
    ]
    return spark.createDataFrame(rows, CLAIM_SCHEMA)


def ref_icdcm_codes(spark):
    # (icdcm, ver, ccs_detail_desc, ccs_catch_all, mh_any, sud_any,
    #  intent, mechanism, ccw_diabetes, ccw_diabetes_exclude1, ccw_hypertension)
    rows = [
        # codes stored NORMALIZED (ICD-9 zero-padded to 5), matching the
        # reference's ref.icdcm_codes convention (FIXTURES.md §3)
        ("25000", 9, "Diabetes mellitus without complication", 0, 0, 0, None, None, 1, 0, 0),
        ("40190", 9, "Essential hypertension", 0, 0, 0, None, None, 0, 0, 1),
        ("64891", 9, "Gestational diabetes exclusion", 0, 0, 0, None, None, 0, 1, 0),
        ("V1000", 9, "Personal history of malignancy", 0, 0, 0, None, None, 0, 0, 0),
        ("F329", 10, "Major depressive disorder", 0, 1, 0, None, None, 0, 0, 0),
        ("F1120", 10, "Opioid dependence", 0, 0, 1, None, None, 0, 0, 0),
        ("Z001", 10, "Well child exam", 1, 0, 0, None, None, 0, 0, 0),
        # e-code prefix rows for the LIKE-prefix join (stored truncated)
        ("E950", 9, "Suicide and self-inflicted injury", 0, 0, 0, "suicide", "poisoning", 0, 0, 0),
    ]
    return spark.createDataFrame(
        rows,
        "icdcm string, icdcm_version int, ccs_detail_desc string, ccs_catch_all int, "
        "mh_any int, sud_any int, intent string, mechanism string, "
        "ccw_diabetes int, ccw_diabetes_exclude1 int, ccw_hypertension int",
    )


def ref_claim_type_xwalk(spark):
    rows = [(1, 1), (3, 4), (5, 5), (26, 4), (27, 6), (34, 4), (19, 7), (31, 7), (33, 7)]
    return spark.createDataFrame(rows, "source_clm_type_id int, kc_clm_type_id int")


def ref_rac_code(spark):
    rows = [(1001, "Y", 10, "Standard"), (1002, "N", 11, "Partial"), (1003, "Y", 12, "CHIP")]
    return spark.createDataFrame(
        rows, "rac_code int, full_benefit string, bsp_group_cid int, bsp_group_name string"
    )


def ref_hedis(spark):
    rows = [
        ("Inpatient Stay", "UBREV", "0100"),
        ("Nonacute Inpatient Stay", "UBTOB", "0118"),
    ]
    return spark.createDataFrame(rows, "value_set_name string, code_system string, code string")


def ref_telehealth(spark):
    # code requiring modifier, code requiring none, bare-modifier row
    rows = [
        ("99213", 1, None, "95", "GT", None, "GQ", None, None),
        ("99443", 0, None, None, None, None, None, None, None),
        ("GT", None, None, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "code string, modifier_flag int, modifier_cr string, modifier_95 string, "
        "modifier_gt string, modifier_g0 string, modifier_gq string, modifier_fq string, "
        "modifier_93 string",
    )


def ref_rda_value_sets(spark):
    rows = [
        ("mh_depression", "ICD10CM", "F329", 10, "mh-dx", 0),
        ("sud_opioid", "ICD10CM", "F1120", 10, "sud-dx", 0),
        ("sud_opioid", "NDC", "00002323401", None, "moud-ndc", 0),
        ("sud_opioid", "HCPCS", "H0020", None, "apde-moud-procedure", 1),
    ]
    return spark.createDataFrame(
        rows,
        "sub_group_condition string, code_set string, code string, "
        "icdcm_version int, value_set_name string, oud_dx1_flag int",
    )


def ref_ccw_lookup(spark):
    # type-1 hypertension (1 claim qualifies); type-2 diabetes (2 claims
    # within 24mo) with an exclusion abbrev
    rows = [
        (1, "Hypertension", "ccw_hypertension", "any", "1;4;5", None, 1, 12),
        (2, "Diabetes", "ccw_diabetes", "any", "1;4", "5", 2, 24),
        (3, "Diabetes excl", "ccw_diabetes_exclude1", "any", None, None, 2, 24),
    ]
    return spark.createDataFrame(
        rows,
        "ccw_code int, ccw_desc string, ccw_abbrev string, dx_fields string, "
        "claim_type_1 string, claim_type_2 string, condition_type int, lookback_months int",
    )


def ref_address(spark):
    H1, H2 = "hashA" + "0" * 59, "hashB" + "0" * 59
    clean = spark.createDataFrame(
        [
            (H1, "100 MAIN ST", "SEATTLE", "WA", "98101", "g1"),
            (H2, "200 OAK AVE", "BELLEVUE", "WA", "98004", "g2"),
        ],
        "geo_hash_raw string, geo_add1_clean string, geo_city_clean string, "
        "geo_state_clean string, geo_zip_clean string, geo_hash_geocode string",
    )
    geocode = spark.createDataFrame(
        [("g1", "033", "t1", "h1"), ("g2", "033", "t2", "h2")],
        "geo_hash_geocode string, geo_id20_county string, geo_id20_tract string, geo_id20_hra string",
    )
    return clean, geocode


# --- APCD claim-side fixtures (load_stage.apcd_claim_header.R) ---------------

APCD_HEADER_SCHEMA = (
    "internal_member_id long, medical_claim_header_id long, product_code_id long, "
    "first_service_dt date, last_service_dt date, first_paid_dt date, "
    "last_paid_dt date, charge_amt decimal(19,2), header_status string, "
    "type_of_bill_code string, claim_type_id string, type_of_setting_id string, "
    "place_of_setting_id string, emergency_room_flag string, "
    "denied_header_flag string, orphaned_header_flag string, "
    "inpatient_acute_flag int, telehealth_flag int"
)


def raw_apcd_claim_header(spark):
    from decimal import Decimal

    c = Decimal("100.00")
    rows = [
        # person 101: ED facility visits d0, d0+1 (one episode), d0+3 (new
        # episode); outpatient kc type 4 via '2.3.1'; h1 also ED-perform
        (101, 1, 10, d("2019-03-01"), d("2019-03-01"), d("2019-03-10"), d("2019-03-10"), c, "P", "0131", "2", "3", "1", "Y", "N", "N", 0, 0),
        (101, 2, 10, d("2019-03-02"), d("2019-03-02"), d("2019-03-11"), d("2019-03-11"), c, "P", "0131", "2", "3", "1", "N", "N", "N", 0, 0),
        (101, 3, 10, d("2019-03-04"), d("2019-03-04"), d("2019-03-12"), d("2019-03-12"), c, "P", "0131", "2", "3", "1", "N", "N", "N", 0, 0),
        # person 101: inpatient stay '1.1.1' with discharge -> inpatient_id
        (101, 4, 10, d("2019-05-01"), d("2019-05-05"), d("2019-05-15"), d("2019-05-15"), c, "P", "0111", "1", "1", "1", "N", "N", "N", 1, 0),
        # person 102: carrier ED ('3.2.5' kc 5): px 99284 + POS 23 line
        (102, 5, 11, d("2019-04-10"), d("2019-04-10"), d("2019-04-20"), d("2019-04-20"), c, "P", None, "3", "2", "5", "N", "N", "N", 0, 0),
        # person 102: primary-care visit (99213 + taxonomy match)
        (102, 6, 11, d("2019-06-15"), d("2019-06-15"), d("2019-06-25"), d("2019-06-25"), c, "P", None, "2", "3", "1", "N", "N", "N", 0, 0),
        # denied claim (excluded); sentinel place-of-setting
        (102, 7, 11, d("2019-07-01"), d("2019-07-01"), d("2019-07-05"), d("2019-07-05"), c, "P", None, "2", "3", "-1", "N", "Y", "N", 0, 0),
        # person 102: injury claim (T-poisoning primary + secondary F329)
        (102, 8, -1, d("2019-08-20"), d("2019-08-20"), d("2019-08-30"), d("2019-08-30"), c, "S", "-2", "2", "3", "1", "N", "N", "N", 0, 0),
    ]
    return spark.createDataFrame(rows, APCD_HEADER_SCHEMA)


def raw_apcd_claim_line(spark):
    rows = [
        (1, d("2019-03-01"), "23", "0450"),
        (2, None, None, "0451"),
        (3, None, None, "0456"),
        (4, d("2019-05-05"), "21", "0100"),
        (5, None, "23", None),
        (6, None, "11", None),
        (8, None, "11", None),
    ]
    return spark.createDataFrame(
        rows,
        "claim_header_id long, discharge_date date, "
        "place_of_service_code string, revenue_code string",
    )


def raw_apcd_claim_icdcm(spark):
    rows = [
        (101, 1, "25000", 9, "01"),
        (101, 4, "25000", 9, "01"),
        (102, 5, "F329", 10, "01"),
        (102, 6, "Z000", 10, "01"),
        # h8: poisoning nature code (injury) + secondary MH dx
        (102, 8, "T402X1A", 10, "01"),
        (102, 8, "F329", 10, "02"),
    ]
    return spark.createDataFrame(
        rows,
        "id_apcd long, claim_header_id long, icdcm_norm string, "
        "icdcm_version int, icdcm_number string",
    )


def raw_apcd_claim_procedure(spark):
    rows = [(5, "99284"), (6, "99213"), (8, "99215")]
    return spark.createDataFrame(rows, "claim_header_id long, procedure_code string")


def raw_apcd_claim_provider(spark):
    rows = [(6, "rendering", 9001), (5, "billing", 9002)]
    return spark.createDataFrame(
        rows, "claim_header_id long, provider_type string, provider_id_apcd long"
    )


def ref_apcd_provider_npi(spark):
    return spark.createDataFrame(
        [(9001, 555), (9002, 556)], "provider_id_apcd long, npi long"
    )


def ref_kc_provider_master(spark):
    return spark.createDataFrame(
        [(555, "208D00000X", None), (556, "101Y00000X", None)],
        "npi long, primary_taxonomy string, secondary_taxonomy string",
    )


def ref_apcd_claim_status(spark):
    return spark.createDataFrame(
        [("P", 1), ("S", 2), ("D", 90)],
        "claim_status_code string, claim_status_id long",
    )


def ref_kc_claim_type_xwalk_apcd(spark):
    rows = [
        ("apcd", "1.1.1", 1),
        ("apcd", "2.3.1", 4),
        ("apcd", "3.2.5", 5),
    ]
    return spark.createDataFrame(
        rows, "source_desc string, source_clm_type_id string, kc_clm_type_id int"
    )


def ref_pc_visit_oregon(spark):
    rows = [
        ("99213", "cpt"), ("Z000", "icd10cm"), ("208D00000X", "provider_taxonomy"),
    ]
    return spark.createDataFrame(rows, "code string, code_system string")


def ref_icdcm_codes_apcd(spark):
    """Extends the shared ICD master with APCD-test rows: the
    T-poisoning prefix carries intent/mechanism (cause-of-injury ref)
    and Z000 for the PC-visit zcode path."""
    base = ref_icdcm_codes(spark)
    extra = spark.createDataFrame(
        [
            ("T402", 10, "Poisoning by methadone", 0, 0, 0, "unintentional", "poisoning", 0, 0, 0),
            ("Z000", 10, "General adult medical exam", 1, 0, 0, None, None, 0, 0, 0),
        ],
        base.schema,
    )
    return base.unionByName(extra)


# --- Medicare + combined fixtures (load_stage.mcare_claim_header.R,
#     load_stage.mcaid_mcare_claim_header.R) --------------------------------

def raw_mcare_claim_header(spark):
    rows = [
        # person M1: outpatient ED visits d0 and d0+1 (one episode);
        # '40' -> kc 4 via xwalk
        ("M1", "C-1001", "40", "outpatient", d("2017-01-06"), d("2017-01-06"), "01"),
        ("M1", "C-1002", "40", "outpatient", d("2017-01-07"), d("2017-01-07"), "01"),
        # person M1: inpatient stay type 60 -> kc 1
        ("M1", "C-1003", "60", "inpatient", d("2017-02-01"), d("2017-02-05"), "01"),
        # person M2: carrier ED (type 71 -> kc 5): px+pos path
        ("M2", "C-2001", "71", "carrier", d("2017-03-10"), d("2017-03-10"), "01"),
        # person M2: PC visit (99213 + taxonomy)
        ("M2", "C-2002", "71", "carrier", d("2017-04-02"), d("2017-04-02"), "01"),
    ]
    return spark.createDataFrame(
        rows,
        "id_mcare string, claim_header_id string, claim_type_mcare_id string, "
        "filetype_mcare string, first_service_date date, last_service_date date, "
        "patient_status_code string",
    )


def raw_mcare_claim_line(spark):
    rows = [
        ("C-1001", None, None, "0450"),
        ("C-1002", None, None, "0451"),
        ("C-1003", d("2017-02-05"), "21", "0100"),
        ("C-2001", None, "23", None),
        ("C-2002", None, "11", None),
    ]
    return spark.createDataFrame(
        rows,
        "claim_header_id string, discharge_date date, "
        "place_of_service_code string, revenue_code string",
    )


def raw_mcare_claim_icdcm(spark):
    rows = [
        ("C-1001", "25000", 9, "01"),
        ("C-1003", "25000", 9, "01"),
        ("C-2001", "F329", 10, "01"),
        ("C-2002", "Z000", 10, "01"),
    ]
    return spark.createDataFrame(
        rows,
        "claim_header_id string, icdcm_norm string, icdcm_version int, "
        "icdcm_number string",
    )


def raw_mcare_claim_procedure(spark):
    rows = [("C-2001", "99284"), ("C-2002", "99213")]
    return spark.createDataFrame(
        rows, "claim_header_id string, procedure_code string"
    )


def raw_mcare_claim_provider(spark):
    return spark.createDataFrame(
        [("C-2002", "rendering", 555)],
        "claim_header_id string, provider_type string, provider_npi long",
    )


def ref_kc_claim_type_xwalk_mcare(spark):
    rows = [("mcare", "40", 4), ("mcare", "60", 1), ("mcare", "71", 5)]
    return spark.createDataFrame(
        rows, "source_desc string, source_clm_type_id string, kc_clm_type_id int"
    )


def xwalk_apde_mcaid_mcare(spark):
    # p1 (Medicaid) and M1 (Medicare) are the SAME person (id_apde 1)
    rows = [
        (1, "p1", "M1"),
        (2, "p2", None),
        (3, "p3", None),
        (4, None, "M2"),
    ]
    return spark.createDataFrame(
        rows, "id_apde long, id_mcaid string, id_mcare string"
    )
