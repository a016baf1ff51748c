"""NDC normalization + chronic-meds pattern join
(ref: load_ref.ndc_codes.R, load_ref.chronic_meds_eli.R)."""
from __future__ import annotations

from pyspark.sql import functions as F

from claims_data_spark.tables.pharmacy import (
    build_chronic_meds_crosswalk,
    build_ref_ndc_codes,
    normalize_ndc_11,
)


def test_normalize_ndc_all_formats(spark):
    df = spark.createDataFrame(
        [
            ("1234-5678-90",),   # 4-4-2 -> pad labeler
            ("12345-678-90",),   # 5-3-2 -> pad product
            ("12345-6789-0",),   # 5-4-1 -> pad package
            ("12-34-56",),       # unknown -> null
            (None,),
        ],
        "code string",
    )
    got = [r.ndc for r in df.select(normalize_ndc_11("code").alias("ndc")).collect()]
    assert got == ["01234567890", "12345067890", "12345678900", None, None]


def test_ndc_directory_assembly(spark):
    package = spark.createDataFrame(
        [("p1", "1234-5678", "1234-5678-90", "20200101", None)],
        "product_id string, product_ndc string, ndc_package_code string, "
        "start_marketing_date string, end_marketing_date string",
    )
    product = spark.createDataFrame(
        [("p1", "1234-5678", "BrandX", None, "genericx", "TABLET", "5", "mg")],
        "product_id string, product_ndc string, proprietary_name string, "
        "proprietary_name_suffix string, nonproprietary_name string, "
        "dosage_form_name string, active_numerator_strength string, "
        "active_ingred_unit string",
    )
    compounders = spark.createDataFrame(
        [("9999-1111", "9999-1111-22", "CompBrand", None, "compgen", "CREAM", "info")],
        "product_ndc string, ndc_package_code string, proprietary_name string, "
        "proprietary_name_suffix string, nonproprietary_name string, "
        "dosage_form_name string, active_numerator_strength string",
    )
    out = build_ref_ndc_codes(package, product, compounders=compounders)
    rows = {r.ndc_package_code: r for r in out.collect()}
    assert rows["1234-5678-90"].ndc == "01234567890"
    assert rows["1234-5678-90"].proprietary_name == "BrandX"
    assert rows["9999-1111-22"].ndc == "09999111122"
    assert rows["9999-1111-22"].product_id is None
    assert out.count() == 2


def test_chronic_meds_pattern_join(spark):
    descs = spark.createDataFrame(
        [("metformin hcl 500mg",), ("insulin glargine",), ("aspirin 81mg",),
         ("somemetforminmix",)],
        "ndc_desc string",
    )
    meds = spark.createDataFrame(
        [("metformin", "diabetes"), ("%glargine%", "diabetes")],
        "drug_name string, drug_class string",
    )
    out = build_chronic_meds_crosswalk(descs, meds)
    got = {(r.ndc_desc, r.drug_class) for r in out.collect()}
    # prefix rule: 'metformin...' matches, 'somemetforminmix' does NOT
    assert ("metformin hcl 500mg", "diabetes") in got
    assert ("somemetforminmix", None) in got
    # contains rule via % wildcard
    assert ("insulin glargine", "diabetes") in got
    # left join keeps unmatched rows
    assert ("aspirin 81mg", None) in got
    assert out.count() == 4


def test_mcare_claim_pharm_char_projection(spark):
    """load_stage.mcare_claim_pharm_char.R: ncpdp_id -> pharmacy_id,
    dates typed, vintage-missing trailing columns null-fill."""
    from claims_data_spark.tables.pharmacy import (
        PHARM_CHAR_RENAMES,
        build_mcare_claim_pharm_char,
    )

    raw = spark.createDataFrame(
        [{
            "ncpdp_id": "1234567",
            "physical_location_state_code": "WA",
            "physical_location_open_date": "2019-05-01",
            "dispenser_class": "Independent",
            "primary_dispenser_type": "Community/Retail",
            "relationship_from_dt": "2020-01-01",
            "status_340b_ind": "Y",
        }]
    )
    out = build_mcare_claim_pharm_char(raw)
    assert out.columns == [d or s for s, d in PHARM_CHAR_RENAMES]
    r = out.collect()[0]
    assert r["pharmacy_id"] == "1234567"
    assert str(r["physical_location_open_date"]) == "2019-05-01"
    assert str(r["relationship_from_dt"]) == "2020-01-01"
    # columns absent from this extract vintage surface as NULLs
    assert r["physical_location_close_date"] is None
    assert r["dme_srvc_ind"] is None
    assert r["status_340b_ind"] == "Y"
