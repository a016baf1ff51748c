"""Ref-lookup builders (tables/ref_lookups.py) — each test mirrors the
reference script's own transform/QA rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from claims_data_spark.tables.ref_lookups import (
    append_hedis_year,
    build_ref_fda_ndc_product,
    build_ref_geo_county_code_wa,
    build_ref_geo_kc_zip,
    build_ref_hedis_measures,
    build_ref_hedis_value_sets,
    build_ref_mco,
    normalize_hedis_codes,
    qa_hedis_value_sets,
    qa_ref_geo_kc_zip,
    qa_ref_mco,
)


def test_ref_mco_dedup_and_types(spark):
    raw = spark.createDataFrame(
        [("CHPW ", " Healthy Options", 105010101, "ho"),
         ("CHPW ", " Healthy Options", 105010101, "ho"),   # exact dup
         ("Molina", "Apple Health", 105020101, "AH")],
        "mco string, product string, product_identifier long,"
        " product_code string",
    )
    out = build_ref_mco(raw)
    rows = {r["product_identifier"]: r for r in out.collect()}
    assert len(rows) == 2
    assert rows["105010101"]["mco"] == "CHPW"
    assert rows["105010101"]["product_code"] == "HO"
    assert qa_ref_mco(out) == {"dup_ids": 0}


def test_geo_county_fips_padding(spark):
    raw = spark.createDataFrame(
        [("King", 33, 53033, 17, 1481962, 53033, 5303300),
         ("Adams", 1, 53001, 1, 1531601, 53001, 5300100)],
        "geo_county_name string, geo_county_code_fips int,"
        " geo_county_fips_long int, geo_county_code_order int,"
        " geo_county_code_gnis int, geo_county_code_tiger int,"
        " geo_county_code_aff int",
    )
    out = build_ref_geo_county_code_wa(raw)
    got = {r["geo_county_name"]: r for r in out.collect()}
    # load_ref.geo_county_code_wa.R:15 — pad FIPS to width 3
    assert got["King"]["geo_county_code_fips"] == "033"
    assert got["Adams"]["geo_county_code_fips"] == "001"
    # :16-17 — all other code systems stringified
    assert got["King"]["geo_county_fips_long"] == "53033"
    assert out.schema["geo_county_code_gnis"].dataType.simpleString() == "string"


def test_geo_kc_zip_distinct_and_padding(spark):
    raw = spark.createDataFrame(
        [(98101, 1), (98101, 1), (2109, 0)],  # dup row + short zip
        "geo_zip int, geo_kc int",
    )
    out = build_ref_geo_kc_zip(raw)
    rows = {r["geo_zip"]: r["geo_kc"] for r in out.collect()}
    assert rows == {"98101": 1, "02109": 0}
    assert qa_ref_geo_kc_zip(out) == {"dup_zip": 0, "bad_len": 0}


def test_fda_ndc_product_ascii_scrub(spark):
    raw = spark.createDataFrame(
        [("0002-0800", "LILLY� INC", "INSULIN"),
         ("0002-0801", "PFIZER", "ATORVASTATIN")],
        "PRODUCTNDC string, LABELERNAME string, NONPROPRIETARYNAME string",
    )
    out = build_ref_fda_ndc_product(raw)
    assert out.columns == ["productndc", "labelername",
                           "nonproprietaryname"]
    got = {r["productndc"]: r["labelername"] for r in out.collect()}
    # load_ref.fda_ndc_product.R:43 — the replacement char is removed
    assert got["0002-0800"] == "LILLY INC"


HEDIS_SCHEMA = (
    "value_set_name string, value_set_oid string, code string,"
    " code_system string"
)


def test_hedis_code_normalization(spark):
    df = spark.createDataFrame(
        [("AOD Abuse", "2.1", "F10.10", "ICD10CM"),
         ("AOD Abuse", "2.1", "291", "ICD9CM"),
         ("AOD Abuse", "2.1", "291.8", "ICD9CM"),
         ("AOD Abuse", "2.1", "99213", "CPT")],
        HEDIS_SCHEMA,
    )
    out = normalize_hedis_codes(df)
    codes = sorted(r["code"] for r in out.collect())
    # punct stripped from ICD only; ICD-9 padded to 5 trailing zeros
    assert codes == ["29100", "29180", "99213", "F1010"]
    assert qa_hedis_value_sets(out) == {
        "bad_icd9": 0, "bad_icd10": 0, "bad_ndc": 0
    }


def test_hedis_year_merge_binds_drifting_schemas(spark):
    y2018 = spark.createDataFrame(
        [("FUH", "1.1", "F32.9", "ICD10CM")], HEDIS_SCHEMA
    )
    # 2023 release adds a column 2018 lacks (schema drift across years)
    y2023 = spark.createDataFrame(
        [("FUH", "1.1", "F33.0", "ICD10CM", "2023-03-31")],
        HEDIS_SCHEMA + ", value_set_version string",
    )
    out = build_ref_hedis_value_sets({2018: y2018, 2023: y2023})
    rows = {r["year"]: r for r in out.collect()}
    assert set(rows) == {2018, 2023}
    assert rows[2018]["value_set_version"] is None     # missing -> NULL
    assert rows[2018]["code"] == "F329"                # normalized
    assert rows[2023]["value_set_version"] == "2023-03-31"


def test_hedis_append_year_is_idempotent(spark):
    base = build_ref_hedis_value_sets({
        2023: spark.createDataFrame(
            [("FUH", "1.1", "F32.9", "ICD10CM")], HEDIS_SCHEMA
        )
    })
    y2024 = spark.createDataFrame(
        [("FUH", "1.1", "F33.1", "ICD10CM")], HEDIS_SCHEMA
    )
    once = append_hedis_year(base, y2024, 2024)
    # re-running the same year replaces, never duplicates
    twice = append_hedis_year(once, y2024, 2024)
    assert once.count() == twice.count() == 2
    assert twice.filter(F.col("year") == 2024).count() == 1


def test_hedis_measures_year_tag(spark):
    m = spark.createDataFrame(
        [("FUH", "Follow-Up After Hospitalization", "AOD Abuse", "2.1")],
        "measure_id string, measure_name string, value_set_name string,"
        " value_set_oid string",
    )
    out = build_ref_hedis_measures({2022: m, 2023: m})
    assert sorted(r["year"] for r in out.collect()) == [2022, 2023]
