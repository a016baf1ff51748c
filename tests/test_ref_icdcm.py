"""ref.icdcm_codes assembly (load_ref.icdcm_codes.R)."""

from __future__ import annotations

import pytest

from claims_data_spark.tables.ref_icdcm import (
    attach_external_cause,
    build_ref_icdcm_codes,
    widen_ccw_lookup,
)

EXT_SCHEMA = (
    "code string, version int, intent string, mechanism string,"
    " mechanism_full string"
)
CODES_SCHEMA = "icdcode string, dx_description string, ver int"
CCW_SCHEMA = "dx string, ver int, ccw_abbrev string"


def test_hierarchical_prefix_fallback(spark):
    ext = spark.createDataFrame(
        [
            # exact match target
            ("V436XXA", 10, "Unintentional", "MVT", "Motor vehicle"),
            # unique 6-char prefix W13.9X (one row) -> 6-char fallback
            ("W139XXA", 10, "Unintentional", "Fall", "Fall"),
            # ambiguous 6-char prefix X714X: two rows with different
            # intent -> must NOT match at 6; unique at 5 (X714.) only
            # if 5-char is unique... make 5-char ambiguous too
            ("X714XXA", 10, "Suicide", "Drowning", "Drowning"),
            ("X714XXD", 10, "Undetermined", "Drowning", "Drowning"),
            # unique 5-char prefix Y030
            ("Y030XXA", 10, "Assault", "MVT", "Struck by vehicle"),
        ],
        EXT_SCHEMA,
    )
    codes = spark.createDataFrame(
        [
            ("V436XXA", "exact hit", 10),
            ("W139XXS", "six-char fallback", 10),
            ("X714XXS", "ambiguous everywhere", 10),
            ("Y030XXS", "five-char fallback", 10),
            ("Z999999", "no injury", 10),
        ],
        CODES_SCHEMA,
    )
    out = {
        r["icdcode"]: r
        for r in attach_external_cause(codes, ext).collect()
    }
    assert out["V436XXA"]["intent"] == "Unintentional"
    assert out["W139XXS"]["mechanism"] == "Fall"
    # both X714 rows share prefix at 5 AND 6 chars with conflicting
    # intent -> no unique map row -> stays null
    assert out["X714XXS"]["intent"] is None
    assert out["Y030XXS"]["intent"] == "Assault"
    assert out["Z999999"]["intent"] is None


def test_ccw_widen_and_qa_gate(spark):
    long = spark.createDataFrame(
        [
            ("25000", 9, "diabetes"),
            ("25000", 9, "hypert"),
            ("I10", 10, "hypert"),
        ],
        CCW_SCHEMA,
    )
    wide = widen_ccw_lookup(long)
    got = {(r["dx"], r["ver"]): r for r in wide.collect()}
    assert got[("25000", 9)]["ccw_diabetes"] == 1
    assert got[("25000", 9)]["ccw_hypert"] == 1
    assert got[("I10", 10)]["ccw_diabetes"] is None
    assert got[("I10", 10)]["ccw_hypert"] == 1


def test_build_composes_versions_and_ccw(spark):
    codes = spark.createDataFrame(
        [("E8100", "icd9 injury", 9), ("V436XXA", "icd10 injury", 10)],
        CODES_SCHEMA,
    )
    ext = spark.createDataFrame(
        [
            ("E8100", 9, "Unintentional", "MVT", "Motor vehicle"),
            ("V436XXA", 10, "Unintentional", "MVT", "Motor vehicle"),
        ],
        EXT_SCHEMA,
    )
    ccw = spark.createDataFrame(
        [("V436XXA", 10, "injurycond")], CCW_SCHEMA
    )
    out = {
        r["icdcode"]: r
        for r in build_ref_icdcm_codes(codes, ext, ccw).collect()
    }
    assert out["E8100"]["intent"] == "Unintentional"  # icd9 exact join
    assert out["V436XXA"]["ccw_injurycond"] == 1
    assert out["E8100"]["ccw_injurycond"] is None


def test_parse_cms_order_file_and_vintage_combine(spark):
    """combine_icdcm_codes.R: fixed-width parse (code chars 7-12,
    desc 17-77) and oldest-vintage-wins dedup on (icdcode, ver)."""
    from claims_data_spark.tables.ref_icdcm import (
        combine_icdcm_vintages,
        parse_cms_icd10_order,
    )

    # layout: cols 1-5 order number, 7-12 code, 14 header flag, 17+ desc
    lines = spark.createDataFrame(
        [("00001 A000   0  Cholera due to Vibrio cholerae 01, biovar cholerae",),
         ("00002 A0101  1  Typhoid meningitis",)],
        "value string",
    )
    parsed = parse_cms_icd10_order(lines)
    rows = {r["icdcode"]: r for r in parsed.collect()}
    assert rows["A000"]["dx_description"].startswith("Cholera due to")
    assert rows["A0101"]["ver"] == 10

    existing = spark.createDataFrame(
        [("A000", 10, "OLD CHOLERA DESC"), ("0010", 9, "CHOLERA ICD9")],
        "icdcode string, ver int, dx_description string",
    )
    combined = combine_icdcm_vintages(existing, [parsed])
    out = {(r["icdcode"], r["ver"]): r["dx_description"]
           for r in combined.collect()}
    assert out[("A000", 10)] == "OLD CHOLERA DESC"  # oldest vintage wins
    assert ("A0101", 10) in out and ("0010", 9) in out
    assert len(out) == 3
