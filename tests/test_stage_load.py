"""Raw->stage loader semantics (load_stage.mcaid_elig.R,
load_stage.mcaid_claim.R, load_stage.mcare_mbsf.r,
load_stage.mcaid_perf_elig_member_month.R)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from claims_data_spark.tables.stage_load import (
    build_perf_distinct_member,
    build_perf_elig_member_month,
    build_stage_mcaid_claim,
    build_stage_mcaid_elig,
    build_stage_mcare_mbsf,
    dedup_mcaid_elig_raw,
    elig_duplicate_probe,
    mbsf_duplicate_rows,
    mbsf_new_years,
    stage_mcaid_elig_qa,
)

ELIG_SCHEMA = (
    "CLNDR_YEAR_MNTH int, MBR_H_SID string, MEDICAID_RECIPIENT_ID string,"
    " RAC_FROM_DATE date, RAC_TO_DATE date, RAC_CODE string,"
    " RAC_NAME string, END_REASON_NAME string, HOH_ID string,"
    " DUALELIGIBLE_INDICATOR string, RSDNTL_ADRS_LINE_1 string,"
    " RSDNTL_ADRS_LINE_2 string, RSDNTL_CITY_NAME string,"
    " RSDNTL_STATE_CODE string, RSDNTL_POSTAL_CODE string"
)
ELIG_COLS = [c.split()[0] for c in ELIG_SCHEMA.split(",")]


def _elig_row(**kw):
    base = dict(
        CLNDR_YEAR_MNTH=201901,
        MBR_H_SID="S1",
        MEDICAID_RECIPIENT_ID="abc123",
        RAC_FROM_DATE=dt.date(2019, 1, 1),
        RAC_TO_DATE=dt.date(2019, 1, 31),
        RAC_CODE="1001",
        RAC_NAME="Some RAC",
        END_REASON_NAME=None,
        HOH_ID="H1",
        DUALELIGIBLE_INDICATOR="N",
        RSDNTL_ADRS_LINE_1="100 Main St",
        RSDNTL_ADRS_LINE_2=None,
        RSDNTL_CITY_NAME="Seattle",
        RSDNTL_STATE_CODE="WA",
        RSDNTL_POSTAL_CODE="98101",
    )
    base.update(kw)
    return {c: base[c] for c in ELIG_COLS}


def test_elig_dedup_reason_score_and_rac_spelling(spark):
    raw = spark.createDataFrame(
        [
            # same combo, two end reasons: 'Other' (2) loses to real (7)
            _elig_row(END_REASON_NAME="Other"),
            _elig_row(END_REASON_NAME="Moved out of state"),
            # misspelled RAC name collapses onto the corrected row
            _elig_row(
                RAC_CODE="2002",
                RAC_NAME="Involuntary Inpatient Psychiactric Treatment (ITA)",
            ),
            _elig_row(
                RAC_CODE="2002",
                RAC_NAME="Involuntary Inpatient Psychiatric Treatment (ITA)",
            ),
            # distinct person untouched
            _elig_row(MBR_H_SID="S2", END_REASON_NAME=None),
        ],
        schema=ELIG_SCHEMA,
    )
    probe = elig_duplicate_probe(raw)
    assert probe["any_dup"]
    assert probe["dup_reason"]
    assert probe["dup_rac_name"]

    out = dedup_mcaid_elig_raw(raw)
    rows = {
        (r["MBR_H_SID"], r["RAC_CODE"]): r for r in out.collect()
    }
    assert len(rows) == 3
    assert rows[("S1", "1001")]["END_REASON_NAME"] == "Moved out of state"
    assert (
        rows[("S1", "2002")]["RAC_NAME"]
        == "Involuntary Inpatient Psychiatric Treatment (ITA)"
    )


def test_elig_stage_geo_hash_upper_id_and_incremental(spark):
    raw = spark.createDataFrame(
        [_elig_row(CLNDR_YEAR_MNTH=201902), _elig_row(CLNDR_YEAR_MNTH=201903)],
        schema=ELIG_SCHEMA,
    )
    archive = (
        spark.createDataFrame(
            [
                _elig_row(CLNDR_YEAR_MNTH=201812),
                # archive row in the refreshed window must be dropped
                _elig_row(CLNDR_YEAR_MNTH=201902, MBR_H_SID="OLD"),
            ],
            schema=ELIG_SCHEMA,
        )
        .withColumn("geo_hash_raw", F.lit("x"))
    )
    out = build_stage_mcaid_elig(raw, archive=archive)
    got = out.collect()
    assert {r["CLNDR_YEAR_MNTH"] for r in got} == {201812, 201902, 201903}
    assert all(r["MEDICAID_RECIPIENT_ID"] == "ABC123" for r in got)
    new = [r for r in got if r["CLNDR_YEAR_MNTH"] == 201902][0]
    # sha256 of 'upper(line1)|<null line2>||city|state|zip'
    import hashlib

    expect = hashlib.sha256(
        "100 MAIN ST|||SEATTLE|WA|98101".encode()
    ).hexdigest()
    assert new["geo_hash_raw"] == expect

    qa = stage_mcaid_elig_qa(out)
    assert qa == {"rows": 3, "null_ids": 0}


def test_stage_mcaid_claim_derived_cols_and_distinct(spark):
    raw = spark.createDataFrame(
        [
            Row(
                MBR_H_SID="S1",
                MEDICAID_RECIPIENT_ID="ab1",
                BABY_ON_MOM_IND="N",
                TCN="T1",
                CLM_LINE_TCN="T1-007",
                FROM_SRVC_DATE=dt.date(2019, 3, 15),
            )
        ]
        * 2  # duplicate raw rows collapse
        + [
            Row(
                MBR_H_SID="S1",
                MEDICAID_RECIPIENT_ID="ab1",
                BABY_ON_MOM_IND="N",
                TCN="T2",
                CLM_LINE_TCN="T2-012",
                FROM_SRVC_DATE=dt.date(2019, 4, 2),
            )
        ]
    )
    out = build_stage_mcaid_claim(raw).orderBy("TCN").collect()
    assert len(out) == 2
    assert out[0]["CLNDR_YEAR_MNTH"] == 201903
    assert out[0]["CLM_LINE"] == 7
    assert out[1]["CLNDR_YEAR_MNTH"] == 201904
    assert out[1]["CLM_LINE"] == 12
    assert out[0]["MEDICAID_RECIPIENT_ID"] == "AB1"


def test_stage_mcaid_claim_incremental_and_bho(spark):
    mk = lambda tcn, d: Row(  # noqa: E731
        MBR_H_SID="S1",
        MEDICAID_RECIPIENT_ID="ab1",
        BABY_ON_MOM_IND="N",
        TCN=tcn,
        CLM_LINE_TCN=tcn + "-001",
        FROM_SRVC_DATE=d,
    )
    raw = spark.createDataFrame([mk("NEW", dt.date(2019, 6, 1))])
    archive = build_stage_mcaid_claim(
        spark.createDataFrame(
            [mk("OLD", dt.date(2019, 1, 1)), mk("STALE", dt.date(2019, 7, 1))]
        )
    )
    out = build_stage_mcaid_claim(raw, archive=archive)
    assert {r["TCN"] for r in out.collect()} == {"OLD", "NEW"}

    bho = build_stage_mcaid_claim(
        spark.createDataFrame([mk("BHO", dt.date(2015, 1, 1))])
    )
    full = build_stage_mcaid_claim(raw, bho_archive=bho, full_refresh=True)
    assert {r["TCN"] for r in full.collect()} == {"NEW", "BHO"}


def _mbsf_row(bene, yr, zip_cd, **kw):
    base = dict(
        bene_id=bene,
        bene_enrollmt_ref_yr=yr,
        zip_cd=zip_cd,
        data_year=str(yr),
    )
    base.update(kw)
    return Row(**base)


def test_mbsf_new_year_detection_and_zip_rules(spark):
    stage = spark.createDataFrame(
        [Row(bene_id="a", bene_enrollmt_ref_yr=2015, zip_cd="98101")]
    )
    raw_abcd = spark.createDataFrame(
        [
            _mbsf_row("a", 2015, "98101"),  # same (year, count) -> skipped
            _mbsf_row("b", 2016, "99999"),  # sentinel zip -> NULL
            _mbsf_row("c", 2016, "812"),  # zero-padded to 00812
        ]
    )
    raw_ab = spark.createDataFrame(
        [
            Row(
                bene_id="d",
                bene_enrollmt_ref_yr=2014,
                bene_zip_cd="999999999",  # renamed + sentinel -> NULL
            ),
            Row(bene_id="e", bene_enrollmt_ref_yr=2014, bene_zip_cd="981011234"),
        ]
    )
    years = mbsf_new_years(raw_abcd, stage)
    assert {r[0] for r in years.collect()} == {2016}

    out = build_stage_mcare_mbsf(
        raw_ab,
        raw_abcd,
        stage=stage,
        rename_ab={"bene_zip_cd": "zip_cd"},
        type_map={"bene_enrollmt_ref_yr": "INT", "zip_cd": "VARCHAR(5)"},
    )
    got = {r["bene_id"]: r for r in out.collect()}
    assert set(got) == {"b", "c", "d", "e"}
    assert got["b"]["zip_cd"] is None
    assert got["c"]["zip_cd"] == "00812"
    assert got["d"]["zip_cd"] is None
    assert got["e"]["zip_cd"] == "98101"
    assert "data_year" not in out.columns
    assert "last_run" in out.columns


def test_mbsf_case_insensitive_duplicate_gate(spark):
    raw_abcd = spark.createDataFrame(
        [_mbsf_row("AAA", 2016, "98101"), _mbsf_row("aaa", 2016, "98101")]
    )
    empty_ab = spark.createDataFrame([], raw_abcd.drop("data_year").schema)
    dups = mbsf_duplicate_rows(raw_abcd.drop("data_year"))
    assert dups.count() == 2
    with pytest.raises(ValueError, match="duplicate"):
        build_stage_mcare_mbsf(empty_ab, raw_abcd)
    ok = build_stage_mcare_mbsf(empty_ab, raw_abcd, allow_duplicates=True)
    assert ok.count() == 2


def test_perf_elig_member_month_and_distinct_member(spark):
    elig = spark.createDataFrame(
        [
            Row(
                CLNDR_YEAR_MNTH="201901",
                MEDICAID_RECIPIENT_ID="M1",
                RPRTBL_RAC_CODE="1",
                FROM_DATE=dt.date(2019, 1, 10),
                TO_DATE=dt.date(2019, 1, 20),
                COVERAGE_TYPE_IND="MC",
                MC_PRVDR_NAME="Coordinated Care of Washington",
                DUAL_ELIG="N",
                TPL_FULL_FLAG="N",
                RSDNTL_POSTAL_CODE="98101",
            ),
            # longer span wins the row_number dedup
            Row(
                CLNDR_YEAR_MNTH="201901",
                MEDICAID_RECIPIENT_ID="M1",
                RPRTBL_RAC_CODE="2",
                FROM_DATE=dt.date(2019, 1, 1),
                TO_DATE=dt.date(2019, 1, 31),
                COVERAGE_TYPE_IND="FFS",
                MC_PRVDR_NAME="ignored",
                DUAL_ELIG="N",
                TPL_FULL_FLAG="N",
                RSDNTL_POSTAL_CODE="98101",
            ),
            # non-King zip filtered out
            Row(
                CLNDR_YEAR_MNTH="201901",
                MEDICAID_RECIPIENT_ID="M2",
                RPRTBL_RAC_CODE="1",
                FROM_DATE=dt.date(2019, 1, 1),
                TO_DATE=dt.date(2019, 1, 31),
                COVERAGE_TYPE_IND="MC",
                MC_PRVDR_NAME="Unknown Plan",
                DUAL_ELIG="N",
                TPL_FULL_FLAG="N",
                RSDNTL_POSTAL_CODE="99201",
            ),
        ]
    )
    ref_zip = spark.createDataFrame(
        [
            Row(zip_code="98101", state="WA", county_name="King"),
            Row(zip_code="99201", state="WA", county_name="Spokane"),
        ]
    )
    out = build_perf_elig_member_month(elig, ref_zip).collect()
    assert len(out) == 1
    assert out[0]["MEDICAID_RECIPIENT_ID"] == "M1"
    assert out[0]["RPRTBL_RAC_CODE"] == "2"
    assert out[0]["MC_PRVDR_NAME"] is None  # FFS row: no plan abbrev
    assert out[0]["CLNDR_YEAR_MNTH"] == 201901

    denom = spark.createDataFrame(
        [Row(id_mcaid="M1"), Row(id_mcaid="M1"), Row(id_mcaid="M2")]
    )
    dm = build_perf_distinct_member(denom)
    assert dm.count() == 2
    assert dm.columns == ["id_mcaid", "load_date"]
