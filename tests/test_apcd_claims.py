"""APCD claim_header family: flags, episode ids, injury columns, and
the reference's QA invariant suite
(``load_stage.apcd_claim_header.R:74-1251``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import tests.fixtures as fx
from claims_data_spark.tables.apcd import (
    build_apcd_claim_header,
    qa_apcd_claim_header,
)


@pytest.fixture(scope="module")
def apcd_header(spark):
    return build_apcd_claim_header(
        fx.raw_apcd_claim_header(spark),
        fx.raw_apcd_claim_line(spark),
        fx.raw_apcd_claim_icdcm(spark),
        fx.raw_apcd_claim_procedure(spark),
        ref_claim_status=fx.ref_apcd_claim_status(spark),
        ref_xwalk=fx.ref_kc_claim_type_xwalk_apcd(spark),
        ref_icdcm=fx.ref_icdcm_codes_apcd(spark),
        ref_pc_oregon=fx.ref_pc_visit_oregon(spark),
        provider=fx.raw_apcd_claim_provider(spark),
        ref_provider_npi=fx.ref_apcd_provider_npi(spark),
        ref_provider_master=fx.ref_kc_provider_master(spark),
    )


def test_apcd_header_excludes_denied_and_cleans_sentinels(apcd_header):
    rows = {r["claim_header_id"]: r for r in apcd_header.collect()}
    assert 7 not in rows  # denied
    assert len(rows) == 7
    assert rows[8]["product_code_id"] is None     # -1 sentinel
    assert rows[8]["type_of_bill_code"] is None   # -2 sentinel
    assert rows[1]["claim_type_apcd_id"] == "2.3.1"
    assert rows[1]["claim_type_id"] == 4


def test_apcd_ed_definitions(apcd_header):
    rows = {r["claim_header_id"]: r for r in apcd_header.collect()}
    # facility outpatient: revenue-code path
    assert rows[1]["ed_yale_opt"] == 1 and rows[1]["ed_perform"] == 1
    assert rows[2]["ed_yale_opt"] == 1 and rows[2]["ed_perform"] == 0
    # carrier: needs ED px AND POS 23
    assert rows[5]["ed_yale_carrier"] == 1
    # inpatient stay is not ED here
    assert rows[4]["ed_yale_ipt"] == 0 and rows[4]["inpatient"] == 1


def test_apcd_ed_pophealth_episode_ids(apcd_header):
    rows = {r["claim_header_id"]: r for r in apcd_header.collect()}
    # d0 and d0+1 merge (1-day window); d0+3 starts a new episode
    assert rows[1]["ed_pophealth_id"] == rows[2]["ed_pophealth_id"] == 1
    assert rows[3]["ed_pophealth_id"] == 2
    assert rows[5]["ed_pophealth_id"] == 3
    assert rows[4]["ed_pophealth_id"] is None
    # per-concept event ids
    assert rows[1]["ed_perform_id"] == 1
    assert rows[4]["inpatient_id"] == 1
    assert rows[6]["pc_visit_id"] == 1 and rows[6]["pc_visit"] == 1
    # PC-visit exclusions: no taxonomy/procedure match -> not a pc visit
    assert rows[8]["pc_visit"] == 0


def test_apcd_bh_and_injury(apcd_header):
    rows = {r["claim_header_id"]: r for r in apcd_header.collect()}
    assert rows[5]["mh_primary"] == 1 and rows[5]["mh_any"] == 1
    assert rows[8]["mh_primary"] == 0 and rows[8]["mh_any"] == 1
    # T-poisoning code: CDC nature inclusion + embedded cause prefix
    assert rows[8]["injury_nature_narrow"] == 1
    assert rows[8]["injury_nature_broad"] == 1
    assert rows[8]["injury_nature_icdcm"] == "T402X1A"
    assert rows[8]["injury_intent"] == "unintentional"
    assert rows[8]["injury_mechanism"] == "poisoning"
    assert rows[1]["injury_nature_broad"] == 0


def test_apcd_qa_suite_green(spark, apcd_header):
    elig = spark.createDataFrame([(101,), (102,)], "id_apcd long")
    results = qa_apcd_claim_header(
        apcd_header, fx.raw_apcd_claim_header(spark),
        elig_demo=elig, elig_timevar=elig,
    )
    failures = [(n, d) for n, ok, d in results if not ok]
    assert not failures, failures
    names = {n for n, _, _ in results}
    assert "ed-pophealth-1day-window" in names
    assert "one-person(inpatient_id)" in names
    assert "dense(ed_pophealth_id)" in names


def test_apcd_qa_catches_violations(spark, apcd_header):
    # corrupt: duplicate a header row and strip a discharge date
    bad = apcd_header.unionByName(apcd_header.limit(1)).withColumn(
        "discharge_date", F.lit(None).cast("date")
    )
    results = qa_apcd_claim_header(bad, fx.raw_apcd_claim_header(spark))
    by_name = {n: ok for n, ok, _ in results}
    assert by_name["unique(claim_header_id)"] is False
    assert by_name["ipt-has-discharge"] is False


def test_apcd_claim_children(spark):
    from claims_data_spark.tables.apcd import (
        build_apcd_claim_icdcm_header,
        build_apcd_claim_line,
        build_apcd_claim_procedure,
        build_apcd_claim_provider,
        qa_apcd_child,
    )

    header = fx.raw_apcd_claim_header(spark)
    d_ = fx.d
    line_raw = spark.createDataFrame(
        [
            # normal line on a live claim
            (101, 1, 11, 1, d_("2019-03-01"), d_("2019-03-01"), "0450", "23",
             d_("2019-03-01"), d_("2019-03-01"), "01", "1", "3"),
            # discharge BEFORE admission -> corrected to last service
            (101, 4, 41, 1, d_("2019-05-01"), d_("2019-05-05"), "0100", "21",
             d_("2019-05-02"), d_("2019-05-01"), "01", "1", "3"),
            # line on the denied claim 7 -> dropped
            (102, 7, 71, 1, d_("2019-07-01"), d_("2019-07-01"), None, "11",
             None, None, None, None, None),
        ],
        "id_apcd long, claim_header_id long, claim_line_id long, "
        "line_counter int, first_service_dt date, last_service_dt date, "
        "revenue_code string, place_of_service_code string, "
        "admission_dt date, discharge_dt date, discharge_status_code string, "
        "admission_point_of_origin_code string, admission_type string",
    ).withColumn("charge_amt", F.lit(10.0))
    lines = {r["claim_header_id"]: r
             for r in build_apcd_claim_line(line_raw, header).collect()}
    assert 7 not in lines
    assert lines[4]["discharge_date"] == d_("2019-05-05")  # corrected
    assert lines[1]["discharge_date"] == d_("2019-03-01")

    icdcm_raw = spark.createDataFrame(
        [
            (101, 1, d_("2019-03-01"), d_("2019-03-01"), "250.00", "25000", 9, "01"),
            (102, 7, d_("2019-07-01"), d_("2019-07-01"), "F32.9", "F329", 10, "01"),
        ],
        "id_apcd long, claim_header_id long, first_service_dt date, "
        "last_service_dt date, icdcm_raw string, icdcm_norm string, "
        "icdcm_version int, icdcm_number string",
    )
    icd = build_apcd_claim_icdcm_header(icdcm_raw, header)
    assert [r["claim_header_id"] for r in icd.collect()] == [1]

    px_raw = spark.createDataFrame(
        [(101, 1, d_("2019-03-01"), d_("2019-03-01"), "99284", None)],
        "id_apcd long, claim_header_id long, first_service_dt date, "
        "last_service_dt date, procedure_code string, modifier_code string",
    )
    px = build_apcd_claim_procedure(px_raw, header)
    assert px.count() == 1

    prov_raw = spark.createDataFrame(
        [(101, 1, d_("2019-03-01"), d_("2019-03-01"), 9001, "R9001", "rendering")],
        "id_apcd long, claim_header_id long, first_service_dt date, "
        "last_service_dt date, provider_id_apcd long, "
        "provider_id_raw_apcd string, provider_type string",
    )
    prov = build_apcd_claim_provider(prov_raw)
    assert prov.collect()[0]["provider_type"] == "rendering"

    elig = spark.createDataFrame([(101,), (102,)], "id_apcd long")
    qa = qa_apcd_child(px, elig_demo=elig, elig_timevar=elig,
                       not_null_col="procedure_code")
    assert all(ok for _, ok, _ in qa), qa
