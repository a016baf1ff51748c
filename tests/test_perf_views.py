"""Perf component views: ED visit numerator, HEDIS value-set gates,
hospice member-months, PQI ED indicators (v_perf_ed_visit_num.sql,
v_perf_cap_ambulatory_visit.sql, v_mcaid_perf_hospice_member_month.sql,
v_mcaid_pqi_ed.sql)."""
import datetime

from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403

d_ = datetime.date.fromisoformat


def _hdr(spark, rows):
    return spark.createDataFrame(
        rows,
        "id_mcaid string, claim_header_id long, clm_type_mcaid_id string, "
        "place_of_service_code string, first_service_date date, "
        "last_service_date date",
    )


def test_ed_visit_num_three_branches(spark):
    from claims_data_spark.tables.perf import ed_visit_num

    hdr = _hdr(spark, [
        ("P1", 1, "3", "23", d_("2019-01-05"), d_("2019-01-05")),   # POS
        ("P1", 2, "26", "11", d_("2019-02-01"), d_("2019-02-01")),  # rev
        ("P2", 3, "34", "11", d_("2019-03-01"), d_("2019-03-01")),  # px
        ("P2", 4, "1", "23", d_("2019-03-02"), d_("2019-03-02")),   # bad type
        ("P3", 5, "3", "11", d_("2019-04-01"), d_("2019-04-01")),   # no gate
    ])
    line = spark.createDataFrame(
        [(2, "0450"), (5, "0300")], "claim_header_id long, rev_code string"
    )
    px = spark.createDataFrame(
        [(3, "99285"), (5, "87070")],
        "claim_header_id long, procedure_code string",
    )
    out = ed_visit_num(hdr, line, px)
    rows = {r["claim_header_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["year_month"] == 201901
    assert rows[2]["ed_visit_num"] == 1


def test_hedis_value_set_and_hospice_months(spark):
    from claims_data_spark.tables.perf import (
        hedis_value_set_claims, hospice_member_months,
    )

    hedis = spark.createDataFrame(
        [("Ambulatory Visits", "CPT", "99213"),
         ("Ambulatory Visits", "ICD10CM", "Z000"),
         ("Hospice", "UBREV", "0115"),
         ("Hospice", "UBTOB", "0812")],
        "value_set_name string, code_system string, code string",
    )
    px = spark.createDataFrame(
        [("P1", 1, d_("2019-01-10"), d_("2019-01-10"), "99213"),
         ("P1", 2, d_("2019-02-10"), d_("2019-02-10"), "87070")],
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "last_service_date date, procedure_code string",
    )
    dx = spark.createDataFrame(
        [("P2", 3, d_("2019-03-10"), d_("2019-03-10"), "Z000", 10),
         ("P2", 4, d_("2019-03-11"), d_("2019-03-11"), "Z000", 9)],
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "last_service_date date, icdcm_norm string, icdcm_version int",
    )
    amb = hedis_value_set_claims(
        "Ambulatory Visits", hedis, procedure=px, icdcm=dx
    )
    got = {r["claim_header_id"] for r in amb.collect()}
    assert got == {1, 3}   # ICD-9 row and non-matching px excluded

    hdr = spark.createDataFrame(
        [("P3", 5, d_("2019-05-02"), d_("2019-05-02"), "0812"),
         ("P3", 6, d_("2019-06-02"), d_("2019-06-02"), "0111")],
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "last_service_date date, type_of_bill_code string",
    )
    line = spark.createDataFrame(
        [("P4", 7, d_("2019-05-20"), d_("2019-05-20"), "0115")],
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "last_service_date date, rev_code string",
    )
    months = hospice_member_months(hdr, line, hedis)
    got = {(r["id_mcaid"], r["year_month"]) for r in months.collect()}
    assert got == {("P3", 201905), ("P4", 201905)}


def test_pqi_ed_events_and_composite(spark):
    from claims_data_spark.tables.perf import pqi_composite, pqi_ed_events

    vs = spark.createDataFrame(
        [("ACDIASD", "E1010"), ("MRTCHFD", "I5021"),
         ("ACSCARP", "0210093"), ("ACSBACD", "J13"),
         ("IMMUNID", "B20")],
        "value_set_name string, code string",
    )
    hdr = spark.createDataFrame(
        [("P1", 1, "E1010", 101),     # PQI 01 hit
         ("P1", 2, "I5021", 102),     # PQI 08 but excluded by px
         ("P2", 3, "I5021", 103),     # PQI 08 clean
         ("P2", 4, "J13", 104),       # PQI 11 but excluded by dx B20
         ("P3", 5, "E1010", None)],   # not an ED event
        "id_mcaid string, claim_header_id long, primary_diagnosis "
        "string, ed_pophealth_id long",
    )
    dx = spark.createDataFrame(
        [(4, "B20", 10)],
        "claim_header_id long, icdcm_norm string, icdcm_version int",
    )
    px = spark.createDataFrame(
        [(2, "0210093")], "claim_header_id long, procedure_code string"
    )
    events = pqi_ed_events(hdr, dx, px, vs)
    got = {(r["value_set_group"], r["claim_header_id"])
           for r in events.collect()}
    assert got == {("PQI 01", 1), ("PQI 08", 3)}

    comp = pqi_composite(events)
    rows = {r["ed_pophealth_id"]: r for r in comp.collect()}
    assert rows[101]["pqi_01"] == 1 and rows[101]["pqi_08"] == 0
    assert rows[103]["pqi_08"] == 1
    assert all(r["pqi_composite"] == 1 for r in rows.values())


def test_pqi_inpatient_events(spark):
    """Inpatient PQI shapes beyond the ED view: transfer-source
    filter, px∩dx inclusion (PQI 16), dx∩px conjunction exclusion
    (PQI 07) — v_mcaid_pqi_inpatient.sql."""
    from claims_data_spark.tables.perf import (
        pqi_composite, pqi_inpatient_events,
    )

    vs = spark.createDataFrame(
        [("ACDIASD", "E1010"),
         ("ACSHYPD", "I10"), ("ACSHY2D", "N185"), ("DIALY2P", "5A1D00Z"),
         ("ACSCARP", "0210093"),
         ("ACSLEAP", "0Y6200Z"), ("ACSLEAD", "E1151"),
         ("ACLEA2D", "S78011A")],
        "value_set_name string, code string",
    )
    hdr = spark.createDataFrame(
        [("P1", 1, "E1010", 201, "1"),   # PQI 01 hit
         ("P1", 2, "E1010", 202, "4"),   # transfer source -> dropped
         ("P2", 3, "I10", 203, None),    # PQI 07 hit (no conj excl)
         ("P2", 4, "I10", 204, None),    # PQI 07 excluded: kidney dx + dialysis px
         ("P3", 5, "Z000", 205, None),   # PQI 16: amputation px + diabetes dx
         ("P3", 6, "Z000", 206, None),   # px only, no diabetes dx -> no PQI 16
         ("P3", 7, "E1010", None, None)],  # not inpatient
        "id_mcaid string, claim_header_id long, primary_diagnosis "
        "string, inpatient_id long, admsn_source string",
    )
    dx = spark.createDataFrame(
        [(4, "N185", 10), (5, "E1151", 10)],
        "claim_header_id long, icdcm_norm string, icdcm_version int",
    )
    px = spark.createDataFrame(
        [(4, "5A1D00Z"), (5, "0Y6200Z"), (6, "0Y6200Z")],
        "claim_header_id long, procedure_code string",
    )
    events = pqi_inpatient_events(hdr, dx, px, vs)
    got = {(r["value_set_group"], r["claim_header_id"])
           for r in events.collect()}
    assert got == {("PQI 01", 1), ("PQI 07", 3), ("PQI 16", 5)}

    comp = pqi_composite(
        events, groups=["PQI 01", "PQI 07", "PQI 16"],
        event_col="inpatient_id",
    )
    rows = {r["inpatient_id"]: r for r in comp.collect()}
    assert rows[201]["pqi_01"] == 1 and rows[201]["pqi_07"] == 0
    assert rows[203]["pqi_07"] == 1
    assert rows[205]["pqi_16"] == 1


def test_enroll_provider_quarterly_attribution(spark):
    from claims_data_spark.tables.perf import build_enroll_provider

    # P1: FFS Jan-Aug 2019, MC Sep-Dec 2019 -> at 201912 FFS has 8
    # trailing months vs MC's 4 -> FFS wins; at 201906 only FFS exists
    rows = [("P1", 201900 + m, "FFS") for m in range(1, 9)]
    rows += [("P1", 201900 + m, "MC") for m in range(9, 13)]
    # P2: no months in 2019 -> absent
    rows += [("P2", 201801, "FFS")]
    mm = spark.createDataFrame(
        rows, "id_mcaid string, year_month int, mco_or_ffs string"
    )
    out = build_enroll_provider(mm, 201903, 201912)
    got = {(r["id_mcaid"], r["year_month"]): r for r in out.collect()}
    assert ("P2", 201903) not in got      # outside trailing window? no:
    # P2's 201801 is >14 months before 201903 -> zero coverage, dropped
    assert all(k[0] == "P1" for k in got)
    assert got[("P1", 201912)]["mco_or_ffs"] == "FFS"
    assert got[("P1", 201912)]["coverage_months_t_12_m"] == 8
    assert got[("P1", 201906)]["mco_or_ffs"] == "FFS"
    assert got[("P1", 201906)]["coverage_months_t_12_m"] == 6
    assert got[("P1", 201912)]["end_quarter"] == 4


def test_profile_table_and_distinct_list(spark):
    from claims_data_spark.qa import distinct_values_list, profile_table

    df = spark.createDataFrame(
        [(1, "b", None), (2, "a", 5.0), (None, "b", 7.5)],
        "k int, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["k"]["non_null_count"] == 2
    assert prof["k"]["null_count"] == 1
    assert prof["k"]["min_value"] == "1" and prof["k"]["max_value"] == "2"
    assert prof["s"]["approx_distinct"] == 2
    assert prof["v"]["max_value"] == "7.5"

    vals = distinct_values_list(df, "s").collect()[0]["values"]
    assert vals == "a, b"
