"""HEDIS follow-up measures FUA/FUM/FUH against hand-computed cases
(``sp_perf_fua_join_step.sql``, ``sp_perf_fuh_join_step.sql``,
``fn_perf_fua_ed_index_visit_exclusion.sql``)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from claims_data_spark.tables.perf import (
    ed_followup_measure,
    fuh_measure,
    thin_events_greedy,
)


def d(s):
    return dt.date.fromisoformat(s)


def test_thin_events_greedy_31_day_rule(spark):
    # greedy kept-set: keep 1/1; 1/15 (<31d) drop; 2/10 (<31d after
    # 1/1? 40d -> KEEP since gap from last KEPT 1/1 is 40); 2/20 (<31d
    # after 2/10) drop; 4/1 keep
    rows = [
        ("p", 1, d("2019-01-01")), ("p", 2, d("2019-01-15")),
        ("p", 3, d("2019-02-10")), ("p", 4, d("2019-02-20")),
        ("p", 5, d("2019-04-01")),
        ("q", 6, d("2019-01-05")),
    ]
    ev = spark.createDataFrame(
        rows, "id_mcaid string, claim_header_id long, first_service_date date"
    )
    kept = {
        r["claim_header_id"]
        for r in thin_events_greedy(ev, ["id_mcaid"], "first_service_date").collect()
    }
    assert kept == {1, 3, 5, 6}


def test_fua_same_day_follow_up_counts(spark):
    ed = spark.createDataFrame(
        [
            # visit with same-day follow-up -> 7 and 30 both 1 (FUA
            # windows are same-day inclusive)
            ("a", 1, d("2019-01-10"), d("2019-01-10")),
            # visit with follow-up at +20 days -> 30-day only
            ("b", 2, d("2019-03-01"), d("2019-03-01")),
            # visit with inpatient admission at +5 days -> EXCLUDED
            ("c", 3, d("2019-05-01"), d("2019-05-01")),
            # visit with no follow-up
            ("e", 4, d("2019-06-01"), d("2019-06-01")),
        ],
        "id_mcaid string, claim_header_id long, "
        "first_service_date date, last_service_date date",
    )
    ipt = spark.createDataFrame(
        [("c", d("2019-05-06"))], "id_mcaid string, first_service_date date"
    )
    fu = spark.createDataFrame(
        [("a", d("2019-01-10")), ("b", d("2019-03-21"))],
        "id_mcaid string, service_date date",
    )
    out = {
        r["claim_header_id"]: r
        for r in ed_followup_measure(ed, ipt, fu, "2019-01-01", "2019-12-31").collect()
    }
    assert 3 not in out  # inpatient exclusion
    assert out[1]["follow_up_7_day"] == 1 and out[1]["follow_up_30_day"] == 1
    assert out[2]["follow_up_7_day"] == 0 and out[2]["follow_up_30_day"] == 1
    assert out[4]["follow_up_7_day"] == 0 and out[4]["follow_up_30_day"] == 0


def test_fuh_roll_forward_and_day_after_windows(spark):
    idx = spark.createDataFrame(
        [
            # MI discharge 1/10; MH readmission discharged 1/25 within
            # 30d -> roll forward to the 1/25 stay
            ("a", 10, d("2019-01-05"), d("2019-01-10")),
            # clean MI discharge; same-day FU must NOT count for FUH
            ("b", 20, d("2019-03-01"), d("2019-03-04")),
            # MI discharge followed by a nonacute readmit at +10 -> drop
            ("c", 30, d("2019-05-01"), d("2019-05-03")),
        ],
        "id_mcaid string, claim_header_id long, admit_date date, discharge_date date",
    )
    mh = spark.createDataFrame(
        [("a", 11, d("2019-01-20"), d("2019-01-25"))],
        "id_mcaid string, claim_header_id long, admit_date date, discharge_date date",
    )
    readmits = spark.createDataFrame(
        [("c", d("2019-05-13"))], "id_mcaid string, admit_date date"
    )
    fu = spark.createDataFrame(
        [
            ("a", d("2019-01-27"), "N"),   # +2 after rolled discharge 1/25
            ("b", d("2019-03-04"), "N"),   # same day as discharge -> ignored
            ("b", d("2019-03-20"), "Y"),   # TCM: 30-day only
        ],
        "id_mcaid string, service_date date, only_30_day_fu string",
    )
    out = {
        r["claim_header_id"]: r
        for r in fuh_measure(idx, mh, readmits, fu, "2019-01-01", "2019-12-31").collect()
    }
    # roll-forward replaced stay 10 with stay 11
    assert 10 not in out and 11 in out
    assert out[11]["discharge_date"] == d("2019-01-25")
    assert out[11]["follow_up_7_day"] == 1
    # nonacute readmit exclusion
    assert 30 not in out
    # same-day FU ignored; TCM counts only for the 30-day flag
    assert out[20]["follow_up_7_day"] == 0
    assert out[20]["follow_up_30_day"] == 1
