"""Condition-specific tables: pregnancy episodes, naloxone events,
PHA-extended person crosswalk
(``load_stage.mcaid_claim_preg_episode.R``,
``load_stage.mcaid_claim_naloxone.R``,
``load_stage.xwalk_apde_mcaid_mcare_pha.R``)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from claims_data_spark.tables.naloxone import build_claim_naloxone
from claims_data_spark.tables.pregnancy import (
    apply_start_corrections,
    build_preg_episodes,
    classify_endpoint_days,
)
from claims_data_spark.tables.xwalk import build_xwalk


def d(s):
    return dt.date.fromisoformat(s)


ENDPOINT_SCHEMA = (
    "id_mcaid string, last_service_date date, lb int, ect int, ab int, "
    "sa int, sb int, tro int, deliv int"
)


def test_preg_endpoint_day_classification(spark):
    rows = [
        # same day, lb from two claims -> one day
        ("w1", d("2019-03-01"), 1, 0, 0, 0, 0, 0, 0),
        ("w1", d("2019-03-01"), 1, 0, 0, 0, 0, 0, 1),
        # conflicting endpoints on one day (lb + sb) -> dropped
        ("w2", d("2019-04-01"), 1, 0, 0, 0, 1, 0, 0),
        # deliv-only day survives as 'deliv'
        ("w3", d("2019-05-01"), 0, 0, 0, 0, 0, 0, 1),
    ]
    days = classify_endpoint_days(spark.createDataFrame(rows, ENDPOINT_SCHEMA))
    got = {(r["id_mcaid"], r["preg_endpoint"]) for r in days.collect()}
    assert got == {("w1", "lb"), ("w3", "deliv")}


def test_preg_episode_timeline_and_windows(spark):
    rows = [
        # w1: two live births 300 days apart -> two episodes (>182)
        ("w1", d("2018-01-10"), 1, 0, 0, 0, 0, 0, 0),
        ("w1", d("2018-11-06"), 1, 0, 0, 0, 0, 0, 0),
        # lb follow-up visit 30 days after the first -> same episode
        ("w1", d("2018-02-09"), 1, 0, 0, 0, 0, 0, 0),
        # w1 sa 60 days after first lb -> within the sa-vs-lb window
        # (154) -> NOT placed
        ("w1", d("2018-03-11"), 0, 0, 0, 1, 0, 0, 0),
        # w2: ectopic then spontaneous abortion 80 days later (> the
        # 56-day sa-vs-ect window) -> both placed
        ("w2", d("2019-02-01"), 0, 1, 0, 0, 0, 0, 0),
        ("w2", d("2019-04-22"), 0, 0, 0, 1, 0, 0, 0),
    ]
    eps = build_preg_episodes(spark.createDataFrame(rows, ENDPOINT_SCHEMA))
    got = eps.orderBy("preg_episode_id").collect()
    w1 = [r for r in got if r["id_mcaid"] == "w1"]
    assert [(r["preg_endpoint"], r["preg_end_date"]) for r in w1] == [
        ("lb", d("2018-01-10")), ("lb", d("2018-11-06"))
    ]
    # first lb: no prior -> start = end - 301
    assert w1[0]["preg_start_date"] == d("2018-01-10") - dt.timedelta(days=301)
    # second lb: prior episode exists 300 days before (< 301) -> start
    # clamped to prior date + 28-day buffer
    assert w1[1]["preg_start_date"] == d("2018-01-10") + dt.timedelta(days=28)
    w2 = [r for r in got if r["id_mcaid"] == "w2"]
    assert {r["preg_endpoint"] for r in w2} == {"ect", "sa"}
    # globally dense episode ids across the dataset
    ids = sorted(r["preg_episode_id"] for r in got)
    assert ids == [1, 2, 3, 4]


def test_preg_start_corrections(spark):
    rows = [("w1", d("2018-01-10"), 1, 0, 0, 0, 0, 0, 0)]
    eps = build_preg_episodes(spark.createDataFrame(rows, ENDPOINT_SCHEMA))
    corr = spark.createDataFrame(
        [("w1", 1, d("2017-04-01"), 2), ("w1", 1, d("2017-05-01"), 1)],
        "id_mcaid string, preg_episode_id long, corrected_start_date date, "
        "priority int",
    )
    out = apply_start_corrections(eps, corr).collect()[0]
    # highest-priority (lowest number) correction wins
    assert out["preg_start_date"] == d("2017-05-01")


def test_naloxone_union_and_forms(spark):
    pharm = spark.createDataFrame(
        [
            ("p1", 1, "69547035302", d("2019-01-10"), 2.0),   # matches list
            ("p1", 2, "00093216519", d("2019-02-10"), 1.0),   # special spray
            ("p1", 3, "99999999999", d("2019-03-10"), 1.0),   # not naloxone
            ("p2", 4, "69547035302", d("2015-01-10"), 1.0),   # pre-2016
            ("p2", 5, "69547035302", d("2019-04-10"), 0.5),   # qty < 1
        ],
        "id_mcaid string, claim_header_id long, ndc string, "
        "rx_fill_date date, rx_quantity double",
    )
    procedure = spark.createDataFrame(
        [
            ("p2", 6, "G1028", None, d("2019-05-01")),
            ("p2", 7, "J2310", None, d("2019-06-01")),
            ("p2", 8, "J3490", "HG", d("2019-07-01")),
            ("p2", 9, "J3490", "XX", d("2019-08-01")),  # wrong modifier
            ("p2", 10, "99213", None, d("2019-09-01")),
        ],
        "id_mcaid string, claim_header_id long, procedure_code string, "
        "modifier_code string, last_service_date date",
    )
    ref = spark.createDataFrame(
        [("6954703",), ("00093216519",)], "ndc string"
    )
    out = {r["claim_header_id"]: r for r in build_claim_naloxone(
        pharm, procedure, ref
    ).collect()}
    assert set(out) == {1, 2, 6, 7, 8}
    assert out[2]["form"] == "SPRAY" and out[2]["location"] == "PHARMACY"
    assert out[6]["form"] == "SPRAY" and out[6]["quantity"] == 2.0
    assert out[7]["form"] == "INJECTION"
    assert out[8]["form"] == "UNKNOWN"


def test_naloxone_mcare_variant(spark):
    """load_stage.mcare_claim_naloxone.R: id_mcare-keyed run equals
    the mcaid run row-for-row, output keeps the source id name."""
    from claims_data_spark.tables.naloxone import build_mcare_claim_naloxone

    pharm = spark.createDataFrame(
        [
            ("p1", 1, "69547035302", d("2019-01-10"), 2.0),
            ("p1", 2, "00093216519", d("2019-02-10"), 1.0),
        ],
        "id_mcare string, claim_header_id long, ndc string, "
        "rx_fill_date date, rx_quantity double",
    )
    procedure = spark.createDataFrame(
        [("p2", 6, "G1028", None, d("2019-05-01"))],
        "id_mcare string, claim_header_id long, procedure_code string, "
        "modifier_code string, last_service_date date",
    )
    ref = spark.createDataFrame([("6954703",), ("00093216519",)], "ndc string")
    out = build_mcare_claim_naloxone(pharm, procedure, ref)
    assert "id_mcare" in out.columns and "id_mcaid" not in out.columns
    got = {r["claim_header_id"] for r in out.collect()}
    assert got == {1, 2, 6}


def test_xwalk_with_pha(spark):
    mcaid = spark.createDataFrame(
        [("p1", d("1990-01-01"), "h1"), ("p2", d("1985-02-02"), "h2")],
        "id_mcaid string, dob date, name_hash string",
    )
    mcare = spark.createDataFrame(
        [("M1", d("1990-01-01"), "h1")],
        "id_mcare string, dob date, name_hash string",
    )
    pha = spark.createDataFrame(
        [("H9", d("1990-01-01"), "h1"), ("H8", d("1970-03-03"), "h3")],
        "id_pha string, dob date, name_hash string",
    )
    xw = build_xwalk(mcaid, mcare, ["dob", "name_hash"], pha_persons=pha)
    rows = {tuple(r[c] for c in ("id_mcaid", "id_mcare", "id_pha")): r["id_apde"]
            for r in xw.collect()}
    # p1 = M1 = H9 linked into one id_apde row
    assert ("p1", "M1", "H9") in rows
    # PHA-only person keeps a row with its own id
    assert (None, None, "H8") in rows
    # ids dense over the person dimension
    assert sorted(set(rows.values())) == [1, 2, 3]


def test_preg_episodes_apcd_id_variant(spark):
    import datetime

    from claims_data_spark.tables.pregnancy import build_preg_episodes

    d_ = datetime.date.fromisoformat
    claims = spark.createDataFrame(
        [("A1", d_("2019-06-01"), 1, 0, 0, 0, 0, 0, 0)],
        "id_apcd string, last_service_date date, lb int, ect int, "
        "ab int, sa int, sb int, tro int, deliv int",
    )
    out = build_preg_episodes(claims, id_col="id_apcd")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["id_apcd"] == "A1"
    assert rows[0]["preg_endpoint"] == "lb"
    assert rows[0]["preg_episode_id"] == 1


def test_ccw_table_qa_gates(spark):
    """qa_stage.mcaid_claim_ccw.R: distinct-condition surface match,
    encounter-date ordering, prevalence review stats."""
    from claims_data_spark.qa import ccw_table_qa

    ccw = spark.createDataFrame(
        [(1, "ccw_diabetes", "2024-01-01", "2024-06-01"),
         (2, "ccw_diabetes", "2024-02-01", "2024-02-01"),
         (2, "ccw_hypertension", "2024-03-01", "2024-04-01")],
        "id_mcaid long, ccw_desc string, first_encounter_date string,"
        " last_encounter_date string",
    )
    ok = ccw_table_qa(
        ccw, ["ccw_diabetes", "ccw_hypertension"], population=10
    )
    assert all(r[1] for r in ok)
    prev = [r for r in ok if r[0] == "prevalence-for-review"][0][2]
    assert "'ccw_diabetes': 20.0" in prev

    # a condition absent from the catalog fails the surface gate
    bad = ccw_table_qa(ccw, ["ccw_diabetes"])
    assert not bad[0][1] and "extra=['ccw_hypertension']" in bad[0][2]

    # reversed dates fail the ordering gate
    rev = spark.createDataFrame(
        [(1, "ccw_diabetes", "2024-06-01", "2024-01-01")],
        "id_mcaid long, ccw_desc string, first_encounter_date string,"
        " last_encounter_date string",
    )
    res = ccw_table_qa(rev, ["ccw_diabetes"])
    assert not [r for r in res if r[0] == "encounter-dates-ordered"][0][1]
