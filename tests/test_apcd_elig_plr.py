"""APCD elig_demo / full timevar / person-level rollup
(load_stage.apcd_elig_demo.R, apcd_elig_timevar.R, apcd_elig_plr.R)
and mcaid housing status (load_stage.mcaid_housing_status.R)."""
import datetime

from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403

d_ = datetime.date.fromisoformat


def _mm_row(member=1, ym=201601, age=40, gender="F", zip_code="98101",
            med_mcaid=None, med_mcare=None, med_comm=None, rx_mcaid=None,
            dental_mcaid=None, med_any=None, rx_any=None, dental_any=None):
    return {
        "internal_member_id": member, "year_month": ym, "age": age,
        "gender_code": gender, "zip_code": zip_code,
        "med_medicaid_eligibility_id": med_mcaid,
        "med_medicare_eligibility_id": med_mcare,
        "med_commercial_eligibility_id": med_comm,
        "rx_medicaid_eligibility_id": rx_mcaid,
        "rx_medicare_eligibility_id": None,
        "rx_commercial_eligibility_id": None,
        "dental_medicaid_eligibility_id": dental_mcaid,
        "dental_medicare_eligibility_id": None,
        "dental_commercial_eligibility_id": None,
        "medical_eligibility_id": med_any or med_mcaid or med_mcare
        or med_comm,
        "pharmacy_eligibility_id": rx_any or rx_mcaid,
        "dental_eligibility_id": dental_any or dental_mcaid,
    }


_MM_SCHEMA = (
    "internal_member_id int, year_month int, age int, gender_code string, "
    "zip_code string, med_medicaid_eligibility_id string, "
    "med_medicare_eligibility_id string, med_commercial_eligibility_id "
    "string, rx_medicaid_eligibility_id string, rx_medicare_eligibility_id "
    "string, rx_commercial_eligibility_id string, "
    "dental_medicaid_eligibility_id string, dental_medicare_eligibility_id "
    "string, dental_commercial_eligibility_id string, "
    "medical_eligibility_id string, pharmacy_eligibility_id string, "
    "dental_eligibility_id string"
)


def _mm_df(spark, rows):
    return spark.createDataFrame(
        [_mm_row(**r) for r in rows], _MM_SCHEMA
    )


def test_apcd_elig_demo_dob_gender_race(spark):
    from claims_data_spark.tables.apcd import build_apcd_elig_demo

    # member 1: age ticks 40->41 between 201603 and 201604 so DOB is
    # known to be 1975-04 (ym 201604 - 4200 = 197404... reference:
    # ym - lag((age+1)*100) = 201604 - (41)*100... check: prev row age
    # 40 -> (40+1)*100 = 4100; 201604-4100 = 197504 -> 1975-04-01
    mm = _mm_df(spark, [
        {"member": 1, "ym": 201603, "age": 40, "gender": "F"},
        {"member": 1, "ym": 201604, "age": 41, "gender": "F"},
        # member 2: single age record -> fallback DOB (overestimates)
        {"member": 2, "ym": 201606, "age": 30, "gender": "M"},
    ])
    elig = spark.createDataFrame(
        [(1, "2016-12-31", 5, 0, 0, None, None),     # white
         (1, "2017-06-30", 3, 0, 1, None, None),     # black + latino
         (2, "2016-12-31", 0, 0, 0, None, None)],    # unknown
        "internal_member_id int, eligibility_end_dt string, race_id1 int, "
        "race_id2 int, latino_id int, ethnicity_id1 string, "
        "ethnicity_id2 string",
    )
    out = build_apcd_elig_demo(mm, elig)
    rows = {r["id_apcd"]: r for r in out.collect()}
    m1 = rows[1]
    assert m1["dob"] == d_("1975-04-01")
    assert m1["gender_me"] == "Female" and m1["gender_recent"] == "Female"
    # white ever + black ever + latino ever -> Multiple (eth) / Multiple (race)
    assert m1["race_eth_me"] == "Multiple"
    assert m1["race_me"] == "Multiple"
    # most recent valid row (2017) is black+latino -> z_Multiple -> Multiple
    assert m1["race_eth_recent"] == "Multiple"
    assert m1["race_latino"] == 1 and m1["race_white"] == 1
    m2 = rows[2]
    # single age 30 at 201606 -> 201606-3100=198506, +1 month = 1985-07-01
    assert m2["dob"] == d_("1985-07-01")
    assert m2["race_unknown"] == 1
    # all-unknown rows: the reference's step-9 max(NULLIF) yields NULL
    # for the mutually-exclusive labels but 'Unknown' for the recents
    assert m2["race_eth_me"] is None
    assert m2["race_eth_recent"] == "Unknown"


def test_apcd_timevar_full_flags_and_geo(spark):
    from claims_data_spark.tables.apcd import build_apcd_elig_timevar_full

    mm = _mm_df(spark, [
        # Jan-Feb: medicaid med only; Mar: medicaid+medicare med
        {"member": 1, "ym": 201601, "med_mcaid": "e1"},
        {"member": 1, "ym": 201602, "med_mcaid": "e1"},
        {"member": 1, "ym": 201603, "med_mcaid": "e1", "med_mcare": "e2"},
        # unknown market month (medical id only)
        {"member": 2, "ym": 201601, "med_any": "e9"},
    ])
    ref_zip = spark.createDataFrame(
        [("98101", "County", "King", "K"),
         ("98101", "Accountable Community of Health", "HealthierHere", "H")],
        "zip_code string, zip_group_type_desc string, zip_group_desc "
        "string, zip_group_code string",
    )
    out = build_apcd_elig_timevar_full(mm, ref_zip)
    segs = sorted(out.collect(), key=lambda r: (r["id_apcd"], r["from_date"]))
    assert len(segs) == 3
    a, b, c = segs
    assert a["med_covgrp"] == 1 and a["med_medicaid"] == 1
    assert a["from_date"] == d_("2016-01-01")
    assert a["to_date"] == d_("2016-02-29")
    assert a["cov_time_day"] == 60
    assert a["geo_county"] == "King" and a["geo_kc"] == 1
    assert a["geo_ach"] == "HealthierHere" and a["geo_wa"] == 1
    assert b["med_covgrp"] == 4 and b["med_medicare"] == 1
    assert b["contiguous"] == 1
    assert c["id_apcd"] == 2 and c["med_covgrp"] == 8
    assert c["med_unknown"] == 1 and c["med_medicaid"] == 0


def test_apcd_elig_month(spark):
    """load_stage.apcd_elig_month.R:37-136: month-grain rows (no
    collapse), covgrps, payer flags, dual, time-period vars, geo, and
    the no-coverage QA invariant."""
    from claims_data_spark.tables.apcd import build_apcd_elig_month

    mm = _mm_df(spark, [
        {"member": 1, "ym": 201601, "med_mcaid": "e1"},
        {"member": 1, "ym": 201602, "med_mcaid": "e1", "med_mcare": "e2"},
        {"member": 1, "ym": 201604, "med_comm": "e3", "rx_mcaid": "r1"},
        {"member": 2, "ym": 201612, "med_any": "e9", "zip_code": "99999"},
    ])
    ref_zip = spark.createDataFrame(
        [("98101", "County", "King", "K"),
         ("98101", "Accountable Community of Health", "HealthierHere", "H")],
        "zip_code string, zip_group_type_desc string, zip_group_desc "
        "string, zip_group_code string",
    )
    out = build_apcd_elig_month(mm, ref_zip)
    rows = sorted(out.collect(), key=lambda r: (r["id_apcd"], r["year_month"]))
    assert len(rows) == 4  # one row per member-month, NO island collapse
    a, b, c, e = rows
    assert a["from_date"] == d_("2016-01-01") and a["to_date"] == d_("2016-01-31")
    assert a["cov_time_day"] == 31 and a["year_quarter"] == 20161
    assert a["med_covgrp"] == 1 and a["med_medicaid"] == 1 and a["dual"] == 0
    assert b["med_covgrp"] == 4 and b["med_medicare"] == 1 and b["dual"] == 1
    assert b["cov_time_day"] == 29  # leap February
    # month 201604: commercial med + medicaid rx -> med_covgrp 3,
    # pharm_covgrp 1, empirical dual needs mcaid AND mcare -> 0
    assert c["med_covgrp"] == 3 and c["pharm_covgrp"] == 1 and c["dual"] == 0
    assert c["year_quarter"] == 20162
    assert a["geo_county"] == "King" and a["geo_kc"] == 1 and a["geo_wa"] == 1
    # member 2: unknown-market medical (covgrp 8), non-WA zip
    assert e["med_covgrp"] == 8 and e["med_unknown"] == 1
    assert e["geo_county"] is None and e["geo_wa"] == 0
    # reference QA res7: no member-month with zero coverage everywhere
    none_cov = out.filter(
        (F.col("med_covgrp") == 0) & (F.col("pharm_covgrp") == 0)
        & (F.col("dental_covgrp") == 0)
    ).count()
    assert none_cov == 0


def test_apcd_elig_plr_rollup(spark):
    from claims_data_spark.tables.apcd import build_apcd_elig_plr

    # 2016 calendar year (366 days). Member 1: medicaid med coverage
    # Oct 2015 - Mar 2016 (clips to 91 days), commercial Jul-Dec 2016
    # (184 days) in a different zip.
    tv = spark.createDataFrame(
        [(1, "2015-10-01", "2016-03-31", 1, 0, 1, 0, 0, 0, 0, 0, "98101"),
         (1, "2016-07-01", "2016-12-31", 3, 0, 0, 0, 1, 0, 0, 0, "98055")],
        "id_apcd int, from_date string, to_date string, med_covgrp int, "
        "pharm_covgrp int, med_medicaid int, med_medicare int, "
        "med_commercial int, pharm_medicaid int, pharm_medicare int, "
        "pharm_commercial int, geo_zip string",
    ).select(
        "id_apcd", F.col("from_date").cast("date").alias("from_date"),
        F.col("to_date").cast("date").alias("to_date"),
        "med_covgrp", "pharm_covgrp", "med_medicaid", "med_medicare",
        "med_commercial", "pharm_medicaid", "pharm_medicare",
        "pharm_commercial", "geo_zip",
    )
    demo = spark.createDataFrame(
        [(1, "1950-06-15", 0, "Female", "Female", 1, 0, "White", "White",
          "White", "White", 0, 0, 0, 0, 0, 1, 0)],
        "id_apcd int, dob string, ninety_only int, gender_me string, "
        "gender_recent string, gender_female int, gender_male int, "
        "race_eth_me string, race_me string, race_eth_recent string, "
        "race_recent string, race_aian int, race_asian int, race_black "
        "int, race_latino int, race_nhpi int, race_white int, "
        "race_unknown int",
    ).withColumn("dob", F.col("dob").cast("date"))
    ref_zip = spark.createDataFrame(
        [("98101", "County", "King", "K"),
         ("98055", "County", "King", "K"),
         ("98101", "Accountable Community", "HealthierHere", "H"),
         ("98055", "Accountable Community", "HealthierHere", "H")],
        "zip_code string, zip_group_type_desc string, zip_group_desc "
        "string, zip_group_code string",
    )
    out = build_apcd_elig_plr(tv, demo, "2016-01-01", "2016-12-31", ref_zip)
    r = out.collect()[0]
    assert r["med_total_covd"] == 91 + 184
    assert r["med_medicaid_covd"] == 91
    assert r["med_commercial_covd"] == 184
    assert r["med_total_covper"] == round((275 / 366) * 100, 1)
    # zip pick: 98055 has 184+1 days vs 98101's 91+1 -> 98055
    assert r["geo_zip"] == "98055"
    assert r["geo_county"] == "King"
    # ACH days: both zips map to HealthierHere -> 275 days
    assert r["geo_ach_covd"] == 275
    assert r["age"] == 66 and r["age_grp7"] == "65 and over"
    assert r["geo_wa"] == 1 and r["overall_mcaid"] == 1
    assert r["medical_coverage_6mo"] == 1
    assert r["medical_coverage_11mo"] == 0
    assert r["dual_covd"] == 0 and r["dual_flag"] == 0


def test_housing_status(spark):
    from claims_data_spark.tables.housing import build_housing_status

    months = spark.createDataFrame(
        [("P1", "2019-01-01", "2019-01-31", "123 MAIN ST", None),
         ("P1", "2019-02-01", "2019-02-28", "HOMELESS", None),
         ("P2", "2019-01-01", "2019-01-31", "456 OAK AVE", None),
         ("P3", "2019-01-01", "2019-01-31", "789 ELM ST", None)],
        "id_mcaid string, from_date string, to_date string, geo_add1 "
        "string, geo_add2 string",
    ).select(
        "id_mcaid", F.col("from_date").cast("date").alias("from_date"),
        F.col("to_date").cast("date").alias("to_date"),
        "geo_add1", "geo_add2",
    )
    dx = spark.createDataFrame(
        [("P1", "2019-02-10", "Z5900"),     # homeless z-code same month
         ("P2", "2019-01-15", "Z5910"),     # unstably housed
         ("P2", "2019-01-20", "Z5901"),     # also homeless -> 2 statuses
         ("P3", "2019-03-01", "Z5900")],    # outside any month
        "id_mcaid string, first_service_date string, icdcm_norm string",
    ).withColumn(
        "first_service_date", F.col("first_service_date").cast("date")
    )
    out = build_housing_status(months, dx)
    rows = {(r["id_mcaid"], str(r["from_date"])): r for r in out.collect()}
    # P1 Jan: plain address, no z-code -> absent
    assert ("P1", "2019-01-01") not in rows
    # P1 Feb: address + z-code agree homeless -> source 'multiple'
    p1 = rows[("P1", "2019-02-01")]
    assert p1["housing_status"] == "homeless"
    assert p1["housing_status_source"] == "multiple"
    # P2 Jan: two distinct z-statuses -> forced 'homeless', source z_codes
    p2 = rows[("P2", "2019-01-01")]
    assert p2["housing_status"] == "homeless"
    assert p2["housing_status_source"] == "z_codes"
    # P3: z-code outside coverage months -> absent
    assert not any(k[0] == "P3" for k in rows)


def test_plr_multi_year_equals_per_year_loop(spark):
    """build_apcd_elig_plr_multi: one pass over (year x person) must
    equal the reference's per-year loop exactly, year by year."""
    from claims_data_spark.tables.apcd import (
        build_apcd_elig_plr,
        build_apcd_elig_plr_multi,
        build_apcd_elig_timevar_full,
        build_apcd_elig_demo,
    )

    mm = _mm_df(spark, [
        # member 1 spans the 2016/2017 boundary (one interval lands in
        # both years of the multi build)
        {"member": 1, "ym": 201610, "age": 40, "med_mcaid": "E1"},
        {"member": 1, "ym": 201611, "age": 40, "med_mcaid": "E1"},
        {"member": 1, "ym": 201612, "age": 40, "med_mcaid": "E1"},
        {"member": 1, "ym": 201701, "age": 41, "med_mcaid": "E1"},
        {"member": 1, "ym": 201702, "age": 41, "med_mcaid": "E1"},
        # member 2 only in 2017, dual coverage
        {"member": 2, "ym": 201706, "age": 70, "med_mcaid": "E2",
         "med_mcare": "M2"},
    ])
    elig = spark.createDataFrame(
        [(1, "2017-12-31", 5, 0, 0, None, None),
         (2, "2017-12-31", 3, 0, 0, None, None)],
        "internal_member_id int, eligibility_end_dt string, race_id1 int,"
        " race_id2 int, latino_id int, ethnicity_id1 string,"
        " ethnicity_id2 string",
    )
    tv = build_apcd_elig_timevar_full(mm)
    demo = build_apcd_elig_demo(mm, elig)
    multi = build_apcd_elig_plr_multi(tv, demo, [2016, 2017])
    for year in (2016, 2017):
        single = build_apcd_elig_plr(
            tv, demo, f"{year}-01-01", f"{year}-12-31"
        )
        got = {
            r["id_apcd"]: r.asDict()
            for r in multi.filter(F.col("plr_year") == year)
            .drop("plr_year").collect()
        }
        want = {r["id_apcd"]: r.asDict() for r in single.collect()}
        assert got == want, f"year {year} diverged"
