"""Tests for the measure registry / final-calculation layer
(reference semantics: create_stage.sp_perf_measures.sql batches,
load_ref.age_grp.sql)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from claims_data_spark.tables.perf_registry import (
    build_enroll_denom_full,
    perf_measure_cap,
    perf_measure_event,
    perf_measure_month,
    perf_staging_event_date,
    perf_staging_month,
    ref_age_grp,
    ref_perf_measure,
    yyyymm_add_py,
)


def test_yyyymm_add_py():
    assert yyyymm_add_py(201712, -11) == 201701
    assert yyyymm_add_py(201701, -12) == 201601
    assert yyyymm_add_py(201612, 1) == 201701
    assert yyyymm_add_py(201701, -1) == 201612


def test_ref_age_grp_bands(spark):
    rows = {r.age: r for r in ref_age_grp(spark).collect()}
    assert len(rows) == 252  # -1..250 inclusive
    assert rows[17].age_grp_2 == "Age 0-17"
    assert rows[17].age_grp_1 is None
    assert rows[18].age_grp_1 == "Age 18+"
    assert rows[65].age_grp_7 == "Age 65+"
    assert rows[65].age_grp_8 is None
    # age_grp_9_months is keyed in months
    assert rows[13].age_grp_9_months == "Age 12-24 Months"
    assert rows[100].age_grp_9_months == "Age 7-11"
    assert rows[-1].age_grp_0 is None


def _member_month(spark, rows):
    return spark.createDataFrame(
        rows,
        "id_mcaid string, year_month int, enrolled_any int, full_benefit int,"
        " dual int, tpl int, hospice int, dob date",
    )


DOB_ADULT = dt.date(1980, 6, 15)


def _full_year(pid, months, dob=DOB_ADULT, hospice=0, full_benefit=1, dual=0):
    return [
        (pid, ym, 1, full_benefit, dual, 0, hospice, dob) for ym in months
    ]


MONTHS_2017 = [201700 + m for m in range(1, 13)]
MONTHS_2016 = [201600 + m for m in range(1, 13)]


def test_enroll_denom_full_frames(spark):
    mm = _member_month(
        spark,
        _full_year("a", MONTHS_2016 + MONTHS_2017)
        # b: enrolled only Jul-Dec 2017 (6 months), hospice in Dec
        + [("b", ym, 1, 1, 0, 0, 1 if ym == 201712 else 0, DOB_ADULT)
           for ym in MONTHS_2017[6:]],
    )
    den = build_enroll_denom_full(mm, 201601, 201712)
    end = {r.id_mcaid: r for r in den.filter(F.col("year_month") == 201712).collect()}
    assert end["a"].full_criteria_t_12_m == 12
    assert end["a"].full_criteria_prior_t_12_m == 12
    assert end["a"].hospice_t_12_m == 0
    assert end["a"].end_month_age == 37
    assert end["b"].full_criteria_t_12_m == 6
    assert end["b"].hospice_t_12_m == 1
    # p_2_m frame looks at current + next month
    nov_b = den.filter(
        (F.col("id_mcaid") == "b") & (F.col("year_month") == 201711)
    ).head()
    assert nov_b.full_criteria_p_2_m == 2
    assert nov_b.hospice_p_2_m == 1  # December hospice month visible


def test_enroll_denom_age_in_months(spark):
    mm = _member_month(
        spark, _full_year("kid", MONTHS_2017, dob=dt.date(2016, 6, 15))
    )
    den = build_enroll_denom_full(mm, 201701, 201712)
    r = den.filter(F.col("year_month") == 201712).head()
    assert r.end_month_age == 1
    assert r.age_in_months == 18  # 2016-06-15 -> 2017-12-31


def _refs(spark):
    return ref_perf_measure(spark), ref_age_grp(spark)


def test_perf_measure_ed_member_months(spark):
    ref, age = _refs(spark)
    mm = _member_month(
        spark,
        _full_year("a", MONTHS_2017)                  # 12 months
        + _full_year("b", MONTHS_2017[:6])            # 6 months < 7 threshold
        + _full_year("h", MONTHS_2017, hospice=1),    # hospice-excluded
    )
    den = build_enroll_denom_full(mm, 201701, 201712)
    ed_events = spark.createDataFrame(
        [("a", 201703), ("a", 201703), ("a", 201801),  # 2 in window, 1 outside
         ("b", 201705), ("h", 201706)],
        "id_mcaid string, year_month int",
    )
    staging = perf_staging_month(ed_events, measure_id=1)
    out = perf_measure_month(staging, den, ref, age, 201712, "ED")
    rows = {r.id_mcaid: r for r in out.collect()}
    assert set(rows) == {"a"}
    assert rows["a"].numerator == 2
    assert rows["a"].denominator == 12  # member months
    assert rows["a"].age_grp == "Age 18-64"
    assert rows["a"].beg_year_month == 201701


def test_perf_measure_ah_outlier_exclusion(spark):
    ref, age = _refs(spark)
    mm = _member_month(
        spark, _full_year("a", MONTHS_2017) + _full_year("x", MONTHS_2017)
    )
    den = build_enroll_denom_full(mm, 201701, 201712)
    discharges = spark.createDataFrame(
        [("a", 201702), ("a", 201706),
         ("x", 201702), ("x", 201705), ("x", 201709)],  # 3 => outlier
        "id_mcaid string, year_month int",
    )
    staging = perf_staging_month(discharges, measure_id=2)
    out = perf_measure_month(staging, den, ref, age, 201712, "AH")
    rows = {r.id_mcaid: r for r in out.collect()}
    assert set(rows) == {"a"}
    assert rows["a"].numerator == 2
    assert rows["a"].denominator == 1


def test_perf_measure_tpm_windows(spark):
    """Denominator uses a 24-month identification window; numerator
    only 12 (sp_perf_measures.sql:784-797)."""
    ref, age = _refs(spark)
    mm = _member_month(
        spark,
        _full_year("a", MONTHS_2016 + MONTHS_2017)
        + _full_year("old", MONTHS_2016 + MONTHS_2017)
        + _full_year("kid", MONTHS_2016 + MONTHS_2017, dob=dt.date(2014, 1, 1)),
    )
    den = build_enroll_denom_full(mm, 201601, 201712)
    staging = spark.createDataFrame(
        # a: dx in 2016 (24m denom window), tx in 2017 (12m num window);
        # old: dx + tx both in 2016 — tx outside the numerator window;
        # kid: age 3 at end month — under the TPM age floor
        [("a", 201603, 9, "D", 1), ("a", 201705, 9, "N", 1),
         ("old", 201603, 9, "D", 1), ("old", 201611, 9, "N", 1),
         ("kid", 201703, 9, "D", 1), ("kid", 201705, 9, "N", 1)],
        "id_mcaid string, year_month int, measure_id int, num_denom string,"
        " measure_value int",
    )
    out = perf_measure_month(staging, den, ref, age, 201712, "TPM")
    rows = {r.id_mcaid: r for r in out.collect()}
    assert set(rows) == {"a", "old"}
    assert rows["a"].numerator == 1
    assert rows["old"].numerator == 0  # N row predates the 12m window
    assert rows["a"].denominator == 1


def test_perf_measure_event_fua(spark):
    ref, age = _refs(spark)
    mm = _member_month(
        spark,
        _full_year("a", MONTHS_2017)
        # gap: no coverage in the month after the July event
        + [("g", ym, 1, 1, 0, 0, 0, DOB_ADULT) for ym in MONTHS_2017 if ym != 201708]
        # teen: 12 years old at event -> under the FUA age floor of 13
        + _full_year("teen", MONTHS_2017, dob=dt.date(2005, 6, 1)),
    )
    den = build_enroll_denom_full(mm, 201701, 201712)
    events = spark.createDataFrame(
        [("a", dt.date(2017, 7, 5), 1),
         ("a", dt.date(2017, 12, 20), 1),   # < 30 days before year end: cut
         ("g", dt.date(2017, 7, 5), 1),     # no coverage next month: cut
         ("teen", dt.date(2017, 7, 5), 1)],
        "id_mcaid string, event_date date, followed_up int",
    )
    staging = perf_staging_event_date(
        events, measure_id=4, numerator_col="followed_up"
    )
    out = perf_measure_event(staging, den, ref, age, 201712, "FUA_30")
    rows = {r.id_mcaid: r for r in out.collect()}
    assert set(rows) == {"a"}
    assert rows["a"].denominator == 1
    assert rows["a"].numerator == 1
    assert rows["a"].age_grp == "Age 13+"


def test_perf_measure_event_first_of_month_waiver(spark):
    """An index event on the 1st of a 31-day month doesn't need
    next-month coverage (sp_perf_measures.sql:296-299)."""
    ref, age = _refs(spark)
    mm = _member_month(
        spark,
        [("w", ym, 1, 1, 0, 0, 0, DOB_ADULT) for ym in MONTHS_2017 if ym != 201708],
    )
    den = build_enroll_denom_full(mm, 201701, 201712)
    events = spark.createDataFrame(
        [("w", dt.date(2017, 7, 1), 0)],
        "id_mcaid string, event_date date, followed_up int",
    )
    staging = perf_staging_event_date(
        events, measure_id=4, numerator_col="followed_up"
    )
    out = perf_measure_event(staging, den, ref, age, 201712, "FUA_30")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].denominator == 1


def test_perf_measure_event_pcr_age_band(spark):
    ref, age = _refs(spark)
    mm = _member_month(
        spark,
        _full_year("a", MONTHS_2016 + MONTHS_2017)
        + _full_year("s", MONTHS_2016 + MONTHS_2017, dob=dt.date(1950, 1, 1)),
    )
    den = build_enroll_denom_full(mm, 201601, 201712)
    events = spark.createDataFrame(
        [("a", dt.date(2017, 6, 10), 0), ("s", dt.date(2017, 6, 10), 1)],
        "id_mcaid string, event_date date, readmitted int",
    )
    staging = perf_staging_event_date(
        events, measure_id=12, numerator_col="readmitted"
    )
    out = perf_measure_event(staging, den, ref, age, 201712, "PCR")
    rows = {r.id_mcaid: r for r in out.collect()}
    assert set(rows) == {"a"}  # s is 67: outside 18-64
    assert rows["a"].age_grp == "Age 18-64"


def test_perf_measure_cap_windows(spark):
    """Younger CAP bands use the 12-month numerator window; 7-11 and
    12-19 use 24 months plus prior-year enrollment
    (sp_perf_measures.sql:1363-1370)."""
    ref, age = _refs(spark)
    mm = _member_month(
        spark,
        # toddler (18 months at end): 12m window applies
        _full_year("tod", MONTHS_2016 + MONTHS_2017, dob=dt.date(2016, 6, 15))
        # nine-year-old with full prior-year coverage
        + _full_year("nine", MONTHS_2016 + MONTHS_2017, dob=dt.date(2008, 3, 1))
        # nine-year-old WITHOUT prior-year coverage
        + _full_year("gap9", MONTHS_2017, dob=dt.date(2008, 3, 1)),
    )
    den = build_enroll_denom_full(mm, 201601, 201712)
    staging = spark.createDataFrame(
        # tod visited in 2016 only — outside its 12m window
        [("tod", 201608, 13, "N", 1),
         # nine visited in 2016 — inside its 24m window
         ("nine", 201608, 13, "N", 1),
         ("gap9", 201705, 13, "N", 1)],
        "id_mcaid string, year_month int, measure_id int, num_denom string,"
        " measure_value int",
    )
    out = perf_measure_cap(staging, den, ref, age, 201712)
    rows = {r.id_mcaid: r for r in out.collect()}
    assert set(rows) == {"tod", "nine"}  # gap9 fails prior-year criterion
    assert rows["tod"].numerator == 0
    assert rows["tod"].age_grp == "Age 12-24 Months"
    assert rows["nine"].numerator == 1
    assert rows["nine"].age_grp == "Age 7-11"


def test_perf_measure_tpm_by_dx_any_enrollment(spark):
    """By-dx TPM sub-measures gate on ANY enrollment, not the 11-month
    full-criteria rule, and have no age floor
    (sp_perf_measures.sql:1501-1504)."""
    ref, age = _refs(spark)
    # one month of partial-benefit enrollment: full_criteria = 0 all year
    mm = _member_month(
        spark,
        [("a", 201706, 1, 0, 0, 0, 0, DOB_ADULT)]
        + _full_year("kid", MONTHS_2017, dob=dt.date(2014, 6, 1)),
    )
    den = build_enroll_denom_full(mm, 201601, 201712)
    staging = spark.createDataFrame(
        [("a", 201603, 33, "D", 1), ("a", 201705, 33, "N", 1),
         ("kid", 201703, 33, "D", 1), ("kid", 201705, 33, "N", 1)],
        "id_mcaid string, year_month int, measure_id int, num_denom string,"
        " measure_value int",
    )
    out = perf_measure_month(staging, den, ref, age, 201712, "TPM_Depression")
    rows = {r.id_mcaid: r for r in out.collect()}
    # a: would fail TPM's full-criteria gate but passes by-dx ANY rule;
    # kid (age 3) included because the by-dx batch has no age floor
    assert set(rows) == {"a", "kid"}
    assert rows["a"].measure_id == 33
    assert rows["kid"].age_grp is None  # age 3 outside age_grp_5 bands
