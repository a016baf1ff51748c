"""Staging-batch dispatcher tests (sp_perf_staging.sql semantics)."""

import datetime as dt

from pyspark.sql import functions as F

from claims_data_spark.tables.perf_staging import (
    build_perf_staging,
    stage_all_cause_ed,
    stage_followup_ed,
    stage_tx_pen,
)


def test_stage_ed_sums_visits_per_month(spark):
    ed = spark.createDataFrame(
        [("a", dt.date(2017, 3, 2), 1), ("a", dt.date(2017, 3, 20), 1),
         ("a", dt.date(2017, 4, 1), 1), ("b", dt.date(2017, 3, 5), 1)],
        "id_mcaid string, first_service_date date, ed_visit_num int",
    )
    rows = {(r.id_mcaid, r.year_month): r for r in stage_all_cause_ed(ed).collect()}
    assert rows[("a", 201703)].measure_value == 2
    assert rows[("a", 201704)].measure_value == 1
    assert rows[("a", 201703)].measure_id == 1
    assert rows[("a", 201703)].num_denom == "N"


def test_stage_tx_pen_long_n_and_d(spark):
    num = spark.createDataFrame(
        [("a", 1, dt.date(2017, 3, 2))],
        "id_mcaid string, claim_header_id long, first_service_date date",
    )
    den = spark.createDataFrame(
        [("a", 1, dt.date(2017, 3, 2)), ("b", 2, dt.date(2017, 5, 2)),
         ("b", 3, dt.date(2017, 5, 9))],
        "id_mcaid string, claim_header_id long, first_service_date date",
    )
    out = stage_tx_pen(num, den, 9).collect()
    n = [r for r in out if r.num_denom == "N"]
    d = [r for r in out if r.num_denom == "D"]
    assert len(n) == 1 and len(d) == 2  # b's two May claims MAX to one row
    assert all(r.measure_id == 9 for r in out)
    assert all(r.measure_value == 1 for r in out)


def test_stage_followup_emits_both_horizons(spark):
    js = spark.createDataFrame(
        [("a", dt.date(2017, 3, 2), 1, 1), ("b", dt.date(2017, 4, 9), 0, 1)],
        "id_mcaid string, first_service_date date,"
        " follow_up_7_day int, follow_up_30_day int",
    )
    out = stage_followup_ed(js, "FUA").collect()
    assert len(out) == 4  # 2 events x 2 horizons
    by_measure = {}
    for r in out:
        by_measure.setdefault(r.measure_id, []).append(r)
    assert set(by_measure) == {3, 4}
    a7 = [r for r in by_measure[3] if r.id_mcaid == "a"][0]
    assert a7.numerator == 1 and a7.denominator == 1
    b7 = [r for r in by_measure[3] if r.id_mcaid == "b"][0]
    assert b7.numerator == 0
    assert all(r.event_date is not None and r.year_month == 201703
               for r in out if r.id_mcaid == "a")


def test_dispatcher_names(spark):
    ed = spark.createDataFrame(
        [("a", dt.date(2017, 3, 2), 1)],
        "id_mcaid string, first_service_date date, ed_visit_num int",
    )
    rows, grain = build_perf_staging("All-Cause ED Visits", ed)
    assert grain == "month" and rows.count() == 1
    try:
        build_perf_staging("No Such Measure", ed)
        assert False
    except ValueError:
        pass


def test_staging_feeds_registry_end_to_end(spark):
    """Staging rows produced by the dispatcher are directly consumable
    by perf_registry.perf_measure_month."""
    from claims_data_spark.tables.perf_registry import (
        build_enroll_denom_full,
        perf_measure_month,
        ref_age_grp,
        ref_perf_measure,
    )

    ed = spark.createDataFrame(
        [("a", dt.date(2017, 3, 2), 1), ("a", dt.date(2017, 8, 2), 1)],
        "id_mcaid string, first_service_date date, ed_visit_num int",
    )
    staging, _ = build_perf_staging("All-Cause ED Visits", ed)
    mm = spark.createDataFrame(
        [("a", 201700 + m, 1, 1, 0, 0, 0, dt.date(1980, 6, 15))
         for m in range(1, 13)],
        "id_mcaid string, year_month int, enrolled_any int, full_benefit int,"
        " dual int, tpl int, hospice int, dob date",
    )
    den = build_enroll_denom_full(mm, 201701, 201712)
    out = perf_measure_month(
        staging, den, ref_perf_measure(spark), ref_age_grp(spark),
        201712, "ED",
    ).collect()
    assert len(out) == 1 and out[0].numerator == 2 and out[0].denominator == 12


def test_run_perf_measures_multi(spark):
    """Full EXEC-loop analog: two measures staged and calculated from
    one member-month panel, one unioned result frame."""
    from claims_data_spark.tables.perf_staging import run_perf_measures

    months = [201600 + m for m in range(1, 13)] + [201700 + m for m in range(1, 13)]
    mm = spark.createDataFrame(
        [("a", ym, 1, 1, 0, 0, 0, dt.date(1980, 6, 15)) for ym in months],
        "id_mcaid string, year_month int, enrolled_any int, full_benefit int,"
        " dual int, tpl int, hospice int, dob date",
    )
    ed = spark.createDataFrame(
        [("a", dt.date(2017, 3, 2), 1)],
        "id_mcaid string, first_service_date date, ed_visit_num int",
    )
    fua = spark.createDataFrame(
        [("a", dt.date(2017, 7, 5), 1, 1)],
        "id_mcaid string, first_service_date date,"
        " follow_up_7_day int, follow_up_30_day int",
    )
    out = run_perf_measures(
        mm,
        {"All-Cause ED Visits": ed,
         "Follow-up ED visit for Alcohol/Drug Abuse": fua},
        201712,
        ym_min=201601,
        already_dense=True,
    ).collect()
    by_measure = {r.measure_id: r for r in out}
    assert set(by_measure) == {1, 3, 4}  # ED + FUA 7-day + FUA 30-day
    assert by_measure[1].denominator == 12
    assert by_measure[3].numerator == 1 and by_measure[4].numerator == 1
