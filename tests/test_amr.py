"""AMR (Asthma Medication Ratio) measure tests
(load_stage.mcaid_perf_measure_amr.R semantics)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from claims_data_spark.tables.amr import amr_measure
from claims_data_spark.tables.perf_registry import (
    build_enroll_denom_full,
    ref_age_grp,
)

END = "2017-12-31"


@pytest.fixture(scope="module")
def refs(spark):
    value_sets = spark.createDataFrame(
        [("Asthma", "J4521", "ICD10CM"),
         ("Asthma", "49390", "ICD-9CM"),
         ("Outpatient", "99213", "CPT"),
         ("COPD", "J449", "ICD10CM")],
        "value_set_name string, code string, code_system string",
    )
    med_list = spark.createDataFrame(
        [("Asthma Controller Medications", "11111", "NDC", "fluticasone",
          "inhalation", "Inhaled steroid", 1.0),
         ("Asthma Controller Medications", "22222", "NDC", "montelukast",
          "oral", "Leukotriene modifiers", 1.0),
         ("Asthma Reliever Medications", "33333", "NDC", "albuterol",
          "inhalation", "SABA", 1.0),
         ("Asthma Controller Medications", "44444", "NDC", "omalizumab",
          "subcutaneous", "Antibody inhibitor", 2.0)],
        "medication_list_name string, code string, code_system string,"
        " generic_product_name string, route string, drug_class string,"
        " package_size double",
    )
    return value_sets, med_list


def _denom(spark, people):
    months = [201600 + m for m in range(1, 13)] + [201700 + m for m in range(1, 13)]
    rows = [
        (p, ym, 1, 1, 0, 0, 0, dob) for p, dob in people for ym in months
    ]
    mm = spark.createDataFrame(
        rows,
        "id_mcaid string, year_month int, enrolled_any int, full_benefit int,"
        " dual int, tpl int, hospice int, dob date",
    )
    return build_enroll_denom_full(mm, 201601, 201712)


def _claims(spark, rows):
    return spark.createDataFrame(
        rows,
        "id_mcaid string, claim_header_id long, first_service_date date,"
        " ed_perform int, inpatient int",
    )


def _dx(spark, rows):
    return spark.createDataFrame(
        rows,
        "id_mcaid string, claim_header_id long, icdcm_norm string,"
        " icdcm_version int, icdcm_number string",
    )


def _px(spark, rows):
    return spark.createDataFrame(
        rows, "id_mcaid string, claim_header_id long, procedure_code string"
    )


def _pharm(spark, rows):
    return spark.createDataFrame(
        rows,
        "id_mcaid string, ndc string, rx_fill_date date,"
        " rx_days_supply double, rx_quantity double",
    )


def test_amr_ed_pathway_and_ratio(spark, refs):
    """Member with an asthma ED visit in both years + controller-heavy
    fills qualifies and is numerator-compliant."""
    value_sets, med_list = refs
    den = _denom(spark, [("a", dt.date(1990, 5, 1))])
    header = _claims(spark, [
        ("a", 1, dt.date(2017, 6, 1), 1, 0),
        ("a", 2, dt.date(2016, 6, 1), 1, 0),   # prior-year criterion
    ])
    icdcm = _dx(spark, [
        ("a", 1, "J4521", 10, "01"), ("a", 2, "J4521", 10, "01"),
    ])
    pharm = _pharm(spark, [
        # 3 controller fills vs 1 reliever fill -> ratio 0.75
        ("a", "11111", dt.date(2017, 3, 1), 30.0, 1.0),
        ("a", "11111", dt.date(2017, 5, 1), 30.0, 1.0),
        ("a", "11111", dt.date(2017, 7, 1), 30.0, 1.0),
        ("a", "33333", dt.date(2017, 4, 1), 30.0, 1.0),
    ])
    out = amr_measure(
        den, header, icdcm, _px(spark, []), pharm, value_sets, med_list,
        END, age_grp=ref_age_grp(spark),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.measure_id == 19
    assert r.numerator == 1 and r.denominator == 1
    assert r.age_grp == "Age 19-50"
    assert r.beg_year_month == 201701 and r.end_year_month == 201712


def test_amr_requires_persistence(spark, refs):
    """Criteria only in the measurement year -> excluded from the full
    measure but included in the relaxed (1-year) variant."""
    value_sets, med_list = refs
    den = _denom(spark, [("a", dt.date(1990, 5, 1))])
    header = _claims(spark, [("a", 1, dt.date(2017, 6, 1), 1, 0)])
    icdcm = _dx(spark, [("a", 1, "J4521", 10, "01")])
    pharm = _pharm(spark, [("a", "11111", dt.date(2017, 3, 1), 30.0, 1.0)])
    full = amr_measure(
        den, header, icdcm, _px(spark, []), pharm, value_sets, med_list, END
    ).collect()
    assert full == []
    relaxed = amr_measure(
        den, header, icdcm, _px(spark, []), pharm, value_sets, med_list, END,
        require_persistent=False,
    ).collect()
    assert len(relaxed) == 1 and relaxed[0].measure_id == 20


def test_amr_copd_exclusion_and_reliever_heavy(spark, refs):
    value_sets, med_list = refs
    den = _denom(spark, [("x", dt.date(1990, 5, 1)), ("r", dt.date(2000, 5, 1))])
    header = _claims(spark, [
        ("x", 1, dt.date(2017, 6, 1), 1, 0), ("x", 2, dt.date(2016, 6, 1), 1, 0),
        ("x", 3, dt.date(2015, 1, 1), 0, 0),   # old COPD claim still excludes
        ("r", 4, dt.date(2017, 6, 1), 1, 0), ("r", 5, dt.date(2016, 6, 1), 1, 0),
    ])
    icdcm = _dx(spark, [
        ("x", 1, "J4521", 10, "01"), ("x", 2, "J4521", 10, "01"),
        ("x", 3, "J449", 10, "01"),
        ("r", 4, "J4521", 10, "01"), ("r", 5, "J4521", 10, "01"),
    ])
    pharm = _pharm(spark, [
        ("x", "11111", dt.date(2017, 3, 1), 30.0, 1.0),
        # r: 1 controller vs 3 reliever fills -> ratio 0.25 -> numerator 0
        ("r", "11111", dt.date(2017, 3, 1), 30.0, 1.0),
        ("r", "33333", dt.date(2017, 4, 1), 30.0, 1.0),
        ("r", "33333", dt.date(2017, 5, 1), 30.0, 1.0),
        ("r", "33333", dt.date(2017, 6, 1), 30.0, 1.0),
    ])
    out = {r.id_mcaid: r for r in amr_measure(
        den, header, icdcm, _px(spark, []), pharm, value_sets, med_list, END
    ).collect()}
    assert set(out) == {"r"}  # x excluded by COPD
    assert out["r"].numerator == 0


def test_amr_rx_only_pathway_needs_dx_for_lk_only(spark, refs):
    """4+ dispensing events of leukotriene-only meds require an asthma
    dx in the window (amr.R:625-627); mixed-route events do not."""
    value_sets, med_list = refs
    den = _denom(spark, [("lk", dt.date(1990, 5, 1)), ("mx", dt.date(1990, 5, 1))])
    header = _claims(spark, [])
    icdcm = _dx(spark, [])
    fills = []
    for m in (1, 3, 5, 7):
        # lk: four leukotriene-only fills, no dx anywhere
        fills.append(("lk", "22222", dt.date(2017, m, 1), 30.0, 1.0))
        fills.append(("lk", "22222", dt.date(2016, m, 1), 30.0, 1.0))
        # mx: four inhaler fills (no dx requirement)
        fills.append(("mx", "11111", dt.date(2017, m, 1), 30.0, 1.0))
        fills.append(("mx", "11111", dt.date(2016, m, 1), 30.0, 1.0))
    out = {r.id_mcaid: r for r in amr_measure(
        den, header, icdcm, _px(spark, []), _pharm(spark, fills),
        value_sets, med_list, END,
    ).collect()}
    assert set(out) == {"mx"}
