"""MOUD claim table tests (load_stage.mcaid_claim_moud.R)."""
import datetime

from pyspark.sql import functions as F


def d(s):
    return datetime.date.fromisoformat(s)


def _oud_codes(spark):
    return spark.createDataFrame(
        [("F1120", 10), ("30400", 9)], "code string, icdcm_version int"
    )


def _header(spark, rows):
    return spark.createDataFrame(
        rows, "claim_header_id long, primary_diagnosis string, icdcm_version int"
    )


def _proc(spark, rows):
    return spark.createDataFrame(
        rows,
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "last_service_date date, procedure_code string",
    )


def test_moud_flags_and_dx_requirement(spark):
    from claims_data_spark.tables.moud import build_claim_moud

    proc = _proc(spark, [
        # methadone, no dx required
        ("a", 1, d("2019-01-02"), d("2019-01-02"), "H0020"),
        # H0033 requires OUD primary dx: claim 2 has it, claim 3 doesn't
        ("b", 2, d("2019-02-01"), d("2019-02-01"), "H0033"),
        ("c", 3, d("2019-03-01"), d("2019-03-01"), "H0033"),
        # pre-2016 claim excluded
        ("a", 4, d("2015-06-01"), d("2015-06-01"), "H0020"),
        # oral naltrexone (G2073 is both lists -> oral wins? it's in
        # both _ADMIN_ORAL and _ADMIN_INJ; first when() gives oral)
        ("e", 5, d("2019-04-01"), d("2019-04-01"), "J2315"),
    ])
    hdr = _header(spark, [(1, None, None), (2, "F1120", 10),
                          (3, "Z000", 10), (5, "F1120", 10)])
    out = build_claim_moud(proc, hdr, None, _oud_codes(spark))
    rows = out.collect()
    by_person = {}
    for r in rows:
        by_person.setdefault(r["id_mcaid"], []).append(r)
    assert "a" in by_person and len(by_person["a"]) == 1  # 2015 row gone
    assert by_person["a"][0]["meth_proc_flag"] == 1
    # H0033 with OUD dx and no other evidence in month -> methadone
    assert by_person["b"][0]["meth_proc_flag"] == 1
    assert "c" not in by_person  # H0033 without OUD dx dropped
    # J2315 = injection naltrexone, kept
    assert by_person["e"][0]["nal_proc_flag"] == 1
    assert by_person["e"][0]["admin_method"] == "injection/implant"


def test_moud_h0033_monthly_disambiguation(spark):
    from claims_data_spark.tables.moud import build_claim_moud

    # person with H0033 plus MORE bup than meth evidence that month ->
    # H0033 is assigned to buprenorphine
    proc = _proc(spark, [
        ("a", 1, d("2019-01-02"), d("2019-01-02"), "H0033"),
        ("a", 2, d("2019-01-05"), d("2019-01-05"), "J0571"),
        ("a", 3, d("2019-01-09"), d("2019-01-09"), "J0572"),
        ("a", 4, d("2019-01-12"), d("2019-01-12"), "H0020"),
    ])
    hdr = _header(spark, [(1, "F1120", 10), (2, None, None),
                          (3, None, None), (4, None, None)])
    out = build_claim_moud(proc, hdr, None, _oud_codes(spark)).collect()
    h0033 = [r for r in out if r["last_service_date"] == d("2019-01-02")]
    assert len(h0033) == 1
    assert h0033[0]["bup_proc_flag"] == 1 and h0033[0]["meth_proc_flag"] == 0


def test_moud_pharm_union_and_same_day_dedup(spark):
    from claims_data_spark.tables.moud import build_claim_moud

    # same person/day: bup HCPCS claim AND bup pharmacy fill with the
    # same admin method -> the HCPCS row is dropped
    proc = _proc(spark, [
        ("a", 1, d("2019-01-02"), d("2019-01-02"), "J0571"),
    ])
    hdr = _header(spark, [(1, None, None)])
    pharm = spark.createDataFrame(
        [("a", 90, d("2019-01-02"), "00093572001", 30.0)],
        "id_mcaid string, claim_header_id long, rx_fill_date date, "
        "ndc string, rx_days_supply double",
    )
    rda_pharm = spark.createDataFrame(
        [("00093572001", "pharm_buprenorphine")],
        "code string, sub_group_pharmacy string",
    )
    ndc_ref = spark.createDataFrame(
        [("00093572001", "TABLET")], "ndc string, dosage_form string"
    )
    out = build_claim_moud(
        proc, hdr, pharm, _oud_codes(spark), rda_pharm, ndc_ref
    ).collect()
    assert len(out) == 1
    assert out[0]["bup_rx_flag"] == 1          # pharmacy row won
    assert float(out[0]["moud_days_supply"]) == 30.0
    assert out[0]["moud_flag_count"] == 1


def test_moud_methadone_days_supply_estimator(spark):
    from claims_data_spark.tables.moud import build_claim_moud

    # 4 methadone dates in one quarter, gaps 7,7,21 -> median 7;
    # the 21-day gap (> 1.5*7) snaps to the median; the last date
    # (no next) also takes the median
    proc = _proc(spark, [
        ("a", 1, d("2019-01-01"), d("2019-01-01"), "H0020"),
        ("a", 2, d("2019-01-08"), d("2019-01-08"), "H0020"),
        ("a", 3, d("2019-01-15"), d("2019-01-15"), "H0020"),
        ("a", 4, d("2019-02-05"), d("2019-02-05"), "H0020"),
    ])
    hdr = _header(spark, [(i, None, None) for i in (1, 2, 3, 4)])
    out = {r["last_service_date"]: r for r in
           build_claim_moud(proc, hdr, None, _oud_codes(spark)).collect()}
    assert out[d("2019-01-01")]["next_meth_diff"] == 7
    assert float(out[d("2019-01-01")]["moud_days_supply_new_year_quarter"]) == 7
    assert float(out[d("2019-01-15")]["moud_days_supply_new_year_quarter"]) == 7  # 21 > 10.5
    assert float(out[d("2019-02-05")]["moud_days_supply_new_year_quarter"]) == 7  # null next
    assert out[d("2019-01-01")]["meth_proc_sum_year_quarter"] == 4
