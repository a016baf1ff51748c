"""Interactive API tests: claims_elig cohort query, claims_condition,
top_causes, elig_timevar_collapse, perf measures."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from claims_data_spark.api import (
    claims_condition,
    claims_elig,
    elig_timevar_collapse,
    top_causes,
)
from claims_data_spark.tables.claim_children import build_claim_icdcm_header
from claims_data_spark.tables.claim_header import build_claim_header
from claims_data_spark.tables.conditions import build_claim_ccw
from claims_data_spark.tables.elig_demo import build_elig_demo
from claims_data_spark.tables.elig_month import build_elig_month
from claims_data_spark.tables.elig_timevar import build_elig_timevar
from claims_data_spark.tables.perf import build_enroll_denom, build_measure
from tests import fixtures as fx


def d(s):
    return dt.date.fromisoformat(s)


@pytest.fixture(scope="module")
def tables(spark):
    raw_elig = fx.raw_mcaid_elig(spark)
    raw_claim = fx.raw_mcaid_claim(spark)
    clean, geocode = fx.ref_address(spark)
    tv = build_elig_timevar(raw_elig, fx.ref_rac_code(spark), clean, geocode).cache()
    demo = build_elig_demo(raw_elig).cache()
    icdcm = build_claim_icdcm_header(raw_claim)
    header = build_claim_header(
        raw_claim, icdcm,
        ref_xwalk=fx.ref_claim_type_xwalk(spark),
        ref_hedis=fx.ref_hedis(spark),
        ref_telehealth=fx.ref_telehealth(spark),
        ref_icdcm=fx.ref_icdcm_codes(spark),
    ).cache()
    return {"tv": tv, "demo": demo, "icdcm": icdcm, "header": header}


def test_claims_elig_coverage_and_mode(spark, tables):
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        timevar_values=["geo_zip_clean"],
    )
    rows = {r["id_mcaid"]: r for r in cohort.collect()}
    p1 = rows["p1"]
    # Jan-Mar (90d) + May-Jun (61d) = 151 of 181 days
    assert p1["cov_days"] == 151
    assert float(p1["cov_pct"]) == round(151 / 181 * 100, 1)
    assert p1["covgap_max"] == 30  # April gap
    # most-person-time zip: 98004 (120d) vs 98101 (31d)
    assert p1["geo_zip_clean"] == "98004"
    p3 = rows["p3"]
    assert p3["cov_days"] == 11 and p3["pre_gap"] == 9


def test_claims_elig_covgap_filter(spark, tables):
    # p1's longest gap in H1 2017 is April (30 days): covgap_max=29
    # keeps p2/p3 out too (their pre/post gaps exceed it)
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        covgap_max=30,
    )
    assert [r["id_mcaid"] for r in cohort.collect()] == ["p1"]
    none = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        covgap_max=10,
    )
    assert none.count() == 0


def test_claims_elig_pct_mode(spark, tables):
    # reference default timevar_denom='duration': the pct denominator
    # is the WINDOW length (181 days for Jan-Jun 2017), not the
    # person's covered days (R/claims_elig.R:691-696)
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        timevar_pct=["geo_zip_clean"],
    )
    p1 = cohort.filter(F.col("id_mcaid") == "p1").collect()[0]
    # 98004 covers 120 days of the 181-day window -> 66.3%
    assert p1["geo_zip_clean"] == "98004"
    assert float(p1["geo_zip_clean_pct"]) == round(120 / 181 * 100, 1)


def test_claims_elig_pct_mode_cov_days_denom(spark, tables):
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        timevar_pct=["geo_zip_clean"],
        timevar_denom="cov_days",
    )
    p1 = cohort.filter(F.col("id_mcaid") == "p1").collect()[0]
    # 98004 covers 120 of p1's 151 covered days -> 79.5%
    assert p1["geo_zip_clean"] == "98004"
    assert float(p1["geo_zip_clean_pct"]) == round(120 / 151 * 100, 1)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        claims_elig(
            tables["demo"], tables["tv"],
            from_date="2017-01-01", to_date="2017-06-30",
            timevar_pct=["geo_zip_clean"], timevar_denom="bogus",
        )


def test_claims_elig_filters(spark, tables):
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        cov_min=50.0,
        age_min=18,
        demo_filters={"gender_me": ["female"]},
    )
    ids = [r["id_mcaid"] for r in cohort.collect()]
    assert ids == ["p1"]  # p3 under cov_min, p2 Multiple gender


def test_claims_condition_window(spark, tables):
    ccw = build_claim_ccw(
        tables["icdcm"], tables["header"], fx.ref_icdcm_codes(spark),
        [r.asDict() for r in fx.ref_ccw_lookup(spark).collect()],
    )
    hits = claims_condition(ccw, "ccw_diabetes", "2017-02-01", "2017-02-28")
    assert [r["id_mcaid"] for r in hits.collect()] == ["p1"]
    none = claims_condition(ccw, "ccw_diabetes", "2018-01-01", "2018-12-31")
    assert none.count() == 0


def test_top_causes(spark, tables):
    cohort = tables["demo"].select("id_mcaid")
    out = top_causes(
        cohort, tables["header"], tables["icdcm"], fx.ref_icdcm_codes(spark),
        from_date="2017-01-01", to_date="2017-12-31", top_n=5,
    ).collect()
    by_desc = {r["ccs_detail_desc"]: r["event_count"] for r in out}
    # ED events: TCN1/2 (episode 1) + TCN3 (episode 2), primary dx
    # 25000 x2 claims but 2 distinct episodes for diabetes desc:
    # TCN1(ep1), TCN2(ep1) -> 1 distinct; TCN3 V100 -> personal history
    assert by_desc["Diabetes mellitus without complication"] == 1
    assert "Personal history of malignancy" not in by_desc  # V100 in 2017 is v10, no ref match


def test_top_causes_param_parity(spark, tables):
    """R/top_causes.R parameter parity: type/override_all, catch_all,
    primary_dx, ind_dates per-person windows (:63-70, 115-130, 166-190,
    198-214, 289-306)."""
    # mcaid's final header carries inpatient_flag; synthesize the
    # apcd/mcare-style stay id the reference's type='inpatient' counts
    header = tables["header"].withColumn(
        "inpatient_id",
        F.when(F.col("inpatient_flag") == 1, F.col("claim_header_id")),
    )
    ref = fx.ref_icdcm_codes(spark)
    cohort = tables["demo"].select("id_mcaid")

    # type='inpatient': p1's acute stay only (p2's nonacute TOB has no
    # inpatient_id); with primary_dx only the 25000 primary surfaces
    ipt = top_causes(
        cohort, header, tables["icdcm"], ref,
        "2017-01-01", "2017-12-31", type="inpatient",
    ).collect()
    assert {r["ccs_detail_desc"]: r["event_count"] for r in ipt} == {
        "Diabetes mellitus without complication": 1
    }

    # primary_dx=False reaches TCN4's dx2 (F329 depression)
    ipt_all = top_causes(
        cohort, header, tables["icdcm"], ref,
        "2017-01-01", "2017-12-31", type="inpatient", primary_dx=False,
    ).collect()
    assert "Major depressive disorder" in {
        r["ccs_detail_desc"] for r in ipt_all
    }

    # type='all' without the override refuses, like the R's stop()
    with pytest.raises(ValueError, match="override_all"):
        top_causes(
            cohort, header, tables["icdcm"], ref,
            "2017-01-01", "2017-12-31", type="all",
        )

    # catch_all toggle over type='all': Z001 well-child (ccs_catch_all=1)
    kw = dict(type="all", override_all=True, top_n=20)
    excl = top_causes(
        cohort, header, tables["icdcm"], ref,
        "2017-01-01", "2017-12-31", **kw,
    ).collect()
    incl = top_causes(
        cohort, header, tables["icdcm"], ref,
        "2017-01-01", "2017-12-31", catch_all=True, **kw,
    ).collect()
    assert "Well child exam" not in {r["ccs_detail_desc"] for r in excl}
    assert "Well child exam" in {r["ccs_detail_desc"] for r in incl}

    # ind_dates: p1's personal window starting Feb drops all January ED
    # claims — the global-window answer (1 diabetes episode) differs
    coh_ind = spark.createDataFrame(
        [("p1", d("2017-02-01"), d("2017-12-31"))],
        "id_mcaid string, from_date date, to_date date",
    )
    glob = top_causes(
        coh_ind, header, tables["icdcm"], ref, "2017-01-01", "2017-12-31",
    ).collect()
    assert {r["ccs_detail_desc"]: r["event_count"] for r in glob} == {
        "Diabetes mellitus without complication": 1
    }
    ind = top_causes(
        coh_ind, header, tables["icdcm"], ref,
        "2017-01-01", "2017-12-31", ind_dates=True,
    ).collect()
    assert ind == []

    # clip-to-global + drop-outside-global: p1's window widens past the
    # global end (clipped back, episode 1 still counted once via TCN2);
    # p2's 2016-only window never overlaps and the person is dropped
    coh2 = spark.createDataFrame(
        [
            ("p1", d("2017-01-06"), d("2018-06-30")),
            ("p2", d("2016-01-01"), d("2016-12-31")),
        ],
        "id_mcaid string, from_date date, to_date date",
    )
    ind2 = top_causes(
        coh2, header, tables["icdcm"], ref,
        "2017-01-01", "2017-12-31", ind_dates=True,
    ).collect()
    assert {r["ccs_detail_desc"]: r["event_count"] for r in ind2} == {
        "Diabetes mellitus without complication": 1
    }


def test_top_causes_broadcast_guard(spark, tables):
    """max_broadcast_cohort_rows: in-bound cohorts broadcast the
    clipped member windows (the round-10 zero-fact-exchange plan);
    oversized cohorts fall back to the shuffle_hash join with
    identical values instead of hard-failing on the 8 GB / 512M-row
    broadcast-relation cap."""
    ref = fx.ref_icdcm_codes(spark)
    coh = spark.createDataFrame(
        [("p1", d("2017-01-01"), d("2017-12-31"))],
        "id_mcaid string, from_date date, to_date date",
    )
    kw = dict(
        from_date="2017-01-01", to_date="2017-12-31", ind_dates=True
    )
    bc = top_causes(coh, tables["header"], tables["icdcm"], ref, **kw)
    fb = top_causes(
        coh, tables["header"], tables["icdcm"], ref,
        max_broadcast_cohort_rows=0, **kw,
    )
    bc_plan = bc._jdf.queryExecution().executedPlan().toString()
    fb_plan = fb._jdf.queryExecution().executedPlan().toString()
    # the guard decides the cohort join strategy: broadcast in-bound,
    # forced shuffle_hash when over the cap
    assert "ShuffledHashJoin" not in bc_plan
    assert "ShuffledHashJoin" in fb_plan
    assert sorted(map(tuple, bc.collect())) == sorted(
        map(tuple, fb.collect())
    )


def test_elig_timevar_collapse(spark, tables):
    # dropping the address covariate merges p1's Jan | Feb-Mar islands
    collapsed = elig_timevar_collapse(
        tables["tv"], group_cols=["cov_type"]
    )
    p1 = sorted(
        collapsed.filter(F.col("id_mcaid") == "p1").collect(),
        key=lambda r: r["from_date"],
    )
    assert [(r["from_date"], r["to_date"]) for r in p1] == [
        (d("2017-01-01"), d("2017-03-31")),
        (d("2017-05-01"), d("2017-06-30")),
    ]


def test_follow_up_after_ed(spark, tables):
    from claims_data_spark.tables.perf import follow_up_after_ed

    out = follow_up_after_ed(tables["header"], follow_up_days=60)
    rows = {r["ed_pophealth_id"]: r for r in out.collect()}
    # p1 has two ED episodes (Jan 05-06 and Jan 08); first qualifying
    # non-ED follow-up for p1 is the pc_visit claim on 2017-05-20 —
    # beyond 60 days -> neither episode followed up within window
    assert len(rows) == 2
    assert all(r["followed_up"] == 0 for r in rows.values())
    wide = follow_up_after_ed(tables["header"], follow_up_days=365)
    assert all(r["followed_up"] == 1 for r in wide.collect())


def test_perf_denominator_and_measure(spark, tables):
    em = build_elig_month(tables["tv"])
    denom = build_enroll_denom(em, 201701, 201712)
    p1_dec = denom.filter(
        (F.col("id_mcaid") == "p1") & (F.col("year_month") == 201712)
    ).collect()[0]
    assert p1_dec["enrolled_any_t_12_m"] == 5  # 01,02,03,05,06
    # measure: ED visit during the year, denominator = 5+ enrolled months
    events = spark.createDataFrame(
        [("p1", 201701)], "id_mcaid string, year_month int"
    )
    m = build_measure(
        denom, events, "ed_visit", 201712, months_enrolled_min=5
    ).collect()
    rows = {r["id_mcaid"]: r for r in m}
    assert rows["p1"]["numerator"] == 1 and rows["p1"]["denominator"] == 1
    assert "p3" not in rows  # 1 enrolled month < 5


def test_claims_elig_named_params_and_name_joins(spark, tables):
    """Reference named-parameter surface (R/claims_elig.R:441-583) +
    the bsp/county name post-joins (:1408-1438)."""
    # scalar equality + case-insensitive IN, as direct keywords
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        race_white=1,
        race_me=["white"],
        lang_english=1,
    )
    assert [r["id_mcaid"] for r in cohort.collect()] == ["p1"]

    # unknown parameter fails fast like the reference's arg validation
    import pytest as _pytest

    with _pytest.raises(KeyError):
        claims_elig(
            tables["demo"], tables["tv"],
            from_date="2017-01-01", to_date="2017-06-30",
            race_wite=1,
        ).collect()

    # bsp name post-join on the requested timevar code column
    bsp_names = spark.createDataFrame(
        [(10, "Standard"), (11, "Partial"), (12, "CHIP")],
        "bsp_group_cid int, bsp_group_name string",
    )
    named = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        timevar_values=["bsp_group_cid"],
        ref_bsp_names=bsp_names,
    )
    rows = {r["id_mcaid"]: r for r in named.collect()}
    assert rows["p1"]["bsp_group_name"] == "Standard"
    assert rows["p3"]["bsp_group_name"] == "CHIP"


def test_claims_summary_distinct_date_counting(spark):
    """sp_mcaid_claims_simple_r.sql: an event counts once per distinct
    service DATE (two same-day ED claims = 1), window membership is
    event-began-in-window, and no-claims persons keep their cohort row
    with zeros + no_claims=1."""
    from claims_data_spark.api import claims_summary

    cohort = spark.createDataFrame(
        [(1, "F"), (2, "M"), (3, "F")], "id_mcaid long, gender string"
    )
    claims = spark.createDataFrame(
        [
            # person 1: two same-day ED claims -> ed_cnt 1; next-day -> 2
            (1, "2024-03-01", 1, 0), (1, "2024-03-01", 1, 0),
            (1, "2024-03-02", 1, 1),
            # person 2: claim BEFORE the window -> excluded
            (2, "2024-02-28", 1, 0),
            # person 9: not in cohort -> excluded entirely
            (9, "2024-03-05", 1, 0),
        ],
        "id_mcaid long, first_service_date string, ed int, inpatient int",
    ).withColumn(
        "first_service_date", F.col("first_service_date").cast("date")
    )
    out = claims_summary(
        cohort, claims, "2024-03-01", "2024-03-31",
        flag_cols=["ed", "inpatient"],
    )
    rows = {r["id_mcaid"]: r for r in out.collect()}
    assert rows[1]["ed_cnt"] == 2 and rows[1]["inpatient_cnt"] == 1
    assert rows[1]["no_claims"] == 0
    assert rows[2]["ed_cnt"] == 0 and rows[2]["no_claims"] == 1
    assert rows[3]["no_claims"] == 1
    assert 9 not in rows


def test_claims_condition_validation_and_ids(spark, tables):
    import pytest as _pytest

    ccw = build_claim_ccw(
        tables["icdcm"], tables["header"], fx.ref_icdcm_codes(spark),
        [r.asDict() for r in fx.ref_ccw_lookup(spark).collect()],
    )
    with _pytest.raises(ValueError):
        claims_condition(ccw, "ccw_diabetus", "2017-02-01", "2017-02-28")
    all_hits = claims_condition(ccw, "ccw_diabetes", "2017-02-01", "2017-02-28")
    got = {r["id_mcaid"] for r in all_hits.collect()}
    assert got  # fixture has at least one diabetic member in-window
    some = sorted(got)[:1]
    # list ids -> IN predicate
    subset = claims_condition(
        ccw, "ccw_diabetes", "2017-02-01", "2017-02-28", ids=some
    )
    assert {r["id_mcaid"] for r in subset.collect()} == set(some)
    # DataFrame ids -> broadcast semi join
    iddf = spark.createDataFrame([(i,) for i in some], "id_mcaid string")
    subset2 = claims_condition(
        ccw, "ccw_diabetes", "2017-02-01", "2017-02-28", ids=iddf
    )
    assert {r["id_mcaid"] for r in subset2.collect()} == set(some)


def test_elig_timevar_collapse_cov_time_and_ids(spark, tables):
    collapsed = elig_timevar_collapse(
        tables["tv"], group_cols=["cov_type"], ids=["p1"]
    )
    rows = sorted(collapsed.collect(), key=lambda r: r["from_date"])
    assert {r["id_mcaid"] for r in rows} == {"p1"}
    # R :189-194 default cov_time_day=TRUE: datediff + 1 per island
    assert [(str(r["from_date"]), r["cov_time_day"]) for r in rows] == [
        ("2017-01-01", 90), ("2017-05-01", 61),
    ]
    off = elig_timevar_collapse(
        tables["tv"], group_cols=["cov_type"], cov_time_day=False
    )
    assert "cov_time_day" not in off.columns
    with pytest.raises(ValueError, match="at least one column"):
        elig_timevar_collapse(tables["tv"], group_cols=[])


# --- round-9: full reference named-parameter sweep -------------------------
# every documented claims_elig demo-filter param (R/claims_elig.R:441-583)
# driven through the generic apply_filters path against fixture
# expectations, so a silent rename in demo/timevar schema or predicate
# wiring cannot slip through. Fixture facts (tests/fixtures.py):
#   p1 Female WHITE ENGLISH (dob 1990-05-15, age 27 at 2017-06-30)
#   p2 Male->Female ('Multiple' ever, 'Female' recent), ASIAN,
#      SPANISH+ENGLISH (dob 1985-01-01, age 32)
#   p3 Male BLACK SOMALI (dob 2000-12-31, age 16)
_ELIG_PARAM_SWEEP = [
    ("id", ["p1", "p3"], {"p1", "p3"}),
    ("age_min", 18, {"p1", "p2"}),
    ("age_max", 16, {"p3"}),
    ("female", 1, {"p1", "p2"}),
    ("female", 0, {"p3"}),
    ("male", 1, {"p2", "p3"}),
    ("gender_me", ["female"], {"p1"}),
    ("gender_me", ["Multiple"], {"p2"}),
    ("gender_recent", ["FEMALE"], {"p1", "p2"}),
    ("gender_recent", ["male"], {"p3"}),
    ("race_aian", 1, set()),
    ("race_asian", 1, {"p2"}),
    ("race_black", 1, {"p3"}),
    ("race_nhpi", 1, set()),
    ("race_white", 1, {"p1"}),
    ("race_unk", 1, set()),
    ("race_unk", 0, {"p1", "p2", "p3"}),
    ("race_me", ["white"], {"p1"}),
    ("race_me", ["Asian", "Black"], {"p2", "p3"}),
    ("race_eth_me", ["asian"], {"p2"}),
    ("race_recent", ["black"], {"p3"}),
    ("race_eth_recent", ["white"], {"p1"}),
    ("lang_amharic", 1, set()),
    ("lang_arabic", 1, set()),
    ("lang_chinese", 1, set()),
    ("lang_english", 1, {"p1", "p2"}),
    ("lang_korean", 1, set()),
    ("lang_russian", 1, set()),
    ("lang_somali", 1, {"p3"}),
    ("lang_spanish", 1, {"p2"}),
    ("lang_ukrainian", 1, set()),
    ("lang_vietnamese", 1, set()),
    # geo_kc_ever derives from timevar geo_kc when the demo frame has
    # no stored column (both fixture geocodes are county 033 = KC)
    ("geo_kc_ever", 1, {"p1", "p2", "p3"}),
    ("geo_kc_ever", 0, set()),
]


@pytest.mark.parametrize("name,value,expected", _ELIG_PARAM_SWEEP)
def test_claims_elig_reference_param_sweep(spark, tables, name, value, expected):
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30",
        **{name: value},
    )
    assert {r["id_mcaid"] for r in cohort.select("id_mcaid").collect()} == expected


def test_claims_elig_param_sweep_extras(spark, tables):
    # lang_max IN-list: p2's EN/ES tie resolves via the deterministic
    # tiebreak — whatever it picked, filtering on that value must
    # return p2 (plus p1 when the winner is ENGLISH)
    demo_rows = {r["id_mcaid"]: r for r in tables["demo"].collect()}
    p2_lang = demo_rows["p2"]["lang_max"]
    got = {
        r["id_mcaid"]
        for r in claims_elig(
            tables["demo"], tables["tv"],
            from_date="2017-01-01", to_date="2017-06-30",
            lang_max=[p2_lang],
        ).select("id_mcaid").collect()
    }
    assert "p2" in got and got == {
        p for p, r in demo_rows.items() if r["lang_max"] == p2_lang
    }

    # id as a DataFrame cohort (the reference's ##temp_ids pattern,
    # kept cluster-side as a broadcast semi join)
    ids_df = spark.createDataFrame([("p2",)], "id_mcaid string")
    got = {
        r["id_mcaid"]
        for r in claims_elig(
            tables["demo"], tables["tv"],
            from_date="2017-01-01", to_date="2017-06-30",
            id=ids_df,
        ).select("id_mcaid").collect()
    }
    assert got == {"p2"}

    # race_asian_pi exists only in the combined-source demo tables —
    # mcaid demo lacks the column, so it fails fast (the reference
    # would fail server-side the same way)
    with pytest.raises(KeyError):
        claims_elig(
            tables["demo"], tables["tv"],
            from_date="2017-01-01", to_date="2017-06-30",
            race_asian_pi=1,
        ).collect()


# --- round-9: timevar-derived named-parameter families (R :788-1280) -------
# fixture person-time facts (window 2017-01-01..2017-06-30, 181 days):
#   p1 cov 151d: cov_type FFS, dual N, geo_kc 1, zip 98004 (120d) / 98101 (31d)
#   p2 cov 59d:  cov_type MC,  dual Y Jan (31d) N Feb (28d), mco m1, zip 98101
#   p3 cov 11d:  cov_type FFS, dual N, zip 98004
def _elig_ids(tables, **kw):
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30", **kw,
    )
    return {r["id_mcaid"] for r in cohort.select("id_mcaid").collect()}


def test_claims_elig_timevar_modal_params(spark, tables):
    assert _elig_ids(tables, cov_type=["mc"]) == {"p2"}
    assert _elig_ids(tables, cov_type="FFS") == {"p1", "p3"}
    assert _elig_ids(tables, geo_zip=["98004"]) == {"p1", "p3"}
    assert _elig_ids(tables, mco_id=["M1"]) == {"p2"}
    assert _elig_ids(tables, bsp_group_cid=[12]) == {"p3"}
    assert _elig_ids(tables, geo_county_code=["033"]) == {"p1", "p2", "p3"}


def test_claims_elig_timevar_pct_params(spark, tables):
    # dual is the raw 'Y'/'N' stage encoding — normalized, not cast
    assert _elig_ids(tables, dual_min=10) == {"p2"}
    assert _elig_ids(tables, dual_max=0) == {"p1", "p3"}
    # p2: 31 dual days -> 17.1% of the 181-day window, 52.5% of 59 cov days
    cohort = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30", dual_min=10,
    )
    assert float(cohort.collect()[0]["dual_pct"]) == 17.1
    cohort_cd = claims_elig(
        tables["demo"], tables["tv"],
        from_date="2017-01-01", to_date="2017-06-30", dual_min=10,
        timevar_denom="cov_days",
    )
    assert float(cohort_cd.collect()[0]["dual_pct"]) == 52.5
    # geo_kc: coverage-share vs covered-share denominators
    assert _elig_ids(tables, geo_kc_min=50) == {"p1"}
    assert _elig_ids(tables, geo_kc_min=50, timevar_denom="cov_days") == {
        "p1", "p2", "p3",
    }
    assert _elig_ids(tables, full_benefit_min=80) == {"p1"}


def test_claims_elig_timevar_param_missing_column(spark, tables):
    # mcaid flag exists only in the combined-source timevar
    with pytest.raises(KeyError, match="mcaid"):
        _elig_ids(tables, mcaid_min=50)


def test_claims_elig_numeric_typed_flag_and_modal(spark):
    """Round-9 advice: a double-typed flag column renders '1.0' after
    the string cast and a double-typed modal code column renders
    '12.0' — both must normalize (numeric-first try_cast) instead of
    silently emptying the cohort."""
    tv = spark.createDataFrame(
        [
            ("pA", d("2017-01-01"), d("2017-06-30"), 1.0, 12.0, 1.0),
            ("pB", d("2017-01-01"), d("2017-06-30"), 0.0, 13.0, 0.0),
        ],
        "id_mcaid string, from_date date, to_date date, "
        "dual double, bsp_group_cid double, geo_kc double",
    )
    demo = spark.createDataFrame(
        [("pA", d("1980-01-01")), ("pB", d("1980-01-01"))],
        "id_mcaid string, dob date",
    )
    flag = claims_elig(demo, tv, "2017-01-01", "2017-06-30", dual_min=50)
    assert {r["id_mcaid"] for r in flag.collect()} == {"pA"}
    modal = claims_elig(
        demo, tv, "2017-01-01", "2017-06-30", bsp_group_cid=[12]
    )
    assert {r["id_mcaid"] for r in modal.collect()} == {"pA"}
    # derived geo_kc_ever over a numeric-typed stage flag (was a raw
    # cast('int'); now _flag_as_int for Y/N safety) still filters
    ever = claims_elig(demo, tv, "2017-01-01", "2017-06-30", geo_kc_ever=1)
    assert {r["id_mcaid"] for r in ever.collect()} == {"pA"}
