"""Medicare xwalk staging (load_stage.mcare_xwalk_bene_ssn.R /
mcare_xwalk_edb_user_view.R)."""

from __future__ import annotations

from claims_data_spark.tables.mcare_xwalk import (
    build_mcare_xwalk_bene_ssn,
    build_mcare_xwalk_edb,
    xwalk_qa,
)

SSN_SCHEMA = "bene_id string, ssn string, source string"
EDB_SCHEMA = (
    "bene_id string, bene_srnm_name string, bene_gvn_name string,"
    " bene_mdl_name string, crnt_rec_ind string, source string"
)


def test_bene_ssn_first_by_source_then_ssn(spark):
    raw = spark.createDataFrame(
        [
            ("B1", "111", "2"),
            ("B1", "222", "1"),   # lower source wins
            ("B2", "444", "1"),
            ("B2", "333", "1"),   # same source: lower ssn wins
            ("B2", "333", "1"),   # exact dup collapses
            ("B3 ", " 555", "1"),  # whitespace cleaned
        ],
        SSN_SCHEMA,
    )
    out = build_mcare_xwalk_bene_ssn(raw)
    got = {r["bene_id"]: r["ssn"] for r in out.collect()}
    assert got == {"B1": "222", "B2": "333", "B3": "555"}
    qa = xwalk_qa(raw, out)
    assert qa["unique_per_id"] and qa["id_parity"]


def test_edb_middle_initial_inheritance_and_latest_row(spark):
    raw = spark.createDataFrame(
        [
            # single-row id passes through
            ("S1", "SMITH", "ANN", None, "Y", "2016"),
            # exact dup (names identical): latest source's row kept
            ("E1", "LOPEZ", "MARIA", "J", "N", "2015"),
            ("E1", "LOPEZ", "MARIA", "J", "Y", "2016"),
            # name change: newest row lacks the middle initial and
            # inherits it from the older extract
            ("N1", "DOE", "JANE", "Q", "Y", "2015"),
            ("N1", "ROE", "JANE", None, "Y", "2017"),
            # initial present later only: older NA rows stay NA but the
            # max-source row carries its own value
            ("N2", "KIM", "SU", None, "Y", "2015"),
            ("N2", "KIM", "SUE", "B", "Y", "2016"),
        ],
        EDB_SCHEMA,
    )
    out = build_mcare_xwalk_edb(raw)
    got = {r["bene_id"]: r for r in out.collect()}
    assert len(got) == 4
    assert got["S1"]["bene_mdl_name"] is None
    assert got["E1"]["crnt_rec_ind"] == "Y"
    assert got["E1"]["bene_mdl_name"] == "J"
    assert got["N1"]["bene_srnm_name"] == "ROE"
    assert got["N1"]["bene_mdl_name"] == "Q"  # inherited
    assert got["N2"]["bene_gvn_name"] == "SUE"
    assert got["N2"]["bene_mdl_name"] == "B"
    qa = xwalk_qa(raw, out)
    assert qa["unique_per_id"] and qa["id_parity"]
