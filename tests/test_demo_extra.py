"""Noncisgender flag set-algebra (load_stage.mcaid_elig_demo_extra.R)."""

from __future__ import annotations

from pyspark.sql import Row

from claims_data_spark.tables.demo_extra import (
    apply_noncisgender_flag,
    build_noncisgender_ids,
    hormone_ndc_sets,
)

DX_SCHEMA = (
    "id_mcaid string, claim_header_id string, icdcm_norm string,"
    " icdcm_version int"
)
PROC_SCHEMA = "id_mcaid string, claim_header_id string, procedure_code string"
PHARM_SCHEMA = "id_mcaid string, ndc string"
NDC_SCHEMA = (
    "ndc string, NONPROPRIETARYNAME string, DOSAGEFORMNAME string,"
    " ACTIVE_NUMERATOR_STRENGTH string"
)
DEMOG_SCHEMA = "id_mcaid string, gender_me string"


def _frames(spark, dx=(), proc=(), pharm=(), ndc=(), demog=()):
    return (
        spark.createDataFrame(list(dx), DX_SCHEMA),
        spark.createDataFrame(list(proc), PROC_SCHEMA),
        spark.createDataFrame(list(pharm), PHARM_SCHEMA),
        spark.createDataFrame(list(ndc), NDC_SCHEMA),
        spark.createDataFrame(list(demog), DEMOG_SCHEMA),
    )


def test_hormone_ndc_strength_rules(spark):
    ndc = spark.createDataFrame(
        [
            # testosterone injection >=7 qualifies
            ("n1", "TESTOSTERONE CYPIONATE", "INJECTION", "100; 10"),
            # testosterone gel at 1 does not (needs >=2)
            ("n2", "TESTOSTERONE", "GEL", "1 mg"),
            # spironolactone >=50 qualifies as fem
            ("n3", "SPIRONOLACTONE", "TABLET", "50"),
            ("n4", "SPIRONOLACTONE", "TABLET", "25"),
            # estradiol: no dose requirement
            ("n5", "ESTRADIOL", "TABLET", "0.5"),
        ],
        NDC_SCHEMA,
    )
    got = {r["ndc"]: r for r in hormone_ndc_sets(ndc).collect()}
    assert set(got) == {"n1", "n3", "n5"}
    assert got["n1"]["masc_hormone"] == 1
    assert got["n3"]["fem_hormone"] == 1
    assert got["n5"]["fem_hormone"] == 1


def test_surgery_pathways_with_same_claim_cancer_exclusion(spark):
    dx = [
        # P2's 58661 claim carries ovarian AND vaginal cancer dx ->
        # excluded from BOTH the 3b and 3c pathways (58661 sits in both
        # code sets with different exclusion lists in the reference)
        ("P2", "c2", "C561", 10),
        ("P2", "c2", "C511", 10),
        # P3's 58661 claim is clean -> included
        ("P3", "c3", "Z000", 10),
    ]
    proc = [
        ("P1", "c1", "55980"),  # ftm_a unconditional
        ("P2", "c2", "58661"),
        ("P3", "c3", "58661"),
        ("P4", "c4", "54520"),  # mtf_e, no cancer dx -> transfem
    ]
    frames = _frames(spark, dx=dx, proc=proc, demog=[])
    out = {
        r["id_mcaid"]: r["category"]
        for r in build_noncisgender_ids(*frames).collect()
    }
    assert out == {
        "P1": "transmasc",
        "P3": "transmasc",
        "P4": "transfem",
    }


def test_endo_hormone_sex_pathway_and_conflict_drop(spark):
    dx = [
        # E07 endo-NOS dx for both hormone candidates
        ("H1", "d1", "E079", 10),
        ("H2", "d2", "E079", 10),
        # dysphoria-only person
        ("U1", "d3", "F640", 10),
        # conflict person: both proc pathways
        ("X1", "d4", "F640", 10),
    ]
    proc = [
        ("X1", "x1", "55980"),  # masc proc
        ("X1", "x2", "55970"),  # fem proc -> conflict, dropped
    ]
    pharm = [("H1", "n1"), ("H2", "n5")]
    ndc = [
        ("n1", "TESTOSTERONE", "INJECTION", "200"),
        ("n5", "ESTRADIOL", "TABLET", "1"),
    ]
    demog = [
        ("H1", "Female"),  # masc hormones + F sex -> transmasc
        ("H2", "Female"),  # fem hormones but F sex -> NOT transfem
        ("U1", "Male"),
        ("X1", "Male"),
    ]
    frames = _frames(spark, dx=dx, proc=proc, pharm=pharm, ndc=ndc, demog=demog)
    out = {
        r["id_mcaid"]: r["category"]
        for r in build_noncisgender_ids(*frames).collect()
    }
    # H2 has endo dx + fem hormone + Female sex: fails the M-sex gate,
    # and is not dysphoric -> absent entirely
    assert out == {"H1": "transmasc", "U1": "unknown"}

    demog_df = spark.createDataFrame(demog, DEMOG_SCHEMA)
    flagged = apply_noncisgender_flag(
        demog_df, build_noncisgender_ids(*frames)
    )
    got = {r["id_mcaid"]: r["noncisgender"] for r in flagged.collect()}
    assert got == {"H1": 1, "H2": 0, "U1": 1, "X1": 0}
