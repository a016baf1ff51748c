"""claim_value_set tests (load_stage.mcaid_claim_value_set.R)."""
import datetime


def d(s):
    return datetime.date.fromisoformat(s)


def test_claim_value_set_domains(spark):
    from claims_data_spark.tables.value_set import build_claim_value_set

    rda = spark.createDataFrame(
        [
            ("OUD", "OUD-Tx-Pen-Value-Set-2", "procedure", "moud", "HCPCS", "H0020", "Y"),
            ("MH", "MH-Dx-value-set", "diagnosis", None, "ICD10CM", "F329", "Y"),
            ("OUD", "OUD-Tx-Pen-Value-Set-2", "pharmacy", "bup", "NDC", "00093", "Y"),
            ("OUD", "old-ndc", "pharmacy", "bup", "NDC", "11111", "N"),
            ("ED", "ED-rev", "line", None, "UBREV", "0450", "Y"),
            ("IP", "IP-drg", "claim", None, "DRG", "470", "Y"),
        ],
        "value_set_group string, value_set_name string, data_source_type string, "
        "sub_group string, code_set string, code string, active string",
    )
    px = spark.createDataFrame(
        [("a", 1, d("2019-01-01"), "H0020")],
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "procedure_code string",
    )
    hdr = spark.createDataFrame(
        [("a", 2, d("2019-01-02"), "470")],
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "drvd_drg_code string",
    )
    dx = spark.createDataFrame(
        [
            ("a", 3, d("2019-01-03"), "F329", 10, "01"),   # primary -> N + Y
            ("b", 4, d("2019-01-04"), "F329", 10, "02"),   # secondary -> N
            ("b", 5, d("2019-01-05"), "F329", 9, "01"),    # version mismatch
        ],
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "icdcm_norm string, icdcm_version int, icdcm_number string",
    )
    ph = spark.createDataFrame(
        [("c", 6, d("2019-01-06"), "00093"), ("c", 7, d("2019-01-07"), "11111")],
        "id_mcaid string, claim_header_id long, rx_fill_date date, ndc string",
    )
    ln = spark.createDataFrame(
        [("a", 8, d("2019-01-08"), "0450")],
        "id_mcaid string, claim_header_id long, first_service_date date, "
        "rev_code string",
    )
    hedis = spark.createDataFrame(
        [("TCM 7 Day", "CPT", "H0020"), ("FUH Stand Alone Visits", "UBREV", "0450")],
        "value_set_name string, code_system string, code string",
    )
    out = build_claim_value_set(
        rda, procedure=px, header=hdr, icdcm=dx, pharm=ph, line=ln,
        hedis=hedis, hedis_value_sets=["TCM 7 Day", "FUH Stand Alone Visits"],
    )
    rows = out.collect()
    by_claim = {}
    for r in rows:
        by_claim.setdefault(r["claim_header_id"], []).append(r)
    assert len(by_claim[1]) == 2           # rda HCPCS + HEDIS CPT/HCPCS
    assert {r["value_set_group"] for r in by_claim[1]} == {"OUD", "HEDIS"}
    assert len(by_claim[2]) == 1 and by_claim[2][0]["code_set"] == "DRG"
    flags3 = sorted(r["primary_dx_only"] for r in by_claim[3])
    assert flags3 == ["N", "Y"]            # primary dx dual insert
    assert [r["primary_dx_only"] for r in by_claim[4]] == ["N"]
    assert 5 not in by_claim               # version mismatch
    assert len(by_claim[6]) == 1           # active NDC
    assert 7 not in by_claim               # inactive NDC dropped
    assert len(by_claim[8]) == 2           # UBREV via rda + HEDIS
