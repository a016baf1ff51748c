"""Provider master ranking (ref: load_ref.kc_provider_master.R)."""
from __future__ import annotations

from claims_data_spark.tables.provider import (
    build_apcd_claim_provider,
    build_ref_kc_provider_master,
    qa_provider_master,
)


def _frames(spark):
    pm = spark.createDataFrame(
        [
            # valid master row
            (1000000001, "1", "98101", "207Q00000X", "208D00000X"),
            # invalid zip (4 chars), sentinel taxonomy
            (1000000002, "2", "9810", "-1", "208D00000X"),
            # duplicate raw rows collapse via distinct
            (1000000001, "1", "98101", "207Q00000X", "208D00000X"),
        ],
        "npi long, entity_type string, zip_physical string, "
        "primary_taxonomy string, secondary_taxonomy string",
    )
    prov = spark.createDataFrame(
        [
            # npi already in master -> excluded from ranked set
            (1000000001, "1", "98101", "207Q00000X"),
            # new npi: entity 2 appears twice, 1 once -> modal 2
            (1000000003, "2", "98105", "208D00000X"),
            (1000000003, "2", "98105", "208D00000X"),
            (1000000003, "1", "98109", "207Q00000X"),
            # taxonomy tie at count 1 between 207Q/208D after the two
            # 208D rows -> primary 208D (count 2), secondary 207Q
            # invalid npi (9 digits) dropped
            (999999999, "1", "98101", "207Q00000X"),
            # invalid zip/taxonomy lengths -> null, ignored by ranking
            (1000000004, "1", "981", "short"),
        ],
        "orig_npi long, entity_type string, zip string, primary_specialty_code string",
    )
    return pm, prov


def test_provider_master_assembly(spark):
    pm, prov = _frames(spark)
    out = build_ref_kc_provider_master(pm, prov)
    rows = {r.npi: r for r in out.collect()}
    # master rows deduped, flag 1, validation applied
    assert rows[1000000001].apcd_provider_master_flag == 1
    assert rows[1000000002].geo_zip_practice is None
    assert rows[1000000002].primary_taxonomy is None
    # ranked new npi: modal entity 2, modal zip 98105, taxonomy 1/2
    r3 = rows[1000000003]
    assert r3.apcd_provider_master_flag == 0
    assert r3.entity_type == "2"
    assert r3.geo_zip_practice == "98105"
    assert r3.primary_taxonomy == "208D00000X"
    assert r3.secondary_taxonomy == "207Q00000X"
    # npi with only invalid attrs still present, all-null attrs
    r4 = rows[1000000004]
    assert r4.entity_type == "1" and r4.geo_zip_practice is None
    # invalid npi dropped entirely
    assert 999999999 not in rows
    # every npi exactly once
    assert out.count() == len(rows) == 4


def test_provider_master_entity_tiebreak_desc(spark):
    pm = spark.createDataFrame(
        [], "npi long, entity_type string, zip_physical string, "
        "primary_taxonomy string, secondary_taxonomy string"
    )
    prov = spark.createDataFrame(
        [
            (1000000007, "1", None, None),
            (1000000007, "2", None, None),
        ],
        "orig_npi long, entity_type string, zip string, primary_specialty_code string",
    )
    out = build_ref_kc_provider_master(pm, prov).first()
    # tie on count -> entity_type DESC picks '2' (ref :47)
    assert out.entity_type == "2"


def test_all_null_attr_npi_survives(spark):
    pm = spark.createDataFrame(
        [], "npi long, entity_type string, zip_physical string, "
        "primary_taxonomy string, secondary_taxonomy string"
    )
    prov = spark.createDataFrame(
        [
            # valid npi, every attribute invalid -> row survives with nulls
            (1000000009, None, "98", "x"),
            # null value must not beat a real one on count
            (1000000010, None, "98105", None),
            (1000000010, None, None, None),
            (1000000010, "1", None, None),
        ],
        "orig_npi long, entity_type string, zip string, primary_specialty_code string",
    )
    out = build_ref_kc_provider_master(pm, prov)
    rows = {r.npi: r for r in out.collect()}
    r9 = rows[1000000009]
    assert r9.entity_type is None and r9.geo_zip_practice is None
    assert r9.primary_taxonomy is None and r9.secondary_taxonomy is None
    r10 = rows[1000000010]
    # single real entity '1' wins over two null rows; real zip wins
    assert r10.entity_type == "1" and r10.geo_zip_practice == "98105"
    assert r10.primary_taxonomy is None


def test_qa_gates(spark):
    pm, prov = _frames(spark)
    out = build_ref_kc_provider_master(pm, prov)
    qa = qa_provider_master(out)
    assert qa["dup_npi"] == 0 and qa["bad_npi"] == 0
    assert qa["bad_tax"] == 0 and qa["bad_zip"] == 0


def test_claim_provider_projection(spark):
    raw = spark.createDataFrame(
        [(11, 501, "2020-01-02", "2020-01-05", 9001, "X9001", "attending")],
        "internal_member_id long, medical_claim_header_id long, "
        "first_service_dt string, last_service_dt string, "
        "provider_id_apcd long, provider_id_raw_apcd string, provider_type string",
    )
    out = build_apcd_claim_provider(raw).first()
    assert out.id_apcd == 11 and out.claim_header_id == 501
    assert str(out.first_service_date) == "2020-01-02"
    assert out.provider_type == "attending"


def test_ref_apcd_provider_npi_modal_fallback(spark):
    """load_ref.apcd_provider_npi.R: master pairs win; non-master
    providers take their modal valid NPI (ties -> lowest NPI); invalid
    NPIs (leading zero / wrong length) never qualify; QA gates hold.
    Includes the reference's two named QA fixtures: a provider with an
    NPI typo must still get ONE row, and one NPI shared by two
    provider ids must keep both rows."""
    from claims_data_spark.tables.provider import (
        build_ref_apcd_provider_npi,
        qa_ref_apcd_provider_npi,
    )

    master = spark.createDataFrame(
        [(100, "1234567893")], "internal_provider_id long, npi string"
    )
    provider = spark.createDataFrame(
        [
            # master provider also in claims with a different NPI: master wins
            (100, "1999999999"),
            # modal pick: 2x same NPI beats 1x other
            (200, "1111111116"), (200, "1111111116"), (200, "1222222224"),
            # NPI-typo provider: two candidate NPIs with equal counts ->
            # lowest NPI wins, exactly one row survives
            (300, "1333333332"), (300, "1333333331"),
            # invalid NPIs: leading zero and 9 digits -> dropped entirely
            (400, "0123456789"), (400, "123456789"),
            # same NPI for two provider ids: both rows survive
            (500, "1444444440"), (600, "1444444440"),
        ],
        "internal_provider_id long, orig_npi string",
    )
    out = build_ref_apcd_provider_npi(master, provider)
    rows = {r["provider_id_apcd"]: r for r in out.collect()}
    assert rows[100]["npi"] == 1234567893
    assert rows[100]["provider_master_flag"] == 1
    assert rows[200]["npi"] == 1111111116
    assert rows[300]["npi"] == 1333333331  # tie -> lowest
    assert 400 not in rows  # no valid NPI at all
    assert rows[500]["npi"] == 1444444440 and rows[600]["npi"] == 1444444440
    qa = qa_ref_apcd_provider_npi(out)
    assert qa == {"dup_id": 0, "bad_npi": 0}


def test_carrier_billing_npi_xwalk(spark):
    from claims_data_spark.tables.provider import (
        build_ref_apcd_mcare_carrier_billing_npi,
        qa_carrier_billing_npi,
    )

    apcd = spark.createDataFrame(
        [("aBc123", 1, 24), ("ABC123", 2, 25), ("zzz999", 3, 16)],
        "submitter_clm_control_num string, medical_claim_header_id long,"
        " submitted_claim_type_id int",
    )
    carrier = spark.createDataFrame(
        [("aBc123", "1234567893"), ("ABC123", "1999999999")],
        "clm_id string, carr_clm_blg_npi_num string",
    )
    out = build_ref_apcd_mcare_carrier_billing_npi(apcd, carrier)
    rows = {r["claim_header_id"]: r for r in out.collect()}
    # case-sensitive: aBc123 and ABC123 map to DIFFERENT NPIs
    assert rows[1]["carr_clm_blg_npi_num"] == 1234567893
    assert rows[2]["carr_clm_blg_npi_num"] == 1999999999
    assert 3 not in rows  # non-carrier claim types never enter
    assert qa_carrier_billing_npi(out, apcd) == 0
