"""Provider master ranking (ref: load_ref.kc_provider_master.R)."""
from __future__ import annotations

from pyspark.sql import functions as F

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


def test_ref_provider_nppes_apde_taxonomy_ranking(spark):
    """15-way paired unpivot -> collapse -> rank -> 3-column pivot,
    including the reference's anchor quirk (two primary taxonomies
    emit two rows) and the no-primary fallback to rank 1."""
    from claims_data_spark.tables.provider import (
        build_ref_provider_nppes_apde,
        nppes_address_extract,
    )

    cols = {}
    for i in range(1, 16):
        cols[f"healthcare_provider_taxonomy_code_{i}"] = "string"
        cols[f"healthcare_provider_primary_taxonomy_switch_{i}"] = "string"
    schema = (
        "npi long, entity_type_code string, name_org string, "
        "name_last string, name_first string, name_middle string, "
        "credential string, name_org_other string, "
        "name_org_other_type_code string, address_practice_first string, "
        "address_practice_second string, address_practice_city string, "
        "address_practice_state string, address_practice_zip_code string, "
        "gender_code string, is_sole_proprietor string, "
        "is_organization_subpart string, parent_organization_lbn string, "
        "enumeration_date string, last_update string, "
        "deactivation_date string, "
        + ", ".join(f"{k} {v}" for k, v in cols.items())
    )

    def mk(npi, taxes, state="WA", entity="1", deact=None):
        # taxes: list of (code, switch); schema interleaves code_i/switch_i
        t = []
        for j in range(15):
            if j < len(taxes):
                t.extend(taxes[j])
            else:
                t.extend((None, None))
        return (
            npi, entity, None, "LAST", "FIRST", None, None, None, None,
            "100 MAIN ST", None, "SEATTLE", state, "981011234",
            "F", "N", "N", None, "2010-01-01", "2020-01-01", deact,
            *t,
        )

    raw = spark.createDataFrame(
        [
            # primary is 2nd slot; alphabetical fills ranks 2-3
            mk(1, [("B", "N"), ("C", "Y"), ("A", "N")]),
            # no primary -> rank 1 alphabetical
            mk(2, [("Z", "N"), ("M", "N")], state="OR"),
            # TWO primaries -> two anchor rows (reference quirk)
            mk(3, [("P1", "Y"), ("P2", "Y"), ("Q", "N")]),
            # deactivated org: no entity type + deactivation date
            mk(4, [("T", "Y")], entity=None, deact="2021-05-05"),
            # duplicate taxonomy slots collapse, MAX keeps the Y
            mk(5, [("D", "N"), ("D", "Y")]),
        ],
        schema,
    )
    out = build_ref_provider_nppes_apde(raw)
    rows = {r["npi"]: r for r in out.filter(F.col("npi") != 3).collect()}

    assert rows[1]["taxonomy_1"] == "C" and rows[1]["taxonomy_primary_flag"] == 1
    assert rows[1]["taxonomy_2"] == "A" and rows[1]["taxonomy_3"] == "B"
    assert rows[2]["taxonomy_1"] == "M" and rows[2]["taxonomy_primary_flag"] == 0
    assert rows[2]["taxonomy_2"] == "Z" and rows[2]["taxonomy_3"] is None
    assert rows[2]["geo_wa"] == 0 and rows[1]["geo_wa"] == 1
    assert rows[4]["deactivation_flag"] == 1 and rows[1]["deactivation_flag"] == 0
    assert len(rows[1]["geo_hash_raw"]) == 64
    assert rows[5]["taxonomy_1"] == "D" and rows[5]["taxonomy_primary_flag"] == 1
    assert rows[5]["taxonomy_2"] is None

    three = out.filter(F.col("npi") == 3).collect()
    assert len(three) == 2
    assert {r["taxonomy_1"] for r in three} == {"P1", "P2"}
    # both anchor rows carry the SAME rank-2/rank-3 slices — and with
    # two primaries, rank 2 is the OTHER primary (the reference ranks
    # primaries first, then alphabetical; :108-122)
    assert all(r["taxonomy_2"] == "P2" and r["taxonomy_3"] == "Q"
               for r in three)

    addrs = nppes_address_extract(out).collect()
    # npi 2 is OR (excluded); 1/3/4/5 share the same WA address -> 1 row
    assert len(addrs) == 1
    assert addrs[0]["geo_zip_raw"] == "98101"
    assert addrs[0]["geo_source"] == "nppes"


def test_ref_ahrq_value_set_prefix_strip_and_pk(spark):
    from claims_data_spark.tables.value_set import (
        build_ref_ahrq_value_set,
        qa_ahrq_value_set,
    )

    raw = spark.createDataFrame(
        [
            ("PQI", "PQI 01", "ICD", "DX", "123456789012E1110", "diab"),
            ("PQI", "PQI 01", "ICD", "DX", "123456789012E1110", "diab dup"),
            ("PQI", "PQI 01", "ICD", "PX", "1234567890124A023", "proc"),
        ],
        "value_set_group string, value_set_name string, "
        "data_source_type string, code_set string, code string, desc_1 string",
    )
    out = build_ref_ahrq_value_set(raw)
    rows = {(r["code_set"], r["code"]): r for r in out.collect()}
    assert set(rows) == {("DX", "E1110"), ("PX", "4A023")}
    assert rows[("DX", "E1110")]["desc_1"] == "diab"  # first-by-key
    qa = qa_ahrq_value_set(out)
    assert qa["pk_unique"] and qa["rows"] == 2
