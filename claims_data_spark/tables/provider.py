"""Provider reference master + claim-provider stage table.

Reference:
  - ref.kc_provider_master  (ref/tables/load_ref.kc_provider_master.R:13-139):
    merge the APCD provider_master extract (authoritative, one row per
    NPI after cleaning) with per-claim provider rows, ranking the modal
    entity type / practice ZIP / top-2 taxonomies per NPI for providers
    absent from the master extract.
  - stage.apcd_claim_provider (stage/tables/load_stage.apcd_claim_provider.R:12-24):
    typed projection of the raw claim-provider spine.

Spark-first ranking design: the reference runs FOUR separate
scan+group+rank passes over the provider rows (entity rank :42-55, zip
rank :58-71, taxonomy rank :74-87 split into primary/secondary
:90-101) and then FIVE left joins to stitch them (:104-126).  Here the
provider rows are melted once into (npi, attr, value) long form, one
groupBy counts every (npi, attr, value), one window ranks within
(npi, attr), and one conditional agg pivots the winners back to
columns — a single scan and shuffles keyed only by npi/(npi, attr),
no joins between the rank families.  At 36M provider rows (the
reference's row_count) this is 3 exchanges instead of 9+.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def clean_provider_master(provider_master: DataFrame) -> DataFrame:
    """Step 1 (load_ref.kc_provider_master.R:21-29): validate and
    project the authoritative extract. NPI kept as-is (BIGINT), ZIP
    must be 5 chars, taxonomies must be 10 chars and not the -1/-2
    sentinel codes."""
    tax = lambda c: F.when(
        F.col(c).isin("-1", "-2") | (F.length(c) != 10), F.lit(None)
    ).otherwise(F.col(c))
    return provider_master.select(
        F.col("npi").cast("bigint").alias("npi"),
        "entity_type",
        F.when(F.length("zip_physical") == 5, F.col("zip_physical"))
        .otherwise(F.lit(None))
        .alias("geo_zip_practice"),
        tax("primary_taxonomy").alias("primary_taxonomy"),
        tax("secondary_taxonomy").alias("secondary_taxonomy"),
        F.lit(1).alias("apcd_provider_master_flag"),
    ).distinct()


def _ranked_provider_attrs(provider: DataFrame) -> DataFrame:
    """Steps 2a-2e as one melted pass. Returns one row per npi with
    entity_type / geo_zip_practice / primary+secondary taxonomy."""
    base = provider.select(
        # NPI must be a 10-digit number not starting with 0
        # (`like '[1-9][0-9]{9}'`, load_ref.kc_provider_master.R:35)
        F.when(
            F.col("orig_npi").cast("bigint").between(1_000_000_000, 9_999_999_999),
            F.col("orig_npi").cast("bigint"),
        ).alias("npi"),
        "entity_type",
        F.when(F.length("zip") == 5, F.col("zip")).alias("zip"),
        F.when(F.length("primary_specialty_code") == 10, F.col("primary_specialty_code")).alias("tax"),
    ).where(F.col("npi").isNotNull())

    melted = base.select(
        "npi",
        F.explode(
            F.array(
                F.struct(F.lit("entity").alias("attr"), F.col("entity_type").alias("value")),
                F.struct(F.lit("zip").alias("attr"), F.col("zip").alias("value")),
                F.struct(F.lit("tax").alias("attr"), F.col("tax").alias("value")),
            )
        ).alias("kv"),
    ).select("npi", "kv.attr", "kv.value")

    # NULL attr values are KEPT through the melt (an NPI whose every
    # attribute is invalid must still get a row, ref :110-116 keeps the
    # full distinct-NPI spine) but must never win a rank — the isNull
    # leading sort key pushes them behind every real value.
    counted = melted.groupBy("npi", "attr", "value").agg(F.count("*").alias("cnt"))
    # entity tiebreak: count desc, value DESC (:47); zip/taxonomy:
    # count desc, value ASC (:63, :79)
    w_desc = Window.partitionBy("npi", "attr").orderBy(
        F.col("value").isNull().asc(), F.desc("cnt"), F.desc("value")
    )
    w_asc = Window.partitionBy("npi", "attr").orderBy(
        F.col("value").isNull().asc(), F.desc("cnt"), F.asc("value")
    )
    ranked = counted.withColumn(
        "rn",
        F.when(F.col("attr") == "entity", F.row_number().over(w_desc)).otherwise(
            F.row_number().over(w_asc)
        ),
    )
    pick = lambda attr, rn: F.max(
        F.when(
            (F.col("attr") == attr) & (F.col("rn") == rn) & F.col("value").isNotNull(),
            F.col("value"),
        )
    )
    return ranked.groupBy("npi").agg(
        pick("entity", 1).alias("entity_type"),
        pick("zip", 1).alias("geo_zip_practice"),
        pick("tax", 1).alias("primary_taxonomy"),
        pick("tax", 2).alias("secondary_taxonomy"),
    )


def build_ref_kc_provider_master(
    provider_master: DataFrame, provider: DataFrame
) -> DataFrame:
    """ref.kc_provider_master: master-extract rows (flag 1) unioned with
    ranked per-claim provider rows for NPIs absent from the master
    (flag 0, load_ref.kc_provider_master.R:104-139)."""
    master = clean_provider_master(provider_master)
    ranked = _ranked_provider_attrs(provider).withColumn(
        "apcd_provider_master_flag", F.lit(0)
    )
    only_new = ranked.join(
        master.select("npi").distinct(), "npi", "left_anti"
    )
    cols = [
        "npi", "entity_type", "geo_zip_practice",
        "primary_taxonomy", "secondary_taxonomy", "apcd_provider_master_flag",
    ]
    return master.select(cols).unionByName(only_new.select(cols))


def qa_provider_master(df: DataFrame) -> dict:
    """The reference's four QA gates (load_ref.kc_provider_master.R:144-180)
    fused into one aggregate pass: duplicate NPIs, NPI length != 10,
    taxonomy length != 10, ZIP length != 5 — all expected 0."""
    per_npi = df.groupBy("npi").agg(
        F.count("*").alias("rows"),
        F.max(F.when(F.length(F.col("npi").cast("string")) != 10, 1).otherwise(0)).alias("bad_npi"),
        F.max(
            F.when(
                (F.length("primary_taxonomy") != 10)
                | (F.length("secondary_taxonomy") != 10),
                1,
            ).otherwise(0)
        ).alias("bad_tax"),
        F.max(F.when(F.length("geo_zip_practice") != 5, 1).otherwise(0)).alias("bad_zip"),
    )
    row = per_npi.agg(
        F.sum(F.when(F.col("rows") > 1, 1).otherwise(0)).alias("dup_npi"),
        F.sum("bad_npi").alias("bad_npi"),
        F.sum("bad_tax").alias("bad_tax"),
        F.sum("bad_zip").alias("bad_zip"),
    ).first()
    return {k: int(row[k] or 0) for k in ("dup_npi", "bad_npi", "bad_tax", "bad_zip")}


def build_apcd_claim_provider(raw: DataFrame) -> DataFrame:
    """stage.apcd_claim_provider: typed projection/rename of the raw
    claim-provider spine (load_stage.apcd_claim_provider.R:18-24)."""
    return raw.select(
        F.col("internal_member_id").alias("id_apcd"),
        F.col("medical_claim_header_id").alias("claim_header_id"),
        F.col("first_service_dt").cast("date").alias("first_service_date"),
        F.col("last_service_dt").cast("date").alias("last_service_date"),
        "provider_id_apcd",
        "provider_id_raw_apcd",
        "provider_type",
    )


# ---------------------------------------------------------------------------
# ref.apcd_provider_npi (ref/tables/load_ref.apcd_provider_npi.R:20-112):
# one row per APCD internal provider id, carrying its best NPI.
# ---------------------------------------------------------------------------

def build_ref_apcd_provider_npi(
    provider_master: DataFrame, provider: DataFrame
) -> DataFrame:
    """Provider-id -> NPI crosswalk: master-extract pairs win (flag 1);
    providers absent from the master fall back to their MODAL valid
    NPI across claim-provider rows (flag 0), ties broken by lowest NPI
    (the reference's ``rank() over (order by row_count desc, npi)``,
    ``:40-55``). NPI validity is the 10-digit no-leading-zero pattern
    (``:33``). One count agg + one window over the small provider
    dimension; the master side joins anti to keep ids single-rowed —
    the QA contract is one row per provider_id_apcd.
    """
    master = provider_master.select(
        F.col("internal_provider_id").alias("provider_id_apcd"),
        F.col("npi").cast("bigint").alias("npi"),
        F.lit(1).alias("provider_master_flag"),
    ).distinct()

    valid = provider.select(
        F.col("internal_provider_id").alias("provider_id_apcd"),
        F.when(
            F.col("orig_npi").cast("string").rlike(r"^[1-9][0-9]{9}$"),
            F.col("orig_npi"),
        ).alias("npi"),
    ).filter(F.col("npi").isNotNull())

    counts = valid.groupBy("provider_id_apcd", "npi").agg(
        F.count(F.lit(1)).alias("row_count")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("provider_id_apcd").orderBy(
        F.col("row_count").desc(), F.col("npi")
    )
    modal = (
        counts.withColumn("_rk", F.rank().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "provider_id_apcd",
            F.col("npi").cast("bigint").alias("npi"),
            F.lit(0).alias("provider_master_flag"),
        )
    )
    fallback = modal.join(
        master.select("provider_id_apcd"), "provider_id_apcd", "left_anti"
    )
    return master.unionByName(fallback)


def qa_ref_apcd_provider_npi(df: DataFrame) -> dict:
    """Reference QA (load_ref.apcd_provider_npi.R:88-108) fused into
    one pass: provider ids with >1 row and NPIs whose length != 10 —
    both expected 0."""
    row = (
        df.groupBy("provider_id_apcd")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.max(
                F.when(
                    F.length(F.col("npi").cast("string")) != 10, 1
                ).otherwise(0)
            ).alias("bad_npi"),
        )
        .agg(
            F.sum(F.when(F.col("rows") > 1, 1).otherwise(0)).alias("dup_id"),
            F.sum("bad_npi").alias("bad_npi"),
        )
        .first()
    )
    return {k: int(row[k] or 0) for k in ("dup_id", "bad_npi")}


def build_ref_apcd_mcare_carrier_billing_npi(
    apcd_medical_claim: DataFrame, mcare_bcarrier_claims: DataFrame
) -> DataFrame:
    """APCD claim-header -> Medicare carrier billing NPI crosswalk
    (``ref/tables/load_ref.apcd_mcare_carrier_billing_npi.sql:20-30``):
    APCD Medicare-FFS carrier claims (submitted claim types 24/25)
    joined to the ResDAC carrier file on the submitter claim control
    number. The reference forces a CASE-SENSITIVE collation for the
    join (claim control numbers are base-62-ish) — Spark string
    equality is already case-sensitive, so the semantic carries with a
    plain equi-join; trim guards padded fixed-width extracts.
    """
    a = apcd_medical_claim.filter(
        F.col("submitted_claim_type_id").isin(24, 25)
    ).select(
        F.trim(F.col("submitter_clm_control_num")).alias("_ctl"),
        F.col("medical_claim_header_id").alias("claim_header_id"),
    )
    b = mcare_bcarrier_claims.select(
        F.trim(F.col("clm_id")).alias("_ctl"),
        F.col("carr_clm_blg_npi_num").cast("bigint")
        .alias("carr_clm_blg_npi_num"),
    )
    return a.join(b, "_ctl", "left").drop("_ctl")


def qa_carrier_billing_npi(
    xwalk: DataFrame, apcd_medical_claim: DataFrame
) -> int:
    """Reference QA (``:33-41``): count of crosswalk claims whose APCD
    submitted claim type is NOT carrier — expect 0 (known OnPoint
    header-clustering caveat documented in the reference)."""
    typed = apcd_medical_claim.select(
        F.col("medical_claim_header_id").alias("claim_header_id"),
        "submitted_claim_type_id",
    )
    return (
        xwalk.join(typed, "claim_header_id", "left")
        .filter(~F.col("submitted_claim_type_id").isin(24, 25))
        .count()
    )


def build_ref_provider_nppes_apde(nppes_load: DataFrame) -> DataFrame:
    """NPPES provider lookup table
    (``ref/tables/load_ref.provider_nppes_apde_load.R:31-166``).

    The reference runs two 15-way UNPIVOTs (taxonomy codes and their
    primary switches), joins them back on (npi, taxonomy_number),
    collapses to distinct (npi, taxonomy) with MAX(primary), ranks by
    (primary DESC, taxonomy), and self-joins three rank slices into
    taxonomy_1/2/3 columns.  Spark-first this is ONE struct-array
    explode (code and switch travel together, so the join-back
    disappears), one groupBy collapse, one rank window, and one
    conditional aggregation for ranks 2-3.

    Faithfully kept reference quirk: the anchor row set is
    ``primary_flag = 1 OR taxonomy_number = 1`` (``:115``), so an NPI
    whose source rows mark TWO taxonomies primary emits two rows, each
    carrying the same taxonomy_2/3.

    Output adds ``geo_wa``, the SHA-256 ``geo_hash_raw`` over the
    upper-cased pipe-joined practice address with 5-digit ZIP
    (``:144-146``, same recipe as ``tables/address.py``),
    ``deactivation_flag`` (deactivated = no entity type + a
    deactivation date), and the ``last_run`` audit column.
    """
    tax_structs = F.array(*[
        F.struct(
            F.lit(f"{i:02d}").alias("taxonomy_number"),
            F.col(f"healthcare_provider_taxonomy_code_{i}").alias("taxonomy"),
            F.col(f"healthcare_provider_primary_taxonomy_switch_{i}").alias(
                "switch"
            ),
        )
        for i in range(1, 16)
    ])
    long = (
        nppes_load.select(
            F.col("npi").cast("bigint").alias("npi"),
            F.explode(tax_structs).alias("t"),
        )
        .filter(F.col("t.taxonomy").isNotNull())
        .select(
            "npi",
            F.col("t.taxonomy").alias("taxonomy"),
            F.col("t.switch").alias("switch"),
        )
    )
    collapsed = long.groupBy("npi", "taxonomy").agg(
        # CASE-style flag: all-NULL switches collapse to 0 (not NULL),
        # matching the reference's max(case when switch='Y' then 1 else 0
        # end) so the primary_flag DESC rank never sorts NULL after 0.
        F.max(
            F.when(F.col("switch") == "Y", 1).otherwise(0)
        ).alias("primary_flag")
    )
    w = Window.partitionBy("npi").orderBy(
        F.col("primary_flag").desc(), F.col("taxonomy")
    )
    ranked = collapsed.withColumn("taxonomy_number", F.rank().over(w))
    anchors = ranked.filter(
        (F.col("primary_flag") == 1) | (F.col("taxonomy_number") == 1)
    ).select(
        "npi",
        F.col("taxonomy").alias("taxonomy_1"),
        F.col("primary_flag").alias("taxonomy_primary_flag"),
    )
    t23 = (
        ranked.filter(F.col("taxonomy_number").isin(2, 3))
        .groupBy("npi")
        .agg(
            F.max(
                F.when(F.col("taxonomy_number") == 2, F.col("taxonomy"))
            ).alias("taxonomy_2"),
            F.max(
                F.when(F.col("taxonomy_number") == 3, F.col("taxonomy"))
            ).alias("taxonomy_3"),
        )
    )
    tax_final = anchors.join(t23, "npi", "left")

    zip5 = F.substring("address_practice_zip_code", 1, 5)
    keep = [
        "entity_type_code", "name_org", "name_last", "name_first",
        "name_middle", "credential", "name_org_other",
        "name_org_other_type_code", "address_practice_first",
        "address_practice_second", "address_practice_city",
        "address_practice_state", "address_practice_zip_code",
        "gender_code", "is_sole_proprietor", "is_organization_subpart",
        "parent_organization_lbn",
    ]
    base = nppes_load.select(
        F.col("npi").cast("bigint").alias("npi"),
        *[F.col(c) for c in keep if c in nppes_load.columns],
        F.when(
            F.col("address_practice_state").isin("WA", "WASHINGTON"), 1
        ).otherwise(0).alias("geo_wa"),
        # Reference hashes CAST(... AS VARCHAR(1275)) — mirror the
        # 1275-char truncation so cross-system joins line up. Residual
        # divergence: we hash UTF-8 bytes where the reference hashes
        # Latin1; identical for ASCII addresses (the NPPES norm), may
        # differ for non-ASCII practice addresses.
        F.upper(
            F.sha2(
                F.substring(
                    F.upper(
                        F.concat_ws(
                            "|",
                            F.coalesce(
                                F.col("address_practice_first"), F.lit("")
                            ),
                            F.coalesce(
                                F.col("address_practice_second"), F.lit("")
                            ),
                            F.coalesce(
                                F.col("address_practice_city"), F.lit("")
                            ),
                            F.coalesce(
                                F.col("address_practice_state"), F.lit("")
                            ),
                            F.coalesce(zip5, F.lit("")),
                        )
                    ),
                    1,
                    1275,
                ),
                256,
            )
        ).alias("geo_hash_raw"),
        F.col("enumeration_date").cast("date").alias("enumeration_date"),
        F.col("last_update").cast("date").alias("last_update"),
        F.when(
            F.col("entity_type_code").isNull()
            & F.col("deactivation_date").isNotNull(),
            1,
        ).otherwise(0).alias("deactivation_flag"),
        F.col("deactivation_date").cast("date").alias("deactivation_date"),
    )
    return base.join(tax_final, "npi", "left").withColumn(
        "last_run", F.current_timestamp()
    )


def nppes_address_extract(nppes_apde: DataFrame) -> DataFrame:
    """Distinct WA practice addresses for the external cleaning service
    (``load_ref.provider_nppes_apde_load.R:171-180``): the raw
    geo_add/city/state/zip projection tagged ``geo_source='nppes'``
    that feeds the same address_clean pipeline as member addresses."""
    return (
        nppes_apde.filter(F.col("geo_wa") == 1)
        .select(
            F.col("address_practice_first").alias("geo_add1_raw"),
            F.col("address_practice_second").alias("geo_add2_raw"),
            F.col("address_practice_city").alias("geo_city_raw"),
            F.col("address_practice_state").alias("geo_state_raw"),
            F.substring("address_practice_zip_code", 1, 5).alias(
                "geo_zip_raw"
            ),
            F.lit("nppes").alias("geo_source"),
        )
        .distinct()
        .withColumn("timestamp", F.current_timestamp())
    )
