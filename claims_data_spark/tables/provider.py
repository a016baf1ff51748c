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
