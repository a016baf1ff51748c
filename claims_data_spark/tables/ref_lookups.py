"""Small reference-lookup builders (the round-5 verdict's long tail).

Reference scripts ported, each cited at its function:

  - ref.mco                 load_ref.mco.R:9-19
  - ref.geo_county_code_wa  load_ref.geo_county_code_wa.R:9-26
  - ref.geo_kc_zip          load_ref.geo_kc_zip.R:17-45
  - ref.fda_ndc_product     load_ref.fda_ndc_product.R:15-55
  - HEDIS/QRS value sets    load_claims.ref_hedis_value_sets_apde_2018-2023.R
                            (+2024/2025 single-year appends)

These are dimension tables: every builder is map-only or one bounded
aggregate, outputs are broadcast-sized by construction (dozens to a
few hundred thousand rows), and the cohort/measure queries join them
with ``F.broadcast``. The interesting logic is the HEDIS multi-year
combine + ICD normalization and the per-table QA gates the reference
treats as load-bearing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# ref.mco — Medicaid managed-care-organization product crosswalk
# ---------------------------------------------------------------------------


def build_ref_mco(raw: DataFrame) -> DataFrame:
    """ref.mco (load_ref.mco.R:9-19): the curated MCO product
    crosswalk. The R loads the csv verbatim; the load contract the
    consumers rely on is (mco, product, product_identifier,
    product_code) with a unique product_identifier — enforced here as
    typed projection + distinct."""
    return (
        raw.select(
            F.trim("mco").alias("mco"),
            F.trim("product").alias("product"),
            F.col("product_identifier").cast("string")
            .alias("product_identifier"),
            F.upper(F.trim("product_code")).alias("product_code"),
        )
        .distinct()
    )


def qa_ref_mco(df: DataFrame) -> dict:
    """Duplicate product identifiers, expect 0 (the implicit key the
    elig pipelines join on)."""
    row = (
        df.groupBy("product_identifier")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("dup_ids")
        )
        .first()
    )
    return {"dup_ids": int(row["dup_ids"] or 0)}


# ---------------------------------------------------------------------------
# ref.geo_county_code_wa — WA county number <-> FIPS codes
# ---------------------------------------------------------------------------

_COUNTY_CODE_COLS = (
    "geo_county_fips_long", "geo_county_code_order",
    "geo_county_code_gnis", "geo_county_code_tiger",
    "geo_county_code_aff",
)


def build_ref_geo_county_code_wa(raw: DataFrame) -> DataFrame:
    """ref.geo_county_code_wa (load_ref.geo_county_code_wa.R:14-18):
    left-pad the FIPS county code to 3 with zeros and cast every other
    code system to string (the R's mutate/across). Consumed by the
    timevar builders as ``geo_county_name -> geo_county_code_fips``
    (load_stage.apcd_elig_timevar.R:132,145)."""
    cols = [
        F.trim("geo_county_name").alias("geo_county_name"),
        F.lpad(F.col("geo_county_code_fips").cast("string"), 3, "0")
        .alias("geo_county_code_fips"),
    ]
    for c in _COUNTY_CODE_COLS:
        if c in raw.columns:
            cols.append(F.col(c).cast("string").alias(c))
    return raw.select(*cols)


# ---------------------------------------------------------------------------
# ref.geo_kc_zip — King County ZIP lookup
# ---------------------------------------------------------------------------


def build_ref_geo_kc_zip(raw: DataFrame) -> DataFrame:
    """ref.geo_kc_zip (load_ref.geo_kc_zip.R:17-45, col_types 'ci'):
    ZIP as a 5-char string (leading zeros preserved), geo_kc int flag.
    Consumers join ``select distinct geo_zip, geo_kc``
    (load_stage.mcare_elig_timevar.R:381) — the builder IS that
    distinct so every downstream join is safe against raw dups."""
    return (
        raw.select(
            F.lpad(F.col("geo_zip").cast("string"), 5, "0").alias("geo_zip"),
            F.col("geo_kc").cast("int").alias("geo_kc"),
        )
        .distinct()
    )


def qa_ref_geo_kc_zip(df: DataFrame) -> dict:
    """ZIPs must be unique after the distinct and 5 chars long."""
    row = df.agg(
        (F.count(F.lit(1)) - F.countDistinct("geo_zip")).alias("dup_zip"),
        F.sum(
            F.when(F.length("geo_zip") != 5, 1).otherwise(0)
        ).alias("bad_len"),
    ).first()
    return {"dup_zip": int(row["dup_zip"] or 0),
            "bad_len": int(row["bad_len"] or 0)}


# ---------------------------------------------------------------------------
# ref.fda_ndc_product — FDA NDC product directory
# ---------------------------------------------------------------------------


def build_ref_fda_ndc_product(raw: DataFrame) -> DataFrame:
    """ref.fda_ndc_product (load_ref.fda_ndc_product.R:40-46): the FDA
    product file loaded as all-string columns with the one transform
    the R applies — strip non-ASCII garbage (the U+FFFD replacement
    character the R file shows) from LABELERNAME. Column names are
    lower-cased on the way in (the repo's convention; the R keeps the
    FDA's upper-case headers)."""
    cols = []
    for c in raw.columns:
        col = F.col(c).cast("string")
        if c.lower() == "labelername":
            col = F.regexp_replace(col, r"[^\x00-\x7F]", "")
        cols.append(col.alias(c.lower()))
    return raw.select(*cols)


# ---------------------------------------------------------------------------
# HEDIS / QRS value sets — multi-year combine (2018-2023) + appends
# ---------------------------------------------------------------------------


def normalize_hedis_codes(df: DataFrame) -> DataFrame:
    """Step 3 of the year-merge loader
    (load_claims.ref_hedis_value_sets_apde_2018-2023.R:716-730): strip
    punctuation from ICD-9/10-CM codes, then pad ICD-9 to 5 chars with
    trailing zeros — aligning the value sets with the claims dx
    vocabulary."""
    code = F.col("code")
    icd = F.col("code_system").isin("ICD10CM", "ICD9CM")
    stripped = F.when(
        icd, F.regexp_replace(code, r"[\p{Punct}]", "")
    ).otherwise(code)
    d = df.withColumn("code", stripped)
    code = F.col("code")
    icd9 = F.col("code_system") == "ICD9CM"
    return d.withColumn(
        "code",
        F.when(icd9 & (F.length(code) == 3), F.concat(code, F.lit("00")))
        .when(icd9 & (F.length(code) == 4), F.concat(code, F.lit("0")))
        .otherwise(code),
    )


def build_ref_hedis_value_sets(
    per_year: dict[int, DataFrame]
) -> DataFrame:
    """Steps 1-3 (:32-730): tag each measurement year, bind by name
    across years (schemas drift between releases — 2018 files lack the
    QRS columns 2023 adds), then normalize the ICD vocabulary once
    over the combined frame. Pure unions + map-only normalize."""
    out = None
    for year in sorted(per_year):
        d = per_year[year].withColumn("year", F.lit(int(year)))
        out = d if out is None else out.unionByName(
            d, allowMissingColumns=True
        )
    return normalize_hedis_codes(out)


def build_ref_hedis_measures(per_year: dict[int, DataFrame]) -> DataFrame:
    """Measures-to-value-sets map, year-tagged and bound by name
    (:687-692). No code normalization — measure ids are clean."""
    out = None
    for year in sorted(per_year):
        d = per_year[year].withColumn("year", F.lit(int(year)))
        out = d if out is None else out.unionByName(
            d, allowMissingColumns=True
        )
    return out


def append_hedis_year(
    existing: DataFrame, new_year: DataFrame, year: int
) -> DataFrame:
    """The 2024/2025 single-year refresh
    (load_claims.ref_hedis_value_sets_apde_2024.R:179-215) as an
    idempotent merge instead of the R's blind dbAppendTable: rows for
    ``year`` are replaced, not duplicated, so a re-run after a partial
    failure cannot double-load the year."""
    kept = existing.filter(F.col("year") != int(year))
    d = normalize_hedis_codes(
        new_year.withColumn("year", F.lit(int(year)))
    )
    return kept.unionByName(d, allowMissingColumns=True)


def qa_hedis_value_sets(df: DataFrame) -> dict:
    """The loader's three confirm-distinct-length checks (:733-740)
    fused into ONE aggregate: ICD-9 codes all length 5, ICD-10 codes
    length 3-7, (when present) NDC codes length 11."""
    row = df.agg(
        F.sum(
            F.when(
                (F.col("code_system") == "ICD9CM")
                & (F.length("code") != 5), 1
            ).otherwise(0)
        ).alias("bad_icd9"),
        F.sum(
            F.when(
                (F.col("code_system") == "ICD10CM")
                & (~F.length("code").between(3, 7)), 1
            ).otherwise(0)
        ).alias("bad_icd10"),
        F.sum(
            F.when(
                (F.col("code_system") == "NDC")
                & (F.length("code") != 11), 1
            ).otherwise(0)
        ).alias("bad_ndc"),
    ).first()
    return {k: int(row[k] or 0) for k in ("bad_icd9", "bad_icd10", "bad_ndc")}
