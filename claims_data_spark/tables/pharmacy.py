"""Pharmacy reference tables: FDA NDC directory + chronic-meds crosswalk.

Reference:
  - ref.ndc_codes (ref/tables/load_ref.ndc_codes.R:31-120): merge the
    FDA NDC directory's package/product files (finished + unfinished +
    compounders), then normalize the dashed 10-digit NDCPACKAGECODE to
    the 11-digit billing NDC: 4-4-2 pads the labeler segment, 5-3-2
    pads the product segment, 5-4-1 pads the package segment
    (:79-87).
  - ref.chronic_meds_eli (ref/tables/load_ref.chronic_meds_eli.R:33-56):
    curated chronic-medication name patterns regex-left-joined against
    the distinct lowercased NDC descriptions observed in claims —
    a prefix match unless the curated name carries '%' wildcards, in
    which case it is a contains match.

Scale notes: the NDC directory is bounded (~300k rows) — all
assembly is narrow unions + one broadcastable output.  The chronic-med
pattern join broadcasts the curated list (tens of rows) against the
DISTINCT description dimension, never the claim fact table, and the
claim join-back is a plain equi-join on ndc_desc.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEG = r"[0-9A-Za-z]"


def normalize_ndc_11(code: Column | str) -> Column:
    """Dashed 10-digit NDC package code -> 11-digit billing NDC
    (load_ref.ndc_codes.R:79-87).

    4-4-2 -> '0' + all segments; 5-3-2 -> seg1 + '0' + seg2 + seg3;
    5-4-1 -> seg1 + seg2 + '0' + seg3; anything else -> NULL.
    Pure string expression — whole-stage codegen, usable on claim
    facts directly.
    """
    c = F.col(code) if isinstance(code, str) else code
    seg = F.split(c, "-")
    s1, s2, s3 = seg.getItem(0), seg.getItem(1), seg.getItem(2)
    return (
        F.when(
            c.rlike(f"^{_SEG}{{4}}-{_SEG}{{4}}-{_SEG}{{2}}$"),
            F.concat(F.lit("0"), s1, s2, s3),
        )
        .when(
            c.rlike(f"^{_SEG}{{5}}-{_SEG}{{3}}-{_SEG}{{2}}$"),
            F.concat(s1, F.lit("0"), s2, s3),
        )
        .when(
            c.rlike(f"^{_SEG}{{5}}-{_SEG}{{4}}-{_SEG}{{1}}$"),
            F.concat(s1, s2, F.lit("0"), s3),
        )
        .otherwise(F.lit(None).cast("string"))
    )


_NDC_COLS = [
    "product_id", "ndc", "product_ndc", "ndc_package_code",
    "start_marketing_date", "end_marketing_date",
    "nonproprietary_name", "proprietary_name", "proprietary_name_suffix",
    "dosage_form_name", "active_numerator_strength", "active_ingred_unit",
]


def build_ref_ndc_codes(
    package: DataFrame,
    product: DataFrame,
    unfinished_package: DataFrame | None = None,
    unfinished_product: DataFrame | None = None,
    compounders: DataFrame | None = None,
    missing: DataFrame | None = None,
) -> DataFrame:
    """ref.ndc_codes: FDA directory assembly
    (load_ref.ndc_codes.R:31-76,100-113).

    package x product merged on (product_id, product_ndc) keeping every
    package row; unfinished rows carry no proprietary name; compounder
    rows carry no product id or marketing dates; curated 'missing' rows
    append last.  Every branch gets the 11-digit normalized ndc.
    """
    def final(df: DataFrame) -> DataFrame:
        out = df.withColumn("ndc", normalize_ndc_11("ndc_package_code"))
        for c in _NDC_COLS:
            if c not in out.columns:
                out = out.withColumn(c, F.lit(None).cast("string"))
        return out.select(_NDC_COLS)

    finished = package.join(product, ["product_id", "product_ndc"], "left")
    branches = [final(finished)]
    if unfinished_package is not None and unfinished_product is not None:
        branches.append(
            final(
                unfinished_package.join(
                    unfinished_product, ["product_id", "product_ndc"], "left"
                )
            )
        )
    if compounders is not None:
        branches.append(final(compounders))
    if missing is not None:
        branches.append(final(missing))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def build_chronic_meds_crosswalk(
    ndc_desc: DataFrame, med_list: DataFrame
) -> DataFrame:
    """ref.chronic_meds_eli (load_ref.chronic_meds_eli.R:33-47).

    ndc_desc: one column ``ndc_desc`` (callers pass
    ``claims.select(lower(ndc_desc)).distinct()`` — the pattern join
    runs on the description DIMENSION, not the fact table).
    med_list: curated (drug_name, drug_class, ...) rows; a '%' in
    drug_name means contains-match, otherwise prefix-match (the R code
    builds '^name' regexes, :36-39).

    LEFT join so unmatched descriptions survive with null med columns,
    mirroring fuzzyjoin::regex_left_join.
    """
    med = med_list.withColumn(
        "_pattern",
        F.when(
            F.col("drug_name").contains("%"),
            F.regexp_replace(F.col("drug_name"), "%", ""),
        ).otherwise(F.concat(F.lit("^"), F.col("drug_name"))),
    )
    # column-valued regex -> SQL RLIKE (Column.rlike only takes a
    # literal); broadcast nested-loop against the tiny curated list
    return ndc_desc.join(
        F.broadcast(med),
        F.expr("ndc_desc rlike _pattern"),
        "left",
    ).drop("_pattern")


# ---------------------------------------------------------------------------
# Medicare Part D pharmacy characteristics
# (stage/tables/load_stage.mcare_claim_pharm_char.R:12-44)
# ---------------------------------------------------------------------------

# raw NCPDP column -> stage column (identity where the reference keeps
# the raw name). Order matches the reference's insert-select.
PHARM_CHAR_RENAMES = [
    ("ncpdp_id", "pharmacy_id"),
    ("physical_location_state_code", None),
    ("physical_location_open_date", None),
    ("physical_location_close_date", None),
    ("dispenser_class", None),
    ("primary_dispenser_type", None),
    ("primary_taxonomy_code", None),
    ("secondary_dispenser_type", None),
    ("secondary_taxonomy_code", None),
    ("tertiary_dispenser_type", None),
    ("tertiary_taxonomy_code", None),
    ("relationship_id", None),
    ("relationship_from_dt", None),
    ("relationship_thru_dt", None),
    ("relationship_type", None),
    ("prnt_org_id", None),
    ("eprscrb_srvc_ind", None),
    ("eprscrb_srvc_cd", None),
    ("dme_srvc_ind", None),
    ("dme_srvc_cd", None),
    ("walkin_clinic_ind", None),
    ("walkin_clinic_cd", None),
    ("immunizations_ind", None),
    ("immunizations_cd", None),
    ("status_340b_ind", None),
    ("status_340b_cd", None),
]


def build_mcare_claim_pharm_char(raw: DataFrame) -> DataFrame:
    """Stage the NCPDP pharmacy-characteristics extract
    (``load_stage.mcare_claim_pharm_char.R:12-44``): rename
    ``ncpdp_id`` to the ``pharmacy_id`` join key used by
    ``mcare_claim_pharm`` and pass the dispenser/relationship/service
    surface through typed. Dates cast to date so downstream
    open/close-window predicates stay codegen comparisons; missing
    trailing columns null-fill (vintage drift tolerance, same policy
    as the facility-stage harmonizer). Pure projection — no shuffle.
    """
    sels = []
    for src, dst in PHARM_CHAR_RENAMES:
        dst = dst or src
        col = (
            F.col(src) if src in raw.columns
            else F.lit(None).cast("string")
        )
        if src.endswith(("_date", "_dt")):
            col = col.cast("date")
        sels.append(col.alias(dst))
    return raw.select(*sels)
