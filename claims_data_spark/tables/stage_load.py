"""Raw -> stage source loaders for the Medicaid extract and the
Medicare MBSF denominator file, plus the perf member-month helpers.

Reference scripts (semantics only; the SQL-Server archive/rename
mechanics are replaced by the lazy-DataFrame + ``sources.io.promote``
model):

* ``claims_db/phclaims/stage/tables/load_stage.mcaid_elig.R``
  (duplicate-type detection :131-208, reason-score dedup :210-300,
  RAC spelling fix :243-247, geo_hash_raw sha256 :337-380,
  archive+new combine :330-410, QA row parity / null ids :425-520)
* ``claims_db/phclaims/stage/tables/load_stage.mcaid_claim.R``
  (derived CLNDR_YEAR_MNTH / CLM_LINE + DISTINCT :100-130,
  BHO archive union on full refresh :117-128)
* ``claims_db/phclaims/stage/tables/load_stage.mcare_mbsf.r``
  (new-year detection by (year, count) :14-21, zip cleaning
  :31-33/50-52, typed bind of ab/abcd :34-62, case-insensitive
  duplicate gate :67-77, append QA :90-180)
* ``load_stage.mcaid_perf_elig_member_month.R`` (MC plan
  abbreviation map, King-county zip filter, longest-span
  row_number dedup) and ``load_stage.mcaid_perf_distinct_member.R``.

Scale notes: every dedup here is one hash shuffle on the natural
key; the duplicate-type probes run as a SINGLE aggregate pass
computing all distinct-struct counts at once (the reference issues
four COUNT(DISTINCT ...) queries — four scans).  The zip reference
join is broadcast.  Nothing collects data rows to the driver; the
probe result is one row of counters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Natural key of one RAC coverage row (load_stage.mcaid_elig.R:146).
ELIG_DEDUP_KEYS = [
    "CLNDR_YEAR_MNTH",
    "MBR_H_SID",
    "MEDICAID_RECIPIENT_ID",
    "RAC_FROM_DATE",
    "RAC_TO_DATE",
    "RAC_CODE",
]

_RAC_MISSPELLED = "Involuntary Inpatient Psychiactric Treatment (ITA)"
_RAC_CORRECT = "Involuntary Inpatient Psychiatric Treatment (ITA)"


def _reason_score() -> Column:
    """END_REASON_NAME priority (load_stage.mcaid_elig.R:225-231):
    higher score wins when one person-month-RAC combo carries
    multiple end reasons."""
    r = F.col("END_REASON_NAME")
    return (
        F.when(r.isNull(), 1)
        .when(r == "Other", 2)
        .when(r == "Other - For User Generation Only", 3)
        .when(r == "Review Not Complete", 4)
        .when(r == "No Eligible Household Members", 5)
        .when(r == "Already Eligible for Program in Different AU", 6)
        .otherwise(7)
    )


def elig_duplicate_probe(raw: DataFrame) -> dict:
    """One-pass analogue of the reference's four COUNT(DISTINCT)
    probes (load_stage.mcaid_elig.R:131-208): total rows plus the
    distinct counts with END_REASON_NAME / HOH_ID / RAC_NAME
    excluded in turn.  Returns the same booleans the R code derives
    (``dup_reason`` etc. true when dropping that column collapses
    rows, i.e. that column is a duplication source)."""
    base = ELIG_DEDUP_KEYS + ["DUALELIGIBLE_INDICATOR"]

    def distinct_over(cols: list[str]) -> Column:
        return F.count_distinct(F.struct(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))

    row = raw.agg(
        F.count(F.lit(1)).alias("rows"),
        distinct_over(base + ["RAC_NAME"]).alias("no_reason"),
        distinct_over(base + ["END_REASON_NAME", "RAC_NAME"]).alias("no_hoh"),
        distinct_over(base + ["END_REASON_NAME"]).alias("no_rac_name"),
    ).collect()[0]
    return {
        "rows": row["rows"],
        "dup_reason": row["no_reason"] != row["rows"],
        "dup_hoh": row["no_hoh"] != row["rows"],
        "dup_rac_name": row["no_rac_name"] != row["rows"],
        "any_dup": min(row["no_reason"], row["no_hoh"], row["no_rac_name"]) != row["rows"],
    }


def geo_hash_raw(
    line1: str = "RSDNTL_ADRS_LINE_1",
    line2: str = "RSDNTL_ADRS_LINE_2",
    city: str = "RSDNTL_CITY_NAME",
    state: str = "RSDNTL_STATE_CODE",
    zip_: str = "RSDNTL_POSTAL_CODE",
) -> Column:
    """sha256 address hash (load_stage.mcaid_elig.R:345-352): pipe-
    joined upper-cased address pieces with an empty filler where the
    reference has no geo_add3_raw.  T-SQL CONCAT treats NULL as '',
    so each piece is coalesced (concat_ws would drop the separator
    instead)."""
    pieces = [F.coalesce(F.col(c), F.lit("")) for c in (line1, line2)]
    pieces.append(F.lit(""))  # geo_add3_raw filler
    pieces += [F.coalesce(F.col(c), F.lit("")) for c in (city, state, zip_)]
    joined = F.concat_ws("|", *pieces)
    return F.sha2(F.upper(joined).cast("binary"), 256)


def dedup_mcaid_elig_raw(raw: DataFrame) -> DataFrame:
    """Reason-score deduplication (load_stage.mcaid_elig.R:210-300).

    1. fix the known RAC_NAME misspelling,
    2. keep only max(reason_score) rows per natural key — the
       reference's null-safe self-join becomes a window max, where
       window partitioning already groups NULL keys together,
    3. DISTINCT the surviving rows (collapses HOH_ID-style pure
       duplicates and rows tied on score).
    """
    fixed = raw.withColumn(
        "RAC_NAME",
        F.when(F.col("RAC_NAME") == _RAC_MISSPELLED, _RAC_CORRECT).otherwise(
            F.col("RAC_NAME")
        ),
    )
    w = Window.partitionBy(*[F.col(k) for k in ELIG_DEDUP_KEYS])
    scored = fixed.withColumn("_score", _reason_score()).withColumn(
        "_max_score", F.max("_score").over(w)
    )
    return (
        scored.filter(F.col("_score") == F.col("_max_score"))
        .drop("_score", "_max_score")
        .distinct()
    )


def build_stage_mcaid_elig(
    raw: DataFrame,
    archive: DataFrame | None = None,
    full_refresh: bool = False,
) -> DataFrame:
    """Stage Medicaid eligibility load (load_stage.mcaid_elig.R).

    Dedups the raw extract (only when the one-pass probe actually
    finds duplicates, mirroring the reference's short-circuit),
    appends ``geo_hash_raw``, upper-cases the Medicaid id, and on an
    incremental refresh unions the archive rows strictly before the
    raw extract's min month (UNION = distinct in the reference SQL).
    """
    probe = elig_duplicate_probe(raw)
    cleaned = dedup_mcaid_elig_raw(raw) if probe["any_dup"] else raw

    cleaned = cleaned.withColumn("geo_hash_raw", geo_hash_raw()).withColumn(
        "MEDICAID_RECIPIENT_ID", F.upper(F.col("MEDICAID_RECIPIENT_ID"))
    )

    if not full_refresh and archive is not None:
        date_truncate = raw.agg(F.min("CLNDR_YEAR_MNTH")).collect()[0][0]
        keep = archive.filter(F.col("CLNDR_YEAR_MNTH") < F.lit(date_truncate))
        keep = keep.withColumn(
            "MEDICAID_RECIPIENT_ID", F.upper(F.col("MEDICAID_RECIPIENT_ID"))
        )
        cleaned = keep.unionByName(
            cleaned.filter(F.col("CLNDR_YEAR_MNTH") >= F.lit(date_truncate)),
            allowMissingColumns=False,
        ).distinct()
    return cleaned


def stage_mcaid_elig_qa(stage: DataFrame) -> dict:
    """Fused stage QA (load_stage.mcaid_elig.R:425-520): row count
    and null-id count in ONE aggregate (the reference runs separate
    COUNT queries)."""
    row = stage.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(
                F.col("MEDICAID_RECIPIENT_ID").isNull()
                | F.col("MBR_H_SID").isNull(),
                1,
            ).otherwise(0)
        ).alias("null_ids"),
    ).collect()[0]
    return {"rows": row["rows"], "null_ids": int(row["null_ids"] or 0)}


# ---------------------------------------------------------------------------
# stage.mcaid_claim
# ---------------------------------------------------------------------------

def build_stage_mcaid_claim(
    raw: DataFrame,
    archive: DataFrame | None = None,
    bho_archive: DataFrame | None = None,
    full_refresh: bool = False,
    date_var: str = "FROM_SRVC_DATE",
) -> DataFrame:
    """Stage Medicaid claim load (load_stage.mcaid_claim.R:100-135).

    Derives ``CLNDR_YEAR_MNTH`` (year*100+month of the service date)
    and ``CLM_LINE`` (int of the last 3 chars of CLM_LINE_TCN),
    upper-cases the recipient id, and takes DISTINCT.  Incremental
    refresh keeps archive rows before the raw min date; full refresh
    unions the BHO archive rows by name instead.
    """
    d = F.col(date_var)
    new = raw.withColumn(
        "CLNDR_YEAR_MNTH",
        (F.year(d) * F.lit(100) + F.month(d)).cast("int"),
    ).withColumn(
        "CLM_LINE", F.substring(F.col("CLM_LINE_TCN"), -3, 3).cast("int")
    ).withColumn(
        "MEDICAID_RECIPIENT_ID", F.upper(F.col("MEDICAID_RECIPIENT_ID"))
    ).distinct()

    if not full_refresh and archive is not None:
        date_truncate = raw.agg(F.min(d)).collect()[0][0]
        keep = archive.filter(F.col(date_var) < F.lit(date_truncate)).withColumn(
            "MEDICAID_RECIPIENT_ID", F.upper(F.col("MEDICAID_RECIPIENT_ID"))
        )
        new = keep.unionByName(
            new.filter(d >= F.lit(date_truncate)),
            allowMissingColumns=False,
        ).distinct()
    elif full_refresh and bho_archive is not None:
        new = new.unionByName(
            bho_archive.withColumn(
                "MEDICAID_RECIPIENT_ID",
                F.upper(F.col("MEDICAID_RECIPIENT_ID")),
            ),
            allowMissingColumns=True,
        ).distinct()
    return new


# ---------------------------------------------------------------------------
# stage.mcare_mbsf
# ---------------------------------------------------------------------------

def mbsf_new_years(raw: DataFrame, stage: DataFrame | None) -> DataFrame:
    """New-year detection (load_stage.mcare_mbsf.r:14-21): a raw
    enrollment year is loaded only when its (year, row-count) pair is
    absent from the stage table.  Year-grain aggregates are tiny —
    the anti join is broadcast."""
    raw_counts = raw.groupBy("bene_enrollmt_ref_yr").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if stage is None:
        return raw_counts.select("bene_enrollmt_ref_yr")
    stage_counts = stage.groupBy("bene_enrollmt_ref_yr").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return raw_counts.join(
        F.broadcast(stage_counts),
        on=["bene_enrollmt_ref_yr", "cnt"],
        how="left_anti",
    ).select("bene_enrollmt_ref_yr")


def _apply_types(df: DataFrame, type_map: dict[str, str]) -> DataFrame:
    casts = []
    for c in df.columns:
        t = (type_map.get(c) or "").lower()
        if "char" in t:
            casts.append(F.col(c).cast("string").alias(c))
        elif "int" in t:
            casts.append(F.col(c).cast("int").alias(c))
        elif "date" in t:
            casts.append(F.col(c).cast("date").alias(c))
        else:
            casts.append(F.col(c))
    return df.select(*casts)


def mbsf_duplicate_rows(combined: DataFrame) -> DataFrame:
    """Case-insensitive duplicate gate (load_stage.mcare_mbsf.r:
    67-77): rows whose full column set — with bene_id lower-cased —
    appears more than once.  One window count over the composite key;
    returns the offending rows (the reference stops the load and
    demands manual review when any exist)."""
    by_cols = [c for c in combined.columns if c != "bene_id"]
    key = [F.lower(F.col("bene_id")).alias("_id_lc")] + [F.col(c) for c in by_cols]
    w = Window.partitionBy(*key)
    return (
        combined.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") > 1)
        .drop("_n")
    )


def build_stage_mcare_mbsf(
    raw_ab: DataFrame,
    raw_abcd: DataFrame,
    stage: DataFrame | None = None,
    rename_ab: dict[str, str] | None = None,
    type_map: dict[str, str] | None = None,
    allow_duplicates: bool = False,
) -> DataFrame:
    """Stage MBSF load (load_stage.mcare_mbsf.r): returns the NEW
    rows to append to stage (the reference appends, never rewrites).

    * only years whose (year, count) is not already staged,
    * DISTINCT within each raw source,
    * ab: zip '999999999' -> NULL then first 5 chars; abcd: zip
      '99999' -> NULL then zero-padded to 5,
    * ab columns renamed to the abcd vocabulary, both typed per the
      declared schema, bound by name with missing columns null,
    * case-insensitive duplicate gate (raises unless
      ``allow_duplicates``).
    """
    ab_years = mbsf_new_years(raw_ab, stage)
    abcd_years = mbsf_new_years(raw_abcd, stage)

    ab = raw_ab.join(F.broadcast(ab_years), "bene_enrollmt_ref_yr").distinct()
    abcd = (
        raw_abcd.join(F.broadcast(abcd_years), "bene_enrollmt_ref_yr")
        .drop("data_year")
        .distinct()
    )

    for old, new in (rename_ab or {}).items():
        if old in ab.columns:
            ab = ab.withColumnRenamed(old, new)
    ab = ab.withColumn(
        "zip_cd",
        F.substring(
            F.when(F.col("zip_cd") == "999999999", None).otherwise(
                F.col("zip_cd")
            ),
            1,
            5,
        ),
    )
    abcd = abcd.withColumn(
        "zip_cd",
        F.lpad(
            F.when(F.col("zip_cd") == "99999", None)
            .otherwise(F.col("zip_cd"))
            .cast("int")
            .cast("string"),
            5,
            "0",
        ),
    )
    if type_map:
        ab = _apply_types(ab, type_map)
        abcd = _apply_types(abcd, type_map)

    combined = abcd.unionByName(ab, allowMissingColumns=True)

    if not allow_duplicates:
        n_dup = mbsf_duplicate_rows(combined).limit(1).count()
        if n_dup:
            raise ValueError(
                "stage_mcare_mbsf: case-insensitive duplicate rows found; "
                "review mbsf_duplicate_rows() output"
            )
    return combined.withColumn("last_run", F.current_timestamp())


# ---------------------------------------------------------------------------
# stage.mcaid_perf_elig_member_month / _distinct_member
# ---------------------------------------------------------------------------

# MC_PRVDR_NAME -> plan abbreviation (load_stage.mcaid_perf_elig_member_month.R:30-37)
_MC_PLAN_ABBREV = {
    "Amerigroup Washington Inc": "AGP",
    "Community Health Plan of Washington": "CHP",
    "Coordinated Care Corporation": "CCW",
    "Coordinated Care of Washington": "CCW",
    "Molina Healthcare of Washington Inc": "MHW",
    "United Health Care Community Plan": "UHC",
}


def build_perf_elig_member_month(
    elig: DataFrame, ref_zip: DataFrame
) -> DataFrame:
    """Perf member-month staging (load_stage.mcaid_perf_elig_member_
    month.R): managed-care plan abbreviation, King-county WA zip
    filter (broadcast ref join), then one row per (member, month)
    keeping the longest FROM_DATE..TO_DATE span."""
    mc = F.col("MC_PRVDR_NAME")
    abbrev = F.lit(None).cast("string")
    for name, short in _MC_PLAN_ABBREV.items():
        abbrev = F.when(mc == name, short).otherwise(abbrev)
    proj = elig.select(
        F.col("CLNDR_YEAR_MNTH").cast("int").alias("CLNDR_YEAR_MNTH"),
        "MEDICAID_RECIPIENT_ID",
        "RPRTBL_RAC_CODE",
        "FROM_DATE",
        "TO_DATE",
        "COVERAGE_TYPE_IND",
        F.when(F.col("COVERAGE_TYPE_IND") == "MC", abbrev)
        .otherwise(F.lit(None))
        .alias("MC_PRVDR_NAME"),
        "DUAL_ELIG",
        "TPL_FULL_FLAG",
        "RSDNTL_POSTAL_CODE",
    )
    king_zips = ref_zip.filter(
        (F.col("state") == "WA") & (F.col("county_name") == "King")
    ).select(F.col("zip_code").alias("RSDNTL_POSTAL_CODE"))
    in_king = proj.join(F.broadcast(king_zips), "RSDNTL_POSTAL_CODE")
    w = Window.partitionBy("MEDICAID_RECIPIENT_ID", "CLNDR_YEAR_MNTH").orderBy(
        F.datediff(F.col("TO_DATE"), F.col("FROM_DATE")).desc(),
        # deterministic residual ordering (T-SQL ROW_NUMBER ties are
        # arbitrary; pin them so reruns are stable)
        F.col("RPRTBL_RAC_CODE"),
        F.col("FROM_DATE"),
    )
    return (
        in_king.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("load_date", F.current_date())
    )


def build_perf_distinct_member(enroll_denom: DataFrame) -> DataFrame:
    """load_stage.mcaid_perf_distinct_member.R: distinct member ids
    from the enroll denominator."""
    return (
        enroll_denom.select("id_mcaid")
        .distinct()
        .withColumn("load_date", F.current_date())
    )
