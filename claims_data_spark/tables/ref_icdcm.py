"""ref.icdcm_codes assembly (reference:
``claims_db/phclaims/ref/tables/load_ref.icdcm_codes.R``).

The reference stitches external spreadsheets (ICD-9/10-CM code
descriptions, the CDC external-cause-of-injury matrix, the CCW
lookup, CCS classifications) into one diagnosis reference table.
The spreadsheets are data; the portable LOGIC is:

* **hierarchical prefix fallback** for the ICD-10 injury matrix
  (:40-95): attach intent/mechanism by exact code, else by the
  6-char prefix when that prefix maps to exactly ONE matrix row,
  else by the unique 5-char prefix.  Expressed as three broadcast
  joins against pre-deduplicated prefix maps with coalesce cascade —
  never a row explosion, because ambiguous prefixes are dropped from
  the maps up front (the R code's ``cnt == 1`` filters).
* **CCW flag widening** (:97-115): the long (dx, ccw_abbrev) lookup
  pivots to ``ccw_*`` indicator columns, with the reference's QA
  gate that every dx carries at least one flag.
* **classification attach**: CCS broad/detail labels are a broadcast
  map join; the reference's ~200-line case_when description
  harmonization is input data here (callers pass the mapping table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EXT_COLS = ["intent", "mechanism", "mechanism_full"]


def _unique_prefix_map(ext_cause: DataFrame, n: int) -> DataFrame:
    """Prefix -> matrix row, keeping only prefixes with exactly one
    matrix row (load_ref.icdcm_codes.R:44-55)."""
    pref = ext_cause.select(
        F.substring("code", 1, n).alias("prefix"), *_EXT_COLS
    )
    counts = pref.groupBy("prefix").agg(F.count(F.lit(1)).alias("_n"))
    return (
        pref.join(counts.filter(F.col("_n") == 1).select("prefix"), "prefix")
        .distinct()
    )


def attach_external_cause(
    codes: DataFrame,
    ext_cause: DataFrame,
    code_col: str = "icdcode",
) -> DataFrame:
    """Intent/mechanism attach with exact -> 6-char -> 5-char unique
    prefix fallback (:70-95).  All three maps broadcast."""
    exact = ext_cause.select(
        F.col("code").alias(code_col),
        *[F.col(c).alias(f"_e_{c}") for c in _EXT_COLS],
    ).distinct()
    p6 = _unique_prefix_map(ext_cause, 6).select(
        F.col("prefix").alias("_p6"),
        *[F.col(c).alias(f"_6_{c}") for c in _EXT_COLS],
    )
    p5 = _unique_prefix_map(ext_cause, 5).select(
        F.col("prefix").alias("_p5"),
        *[F.col(c).alias(f"_5_{c}") for c in _EXT_COLS],
    )
    out = (
        codes.withColumn("_p6", F.substring(code_col, 1, 6))
        .withColumn("_p5", F.substring(code_col, 1, 5))
        .join(F.broadcast(exact), code_col, "left")
        .join(F.broadcast(p6), "_p6", "left")
        .join(F.broadcast(p5), "_p5", "left")
    )
    for c in _EXT_COLS:
        out = out.withColumn(
            c,
            F.coalesce(
                F.col(f"_e_{c}"), F.col(f"_6_{c}"), F.col(f"_5_{c}")
            ),
        )
    drop = (
        ["_p6", "_p5"]
        + [f"_e_{c}" for c in _EXT_COLS]
        + [f"_6_{c}" for c in _EXT_COLS]
        + [f"_5_{c}" for c in _EXT_COLS]
    )
    return out.drop(*drop)


def widen_ccw_lookup(ccw_long: DataFrame) -> DataFrame:
    """Long (dx, ver, ccw_abbrev) -> wide ccw_* indicator columns
    (:97-112).  Raises when a dx row carries no flag at all — the
    reference's stop() QA gate."""
    wide = (
        ccw_long.groupBy("dx", "ver")
        .pivot("ccw_abbrev")
        .agg(F.lit(1))
    )
    flag_cols = [c for c in wide.columns if c not in ("dx", "ver")]
    renamed = wide.select(
        "dx", "ver", *[F.col(c).alias(f"ccw_{c}") for c in flag_cols]
    )
    none_set = renamed.filter(
        sum(F.coalesce(F.col(f"ccw_{c}"), F.lit(0)) for c in flag_cols) == 0
    ).limit(1).count()
    if none_set:
        raise ValueError(
            "Some DX codes in the CCW table are not associated with any "
            "CCW condition"
        )
    return renamed


def build_ref_icdcm_codes(
    codes: DataFrame,
    ext_cause: DataFrame,
    ccw_long: DataFrame,
    ccs_map: DataFrame | None = None,
) -> DataFrame:
    """Compose the diagnosis reference: descriptions + injury matrix
    (exact-only for ICD-9 :38-39, hierarchical for ICD-10) + CCW
    flags (+ optional CCS classification broadcast map)."""
    v9 = codes.filter(F.col("ver") == 9)
    v10 = codes.filter(F.col("ver") == 10)

    ext9 = ext_cause.filter(F.col("version") == 9)
    ext10 = ext_cause.filter(F.col("version") == 10)

    exact9 = ext9.select(
        F.col("code").alias("icdcode"), *_EXT_COLS
    ).distinct()
    v9 = v9.join(F.broadcast(exact9), "icdcode", "left")
    v10 = attach_external_cause(v10, ext10)

    out = v9.unionByName(v10, allowMissingColumns=True)
    ccw = widen_ccw_lookup(ccw_long).withColumnRenamed("dx", "icdcode")
    out = out.join(F.broadcast(ccw), ["icdcode", "ver"], "left")
    if ccs_map is not None:
        out = out.join(F.broadcast(ccs_map), "icdcode", "left")
    return out


# ---------------------------------------------------------------------------
# CMS order-file ingestion (ref/tables/combine_icdcm_codes.R:11-56):
# annual icd10cm_order_YYYY.txt releases are FIXED-WIDTH — code in
# chars 7-12, short description in 17-77 — bound across vintages and
# deduped against the historical ICD-9/10 complete table.
# ---------------------------------------------------------------------------

def parse_cms_icd10_order(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse one CMS icd10cm_order release read as raw text lines
    (``spark.read.text``): substring the fixed-width layout, trim, tag
    version 10 (``combine_icdcm_codes.R:14-18``). Pure codegen —
    substring + trim on the line scan."""
    return lines.select(
        F.trim(F.substring(F.col(value_col), 7, 6)).alias("icdcode"),
        F.trim(F.substring(F.col(value_col), 17, 61)).alias("dx_description"),
        F.lit(10).cast("int").alias("ver"),
    ).filter(F.col("icdcode") != "")


def combine_icdcm_vintages(
    existing: DataFrame, new_releases: list[DataFrame]
) -> DataFrame:
    """Bind the historical complete table with the new per-year
    releases and keep ONE row per (icdcode, ver) — the reference's
    ``distinct(..., .keep_all=TRUE)`` keeps the first occurrence, i.e.
    the OLDEST vintage wins, so descriptions are stable across reloads
    (``:47-56``). Deterministic via a priority rank instead of
    row-order luck: existing=0, then releases in list order."""
    from pyspark.sql import Window

    parts = [existing.withColumn("_prio", F.lit(0))]
    for i, r in enumerate(new_releases, start=1):
        parts.append(r.withColumn("_prio", F.lit(i)))
    allv = parts[0]
    for p in parts[1:]:
        allv = allv.unionByName(p, allowMissingColumns=True)
    w = Window.partitionBy("icdcode", "ver").orderBy("_prio")
    return (
        allv.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )
