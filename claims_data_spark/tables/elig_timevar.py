"""Person-interval eligibility timeline (reference:
``load_stage.mcaid_elig_timevar.R:56-520`` — the 9-temp-table, ~80 min
pipeline re-expressed as one lazy DAG over a single id-partitioned
shuffle).

Stages (reference step -> here):
1. member-month dedup with the dual-indicator priority rule (P6) and
   secondary-RAC drop (P7)
2. month bounds from CLNDR_YEAR_MNTH, clipped to sub-month RAC spans
   where present (W9)
3. islands over contiguous months with constant covariates (W2),
   1-day adjacency
4. covariate enrichment: RAC full_benefit, address -> geo columns
5. cov_time_day + contiguous flag
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import yyyymm_to_date
from claims_data_spark.operators.intervals import collapse_islands

COVARIATES = [
    "rac_code", "bsp_group_cid", "cov_type", "mco_id", "dual",
    "health_home", "geo_hash_raw",
]


def build_elig_timevar(
    raw_elig: DataFrame,
    ref_rac: DataFrame | None = None,
    ref_address: DataFrame | None = None,
    ref_geocode: DataFrame | None = None,
) -> DataFrame:
    """raw member-month rows -> one row per member × contiguous period
    of constant covariates, closed [from_date, to_date]."""
    e = raw_elig.select(
        F.col("MBR_H_SID").alias("id_mcaid"),
        F.col("CLNDR_YEAR_MNTH").alias("ym"),
        F.col("RAC_CODE").alias("rac_code"),
        F.col("RPRTBL_BSP_GROUP_CID").alias("bsp_group_cid"),
        F.col("RAC_FROM_DATE").alias("rac_from"),
        F.col("RAC_TO_DATE").alias("rac_to"),
        F.col("COVERAGE_TYPE_IND").alias("cov_type"),
        F.col("MC_PRVDR_ID").alias("mco_id"),
        F.col("DUALELIGIBLE_INDICATOR").alias("dual_raw"),
        F.col("HEALTH_HOME_CLINICAL_INDICATOR").alias("health_home"),
        F.col("geo_hash_raw"),
    )

    # P6: collapse duplicate rows WITHIN each full covariate tuple;
    # conflicting dual values take MIN unless the min is 'N/A', then
    # MAX. The reference applies the rule inside its GROUP BY over all
    # covariates (load_stage.mcaid_elig_timevar.R:96-108 step 1a), so
    # a dual value never leaks across rows that differ in RAC/MCO/etc.
    group_cols = [c for c in e.columns if c != "dual_raw"]
    e = e.groupBy(*group_cols).agg(
        F.when(F.min("dual_raw") == "N/A", F.max("dual_raw"))
        .otherwise(F.min("dual_raw"))
        .alias("dual")
    )

    # full_benefit is a member-MONTH property: MAX over ALL RAC rows
    # before the secondary-RAC drop (reference steps 1b/2c compute
    # MAX(full_benefit) across the month's RACs, so a full-benefit
    # secondary RAC still marks the month)
    fb_month = None
    if ref_rac is not None:
        fb_month = (
            e.join(
                F.broadcast(ref_rac.select("rac_code", "full_benefit")),
                "rac_code",
                "left",
            )
            .groupBy("id_mcaid", "ym")
            .agg(F.max("full_benefit").alias("full_benefit"))
        )

    # P7: drop secondary RAC rows — keep lowest rac_code per
    # member-month (load_stage.mcaid_elig_timevar.R:142-166); the
    # remaining covariates break rac_code ties deterministically so
    # the survivor is stable across runs and partitionings
    tiebreak = [c for c in group_cols if c not in ("id_mcaid", "ym", "rac_code")]
    w_rac = Window.partitionBy("id_mcaid", "ym").orderBy("rac_code", *tiebreak)
    e = (
        e.withColumn("_rn", F.row_number().over(w_rac))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if fb_month is not None:
        e = e.join(fb_month, ["id_mcaid", "ym"], "left")

    # month bounds (step 2a) clipped to sub-month RAC spans (step 2b, W9)
    month_start = yyyymm_to_date("ym")
    month_end = F.last_day(month_start)
    e = e.withColumn(
        "from_date",
        F.when(
            F.col("rac_from").isNotNull() & (F.col("rac_from") > month_start),
            F.col("rac_from"),
        ).otherwise(month_start),
    ).withColumn(
        "to_date",
        F.when(
            F.col("rac_to").isNotNull() & (F.col("rac_to") < month_end),
            F.col("rac_to"),
        ).otherwise(month_end),
    )

    # steps 3a-4a: islands of contiguous months with constant
    # covariates; full_benefit (month-level, step 2c) is itself a
    # covariate — a benefit-level change splits the island
    island_groups = COVARIATES + (
        ["full_benefit"] if fb_month is not None else []
    )
    islands = collapse_islands(
        e,
        ["id_mcaid"],
        "from_date",
        "to_date",
        group_cols=island_groups,
        max_gap_days=1,
    ).withColumnRenamed("island_days", "cov_time_day").drop("n_segments")

    # contiguous flag: gap to previous segment exactly 1 day
    # (load_stage.mcaid_elig_timevar.R:461-463)
    w = Window.partitionBy("id_mcaid").orderBy("from_date")
    out = islands.withColumn(
        "contiguous",
        (
            F.datediff(F.col("from_date"), F.lag("to_date").over(w)) == 1
        ).cast("int"),
    )

    # step 5b: address -> geo columns
    if ref_address is not None:
        addr = ref_address.select(
            "geo_hash_raw", "geo_zip_clean", "geo_hash_geocode"
        )
        out = out.join(F.broadcast(addr), "geo_hash_raw", "left")
        if ref_geocode is not None:
            geo = ref_geocode.select("geo_hash_geocode", "geo_id20_county")
            out = out.join(F.broadcast(geo), "geo_hash_geocode", "left")
            out = out.withColumn(
                "geo_kc", F.col("geo_id20_county").isin("033", "53033").cast("int")
            )
    return out
