"""Medicare identity-crosswalk staging (reference:
``claims_db/phclaims/stage/tables/load_stage.mcare_xwalk_bene_ssn.R``
and ``load_stage.mcare_xwalk_edb_user_view.R``).

Both reference scripts pull the whole raw table into R data.tables;
here each is one window pass:

* bene_ssn: DISTINCT, then first row per ``bene_id`` ordered by
  (source, ssn) (:16-18).
* edb_user_view: DISTINCT + blank-to-null cleaning, middle-initial
  forward fill through the years (:24-27 — newer records inherit the
  most recent prior non-null initial), then the max-``source`` row
  per ``bene_id``.  The R script branches exact-duplicate ids from
  name-changing ids, but the branches converge: for exact duplicates
  the forward fill is a no-op (the initial is constant within the
  id), so one unified fill-then-latest window pass reproduces both.

QA contract (:19-20, 29-30): one row per bene_id, and as many rows
as distinct raw ids — exposed via :func:`xwalk_qa`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _clean_str(c: str) -> F.Column:
    """rads::sql_clean analogue: trim, empty-string -> null."""
    t = F.trim(F.col(c))
    return F.when(t == "", None).otherwise(t).alias(c)


def build_mcare_xwalk_bene_ssn(raw: DataFrame) -> DataFrame:
    """One (bene_id, ssn) row per beneficiary: lowest source wins,
    ssn as residual tiebreak (load_stage.mcare_xwalk_bene_ssn.R:16-18)."""
    distinct = raw.select(
        _clean_str("bene_id"), _clean_str("ssn"), F.col("source").cast("int")
    ).distinct()
    w = Window.partitionBy("bene_id").orderBy("source", "ssn")
    return (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("bene_id", "ssn")
        .withColumn("last_run", F.current_timestamp())
    )


def build_mcare_xwalk_edb(raw: DataFrame) -> DataFrame:
    """One name row per beneficiary from the yearly EDB extracts
    (load_stage.mcare_xwalk_edb_user_view.R:17-28)."""
    distinct = raw.select(
        _clean_str("bene_id"),
        _clean_str("bene_srnm_name"),
        _clean_str("bene_gvn_name"),
        _clean_str("bene_mdl_name"),
        _clean_str("crnt_rec_ind"),
        F.col("source").cast("int"),
    ).distinct()
    # forward fill the middle initial from older to newer extracts
    fill_w = (
        Window.partitionBy("bene_id")
        .orderBy("source", "bene_srnm_name", "bene_gvn_name")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = distinct.withColumn(
        "bene_mdl_name", F.last("bene_mdl_name", ignorenulls=True).over(fill_w)
    )
    latest_w = Window.partitionBy("bene_id").orderBy(
        F.col("source").desc(),
        "bene_srnm_name",
        "bene_gvn_name",
        "crnt_rec_ind",
    )
    return (
        filled.withColumn("_rn", F.row_number().over(latest_w))
        .filter(F.col("_rn") == 1)
        .select(
            "bene_srnm_name",
            "bene_gvn_name",
            "bene_mdl_name",
            "crnt_rec_ind",
            "bene_id",
        )
        .withColumn("last_run", F.current_timestamp())
    )


def xwalk_qa(raw: DataFrame, staged: DataFrame) -> dict:
    """Distinct-id parity + per-id uniqueness (both scripts' stop()
    gates) as two tiny aggregates."""
    raw_ids = raw.select(F.trim(F.col("bene_id")).alias("b")).distinct().count()
    stage_rows = staged.count()
    stage_ids = staged.select("bene_id").distinct().count()
    return {
        "raw_distinct_ids": raw_ids,
        "stage_rows": stage_rows,
        "unique_per_id": stage_rows == stage_ids,
        "id_parity": raw_ids == stage_rows,
    }
