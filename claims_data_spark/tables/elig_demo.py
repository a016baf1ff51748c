"""Person demographics table (reference:
``load_stage.mcaid_elig_demo.R`` — mode-with-recency DOB, ever/percent
gender & race rollups, language mode with pinned tiebreak).

One shuffle on the member id; every rollup is a conditional aggregate
over the same grouped pass, with the two mode selections (DOB,
language) running on the much smaller (id × value) aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.operators.mode import deterministic_tiebreak, mode_value

RACE_NULL_VALUES = ("NOT PROVIDED", "OTHER")


def build_elig_demo(raw_elig: DataFrame) -> DataFrame:
    """raw member-month rows -> one row per member.

    Columns: id_mcaid, dob, gender_me ('Female'/'Male'/'Multiple'),
    gender_female_t/gender_male_t (percent of months), race_* ever
    flags with NOT PROVIDED/OTHER nulled
    (``load_stage.mcaid_elig_demo.R:124-144``), lang_max (modal
    language across spoken+written with deterministic tiebreak,
    ``:443-478``).
    """
    e = raw_elig.select(
        F.col("MBR_H_SID").alias("id_mcaid"),
        F.col("CLNDR_YEAR_MNTH").alias("ym"),
        F.col("BIRTH_DATE").alias("dob_raw"),
        F.upper("GENDER").alias("gender"),
        *[
            F.when(
                F.upper(F.col(c)).isin(*RACE_NULL_VALUES), F.lit(None)
            ).otherwise(F.upper(F.col(c))).alias(c.lower())
            for c in ("RACE1_NAME", "RACE2_NAME")
        ],
        F.upper("SPOKEN_LNG_NAME").alias("lang_spoken"),
        F.upper("WRTN_LNG_NAME").alias("lang_written"),
    )

    # A4: DOB mode, ties broken by most-recent month then earliest DOB
    # (load_stage.mcaid_elig_demo.R:93-118)
    dob_votes = (
        e.filter(F.col("dob_raw").isNotNull())
        .groupBy("id_mcaid", "dob_raw")
        .agg(F.count(F.lit(1)).alias("dob_cnt"), F.max("ym").alias("max_ym"))
    )
    w = Window.partitionBy("id_mcaid").orderBy(
        F.col("dob_cnt").desc(), F.col("max_ym").desc(), F.col("dob_raw").asc()
    )
    dob = (
        dob_votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id_mcaid", F.col("dob_raw").alias("dob"))
    )

    # A7/A8: gender percentages + Multiple detection
    gender = e.groupBy("id_mcaid").agg(
        F.round(
            F.sum(F.when(F.col("gender") == "FEMALE", 1).otherwise(0))
            * 100.0
            / F.count(F.lit(1)),
            1,
        ).alias("gender_female_t"),
        F.round(
            F.sum(F.when(F.col("gender") == "MALE", 1).otherwise(0))
            * 100.0
            / F.count(F.lit(1)),
            1,
        ).alias("gender_male_t"),
        F.max(F.when(F.col("gender") == "FEMALE", 1).otherwise(0)).alias("_ever_f"),
        F.max(F.when(F.col("gender") == "MALE", 1).otherwise(0)).alias("_ever_m"),
        # every race flag scans BOTH race columns — the reference
        # matches against the concatenation of all race fields
        # (load_stage.mcaid_elig_demo.R:235-238)
        *[
            F.max(
                F.when(
                    (F.col("race1_name") == race) | (F.col("race2_name") == race), 1
                ).otherwise(0)
            ).alias(f"race_{race.lower()}")
            for race in ("WHITE", "BLACK", "ASIAN")
        ],
    ).withColumn(
        "gender_me",
        F.when((F.col("_ever_f") == 1) & (F.col("_ever_m") == 1), "Multiple")
        .when(F.col("_ever_f") == 1, "Female")
        .when(F.col("_ever_m") == 1, "Male"),
    ).drop("_ever_f", "_ever_m")

    # A6: language mode over stacked spoken+written, deterministic
    # stand-in for the reference's NEWID() tiebreak
    langs = (
        e.select("id_mcaid", F.col("lang_spoken").alias("lang"))
        .unionByName(e.select("id_mcaid", F.col("lang_written").alias("lang")))
        .filter(F.col("lang").isNotNull())
    )
    lang_max = mode_value(
        langs,
        ["id_mcaid"],
        "lang",
        tiebreak=deterministic_tiebreak("id_mcaid", "lang"),
        out_col="lang_max",
    )

    return (
        e.select("id_mcaid").distinct()
        .join(dob, "id_mcaid", "left")
        .join(gender, "id_mcaid", "left")
        .join(lang_max, "id_mcaid", "left")
    )
