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

# alone-or-in-combination race patterns over the concatenated race
# fields (load_stage.mcaid_elig_demo.R:232-245); latino comes from the
# hispanic field alone
RACE_PATTERNS = {
    "aian": ["ALASKAN_NATIVE", "AMERICAN INDIAN"],
    "black": ["BLACK"],
    "asian": ["ASIAN"],
    "nhpi": ["HAWAIIAN", "PACIFIC ISLANDER"],
    "white": ["WHITE"],
}

# King County tier-1/2 translation languages (``:374-395``)
LANG_PATTERNS = {
    "english": ["ENGLISH"],
    "spanish": ["SPANISH", "CASTILIAN"],
    "vietnamese": ["VIETNAMESE"],
    "chinese": ["CHINESE", "HAKKA", "MANDARIN", "CANTONESE"],
    "somali": ["SOMALI"],
    "russian": ["RUSSIAN"],
    "arabic": ["ARABIC"],
    "korean": ["KOREAN"],
    "ukrainian": ["UKRAINIAN"],
    "amharic": ["AMHARIC"],
}


def _contains_any(col: F.Column, patterns: list[str]) -> F.Column:
    cond = col.contains(patterns[0])
    for p in patterns[1:]:
        cond = cond | col.contains(p)
    return cond


def _race_cascade(flags: dict[str, F.Column], with_latino: bool) -> F.Column:
    """The reference's mutually-exclusive race CASE cascade
    (``:270-285``): Multiple when >1 flag, else fixed precedence."""
    keys = ["aian", "asian", "black", "nhpi", "white"]
    total = sum(F.coalesce(flags[k], F.lit(0)) for k in keys)
    if with_latino:
        total = total + F.coalesce(flags["latino"], F.lit(0))
    out = F.when(total > 1, "Multiple")
    labels = {
        "aian": "AI/AN", "asian": "Asian", "black": "Black",
        "nhpi": "NH/PI", "white": "White",
    }
    for k in keys:
        out = out.when(flags[k] == 1, labels[k])
    if with_latino:
        out = out.when(flags["latino"] == 1, "Latino")
    return out.otherwise("Unknown")


def build_elig_demo(raw_elig: DataFrame) -> DataFrame:
    """raw member-month rows -> one row per member.

    Columns: id_mcaid, dob, gender_me ('Female'/'Male'/'Multiple'),
    gender_female/gender_male ever flags (``:190-191`` — the columns
    the ``claims_elig`` ``female``/``male`` params filter,
    ``R/claims_elig.R:456-459``), gender_recent (latest month's
    cascade incl. 'Unknown', ``:174-177``),
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
        F.upper("HISPANIC_ORIGIN_NAME").alias("hispanic"),
        F.upper("SPOKEN_LNG_NAME").alias("lang_spoken"),
        F.upper("WRTN_LNG_NAME").alias("lang_written"),
    )
    # concatenated alone-or-in-combination fields (``:226-231``); NULL
    # when every contributing column is NULL so the _t denominators
    # count only informative rows
    e = e.withColumn(
        "race_all",
        F.when(
            F.col("race1_name").isNotNull() | F.col("race2_name").isNotNull(),
            F.concat_ws("|", "race1_name", "race2_name"),
        ),
    ).withColumn(
        "lang_all",
        F.when(
            F.col("lang_spoken").isNotNull() | F.col("lang_written").isNotNull(),
            F.concat_ws("|", "lang_spoken", "lang_written"),
        ),
    )
    for k, pats in RACE_PATTERNS.items():
        e = e.withColumn(
            f"race_{k}",
            F.when(
                F.col("race_all").isNotNull(),
                _contains_any(F.col("race_all"), pats).cast("int"),
            ),
        )
    e = e.withColumn(
        "race_latino",
        F.when(
            F.col("hispanic").isNotNull(),
            F.col("hispanic").startswith("HISPANIC").cast("int"),
        ),
    )
    for k, pats in LANG_PATTERNS.items():
        e = e.withColumn(
            f"lang_{k}",
            F.when(
                F.col("lang_all").isNotNull(),
                _contains_any(F.col("lang_all"), pats).cast("int"),
            ),
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
        # ever flags are OUTPUT columns (gender_female/gender_male,
        # ``:190-191``) — the ones claims_elig's female/male params
        # filter (R/claims_elig.R:456-459)
        F.max(F.when(F.col("gender") == "FEMALE", 1).otherwise(0)).alias(
            "gender_female"
        ),
        F.max(F.when(F.col("gender") == "MALE", 1).otherwise(0)).alias(
            "gender_male"
        ),
        # latest month's flags for gender_recent (``:174-177``)
        F.max(
            F.struct(
                F.col("ym"),
                F.when(F.col("gender") == "FEMALE", 1).otherwise(0).alias("_f"),
                F.when(F.col("gender") == "MALE", 1).otherwise(0).alias("_m"),
            )
        ).alias("_grecent"),
        # ever flags + person-time percentages for every race/language
        # variable in ONE pass: max() and sum()/count() both ignore the
        # NULL months (all inputs missing), matching the reference's
        # COUNT(flag) denominators (``:252-262,399-410``)
        *[
            x
            for k in [*RACE_PATTERNS, "latino"]
            for x in (
                F.max(f"race_{k}").alias(f"race_{k}"),
                F.round(
                    F.sum(f"race_{k}") * 100.0 / F.count(f"race_{k}"), 1
                ).alias(f"race_{k}_t"),
            )
        ],
        *[
            x
            for k in LANG_PATTERNS
            for x in (
                F.max(f"lang_{k}").alias(f"lang_{k}"),
                F.round(
                    F.sum(f"lang_{k}") * 100.0 / F.count(f"lang_{k}"), 1
                ).alias(f"lang_{k}_t"),
            )
        ],
        # most-recent month's flags for race_recent (``:266-287``):
        # max of (ym, flags...) structs picks the latest month's row
        F.max(
            F.struct(
                F.col("ym"),
                *[F.col(f"race_{k}").alias(f"race_{k}") for k in RACE_PATTERNS],
                F.col("race_latino").alias("race_latino"),
            )
        ).alias("_recent"),
    ).withColumn(
        "gender_me",
        F.when(
            (F.col("gender_female") == 1) & (F.col("gender_male") == 1),
            "Multiple",
        )
        .when(F.col("gender_female") == 1, "Female")
        .when(F.col("gender_male") == 1, "Male"),
    ).withColumn(
        "gender_recent",
        F.when(
            (F.col("_grecent._f") == 1) & (F.col("_grecent._m") == 1),
            "Multiple",
        )
        .when(F.col("_grecent._f") == 1, "Female")
        .when(F.col("_grecent._m") == 1, "Male")
        .otherwise("Unknown"),
    ).drop("_grecent")

    ever = {k: F.col(f"race_{k}") for k in [*RACE_PATTERNS, "latino"]}
    recent = {
        k: F.col(f"_recent.race_{k}") for k in [*RACE_PATTERNS, "latino"]
    }
    race_sum = sum(F.coalesce(ever[k], F.lit(0)) for k in RACE_PATTERNS)
    gender = (
        gender.withColumn("race_me", _race_cascade(ever, with_latino=False))
        .withColumn("race_eth_me", _race_cascade(ever, with_latino=True))
        .withColumn("race_recent", _race_cascade(recent, with_latino=False))
        .withColumn("race_eth_recent", _race_cascade(recent, with_latino=True))
        .withColumn("race_unk", (race_sum == 0).cast("int"))
        .withColumn(
            "race_eth_unk",
            ((race_sum + F.coalesce(ever["latino"], F.lit(0))) == 0).cast("int"),
        )
        .drop("_recent")
    )

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
