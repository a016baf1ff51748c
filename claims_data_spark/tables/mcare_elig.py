"""Medicare eligibility tables from the MBSF bene_enrollment file
(reference: ``load_stage.mcare_elig_demo.R:14-249`` and
``load_stage.mcare_elig_timevar.R:13-383``).

Spark-first restructuring, same semantics:

- ``elig_demo``: the reference materializes six temp tables (dob /
  dod / kc_ever / sex / race), each its own groupBy + rank + self
  join, then a 6-way left join. Every one of those shuffles on
  ``bene_id`` — here it's ONE groupBy(bene_id) pass computing every
  concept with conditional aggregates and ``max_by`` (recent-year
  pick), after a broadcast join to the ZIP reference. One shuffle
  instead of ~12.

- ``elig_timevar``: the reference unpivots the 12-month indicator
  columns four times (buy-in / HMO / Part-D contract / dual code) and
  re-joins the four long tables on (bene, year, month) — three
  avoidable shuffles. Here one projection builds an array of 12
  structs carrying ALL four indicators and explodes once: narrow,
  codegen, zero joins. The island collapse reuses the engine's
  gaps-and-islands operator (one window pass, not the reference's
  5-step lag/row_number/spread/min-max idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from claims_data_spark.operators.intervals import collapse_islands


def _sql_list(vals) -> str:
    return ", ".join("'" + v.replace("'", "''") + "'" for v in vals)


# ResDAC code tables (load_stage.mcare_elig_timevar.R:130-177)
_PART_A_YES = ("1", "3", "A", "C")
_PART_A_NO = ("0", "2", "B")
_PART_B_YES = ("2", "3", "B", "C")
_PART_B_NO = ("0", "1", "A")
_PART_C_YES = ("1", "2", "A", "B", "C")
_PART_C_NO = ("0", "4")
_STATE_BUYIN_YES = ("A", "B", "C")
_STATE_BUYIN_NO = ("0", "1", "2", "3")
_RX_NONE = ("N", "NULL", "*", "0", "NA")
_RX_PREFIX = ("E", "H", "R", "S", "X")
_PARTIAL_DUAL_YES = ("1", "01", "3", "03", "5", "05", "6", "06")
_FULL_DUAL_YES = ("2", "02", "4", "04", "8", "08", "10")
_DUAL_NONE = ("NULL", "**", "0", "00", "9", "09", "99", "NA")

TIMEVAR_ATTR_COLS = [
    "geo_zip", "part_a", "part_b", "part_c", "part_d",
    "state_buyin", "partial_dual", "full_dual",
]


def _zip5(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) >= 5, F.substring(c, 1, 5))


def build_mcare_elig_demo(
    bene_enrollment: DataFrame,
    ref_geo_kc_zip: DataFrame | None = None,
) -> DataFrame:
    """One row per beneficiary: latest DOB/DOD, gender and RTI-race
    multiple/ever flags + most-recent values, KC-ever geography
    (``load_stage.mcare_elig_demo.R:14-249``).

    "Most recent" picks the value from the max enrollment year with a
    non-null (and non-unknown) code — ``max_by`` over a struct
    (year, value) so ties at the same year break deterministically on
    the value itself, where the reference's RANK leaves ties ambiguous
    (its QA asserts one row per person, so real data has no ties).
    """
    e = bene_enrollment
    if ref_geo_kc_zip is not None:
        e = e.join(
            F.broadcast(
                ref_geo_kc_zip.select("geo_zip", "geo_kc").distinct()
            ),
            _zip5("zip_cd") == F.col("geo_zip"),
            "left",
        )
    else:
        e = e.withColumn("geo_kc", F.lit(None).cast("int"))

    yr = F.col("bene_enrollmt_ref_yr")
    sex = F.col("sex_ident_cd")
    race = F.col("rti_race_cd")

    def recent(value, valid):
        """Value at the max enrollment year among valid rows; value
        breaks same-year ties (max over a (year, value) struct)."""
        pair = F.when(valid, F.struct(yr.alias("y"), value.alias("v")))
        return F.max(pair)["v"]

    sex_valid = sex.isNotNull() & (sex != "0")
    race_valid = race.isNotNull() & ~race.isin("0", "3")

    agg = e.groupBy(F.col("bene_id").alias("id_mcare")).agg(
        recent(F.col("bene_birth_dt"), F.col("bene_birth_dt").isNotNull())
        .alias("dob"),
        recent(F.col("bene_death_dt"), F.col("bene_death_dt").isNotNull())
        .alias("death_dt"),
        F.max("geo_kc").alias("geo_kc_ever"),
        F.max(F.when(sex_valid & (sex == "1"), 1).otherwise(0))
        .alias("gender_male"),
        F.max(F.when(sex_valid & (sex == "2"), 1).otherwise(0))
        .alias("gender_female"),
        recent(sex, sex_valid).alias("_sex_recent"),
        F.max(F.when(race_valid & (race == "1"), 1).otherwise(0))
        .alias("race_white"),
        F.max(F.when(race_valid & (race == "2"), 1).otherwise(0))
        .alias("race_black"),
        F.max(F.when(race_valid & (race == "4"), 1).otherwise(0))
        .alias("race_asian_pi"),
        F.max(F.when(race_valid & (race == "5"), 1).otherwise(0))
        .alias("race_latino"),
        F.max(F.when(race_valid & (race == "6"), 1).otherwise(0))
        .alias("race_aian"),
        recent(race, race_valid).alias("_race_eth_recent"),
        recent(race, race_valid & (race != "5")).alias("_race_recent"),
    )

    race_eth_sum = (
        F.col("race_white") + F.col("race_black") + F.col("race_asian_pi")
        + F.col("race_latino") + F.col("race_aian")
    )
    race_sum = (
        F.col("race_white") + F.col("race_black") + F.col("race_asian_pi")
        + F.col("race_aian")
    )

    def race_label(code):
        return (
            F.when(code == "1", "White")
            .when(code == "2", "Black")
            .when(code == "4", "Asian/PI")
            .when(code == "5", "Latino")
            .when(code == "6", "AI/AN")
            .otherwise("Unknown")
        )

    return agg.select(
        "id_mcare", "dob", "death_dt", "geo_kc_ever",
        F.when(
            (F.col("gender_male") == 1) & (F.col("gender_female") == 1),
            "Multiple",
        )
        .when(F.col("gender_female") == 1, "Female")
        .when(F.col("gender_male") == 1, "Male")
        .otherwise("Unknown")
        .alias("gender_me"),
        F.when(F.col("_sex_recent") == "1", "Male")
        .when(F.col("_sex_recent") == "2", "Female")
        .otherwise("Unknown")
        .alias("gender_recent"),
        "gender_female", "gender_male",
        F.when(race_sum > 1, "Multiple")
        .when(F.col("race_white") == 1, "White")
        .when(F.col("race_black") == 1, "Black")
        .when(F.col("race_asian_pi") == 1, "Asian/PI")
        .when(F.col("race_aian") == 1, "AI/AN")
        .otherwise("Unknown")
        .alias("race_me"),
        F.when(race_eth_sum > 1, "Multiple")
        .when(F.col("race_white") == 1, "White")
        .when(F.col("race_black") == 1, "Black")
        .when(F.col("race_asian_pi") == 1, "Asian/PI")
        .when(F.col("race_latino") == 1, "Latino")
        .when(F.col("race_aian") == 1, "AI/AN")
        .otherwise("Unknown")
        .alias("race_eth_me"),
        # race_recent excludes Latino ('5'); race_eth_recent keeps it
        F.when(F.col("_race_recent") == "5", "Unknown")
        .otherwise(race_label(F.col("_race_recent")))
        .alias("race_recent"),
        race_label(F.col("_race_eth_recent")).alias("race_eth_recent"),
        "race_aian", "race_asian_pi", "race_black", "race_latino",
        "race_white",
        F.when(race_sum == 0, 1).otherwise(0).alias("race_unk"),
        F.when(race_eth_sum == 0, 1).otherwise(0).alias("race_eth_unk"),
    )


def _coded_covered_months(
    bene_enrollment: DataFrame,
    elig_demo: DataFrame | None = None,
) -> DataFrame:
    """MBSF wide year-rows -> coded month-grain coverage rows shared
    by the timevar and elig_month builders: single struct-array
    explode (replaces the reference's 4 unpivots + 3 self-joins),
    Part A/B/C/D + buy-in + dual recodes, zero-coverage months
    dropped, months after death dropped and the death month truncated
    (``load_stage.mcare_elig_month.R:37-231``)."""
    # compiled to ONE parsed expression: assembling 12 structs x 5
    # fields through the Column API costs a py4j round-trip per call
    # (~60 crossings per build); the parsed tree is identical
    months = F.expr(
        "array(" + ", ".join(
            f"named_struct('mon', {m},"
            f" 'buyin', `mdcr_entlmt_buyin_ind_{m:02d}`,"
            f" 'hmo', `hmo_ind_{m:02d}`,"
            f" 'rx', `ptd_cntrct_id_{m:02d}`,"
            f" 'dual', `dual_stus_cd_{m:02d}`)"
            for m in range(1, 13)
        ) + ")"
    )
    # the 12x explode plus ~60 CASE recodes per output row is the
    # CPU-heavy part of this builder; a single-row-group MBSF extract
    # would otherwise run it in one task (session.spread is a no-op on
    # inputs that already scan as many splits)
    from claims_data_spark.session import spread

    long = spread(bene_enrollment).select(
        F.col("bene_id").alias("id_mcare"),
        F.col("bene_enrollmt_ref_yr").cast("int").alias("cal_year"),
        _zip5("zip_cd").alias("geo_zip"),
        F.explode(months).alias("m"),
    ).select(
        "id_mcare", "cal_year", "geo_zip",
        F.make_date("cal_year", F.col("m.mon"), F.lit(1)).alias("from_date"),
        F.last_day(
            F.make_date("cal_year", F.col("m.mon"), F.lit(1))
        ).alias("to_date"),
        F.col("m.buyin").alias("buyin"),
        F.col("m.hmo").alias("hmo"),
        F.upper(F.trim(F.col("m.rx"))).alias("rx"),
        F.upper(F.trim(F.col("m.dual"))).alias("dual"),
    )

    # the seven ResDAC recodes ship as SQL text in one selectExpr
    # batch (same py4j-crossing argument as the comorbidity flags)
    coded = long.selectExpr(
        "id_mcare", "from_date", "to_date", "geo_zip",
        f"CASE WHEN buyin IN ({_sql_list(_PART_A_YES)}) THEN 1 "
        f"WHEN buyin IN ({_sql_list(_PART_A_NO)}) THEN 0 END AS part_a",
        f"CASE WHEN buyin IN ({_sql_list(_PART_B_YES)}) THEN 1 "
        f"WHEN buyin IN ({_sql_list(_PART_B_NO)}) THEN 0 END AS part_b",
        f"CASE WHEN hmo IN ({_sql_list(_PART_C_YES)}) THEN 1 "
        f"WHEN hmo IN ({_sql_list(_PART_C_NO)}) THEN 0 END AS part_c",
        f"CASE WHEN rx IN ({_sql_list(_RX_NONE)}) OR rx IS NULL THEN 0 "
        f"WHEN substring(rx, 1, 1) IN ({_sql_list(_RX_PREFIX)}) THEN 1 "
        "END AS part_d",
        f"CASE WHEN buyin IN ({_sql_list(_STATE_BUYIN_NO)}) THEN 0 "
        f"WHEN buyin IN ({_sql_list(_STATE_BUYIN_YES)}) THEN 1 "
        "END AS state_buyin",
        "CASE WHEN dual IN ("
        + _sql_list((*_DUAL_NONE, "2", "02", "4", "04", "8", "08", "10"))
        + ") OR dual IS NULL THEN 0 WHEN dual IN ("
        + _sql_list(_PARTIAL_DUAL_YES)
        + ") THEN 1 END AS partial_dual",
        "CASE WHEN dual IN ("
        + _sql_list((*_DUAL_NONE, *_PARTIAL_DUAL_YES))
        + ") OR dual IS NULL THEN 0 WHEN dual IN ("
        + _sql_list(_FULL_DUAL_YES)
        + ") THEN 1 END AS full_dual",
    )

    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    cov_sum = (
        z("part_a") + z("part_b") + z("part_c") + z("part_d")
        + z("state_buyin") + z("partial_dual") + z("full_dual")
    )
    covered = coded.filter(cov_sum > 0)

    if elig_demo is not None:
        covered = (
            covered.join(
                elig_demo.select("id_mcare", "death_dt"), "id_mcare", "left"
            )
            .filter(
                F.col("death_dt").isNull()
                | (F.col("from_date") <= F.col("death_dt"))
            )
            .withColumn(
                "to_date",
                F.when(
                    F.col("death_dt").isNotNull()
                    & (F.col("to_date") > F.col("death_dt")),
                    F.col("death_dt"),
                ).otherwise(F.col("to_date")),
            )
            .drop("death_dt")
        )
    return covered


def build_mcare_elig_timevar(
    bene_enrollment: DataFrame,
    elig_demo: DataFrame | None = None,
    ref_geo_kc_zip: DataFrame | None = None,
) -> DataFrame:
    """Contiguous Medicare coverage periods with Part A/B/C/D,
    state-buy-in and dual flags (``load_stage.mcare_elig_timevar.R``):
    the shared coded-month stage, then one island collapse per
    attribute tuple.
    """
    covered = _coded_covered_months(bene_enrollment, elig_demo)

    islands = collapse_islands(
        covered,
        id_cols=["id_mcare"],
        from_col="from_date",
        to_col="to_date",
        group_cols=TIMEVAR_ATTR_COLS,
        max_gap_days=1,
    ).select(
        "id_mcare", "from_date", "to_date", *TIMEVAR_ATTR_COLS
    )

    w = Window.partitionBy("id_mcare").orderBy("from_date")
    out = islands.select(
        "id_mcare", "from_date", "to_date",
        F.when(
            F.datediff(
                F.col("from_date"), F.lag("to_date").over(w)
            ) == 1,
            1,
        )
        .otherwise(0)
        .alias("contiguous"),
        "part_a", "part_b", "part_c", "part_d",
        "full_dual", "partial_dual", "state_buyin", "geo_zip",
        (F.datediff("to_date", "from_date") + 1).alias("cov_time_day"),
    )
    if ref_geo_kc_zip is not None:
        out = out.join(
            F.broadcast(
                ref_geo_kc_zip.select("geo_zip", "geo_kc").distinct()
            ),
            "geo_zip",
            "left",
        )
    else:
        out = out.withColumn("geo_kc", F.lit(None).cast("int"))
    return out.select(
        "id_mcare", "from_date", "to_date", "contiguous",
        "part_a", "part_b", "part_c", "part_d",
        "full_dual", "partial_dual", "state_buyin",
        "geo_zip", "geo_kc", "cov_time_day",
    )


def build_mcare_elig_month(
    bene_enrollment: DataFrame,
    elig_demo: DataFrame | None = None,
    ref_geo_kc_zip: DataFrame | None = None,
) -> DataFrame:
    """Medicare member-month eligibility table
    (``load_stage.mcare_elig_month.R:30-290``): the shared coded-month
    stage kept at MONTH grain (no island collapse) with time-period
    columns, cov_time_day, and the geo_kc flag.

    Map-only after the explode (zero shuffles; geo ref broadcast) —
    the same 100 TB shape as ``build_apcd_elig_month``.
    """
    covered = _coded_covered_months(bene_enrollment, elig_demo)
    out = covered.select(
        "id_mcare", "from_date", "to_date",
        (F.year("from_date") * 100 + F.month("from_date")).cast("int")
        .alias("year_month"),
        (
            F.year("from_date") * 10
            + F.floor((F.month("from_date") - 1) / 3) + 1
        ).cast("int").alias("year_quarter"),
        F.year("from_date").cast("int").alias("year"),
        "part_a", "part_b", "part_c", "part_d",
        "full_dual", "partial_dual", "state_buyin", "geo_zip",
        (F.datediff("to_date", "from_date") + 1).alias("cov_time_day"),
    )
    if ref_geo_kc_zip is not None:
        out = out.join(
            F.broadcast(
                ref_geo_kc_zip.select("geo_zip", "geo_kc").distinct()
            ),
            "geo_zip",
            "left",
        )
    else:
        out = out.withColumn("geo_kc", F.lit(None).cast("int"))
    return out
