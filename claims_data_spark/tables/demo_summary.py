"""ref.mcaid_demo_summary — suppressed person counts by year and
demographic slice (reference:
``claims_db/phclaims/stage/tables/load_ref.mcaid_demo_summary.R``).

Five reference steps re-expressed as one lazy plan:

1. modal geocode per person-year (:28-43) — count + window rank,
   tie pinned on geo_hash_geocode (the T-SQL ROW_NUMBER tie is
   arbitrary; pinning keeps reruns byte-identical),
2. person-year clients frame (:79-105): full-benefit King-county
   member-months joined to demo + the yearly modal geocode + the
   geocode reference, age grouped at July 1 with T-SQL month
   semantics, unborn (dob after year end) excluded,
3. wide -> long unpivot (:167-181) with race_* columns folded into
   one ``race_aic`` measure carrying the race name as its value,
   zero/blank values dropped,
4. counts with per-(year, measure) totals and 1-10 small-cell
   suppression to 0 (:228-244, final UPDATE sets NULL -> 0),
5. QA aggregates (:44-50, 188-199) exposed as
   :func:`demo_summary_qa` — one pass each.

Scale: the modal-geocode stage and the final count stage each
shuffle once on their grouping key; the unpivot is a map-side
``stack``; the geocode ref join is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import tsql_datediff_month
from claims_data_spark.operators.unpivot import unpivot

_RACE_COLS = [
    "race_aian", "race_asian", "race_black", "race_latino",
    "race_nhpi", "race_white", "race_unk",
]


def yearly_modal_geocode(month: DataFrame) -> DataFrame:
    """Most frequent geo_hash_geocode per person per year
    (load_ref.mcaid_demo_summary.R:28-43)."""
    freq = month.groupBy("id_mcaid", "year", "geo_hash_geocode").agg(
        F.count(F.lit(1)).alias("geo_freq")
    )
    w = Window.partitionBy("id_mcaid", "year").orderBy(
        F.col("geo_freq").desc(), F.col("geo_hash_geocode")
    )
    return (
        freq.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id_mcaid", "year", "geo_hash_geocode")
    )


def _age_group(dob, july1) -> F.Column:
    age = F.floor(tsql_datediff_month(dob, july1) / 12)
    return (
        F.when(age < 18, "0-17")
        .when(age.between(18, 24), "18-24")
        .when(age.between(25, 34), "25-34")
        .when(age.between(35, 44), "35-44")
        .when(age.between(45, 54), "45-54")
        .when(age.between(55, 64), "55-64")
        .when(age > 64, "65+")
    )


def build_demo_summary_clients(
    month: DataFrame,
    demo: DataFrame,
    geocode_ref: DataFrame,
    current_year: int,
) -> DataFrame:
    """Step-2 person-year frame (:79-105)."""
    geo = yearly_modal_geocode(
        month.filter(
            (F.col("full_benefit") == 1) & (F.col("geo_kc") == 1)
        )
    )
    july1 = F.make_date(F.col("year"), F.lit(7), F.lit(1))
    year_end = F.make_date(F.col("year"), F.lit(12), F.lit(31))
    gender = F.when(
        F.col("gender_recent") == "Unknown", F.col("gender_me")
    ).otherwise(F.col("gender_recent"))

    # The modal-geocode frame IS the person-year spine: it covers
    # every (person, year) of the same filtered month rows (null
    # geocodes group too) exactly once, so using it as the base
    # replaces the old month-scan + wide 12-column DISTINCT + geocode
    # join with the rollup the modal step needs anyway — one month
    # pass total, and every downstream join is 1:1 on person(-year).
    return (
        geo
        .filter(F.col("year") < F.lit(current_year))
        .join(
            demo.select(
                "id_mcaid", "dob", "gender_recent", "gender_me", *_RACE_COLS
            ),
            "id_mcaid",
            "left",
        )
        .join(
            F.broadcast(
                geocode_ref.select(
                    "geo_hash_geocode",
                    F.col("geo_id20_kccdist").alias("kccdist"),
                    F.col("geo_zip_clean").alias("zip"),
                )
            ),
            "geo_hash_geocode",
            "left",
        )
        .filter(F.col("dob") <= year_end)
        .select(
            "id_mcaid",
            "year",
            gender.alias("gender"),
            _age_group(F.col("dob"), july1).alias("age_group"),
            *_RACE_COLS,
            "kccdist",
            "zip",
        )
    )


def clients_long(clients: DataFrame) -> DataFrame:
    """Step-3 unpivot (:167-181): race flags fold into one
    ``race_aic`` measure valued by race name; '0'/null dropped."""
    value_cols = {
        "gender": "gender",
        "age_group": "age_group",
        **{c: c for c in _RACE_COLS},
        "kccdist": "kccdist",
        "zip": "zip",
    }
    wide = clients.select(
        "id_mcaid",
        "year",
        *[F.col(c).cast("string").alias(c) for c in value_cols],
    )
    long = unpivot(
        wide,
        id_cols=["id_mcaid", "year"],
        value_cols=value_cols,
        var_name="measure",
        value_name="value",
    ).filter(F.col("value") != "0")
    # no DISTINCT here: clients is person-year unique, so the unpivot
    # rows are already unique per (person, year, measure, value) — the
    # race fold maps distinct race columns to distinct values — and the
    # summary aggregates with count_distinct anyway. The old exploded-
    # grain distinct was a full shuffle of 11x the person-year rows.
    is_race = F.col("measure").like("race_%")
    return long.select(
        "id_mcaid",
        "year",
        F.when(is_race, "race_aic").otherwise(F.col("measure")).alias(
            "measure"
        ),
        F.when(is_race, F.regexp_replace("measure", "^race_", ""))
        .otherwise(F.col("value"))
        .alias("value"),
    )


def build_mcaid_demo_summary(
    month: DataFrame,
    demo: DataFrame,
    geocode_ref: DataFrame,
    current_year: int,
    suppress_low: int = 1,
    suppress_high: int = 10,
) -> DataFrame:
    """Final summary (:228-244 + the NULL->0 UPDATE): counts by
    (year, measure, value) with per-(year, measure) totals and
    small-cell suppression."""
    clients = build_demo_summary_clients(
        month, demo, geocode_ref, current_year
    )
    long = clients_long(clients)
    # clients is person-year UNIQUE, so long is unique per (person,
    # year, measure, value) and the value-level population is a plain
    # COUNT — no count_distinct expand machinery.
    counts = long.groupBy(
        "year", "measure", F.lower("value").alias("value")
    ).agg(F.count(F.lit(1)).alias("raw_pop"))
    # total_pop is DISTINCT persons per (year, measure) — NOT the sum
    # of value-level counts: one person can carry several race_aic
    # values. Computed straight from the person-year-unique clients
    # frame as eight conditional sums in ONE narrow pass (a person
    # contributes to a measure's total iff it would emit >=1 long row,
    # i.e. a non-'0', non-null value), then unpivoted — instead of a
    # second aggregation over the 11x-exploded long frame.
    def _has_value(c):
        col = F.col(c).cast("string")
        return (col.isNotNull() & (col != "0")).cast("int")

    any_race = F.greatest(
        *[F.coalesce(F.col(c), F.lit(0)) for c in _RACE_COLS]
    )
    totals_wide = clients.groupBy("year").agg(
        F.sum(_has_value("gender")).alias("gender"),
        F.sum(_has_value("age_group")).alias("age_group"),
        F.sum(_has_value("kccdist")).alias("kccdist"),
        F.sum(_has_value("zip")).alias("zip"),
        F.sum((any_race == 1).cast("int")).alias("race_aic"),
    )
    totals = unpivot(
        totals_wide,
        id_cols=["year"],
        value_cols={c: c for c in (
            "gender", "age_group", "kccdist", "zip", "race_aic"
        )},
        var_name="measure",
        value_name="total_pop",
    )
    return counts.join(F.broadcast(totals), ["year", "measure"]).select(
        "year",
        "measure",
        "value",
        F.when(
            F.col("raw_pop").between(suppress_low, suppress_high), F.lit(0)
        )
        .otherwise(F.col("raw_pop"))
        .alias("pop"),
        "total_pop",
    )


def demo_summary_qa(long: DataFrame) -> dict:
    """Expansion QA (:188-199) in one fused aggregate: non-race
    measures must have exactly one value row per (person, year,
    measure); race rows one per (person, year, value)."""
    non_race_dups = (
        long.filter(F.col("measure") != "race_aic")
        .groupBy("id_mcaid", "year", "measure")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > 1)
        .count()
    )
    race_dups = (
        long.filter(F.col("measure") == "race_aic")
        .groupBy("id_mcaid", "year", "measure", "value")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > 1)
        .count()
    )
    return {"non_race_dups": non_race_dups, "race_dups": race_dups}
