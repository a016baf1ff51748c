"""Performance-measure registry and final measure calculation.

Re-expresses the reference's measure orchestration layer
(``create_stage.sp_perf_staging.sql`` — per-measure staging batches;
``create_stage.sp_perf_measures.sql`` — per-measure final calculation;
``ref/tables/load_ref.age_grp.sql`` — the 12-column age-group dim;
``ref/tables/archive/create_ref.perf_measure.sql`` — the 36-row
measure registry) as Spark-first builders.

Design notes vs the reference:

* The reference computes each measurement-year slice by CROSS JOINing
  a month dim with every distinct member and running 12/24-month
  rolling ``SUM() OVER`` frames, then keeping only the rows where
  ``year_month = @end_month_int``.  For a single end-month slice that
  grid+window formulation is equivalent to a plain filtered
  aggregation: numerator = SUM/MAX of staged utilization inside the
  [beg, end] month window, grouped by member — one shuffle, no dense
  grid, no window state.  We implement the slice directly; the grid
  sweep (all end-months at once) remains available through
  ``operators/rolling.rolling_month_agg`` which the enrollment
  denominator still uses (it genuinely needs the per-month frames).
* ``ref.age_grp`` (252 rows) and ``ref.perf_measure`` (36 rows) are
  broadcast dimensions; every join against them is a map-side join.
* Event-date measures (FUA/FUM/FUH/PCR) join the enrollment
  denominator twice like the reference — once at the event month for
  coverage-at-event rules, once at the end month for the residency
  proxy — both are equi-joins on (id, year_month).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import (
    month_end,
    tsql_datediff_month,
    yyyymm_to_date,
)


def age_birthday(dob, asof) -> F.Column:
    """T-SQL ``DATEDIFF(YEAR, dob, asof) - CASE WHEN DATEADD(YEAR, ...)
    > asof THEN 1 END`` (sp_perf_measures.sql:269-274): completed years
    at ``asof``, decremented when the birthday hasn't occurred yet.
    (Distinct from ``functions.datetime.age_years``' 365.25 formula —
    the measure sprocs use the birthday form.)"""
    dob, asof = F.col(dob) if isinstance(dob, str) else dob, (
        F.col(asof) if isinstance(asof, str) else asof
    )
    raw = F.year(asof) - F.year(dob)
    had_birthday = (F.month(asof) > F.month(dob)) | (
        (F.month(asof) == F.month(dob)) & (F.dayofmonth(asof) >= F.dayofmonth(dob))
    )
    return (raw - F.when(~had_birthday, 1).otherwise(0)).cast("int")
from claims_data_spark.operators.rolling import densify_months, rolling_month_agg


# ---------------------------------------------------------------------------
# ref.age_grp (load_ref.age_grp.sql:23-79): ages -1..250 with one label
# column per grouping scheme.  age_grp_9_months is keyed by age IN
# MONTHS (CAP joins it on age_in_months, sp_perf_measures.sql:1328).
# ---------------------------------------------------------------------------

def _band(col, bands):
    """CASE chain over inclusive (lo, hi, label) bands; hi=None = open."""
    expr = F.lit(None).cast("string")
    out = None
    for lo, hi, label in bands:
        cond = (col >= lo) if hi is None else col.between(lo, hi)
        out = F.when(cond, label) if out is None else out.when(cond, label)
    return out.otherwise(expr) if out is not None else expr


def ref_age_grp(spark: SparkSession) -> DataFrame:
    """The reference's ``ref.age_grp`` dimension: 252 rows, one per
    age (-1..250), 12 group-label columns (load_ref.age_grp.sql)."""
    age = F.col("age")
    return (
        spark.range(-1, 251)
        .select(F.col("id").cast("int").alias("age"))
        .select(
            "age",
            _band(age, [(0, 4, "Age 0-4"), (5, 11, "Age 5-11"),
                        (12, 17, "Age 12-17"), (18, 24, "Age 18-24"),
                        (25, 44, "Age 25-44"), (45, 64, "Age 45-64"),
                        (65, None, "Age 65+")]).alias("age_grp_0"),
            _band(age, [(18, None, "Age 18+")]).alias("age_grp_1"),
            _band(age, [(0, 17, "Age 0-17"), (18, 64, "Age 18-64"),
                        (65, None, "Age 65+")]).alias("age_grp_2"),
            _band(age, [(13, None, "Age 13+")]).alias("age_grp_3"),
            _band(age, [(6, None, "Age 6+")]).alias("age_grp_4"),
            _band(age, [(6, 17, "Age 6-17"), (18, 64, "Age 18-64"),
                        (65, None, "Age 65+")]).alias("age_grp_5"),
            _band(age, [(12, 17, "Age 12-17"), (18, 64, "Age 18-64"),
                        (65, None, "Age 65+")]).alias("age_grp_6"),
            _band(age, [(18, 64, "Age 18-64"),
                        (65, None, "Age 65+")]).alias("age_grp_7"),
            _band(age, [(18, 64, "Age 18-64")]).alias("age_grp_8"),
            _band(age, [(0, 11, "Age 0-11 Months"),
                        (12, 24, "Age 12-24 Months"),
                        (25, 83, "Age 25 Months-6"),
                        (84, 143, "Age 7-11"),
                        (144, 239, "Age 12-19")]).alias("age_grp_9_months"),
            _band(age, [(5, 11, "Age 5-11"), (12, 18, "Age 12-18"),
                        (19, 50, "Age 19-50"),
                        (51, 64, "Age 51-64")]).alias("age_grp_10"),
            _band(age, [(0, 17, "Age 0-17"), (18, 24, "Age 18-24"),
                        (25, 34, "Age 25-34"), (35, 44, "Age 35-44"),
                        (45, 54, "Age 45-54"), (55, 64, "Age 55-64"),
                        (65, None, "Age 65+")]).alias("age_grp_11"),
        )
    )


# ---------------------------------------------------------------------------
# ref.perf_measure (archive/create_ref.perf_measure.sql:20-58)
# ---------------------------------------------------------------------------

PERF_MEASURES = [
    # (measure_id, short_name, etl_name, measure_name, age_group)
    (1, "ED", "All-Cause ED Visits", "All-Cause ED Visits", "age_grp_2"),
    (2, "AH", "Acute Hospital Utilization", "Acute Hospital Utilization", "age_grp_1"),
    (3, "FUA_7", "Follow-up ED visit for Alcohol/Drug Abuse",
     "Follow-up ED visit for Alcohol/Drug Abuse: 7 days", "age_grp_3"),
    (4, "FUA_30", "Follow-up ED visit for Alcohol/Drug Abuse",
     "Follow-up ED visit for Alcohol/Drug Abuse: 30 days", "age_grp_3"),
    (5, "FUM_7", "Follow-up ED visit for Mental Illness",
     "Follow-up ED visit for Mental Illness: 7 days", "age_grp_4"),
    (6, "FUM_30", "Follow-up ED visit for Mental Illness",
     "Follow-up ED visit for Mental Illness: 30 days", "age_grp_4"),
    (7, "FUH_7", "Follow-up Hospitalization for Mental Illness",
     "Follow-up Hospitalization for Mental Illness: 7 days", "age_grp_4"),
    (8, "FUH_30", "Follow-up Hospitalization for Mental Illness",
     "Follow-up Hospitalization for Mental Illness: 30 days", "age_grp_4"),
    (9, "TPM", "Mental Health Treatment Penetration",
     "Mental Health Treatment Penetration", "age_grp_5"),
    (10, "TPS", "SUD Treatment Penetration", "SUD Treatment Penetration", "age_grp_6"),
    (11, "TPO", "SUD Treatment Penetration (Opioid)",
     "SUD Treatment Penetration (Opioid)", "age_grp_7"),
    (12, "PCR", "Plan All-Cause Readmissions (30 days)",
     "Plan All-Cause Readmissions (30 days)", "age_grp_8"),
    (13, "CAP", "Child and Adolescent Access to Primary Care",
     "Child and Adolescent Access to Primary Care", "age_grp_9_months"),
    (17, "MMA_50", "Medication Management for Asthma: Compliance 50%",
     "Medication Management for Asthma: Compliance 50%", "age_grp_10"),
    (18, "MMA_75", "Medication Management for Asthma: Compliance 75%",
     "Medication Management for Asthma: Compliance 75%", "age_grp_10"),
    (19, "AMR", "Asthma Medication Ratio", "Asthma Medication Ratio", "age_grp_10"),
    (30, "TPM_ADHD", "MH Treatment Penetration by Diagnosis",
     "MH Treatment Penetration: ADHD", "age_grp_5"),
    (31, "TPM_Adjustment", "MH Treatment Penetration by Diagnosis",
     "MH Treatment Penetration: Adjustment", "age_grp_5"),
    (32, "TPM_Anxiety", "MH Treatment Penetration by Diagnosis",
     "MH Treatment Penetration: Anxiety", "age_grp_5"),
    (33, "TPM_Depression", "MH Treatment Penetration by Diagnosis",
     "MH Treatment Penetration: Depression", "age_grp_5"),
    (34, "TPM_Impulse", "MH Treatment Penetration by Diagnosis",
     "MH Treatment Penetration: Disrup/Impulse/Conduct", "age_grp_5"),
    (35, "TPM_Bipolar", "MH Treatment Penetration by Diagnosis",
     "MH Treatment Penetration: Mania/Bipolar", "age_grp_5"),
    (36, "TPM_Psychotic", "MH Treatment Penetration by Diagnosis",
     "MH Treatment Penetration: Psychotic", "age_grp_5"),
]


def ref_perf_measure(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        PERF_MEASURES,
        "measure_id int, measure_short_name string, measure_etl_name string,"
        " measure_name string, age_group string",
    )


# ---------------------------------------------------------------------------
# stage.mcaid_perf_enroll_denom, full reference column surface
# (sp_mcaid_perf_enroll_denom.sql:43-72 over
#  fn_mcaid_perf_enroll_member_month.sql:32-40)
# ---------------------------------------------------------------------------

def build_enroll_denom_full(
    member_month: DataFrame,
    ym_min: int,
    ym_max: int,
    id_col: str = "id_mcaid",
    already_dense: bool = False,
) -> DataFrame:
    """Dense member-month enrollment denominator with every rolling
    frame the measure batches consume.

    Input: one row per member per covered month with flag columns
    ``enrolled_any, full_benefit, dual, tpl, hospice`` (0/1) and
    ``dob`` (date).  Months inside [ym_min, ym_max] with no row are
    densified to all-zero flags (the reference reaches the same shape
    by LEFT JOINing a month×member grid,
    fn_mcaid_perf_enroll_member_month.sql:20-30).

    One shuffle on the id for the densify + a single id-partitioned
    sort feeds every frame (Catalyst shares the Window exchange).
    """
    flags = ["enrolled_any", "full_benefit", "dual", "tpl", "hospice"]
    if already_dense:
        # caller guarantees one row per member per month of
        # [ym_min, ym_max] — skip the groupBy + grid join (three
        # shuffles) that a sparse coverage extract needs
        dense = member_month
    else:
        monthly = member_month.groupBy(id_col, "year_month").agg(
            *[F.max(c).alias(c) for c in flags],
            F.max("dob").alias("dob"),
        )
        dense = densify_months(
            monthly, [id_col], "year_month", ym_min, ym_max,
            fill={c: 0 for c in flags},
        )
    if not already_dense:
        # dob is constant per member but null on densified gap months;
        # backfill with the per-id max (one extra column in the same
        # window pass Catalyst already runs for the frames below)
        from pyspark.sql import Window

        dense = dense.withColumn(
            "dob", F.max("dob").over(Window.partitionBy(id_col))
        )
    # full_criteria = enrolled & full-benefit & non-dual & non-tpl
    # (fn_mcaid_perf_enroll_member_month.sql:40)
    dense = dense.withColumn(
        "full_criteria",
        ((F.col("enrolled_any") == 1) & (F.col("full_benefit") == 1)
         & (F.col("dual") == 0) & (F.col("tpl") == 0)).cast("int"),
    )
    rolled = rolling_month_agg(
        dense,
        [id_col],
        "year_month",
        {
            "enrolled_any_t_12_m": ("enrolled_any", -11, 0),
            "full_benefit_t_12_m": ("full_benefit", -11, 0),
            "dual_t_12_m": ("dual", -11, 0),
            "tpl_t_12_m": ("tpl", -11, 0),
            "hospice_t_12_m": ("hospice", -11, 0),
            "hospice_prior_t_12_m": ("hospice", -23, -12),
            "hospice_p_2_m": ("hospice", 0, 1),
            "full_criteria_t_12_m": ("full_criteria", -11, 0),
            "full_criteria_prior_t_12_m": ("full_criteria", -23, -12),
            "full_criteria_p_2_m": ("full_criteria", 0, 1),
        },
    )
    eom = month_end(yyyymm_to_date(F.col("year_month")))
    return (
        rolled.withColumn("end_month_age", age_birthday(F.col("dob"), eom))
        .withColumn(
            "age_in_months",
            F.when(
                F.col("end_month_age").between(0, 20),
                tsql_datediff_month(F.col("dob"), eom)
                - F.when(
                    F.add_months(F.col("dob"),
                                 tsql_datediff_month(F.col("dob"), eom)) > eom,
                    1,
                ).otherwise(0),
            ),
        )
        .withColumn(
            "end_quarter",
            F.when((F.col("year_month") % 100).isin(3, 6, 9, 12), 1).otherwise(0),
        )
    )


# ---------------------------------------------------------------------------
# stage.perf_staging / perf_staging_event_date builders
# ---------------------------------------------------------------------------

def perf_staging_month(
    events: DataFrame,
    measure_id: int,
    num_denom: str = "N",
    id_col: str = "id_mcaid",
    value_col: str | None = None,
    agg: str = "sum",
) -> DataFrame:
    """Person-month staging rows (``stage.perf_staging`` shape,
    sp_perf_staging.sql): (id, year_month, measure_id, num_denom,
    measure_value).  ``events`` must carry (id, year_month[, value]).
    """
    val = F.col(value_col) if value_col else F.lit(1)
    agg_fn = F.sum(val) if agg == "sum" else F.max(val)
    return (
        events.groupBy(id_col, "year_month")
        .agg(agg_fn.cast("int").alias("measure_value"))
        .withColumn("measure_id", F.lit(measure_id))
        .withColumn("num_denom", F.lit(num_denom))
    )


def perf_staging_event_date(
    events: DataFrame,
    measure_id: int,
    id_col: str = "id_mcaid",
    date_col: str = "event_date",
    numerator_col: str = "numerator",
    denominator_col: str | None = None,
) -> DataFrame:
    """Event-date staging rows (``stage.perf_staging_event_date``):
    (id, year_month, event_date, measure_id, denominator, numerator).
    """
    from claims_data_spark.functions.datetime import date_to_yyyymm

    denom = F.col(denominator_col) if denominator_col else F.lit(1)
    return events.select(
        F.col(id_col).alias(id_col),
        date_to_yyyymm(F.col(date_col)).alias("year_month"),
        F.col(date_col).alias("event_date"),
        F.lit(measure_id).alias("measure_id"),
        denom.cast("int").alias("denominator"),
        F.col(numerator_col).cast("int").alias("numerator"),
    )


# ---------------------------------------------------------------------------
# Final calculation: month-based measures
# (sp_perf_measures.sql ED :53-144, AH :146-240, TPx :721-1110,
#  CAP :1276-1378)
# ---------------------------------------------------------------------------

MONTH_MEASURE_RULES = {
    # threshold on full_criteria_t_12_m at the end month; whether a
    # hospice month in the trailing 12 excludes; what the denominator
    # column is; how the numerator aggregates; minimum end-month age.
    "ED": dict(min_full_criteria=7, hospice_excl=True,
               denominator="member_months", num_agg="sum", age_min=0),
    "AH": dict(min_full_criteria=11, hospice_excl=True,
               denominator="one", num_agg="sum", age_min=18, outlier_at=3),
    "TPM": dict(min_full_criteria=11, hospice_excl=False,
                denominator="staged", num_agg="exists", age_min=6),
    "TPS": dict(min_full_criteria=11, hospice_excl=False,
                denominator="staged", num_agg="exists", age_min=12),
    "TPO": dict(min_full_criteria=11, hospice_excl=False,
                denominator="staged", num_agg="exists", age_min=18),
}

# The by-diagnosis TPM sub-measures (sp_perf_measures.sql:1378-1519)
# share one batch: TPM windows, but the enrollment gate is ANY
# enrollment in the measurement year (enrolled_any_t_12_m >= 1, not
# the 11-month full-criteria rule) and no age floor in the final WHERE.
_BY_DX_RULE = dict(
    min_full_criteria=1, criteria_col="enrolled_any_t_12_m",
    hospice_excl=False, denominator="staged", num_agg="exists", age_min=None,
)
for _short in ("TPM_ADHD", "TPM_Adjustment", "TPM_Anxiety",
               "TPM_Depression", "TPM_Impulse", "TPM_Bipolar",
               "TPM_Psychotic"):
    MONTH_MEASURE_RULES[_short] = _BY_DX_RULE


def _measure_row(ref_measure: DataFrame, short_name: str):
    row = ref_measure.filter(
        F.col("measure_short_name") == short_name
    ).select("measure_id", "age_group").head()
    if row is None:
        raise ValueError(f"unknown measure_short_name {short_name!r}")
    return row.measure_id, row.age_group


def perf_measure_month(
    staging: DataFrame,
    denom: DataFrame,
    ref_measure: DataFrame,
    age_grp: DataFrame,
    end_month: int,
    short_name: str,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """One month-based measure slice → ``stage.mcaid_perf_measure``
    rows (beg/end year_month, id, end_month_age, age_grp, measure_id,
    denominator, numerator).

    The reference sweeps a member×month grid with 12/24-month rolling
    frames and keeps the end-month row; for a fixed ``end_month`` that
    equals a filtered groupBy over the staged window — one shuffle on
    the id, broadcast joins for the two ref dims.
    """
    rules = MONTH_MEASURE_RULES[short_name]
    measure_id, age_group_col = _measure_row(ref_measure, short_name)
    beg_month = yyyymm_add_py(end_month, -11)

    crit_col = rules.get("criteria_col", "full_criteria_t_12_m")
    base = denom.filter(
        (F.col("year_month") == end_month)
        & (F.col(crit_col) >= rules["min_full_criteria"])
    )
    if rules["age_min"] is not None:
        base = base.filter(F.col("end_month_age") >= rules["age_min"])
    if rules["hospice_excl"]:
        base = base.filter(F.col("hospice_t_12_m") == 0)
    base = base.select(id_col, "end_month_age", "full_criteria_t_12_m")

    stg = staging.filter(F.col("measure_id") == measure_id)
    num_window = stg.filter(
        (F.col("num_denom") == "N")
        & F.col("year_month").between(beg_month, end_month)
    )
    if rules["num_agg"] == "sum":
        numer = num_window.groupBy(id_col).agg(
            F.sum("measure_value").alias("numerator")
        )
    else:  # exists: any staged numerator month in the 12-month window
        numer = num_window.groupBy(id_col).agg(
            F.when(F.max("measure_value") > 0, 1).otherwise(0).alias("numerator")
        )
    out = base.join(numer, id_col, "left").withColumn(
        "numerator", F.coalesce("numerator", F.lit(0))
    )

    if rules["denominator"] == "staged":
        # 24-month identification window for the denominator
        # (sp_perf_measures.sql:797 "beg_measure_year_month - 100")
        denom_beg = yyyymm_add_py(beg_month, -12)
        in_denom = (
            stg.filter(
                (F.col("num_denom") == "D")
                & F.col("year_month").between(denom_beg, end_month)
                & (F.col("measure_value") > 0)
            )
            .select(id_col)
            .distinct()
        )
        out = out.join(in_denom, id_col, "left_semi").withColumn(
            "denominator", F.lit(1)
        )
    elif rules["denominator"] == "member_months":
        out = out.withColumn("denominator", F.col("full_criteria_t_12_m"))
    else:
        out = out.withColumn("denominator", F.lit(1))

    if "outlier_at" in rules:
        # AH excludes members at/above the outlier utilization count
        # (sp_perf_measures.sql:202,239)
        out = out.filter(F.col("numerator") < rules["outlier_at"])

    return (
        out.join(
            F.broadcast(age_grp.select("age", F.col(age_group_col).alias("age_grp"))),
            out["end_month_age"] == F.col("age"),
            "left",
        )
        .select(
            F.lit(beg_month).alias("beg_year_month"),
            F.lit(end_month).alias("end_year_month"),
            id_col,
            "end_month_age",
            "age_grp",
            F.lit(measure_id).alias("measure_id"),
            F.col("denominator").cast("long"),
            F.col("numerator").cast("long"),
        )
    )


def perf_measure_cap(
    staging: DataFrame,
    denom: DataFrame,
    ref_measure: DataFrame,
    age_grp: DataFrame,
    end_month: int,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """Child and Adolescent Access to Primary Care
    (sp_perf_measures.sql:1276-1378): age bands come from
    ``age_in_months``; the 12-24-month / 25-months-6 bands use a
    12-month numerator window, the 7-11 / 12-19 bands a 24-month
    window plus an 11-month prior-year enrollment requirement."""
    measure_id, age_group_col = _measure_row(ref_measure, "CAP")
    beg_month = yyyymm_add_py(end_month, -11)
    beg_24 = yyyymm_add_py(beg_month, -12)

    base = (
        denom.filter(
            (F.col("year_month") == end_month)
            & (F.col("age_in_months") >= 12)
            & (F.col("end_month_age") <= 19)
            & (F.col("full_criteria_t_12_m") >= 11)
            & (F.col("hospice_t_12_m") == 0)
        )
        .select(
            id_col, "end_month_age", "age_in_months",
            "full_criteria_prior_t_12_m", "hospice_prior_t_12_m",
        )
    )
    stg = staging.filter(
        (F.col("measure_id") == measure_id)
        & (F.col("num_denom") == "N")
        & (F.col("measure_value") > 0)
        & F.col("year_month").between(beg_24, end_month)
    )
    num = stg.groupBy(id_col).agg(
        F.max(F.when(F.col("year_month") >= beg_month, 1).otherwise(0))
        .alias("numerator_t_12_m"),
        F.lit(1).alias("numerator_t_24_m"),
    )
    labeled = base.join(num, id_col, "left").join(
        F.broadcast(age_grp.select("age", F.col(age_group_col).alias("age_grp"))),
        base["age_in_months"] == F.col("age"),
        "left",
    )
    older = F.col("age_grp").isin("Age 7-11", "Age 12-19")
    return (
        labeled.filter(
            (~older)
            | ((F.col("full_criteria_prior_t_12_m") >= 11)
               & (F.col("hospice_prior_t_12_m") == 0))
        )
        .select(
            F.lit(beg_month).alias("beg_year_month"),
            F.lit(end_month).alias("end_year_month"),
            id_col,
            "end_month_age",
            "age_grp",
            F.lit(measure_id).alias("measure_id"),
            F.lit(1).cast("long").alias("denominator"),
            F.coalesce(
                F.when(older, F.col("numerator_t_24_m"))
                .otherwise(F.col("numerator_t_12_m")),
                F.lit(0),
            ).cast("long").alias("numerator"),
        )
    )


# ---------------------------------------------------------------------------
# Final calculation: event-date measures
# (sp_perf_measures.sql FUA :242-404, FUM :564-721, FUH :404-564,
#  PCR :1111-1276)
# ---------------------------------------------------------------------------

EVENT_MEASURE_RULES = {
    "FUA_7": dict(event_age_min=13, residency=True, prior_coverage=False),
    "FUA_30": dict(event_age_min=13, residency=True, prior_coverage=False),
    "FUM_7": dict(event_age_min=6, residency=True, prior_coverage=False),
    "FUM_30": dict(event_age_min=6, residency=True, prior_coverage=False),
    "FUH_7": dict(event_age_min=6, residency=True, prior_coverage=False),
    "FUH_30": dict(event_age_min=6, residency=True, prior_coverage=False),
    # PCR: 18-64 at event AND at measure level; 11/12-month coverage
    # before the index discharge; no residency proxy join
    "PCR": dict(event_age_min=18, event_age_max=64, residency=False,
                prior_coverage=True),
}


def perf_measure_event(
    staging_event: DataFrame,
    denom: DataFrame,
    ref_measure: DataFrame,
    age_grp: DataFrame,
    end_month: int,
    short_name: str,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """One event-date measure slice.  Index events inside the
    measurement year (cut 30 days before the year end — insufficient
    follow-up window otherwise) qualify when the member has
    full-criteria, non-hospice coverage at the event month and through
    the following month (waived when the event is on the 1st of a
    31-day month: the 31-day follow-up period fits in the calendar
    month, sp_perf_measures.sql:296-299)."""
    rules = EVENT_MEASURE_RULES[short_name]
    measure_id, age_group_col = _measure_row(ref_measure, short_name)
    beg_month = yyyymm_add_py(end_month, -11)
    year_start = yyyymm_to_date(F.lit(beg_month))
    last_event = F.date_add(month_end(yyyymm_to_date(F.lit(end_month))), -30)

    ev = staging_event.filter(
        (F.col("measure_id") == measure_id)
        & (F.col("event_date") >= year_start)
        & (F.col("event_date") <= last_event)
    )

    den_cols = [
        id_col, "year_month", "dob", "full_criteria", "hospice",
        "full_criteria_p_2_m", "hospice_p_2_m",
        "full_criteria_t_12_m", "hospice_t_12_m",
    ]
    at_event = ev.join(
        denom.select(*den_cols),
        [id_col, "year_month"],
        "left",
    )
    need_1_month = (F.dayofmonth("event_date") == 1) & F.month("event_date").isin(
        1, 3, 5, 7, 8, 10, 12
    )
    at_event = at_event.filter(
        (F.col("full_criteria") == 1)
        & (F.col("hospice") == 0)
        & (
            need_1_month
            | ((F.col("full_criteria_p_2_m") == 2) & (F.col("hospice_p_2_m") == 0))
        )
    )
    if rules.get("prior_coverage"):
        at_event = at_event.filter(
            (F.col("full_criteria_t_12_m") >= 11) & (F.col("hospice_t_12_m") == 0)
        )
    event_age = age_birthday(F.col("dob"), F.col("event_date"))
    at_event = at_event.withColumn("event_date_age", event_age).filter(
        F.col("event_date_age") >= rules["event_age_min"]
    )
    if "event_age_max" in rules:
        at_event = at_event.filter(
            F.col("event_date_age") <= rules["event_age_max"]
        )
    if rules.get("residency"):
        resident = denom.filter(
            (F.col("year_month") == end_month)
            & (F.col("enrolled_any_t_12_m") >= 11)
        ).select(id_col)
        at_event = at_event.join(resident, id_col, "left_semi")

    per_member = at_event.groupBy(id_col).agg(
        F.max("event_date_age").alias("end_month_age"),
        F.sum("denominator").alias("denominator"),
        F.sum("numerator").alias("numerator"),
    )
    if "event_age_max" in rules:
        # PCR also filters the person-level age (sp_perf_measures.sql:1249)
        per_member = per_member.filter(
            F.col("end_month_age").between(
                rules["event_age_min"], rules["event_age_max"]
            )
        )
    return (
        per_member.join(
            F.broadcast(age_grp.select("age", F.col(age_group_col).alias("age_grp"))),
            per_member["end_month_age"] == F.col("age"),
            "left",
        )
        .select(
            F.lit(beg_month).alias("beg_year_month"),
            F.lit(end_month).alias("end_year_month"),
            id_col,
            "end_month_age",
            "age_grp",
            F.lit(measure_id).alias("measure_id"),
            F.col("denominator").cast("long"),
            F.col("numerator").cast("long"),
        )
    )


def yyyymm_add_py(ym: int, months: int) -> int:
    """Python-side yyyymm arithmetic (driver constants only)."""
    y, m = divmod(ym, 100)
    total = y * 12 + (m - 1) + months
    return (total // 12) * 100 + (total % 12) + 1
