"""Data-quality assertion suite (SURVEY.md §5 — the reference's QA
scripts re-expressed as DataFrame property checks, e.g.
``qa_stage.mcaid_elig_timevar.R``, ``load_stage.apcd_claim_header.R:1104-1253``).

Each check returns a (name, passed, detail) tuple; ``run_qa`` collects
them into a QA-log DataFrame like the reference's
``metadata.qa_mcaid`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QaResult = tuple[str, bool, str]


def check_keys_unique(df: DataFrame, keys: list[str], name: str = "") -> QaResult:
    """Distinct-rows == total-rows on the key columns
    (``qa_stage.mcaid_elig_timevar.R:152-191``)."""
    total = df.count()
    distinct = df.select(*keys).distinct().count()
    return (
        name or f"unique({','.join(keys)})",
        total == distinct,
        f"total={total} distinct={distinct}",
    )


def check_referential(
    child: DataFrame, parent: DataFrame, keys: list[str], name: str = ""
) -> QaResult:
    """Every child key exists in the parent — left-anti must be empty
    (``load_stage.apcd_claim_header.R:1129-1148``)."""
    orphans = child.select(*keys).distinct().join(
        parent.select(*keys).distinct(), keys, "left_anti"
    ).count()
    return (name or f"referential({','.join(keys)})", orphans == 0, f"orphans={orphans}")


def check_event_id_single_person(
    df: DataFrame, event_id: str, person_id: str, name: str = ""
) -> QaResult:
    """No event id spans >1 person
    (``load_stage.apcd_claim_header.R:1165-1212``)."""
    bad = (
        df.filter(F.col(event_id).isNotNull())
        .groupBy(event_id)
        .agg(F.countDistinct(person_id).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    return (name or f"one-person({event_id})", bad == 0, f"violations={bad}")


def check_event_ids_dense(df: DataFrame, event_id: str, name: str = "") -> QaResult:
    """Dense ids skip no values (``:1213-1225``)."""
    agg = df.filter(F.col(event_id).isNotNull()).agg(
        F.countDistinct(event_id).alias("n"),
        F.min(event_id).alias("lo"),
        F.max(event_id).alias("hi"),
    ).collect()[0]
    dense = agg["n"] == 0 or (agg["lo"] == 1 and agg["hi"] == agg["n"])
    return (
        name or f"dense({event_id})",
        bool(dense),
        f"n={agg['n']} lo={agg['lo']} hi={agg['hi']}",
    )


def check_intervals_valid(
    df: DataFrame, from_col: str = "from_date", to_col: str = "to_date", name: str = ""
) -> QaResult:
    """from <= to on every row."""
    bad = df.filter(F.col(from_col) > F.col(to_col)).count()
    return (name or "intervals-valid", bad == 0, f"violations={bad}")


def check_no_overlap_within_person(
    df: DataFrame, id_cols: list[str], from_col: str = "from_date",
    to_col: str = "to_date", name: str = "",
) -> QaResult:
    """Per-person interval rows must not overlap (timevar invariant)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*id_cols).orderBy(from_col)
    bad = (
        df.withColumn("_prev_to", F.lag(to_col).over(w))
        .filter(F.col("_prev_to") >= F.col(from_col))
        .count()
    )
    return (name or "no-overlap", bad == 0, f"violations={bad}")


def check_rowcount_growth(
    current: int, previous: int | None, name: str = "rowcount-growth"
) -> QaResult:
    """Row count vs previous run, monotonic growth expected
    (``qa_stage.mcaid_elig_timevar.R:48-103``)."""
    ok = previous is None or current >= previous
    return (name, ok, f"current={current} previous={previous}")


def fused_table_qa(
    df: DataFrame,
    unique_keys: list[str] | None = None,
    interval_cols: tuple[str, str] | None = None,
    overlap_ids: list[str] | None = None,
    event_id: str | None = None,
    person_id: str | None = None,
    extra_flags: dict[str, F.Column] | None = None,
) -> list[QaResult]:
    """Run every per-table invariant in ONE Spark action.

    The per-check helpers above each trigger 1-2 jobs; a 5-check gate
    on a warehouse-scale table becomes ~8 full scans. This fuses them:
    row-local violations become flag columns, per-person overlap and
    per-event single-person become window flags (each window shares or
    adds one shuffle, not one scan), and everything collapses in a
    single ``agg`` — count, countDistinct on keys, sums of violation
    flags (reference QA suites: ``qa_stage.mcaid_elig_timevar.R``,
    ``load_stage.apcd_claim_header.R:964-1253``).

    ``extra_flags`` maps check name -> boolean VIOLATION predicate
    evaluated per row in the same pass (the predicate may reference
    window-derived columns the caller attached beforehand).
    """
    from pyspark.sql import Window

    work = df
    aggs = [F.count(F.lit(1)).alias("_total")]
    if unique_keys:
        aggs.append(
            F.countDistinct(*[F.col(k) for k in unique_keys]).alias("_distinct_keys")
        )
    if interval_cols:
        frm, to = interval_cols
        work = work.withColumn(
            "_iv_bad", (F.col(frm) > F.col(to)).cast("int")
        )
        aggs.append(F.sum("_iv_bad").alias("_iv_bad"))
    if overlap_ids:
        frm, to = interval_cols or ("from_date", "to_date")
        w = Window.partitionBy(*overlap_ids).orderBy(frm)
        work = work.withColumn(
            "_ov_bad",
            (F.lag(to).over(w) >= F.col(frm)).cast("int"),
        )
        aggs.append(F.sum(F.coalesce("_ov_bad", F.lit(0))).alias("_ov_bad"))
    if event_id and person_id:
        we = Window.partitionBy(event_id)
        work = work.withColumn(
            "_ev_multi",
            F.when(
                F.col(event_id).isNotNull()
                & (F.size(F.collect_set(person_id).over(we)) > 1),
                1,
            ).otherwise(0),
        )
        aggs.append(F.max("_ev_multi").alias("_ev_multi"))
    if event_id:
        nn = F.when(F.col(event_id).isNotNull(), F.col(event_id))
        aggs += [
            F.countDistinct(nn).alias("_ev_n"),
            F.min(nn).alias("_ev_lo"),
            F.max(nn).alias("_ev_hi"),
        ]
    for i, (fname, pred) in enumerate((extra_flags or {}).items()):
        work = work.withColumn(f"_xf_{i}", pred.cast("int"))
        aggs.append(F.sum(F.coalesce(f"_xf_{i}", F.lit(0))).alias(f"_xf_{i}"))

    row = work.agg(*aggs).collect()[0]
    out: list[QaResult] = []
    if unique_keys:
        out.append(
            (
                f"unique({','.join(unique_keys)})",
                row["_total"] == row["_distinct_keys"],
                f"total={row['_total']} distinct={row['_distinct_keys']}",
            )
        )
    if interval_cols:
        out.append(
            ("intervals-valid", (row["_iv_bad"] or 0) == 0, f"violations={row['_iv_bad'] or 0}")
        )
    if overlap_ids:
        out.append(
            ("no-overlap", (row["_ov_bad"] or 0) == 0, f"violations={row['_ov_bad'] or 0}")
        )
    if event_id and person_id:
        out.append(
            (f"one-person({event_id})", (row["_ev_multi"] or 0) == 0,
             f"multi-person-events={row['_ev_multi'] or 0}")
        )
    if event_id:
        dense = row["_ev_n"] == 0 or (
            row["_ev_lo"] == 1 and row["_ev_hi"] == row["_ev_n"]
        )
        out.append(
            (f"dense({event_id})", bool(dense),
             f"n={row['_ev_n']} lo={row['_ev_lo']} hi={row['_ev_hi']}")
        )
    for i, fname in enumerate(extra_flags or {}):
        bad = row[f"_xf_{i}"] or 0
        out.append((fname, bad == 0, f"violations={bad}"))
    return out


def run_qa(spark: SparkSession, checks: list[QaResult], table: str) -> DataFrame:
    """Collect results into a QA-log DataFrame (the reference writes
    PASS/FAIL rows into ``metadata.qa_mcaid``)."""
    rows = [(table, n, "PASS" if ok else "FAIL", detail) for n, ok, detail in checks]
    log = spark.createDataFrame(
        rows, "table string, qa_item string, qa_result string, note string"
    ).withColumn("qa_date", F.current_timestamp())
    return log


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column profile in ONE aggregation pass — the engine's version
    of the reference's metadata sprocs (``metadata/sprocs/
    create_metadata.sp_profile_table.sql`` / ``sp_min_max_value.sql``:
    per-column min / max / null counts driven by dynamic SQL, one
    query per column there, one fused ``agg`` here).

    Returns one row per profiled column: (column, non_null_count,
    null_count, approx_distinct, min_value, max_value) — min/max as
    strings so heterogeneous column types stack in one long frame.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"_cnt_{c}"),
            F.sum(col.isNull().cast("long")).alias(f"_null_{c}"),
            F.approx_count_distinct(col).alias(f"_dist_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"_cnt_{c}").alias("non_null_count"),
                    F.col(f"_null_{c}").alias("null_count"),
                    F.col(f"_dist_{c}").alias("approx_distinct"),
                    F.col(f"_min_{c}").alias("min_value"),
                    F.col(f"_max_{c}").alias("max_value"),
                )
                for c in cols
            ])
        ).alias("p")
    )
    return stacked.select("p.*")


def distinct_values_list(
    df: DataFrame, column: str, sep: str = ", ", limit: int = 1000
) -> DataFrame:
    """Sorted comma-separated distinct values of one column
    (``sp_comma_separated_list.sql`` — its FOR XML PATH idiom is
    ``array_join(sort_array(collect_set(...)))`` here, one partial-
    aggregated pass). ``limit`` caps the collected set so a
    high-cardinality column cannot blow the driver row."""
    return df.select(
        F.array_join(
            F.slice(
                F.sort_array(F.collect_set(F.col(column).cast("string"))),
                1, limit,
            ),
            sep,
        ).alias("values")
    )
