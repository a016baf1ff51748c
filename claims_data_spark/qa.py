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


def run_qa(spark: SparkSession, checks: list[QaResult], table: str) -> DataFrame:
    """Collect results into a QA-log DataFrame (the reference writes
    PASS/FAIL rows into ``metadata.qa_mcaid``)."""
    rows = [(table, n, "PASS" if ok else "FAIL", detail) for n, ok, detail in checks]
    log = spark.createDataFrame(
        rows, "table string, qa_item string, qa_result string, note string"
    ).withColumn("qa_date", F.current_timestamp())
    return log
