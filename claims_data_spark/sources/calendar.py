"""Calendar / date dimension (SURVEY.md §2.3 J15, FIXTURES.md §11).

The reference maintains ``ref.date`` with one row per day, month
bounds, weekend and (US federal) holiday flags
(``ref/tables/load_ref.date.sql:1-120``). Spark-first this is
``sequence`` + ``explode`` — generated, never stored row-by-row, and
broadcast wherever it joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def date_dim(spark, start: str, end: str) -> DataFrame:
    """One row per day in [start, end]: date, year_month_day int,
    first/last day of month, is_weekend, week_of_year."""
    base = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )
    return base.select(
        "date",
        (F.year("date") * 10000 + F.month("date") * 100 + F.dayofmonth("date"))
        .cast("int")
        .alias("year_month_day"),
        F.trunc("date", "month").alias("first_day_month"),
        F.last_day("date").alias("last_day_month"),
        F.dayofweek("date").isin(1, 7).alias("is_weekend"),
        F.weekofyear("date").alias("week_of_year"),
    )
