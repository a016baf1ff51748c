"""Sketch accuracy and mergeability: estimates within tolerance of
exact; merged fine-grain sketches equal a direct coarse-grain sketch."""

from pyspark.sql import functions as F

from claims_data_spark.operators.sketches import (
    approx_count_distinct,
    approx_quantiles,
    rollup_distinct_via_sketches,
)


def test_approx_count_distinct_tolerance(spark):
    df = spark.range(100_000).select((F.col("id") % 9173).alias("v"))
    approx = df.agg(approx_count_distinct("v", 0.02).alias("a")).collect()[0]["a"]
    assert abs(approx - 9173) / 9173 < 0.05


def test_hll_rollup_merge(spark):
    # members spread over months; year distinct from merged month sketches
    df = spark.range(50_000).select(
        (F.col("id") % 12 + 1).alias("month"),
        F.lit(2020).alias("year"),
        (F.col("id") % 7001).alias("member"),
    )
    rolled = rollup_distinct_via_sketches(
        df, ["year", "month"], ["year"], "member"
    ).collect()[0]
    assert rolled["n_rows"] == 50_000
    assert abs(rolled["approx_distinct"] - 7001) / 7001 < 0.05


def test_approx_quantiles(spark):
    df = spark.range(10_000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    q = approx_quantiles(df, ["g"], "v", probs=[0.5, 0.99]).collect()[0]
    assert abs(q["p5"] - 5000) < 200
    assert abs(q["p99"] - 9900) < 200
