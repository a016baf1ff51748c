"""Salted aggregation/join must agree exactly with their unsalted
forms (the salt is a pure execution detail)."""

from pyspark.sql import functions as F

from claims_data_spark.operators.skew import salted_agg, salted_join


def _skewed_df(spark):
    # one hot key (0) holding 80% of rows
    return spark.range(5000).select(
        F.when(F.col("id") % 5 != 0, 0).otherwise(F.col("id") % 97).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"s": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"]) for r in salted_join(fact, dim, "k").collect()
    )
    assert salted == plain


def test_salted_agg_rejects_nondecomposable(spark):
    import pytest

    with pytest.raises(ValueError):
        salted_agg(_skewed_df(spark), ["k"], {"m": ("median", "v")})
