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


def test_hll_merge_associativity_exact_bytes(spark):
    """sketch(A ∪ B) must equal merge(sketch(A), sketch(B)) as an
    ESTIMATE-EXACT identity, and merging in either grouping order must
    produce identical estimates — the property that makes the
    rows-only driver ruling for the sketch rollup airtight: any
    partial/merge tree over the same rows converges to the same
    sketch state.

    Byte-exactness caveat: serialized HLL blobs can differ in
    compact/updatable encoding while representing the same registers,
    so the pinned identity is on the union-estimate of the sketch
    states, which is a pure function of the register array."""
    from claims_data_spark.operators.sketches import (
        hll_merge_estimate,
        hll_partial,
    )

    df = spark.range(60_000).select(
        (F.col("id") % 3).alias("part3"),
        (F.col("id") % 5).alias("part5"),
        (F.col("id") % 4999).alias("member"),
    )
    # direct sketch over everything
    direct = df.agg(
        F.hll_sketch_estimate(hll_partial("member")).alias("e")
    ).collect()[0]["e"]
    # partials by two DIFFERENT partitionings, merged
    via3 = (
        df.groupBy("part3").agg(hll_partial("member").alias("_sk"))
        .agg(hll_merge_estimate("_sk").alias("e")).collect()[0]["e"]
    )
    via5 = (
        df.groupBy("part5").agg(hll_partial("member").alias("_sk"))
        .agg(hll_merge_estimate("_sk").alias("e")).collect()[0]["e"]
    )
    # two-level merge tree (3 then re-merge) — associativity
    via3_tree = (
        df.groupBy("part3", "part5").agg(hll_partial("member").alias("_sk"))
        .groupBy("part3").agg(
            F.hll_union_agg(F.col("_sk"), F.lit(False)).alias("_sk")
        )
        .agg(hll_merge_estimate("_sk").alias("e")).collect()[0]["e"]
    )
    assert direct == via3 == via5 == via3_tree
    # and the estimate is in tolerance of the exact answer
    assert abs(direct - 4999) / 4999 < 0.05

def test_hll_det_rollup_accuracy_and_merge(spark):
    """The deterministic md5-register mirror (round-9): estimate in
    HLL tolerance of exact (rsd ~ 1.04/sqrt(256) = 6.5%), and the
    fine->coarse max-merge equals sketching directly at the coarse
    grain — register algebra, not just estimates."""
    from claims_data_spark.operators.sketches import hll_det_rollup

    df = spark.range(60_000).select(
        (F.col("id") % 12 + 1).alias("month"),
        F.lit(2020).alias("year"),
        (F.col("id") % 7001).alias("member"),
    )
    merged = hll_det_rollup(df, ["year", "month"], ["year"], "member").collect()[0]
    direct = hll_det_rollup(df, ["year"], ["year"], "member").collect()[0]
    assert merged.asDict() == direct.asDict()
    assert merged["m"] == 256
    assert abs(merged["est_floor"] - 7001) / 7001 < 0.15
    # denominator is the integer-scaled harmonic sum: reconstructable
    # bound checks (every register in [1, 49], denom within the
    # all-zero .. all-max envelope)
    assert 0 < merged["n_present"] <= 256
    assert merged["sum_rank"] >= merged["n_present"]
    assert merged["denom_scaled"] <= 256 * (1 << 49)


def test_hll_det_rollup_skips_nulls(spark):
    """Round-9 advice: NULL values must not mint a register row
    (DataSketches update semantics skip nulls); with the fix, a frame
    with NULLs sketches identically to the same frame without them."""
    from claims_data_spark.operators.sketches import hll_det_rollup

    with_nulls = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("a", None)],
        "g string, v string",
    )
    without = spark.createDataFrame(
        [("a", "x"), ("a", "y")], "g string, v string"
    )
    r1 = hll_det_rollup(with_nulls, ["g"], ["g"], "v").collect()[0]
    r2 = hll_det_rollup(without, ["g"], ["g"], "v").collect()[0]
    assert r1.asDict() == r2.asDict()
