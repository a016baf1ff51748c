"""Golden micro-fixtures for interval algebra (FIXTURES.md §14:
hand-computed islands, clipping, coverage, re-segmentation).

These encode the reference's trickiest semantics: closed intervals,
the gap-of-exactly-1-day "contiguous" rule
(load_stage.mcaid_elig_timevar.R:461-463), contained intervals, and
the boundary-point dual-timeline merge
(load_stage.mcaid_mcare_elig_timevar.R:108-239).
"""

import datetime as dt

from pyspark.sql import functions as F

from claims_data_spark.operators.intervals import (
    collapse_islands,
    coverage_stats,
    resegment_overlaps,
)


def d(s):
    return dt.date.fromisoformat(s)


def make_intervals(spark, rows):
    return spark.createDataFrame(rows, "id string, from_date date, to_date date")


def test_islands_merge_adjacent_and_gap1(spark):
    # months 2017-01..03 then 2017-05..06 (gap of one full month)
    rows = [
        ("a", d("2017-01-01"), d("2017-01-31")),
        ("a", d("2017-02-01"), d("2017-02-28")),
        ("a", d("2017-03-01"), d("2017-03-31")),
        ("a", d("2017-05-01"), d("2017-05-31")),
        ("a", d("2017-06-01"), d("2017-06-30")),
    ]
    out = collapse_islands(make_intervals(spark, rows), ["id"], max_gap_days=1)
    got = {(r["from_date"], r["to_date"], r["n_segments"], r["island_days"]) for r in out.collect()}
    assert got == {
        (d("2017-01-01"), d("2017-03-31"), 3, 90),
        (d("2017-05-01"), d("2017-06-30"), 2, 61),
    }


def test_islands_gap_exactly_2_days_splits(spark):
    rows = [
        ("a", d("2020-01-01"), d("2020-01-10")),
        ("a", d("2020-01-12"), d("2020-01-20")),  # gap == 2 days -> split at max_gap_days=1
    ]
    out = collapse_islands(make_intervals(spark, rows), ["id"], max_gap_days=1)
    assert out.count() == 2
    out2 = collapse_islands(make_intervals(spark, rows), ["id"], max_gap_days=2)
    assert out2.count() == 1


def test_islands_contained_interval(spark):
    # [1,31] contains [5,10]; a later row must compare against the
    # RUNNING max(to), not the previous row's to
    rows = [
        ("a", d("2020-01-01"), d("2020-01-31")),
        ("a", d("2020-01-05"), d("2020-01-10")),
        ("a", d("2020-02-01"), d("2020-02-05")),
    ]
    out = collapse_islands(make_intervals(spark, rows), ["id"], max_gap_days=1)
    got = {(r["from_date"], r["to_date"]) for r in out.collect()}
    assert got == {(d("2020-01-01"), d("2020-02-05"))}


def test_islands_split_by_group_cols(spark):
    rows = [
        ("a", d("2020-01-01"), d("2020-01-31")),
        ("a", d("2020-02-01"), d("2020-02-28")),
    ]
    df = make_intervals(spark, rows).withColumn(
        "zip", F.when(F.col("from_date") < F.lit("2020-02-01"), "98101").otherwise("98052")
    )
    out = collapse_islands(df, ["id"], group_cols=["zip"], max_gap_days=1)
    assert out.count() == 2  # address change splits the island


def test_coverage_stats_golden(spark):
    # window 2020-01-01..2020-12-31 (366 days, leap)
    rows = [
        ("a", d("2020-01-11"), d("2020-03-10")),  # 60 days
        ("a", d("2020-03-01"), d("2020-04-09")),  # overlaps; union to 2020-01-11..04-09 = 90 days
        ("a", d("2020-07-01"), d("2020-07-30")),  # 30 days; inner gap 82 days (04-10..06-30)
        ("b", d("2019-01-01"), d("2021-12-31")),  # covers whole window
        ("c", d("2019-12-01"), d("2019-12-31")),  # outside window entirely
    ]
    out = coverage_stats(
        make_intervals(spark, rows), ["id"], "from_date", "to_date",
        "2020-01-01", "2020-12-31",
    )
    r = {x["id"]: x for x in out.collect()}
    assert set(r) == {"a", "b"}  # c filtered: no overlap
    a = r["a"]
    assert a["cov_days"] == 120
    assert a["pre_gap"] == 10
    assert a["post_gap"] == 154  # 07-31..12-31
    assert a["covgap_max"] == 154
    assert float(a["cov_pct"]) == round(120 / 366 * 100, 1)
    b = r["b"]
    assert b["cov_days"] == 366 and b["pre_gap"] == 0 and b["post_gap"] == 0
    assert b["covgap_max"] == 0


def test_resegment_golden(spark):
    # A covers [1..10], B covers [6..15]: segments [1-5 A], [6-10 AB], [11-15 B]
    a = make_intervals(spark, [("p", d("2020-01-01"), d("2020-01-10"))])
    b = make_intervals(spark, [("p", d("2020-01-06"), d("2020-01-15"))])
    out = resegment_overlaps(a, b, "id").orderBy("from_date").collect()
    got = [(r["from_date"], r["to_date"], r["a"], r["b"]) for r in out]
    assert got == [
        (d("2020-01-01"), d("2020-01-05"), True, False),
        (d("2020-01-06"), d("2020-01-10"), True, True),
        (d("2020-01-11"), d("2020-01-15"), False, True),
    ]


def test_resegment_disjoint_sides(spark):
    a = make_intervals(spark, [("p", d("2020-01-01"), d("2020-01-05"))])
    b = make_intervals(spark, [("p", d("2020-02-01"), d("2020-02-05"))])
    out = resegment_overlaps(a, b, "id").orderBy("from_date").collect()
    got = [(r["from_date"], r["to_date"], r["a"], r["b"]) for r in out]
    # the gap between them is uncovered -> no segment emitted for it
    assert got == [
        (d("2020-01-01"), d("2020-01-05"), True, False),
        (d("2020-02-01"), d("2020-02-05"), False, True),
    ]
