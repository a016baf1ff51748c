"""Multi-source parity: APCD covgrp timeline, identity crosswalk, and
the dual Medicaid/Medicare reconciliation, plus a real Structured
Streaming ingest round-trip."""

import datetime as dt

from pyspark.sql import functions as F

from claims_data_spark.tables.apcd import build_apcd_elig_timevar, derive_covgrp
from claims_data_spark.tables.xwalk import build_dual_elig_timevar, build_xwalk


def d(s):
    return dt.date.fromisoformat(s)


APCD_SCHEMA = (
    "internal_member_id long, year_month int, zip_code string, "
    "med_medicaid_eligibility_id long, med_medicare_eligibility_id long, "
    "med_commercial_eligibility_id long, rx_medicaid_eligibility_id long, "
    "dental_medicaid_eligibility_id long"
)


def test_apcd_covgrp_cases(spark):
    rows = [
        (1, 201701, "98101", 11, None, None, None, None),   # covgrp 1
        (1, 201702, "98101", 11, 22, None, None, None),     # covgrp 4 dual
        (2, 201701, "98052", None, None, 33, None, None),   # covgrp 3
        (3, 201701, "98004", None, None, None, 44, None),   # covgrp 8 rx-only
        (4, 201701, "98004", None, None, None, None, None), # covgrp 0 dropped
        (5, 201701, "98005", 1, 2, 3, None, None),          # covgrp 7
    ]
    df = spark.createDataFrame(rows, APCD_SCHEMA)
    grp = {
        (r["internal_member_id"], r["year_month"]): (r["covgrp"], r["dual_flag"])
        for r in derive_covgrp(df).collect()
    }
    assert grp[(1, 201701)] == (1, 0)
    assert grp[(1, 201702)] == (4, 1)
    assert grp[(2, 201701)] == (3, 0)
    assert grp[(3, 201701)] == (8, 0)
    assert grp[(4, 201701)] == (0, 0)
    assert grp[(5, 201701)] == (7, 1)


def test_apcd_timevar_islands(spark):
    rows = [
        (1, 201701, "98101", 11, None, None, None, None),
        (1, 201702, "98101", 11, None, None, None, None),  # merges with Jan
        (1, 201703, "98101", 11, 22, None, None, None),    # covgrp change splits
        (1, 201705, "98101", 11, None, None, None, None),  # gap splits
        (4, 201701, "98004", None, None, None, None, None),  # covgrp 0 dropped
    ]
    tv = build_apcd_elig_timevar(spark.createDataFrame(rows, APCD_SCHEMA))
    got = sorted(
        (r["id_apcd"], r["from_date"], r["to_date"], r["covgrp"], r["cov_time_day"])
        for r in tv.collect()
    )
    assert got == [
        (1, d("2017-01-01"), d("2017-02-28"), 1, 59),
        (1, d("2017-03-01"), d("2017-03-31"), 4, 31),
        (1, d("2017-05-01"), d("2017-05-31"), 1, 31),
    ]


def test_xwalk_and_dual_reconciliation(spark):
    mcaid_p = spark.createDataFrame(
        [("m1", d("1950-01-01"), "h1"), ("m2", d("1960-02-02"), "h2")],
        "id_mcaid string, dob date, name_hash string",
    )
    mcare_p = spark.createDataFrame(
        [("c1", d("1950-01-01"), "h1"), ("c3", d("1970-03-03"), "h3")],
        "id_mcare string, dob date, name_hash string",
    )
    xw = build_xwalk(mcaid_p, mcare_p, ["dob", "name_hash"])
    rows = {(r["id_mcaid"], r["id_mcare"]): r["id_apde"] for r in xw.collect()}
    assert ("m1", "c1") in rows          # matched pair shares one id
    assert ("m2", None) in rows          # unmatched keeps own row
    assert (None, "c3") in rows
    assert len({v for v in rows.values()}) == 3  # dense distinct ids

    mcaid_tv = spark.createDataFrame(
        [("m1", d("2020-01-01"), d("2020-06-30"))],
        "id_mcaid string, from_date date, to_date date",
    )
    mcare_tv = spark.createDataFrame(
        [("c1", d("2020-04-01"), d("2020-09-30"))],
        "id_mcare string, from_date date, to_date date",
    )
    dual = build_dual_elig_timevar(mcaid_tv, mcare_tv, xw)
    segs = sorted(
        (r["from_date"], r["to_date"], r["mcaid"], r["mcare"], r["dual"])
        for r in dual.collect()
    )
    assert segs == [
        (d("2020-01-01"), d("2020-03-31"), True, False, 0),
        (d("2020-04-01"), d("2020-06-30"), True, True, 1),
        (d("2020-07-01"), d("2020-09-30"), False, True, 0),
    ]


def test_streaming_ingest_roundtrip(spark, tmp_path):
    """Real readStream -> dropDuplicates -> sink, availableNow trigger:
    the reference's replace-duplicates refresh contract on a stream."""
    from pyspark.sql import types as T

    from claims_data_spark.streaming.ingest import streaming_ingest

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    schema = T.StructType(
        [
            T.StructField("claim_header_id", T.LongType()),
            T.StructField("claim_line_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    batch = spark.createDataFrame(
        [
            (1, 11, dt.datetime(2024, 1, 1, 10), 5.0),
            (1, 11, dt.datetime(2024, 1, 1, 10), 5.0),  # duplicate line
            (2, 21, dt.datetime(2024, 1, 1, 11), 7.0),
        ],
        schema,
    )
    batch.write.mode("overwrite").parquet(str(src))

    stream = streaming_ingest(
        spark, str(src), schema,
        natural_keys=["claim_header_id", "claim_line_id"],
        ts_col="ts",
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(sink))
    rows = {(r["claim_header_id"], r["claim_line_id"]) for r in out.collect()}
    assert rows == {(1, 11), (2, 21)}  # duplicate dropped
