"""applyInPandasWithState: state must survive micro-batch boundaries —
two availableNow rounds against one checkpoint; the second round's
emissions reflect totals accumulated across both rounds."""

import datetime as dt

from pyspark.sql import functions as F

from claims_data_spark.streaming.stateful import running_totals


def _write_batch(spark, src, rows, mode):
    df = spark.createDataFrame(rows, "user_id long, value double, ts timestamp")
    df.coalesce(1).write.mode(mode).parquet(src)


def _run_round(spark, src, ckpt, sink):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = running_totals(stream)

    def sink_batch(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink)

    q = (
        out.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_survives_microbatches(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    t = dt.datetime(2024, 1, 1, 10)
    _write_batch(spark, src, [(1, 10.0, t), (1, 5.0, t), (2, 7.0, t)], "overwrite")
    _run_round(spark, src, ckpt, sink)
    _write_batch(spark, src, [(1, 1.0, t), (3, 2.0, t)], "append")
    _run_round(spark, src, ckpt, sink)

    rows = spark.read.parquet(sink).collect()
    last_batch = max(r["batch_id"] for r in rows)
    first = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in rows
        if r["batch_id"] < last_batch
    }
    latest = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in rows
        if r["batch_id"] == last_batch
    }
    assert first == {1: (2, 15.0), 2: (1, 7.0)}
    # user 1's round-2 emission folds +1 into the checkpointed state:
    # (3, 16.0) — state crossed the query restart
    assert latest[1] == (3, 16.0)
    assert latest[3] == (1, 2.0)
    assert 2 not in latest  # update mode: unchanged keys not re-emitted


def test_streaming_refresh_replace_dups_append_rest(spark, tmp_path):
    """streaming_refresh: the reference's partial-refresh contract
    driven by a file stream — first drop loads, second drop replaces
    the overlapping key and appends the new one; a restart with no new
    files is a no-op (checkpointed offsets)."""
    import pyspark.sql.types as T
    from claims_data_spark.streaming.ingest import streaming_refresh

    src = tmp_path / "drops"
    src.mkdir()
    target = str(tmp_path / "claims_target")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([
        T.StructField("claim_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ])

    def drop(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    drop("m1", [(1, 10.0), (2, 20.0)])
    q = streaming_refresh(spark, str(src) + "/*", schema, target,
                          ["claim_id"], ckpt)
    q.awaitTermination(120)
    got = {r["claim_id"]: r["amount"]
           for r in spark.read.parquet(target).collect()}
    assert got == {1: 10.0, 2: 20.0}

    # second monthly drop: claim 2 corrected, claim 3 new
    drop("m2", [(2, 25.0), (3, 30.0)])
    q = streaming_refresh(spark, str(src) + "/*", schema, target,
                          ["claim_id"], ckpt)
    q.awaitTermination(120)
    got = {r["claim_id"]: r["amount"]
           for r in spark.read.parquet(target).collect()}
    assert got == {1: 10.0, 2: 25.0, 3: 30.0}

    # restart with nothing new: checkpoint makes it a no-op
    q = streaming_refresh(spark, str(src) + "/*", schema, target,
                          ["claim_id"], ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(target).count() == 3


def test_stream_stream_join_real_streams(spark, tmp_path):
    """Stream-STREAM join over two real file-source streams: matches
    inside the event-time window emit; a right-side event outside the
    window never joins; state stays bounded by the watermark+range
    contract (the query would be rejected outright without it)."""
    from pyspark.sql import types as T

    from claims_data_spark.streaming.ingest import stream_stream_join

    lsrc, rsrc, ckpt, sink = (
        str(tmp_path / d) for d in ("lsrc", "rsrc", "ckpt", "sink")
    )
    t0 = dt.datetime(2024, 1, 1, 10)
    claims = spark.createDataFrame(
        [(1, "c1", t0), (2, "c2", t0)],
        "member_id long, claim_id string, cts timestamp",
    )
    auths = spark.createDataFrame(
        [
            (1, "a1", t0 + dt.timedelta(minutes=30)),   # inside window
            (2, "a2", t0 + dt.timedelta(hours=5)),      # outside window
        ],
        "member_id long, auth_id string, ats timestamp",
    )
    claims.coalesce(1).write.parquet(lsrc)
    auths.coalesce(1).write.parquet(rsrc)

    lschema = T.StructType([
        T.StructField("member_id", T.LongType()),
        T.StructField("claim_id", T.StringType()),
        T.StructField("cts", T.TimestampType()),
    ])
    rschema = T.StructType([
        T.StructField("member_id", T.LongType()),
        T.StructField("auth_id", T.StringType()),
        T.StructField("ats", T.TimestampType()),
    ])
    lstream = spark.readStream.schema(lschema).parquet(lsrc)
    rstream = spark.readStream.schema(rschema).parquet(rsrc)
    joined = stream_stream_join(
        lstream, rstream, "member_id", "cts", "ats",
        join_window="interval 1 hour",
    )
    q = (
        joined.select("claim_id", "auth_id")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["claim_id"], r["auth_id"])
           for r in spark.read.parquet(sink).collect()}
    assert got == {("c1", "a1")}


def test_stream_stream_join_rejects_unknown_type(spark):
    import pytest as _pytest

    from claims_data_spark.streaming.ingest import stream_stream_join

    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))],
                               "k long, ts timestamp")
    with _pytest.raises(ValueError, match="unsupported"):
        stream_stream_join(df, df, "k", "ts", "ts", how="semi")


def test_streaming_clean_gates_on_a_real_stream(spark, tmp_path):
    """streaming_clean: the row-local corpus gates run per micro-batch
    with NO state store — statuses match the batch operator's rules
    and the kept filter flows through a real readStream."""
    import pyspark.sql.types as T
    from claims_data_spark.streaming.ingest import streaming_clean

    src = str(tmp_path / "docs_src")
    good = ("the quick brown fox jumps over the lazy dog and then a "
            "few more words of fine quality text to pass the gate")
    rows = [
        (1, good),
        (2, "zz"),                      # low quality
        (3, good + " badword"),         # blocked
        (4, "uno dos tres quatro cinco seis siete ocho nueve diez "
            "once doce trece catorce quince " * 3),  # wrong lang
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    gated = streaming_clean(
        stream, min_quality=0.5, blocklist=["badword"]
    )
    q = (
        gated.writeStream.format("memory").queryName("t_sclean")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r["status"]
            for r in spark.sql("SELECT * FROM t_sclean").collect()
        }
    finally:
        q.stop()
    assert got == {1: "kept", 2: "low_quality", 3: "blocked",
                   4: "wrong_lang"}
