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
