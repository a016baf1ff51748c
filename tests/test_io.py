"""Source/sink layer: declared-schema reads, bucketed co-located
joins (shuffle elimination), promotion QA."""

import pytest
from pyspark.sql import functions as F

from claims_data_spark.schema import struct_type
from claims_data_spark.sources.io import (
    promote,
    read_file,
    with_audit,
    write_bucketed,
    write_table,
)


def test_csv_read_with_declared_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,amount,when\n1,10.50,2020-01-02\n2,99.99,2020-02-03\n")
    schema = struct_type({"id": "bigint", "amount": "numeric(10,2)", "when": "date"})
    df = read_file(spark, str(p), "csv", schema=schema)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "decimal(10,2)", "date",
    ]
    assert df.count() == 2


def test_audit_column(spark):
    df = with_audit(spark.range(3))
    assert "last_run" in df.columns
    assert df.filter(F.col("last_run").isNull()).count() == 0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with
    zero Exchange operators — the co-located join the reference gets
    from HASH distribution."""
    import shutil

    for t in ("t_orders_b", "t_lines_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    lines = spark.range(3000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v2")
    )
    write_bucketed(orders, "t_orders_b", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(lines, "t_lines_b", ["k"], num_buckets=8, sort_cols=["k"])
    # disable auto-broadcast: at test size the planner would broadcast
    # (and skip bucketing); at 100 TB neither side is broadcastable and
    # the bucketed sort-merge path is exactly what runs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(spark.table("t_lines_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_promote_rowcount_gate(spark, tmp_path):
    stage = str(tmp_path / "stage")
    final = str(tmp_path / "final")
    write_table(spark.range(5).toDF("id"), stage)
    n = promote(spark, stage, final, expected_rows=5)
    assert n == 5
    assert read_file(spark, final).count() == 5
    with pytest.raises(AssertionError):
        promote(spark, stage, final, expected_rows=99)
