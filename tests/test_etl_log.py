"""ETL batch log semantics (etl_log.R / qa_load_file.R)."""

import tempfile

import pytest

from claims_data_spark.sources.etl_log import (
    latest_batch,
    log_batch,
    qa_file_row_count,
    qa_log,
)


@pytest.fixture()
def log_dir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def test_batch_ids_increment_and_reuse(spark, log_dir):
    b1 = log_batch(
        spark, log_dir, "full", "Medicaid", "2017-01-01", "2017-12-31",
        "2018-02-01", "mcaid_2017.csv", row_cnt=100,
    )
    assert b1 == 1
    b2 = log_batch(
        spark, log_dir, "incremental", "APCD", "2018-01-01", "2018-03-31",
        "2018-05-01", "apcd_q1.csv",
    )
    assert b2 == 2
    # exact match on (source, type, dates, file) reuses the batch
    again = log_batch(
        spark, log_dir, "full", "Medicaid", "2017-01-01", "2017-12-31",
        "2018-03-01", "mcaid_2017.csv",
    )
    assert again == 1
    # auto_reuse off mints a new id
    forced = log_batch(
        spark, log_dir, "full", "Medicaid", "2017-01-01", "2017-12-31",
        "2018-03-01", "mcaid_2017.csv", auto_reuse=False,
    )
    assert forced == 3
    latest = latest_batch(spark, log_dir, "Medicaid")
    assert latest.etl_batch_id == 3


def test_log_batch_validation(spark, log_dir):
    with pytest.raises(ValueError):
        log_batch(spark, log_dir, "weekly", "Medicaid", "2017-01-01",
                  "2017-12-31", "2018-02-01", "x.csv")
    with pytest.raises(ValueError):
        log_batch(spark, log_dir, "full", "Commercial", "2017-01-01",
                  "2017-12-31", "2018-02-01", "x.csv")
    with pytest.raises(ValueError):
        log_batch(spark, log_dir, "full", "Medicaid", "2017-13-99",
                  "2017-12-31", "2018-02-01", "x.csv")


def test_qa_row_count_gate(spark, log_dir):
    b = log_batch(
        spark, log_dir, "full", "Medicare", "2016-01-01", "2016-12-31",
        "2017-06-01", "mcare.csv", row_cnt=3,
    )
    df = spark.createDataFrame([(1,), (2,), (3,)], "x int")
    assert qa_file_row_count(spark, log_dir, b, df, 3, "mcare_raw") is True
    assert qa_file_row_count(spark, log_dir, b, df, 4, "mcare_raw") is False
    qa = spark.read.parquet(f"{log_dir}/qa_log").collect()
    results = sorted(r.qa_result for r in qa)
    assert results == ["FAIL", "PASS"]
    assert all(r.etl_batch_id == b for r in qa)


def test_qa_column_order_gate(spark, tmp_path):
    from claims_data_spark.sources.etl_log import qa_column_order

    log_dir = str(tmp_path / "meta")
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    assert qa_column_order(spark, log_dir, 1, df, ["id", "name"], "t")
    assert not qa_column_order(spark, log_dir, 1, df, ["name", "id"], "t")
    rows = spark.read.parquet(f"{log_dir}/qa_log").collect()
    results = {r["qa_result"] for r in rows}
    assert results == {"PASS", "FAIL"}
    assert all(r["qa_item"] == "column_order" for r in rows)
