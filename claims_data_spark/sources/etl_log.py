"""ETL batch log + load-QA recording (reference:
``db_loader/scripts_general/etl_log.R`` — the ``metadata.etl_log``
table with incrementing batch ids and match-based reuse — and
``qa_load_file.R`` / ``qa_load_sql.R`` — per-load QA rows keyed by the
batch id).

The log is a small parquet-backed metadata table: single-row appends
from the driver are the correct pattern here (this is control-plane
metadata, one row per delivered extract, not data-plane volume).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_SCHEMA = (
    "etl_batch_id bigint, batch_type string, data_source string,"
    " date_min date, date_max date, delivery_date date,"
    " file_name string, row_cnt bigint, note string, load_ts timestamp"
)

_QA_SCHEMA = (
    "etl_batch_id bigint, table_name string, qa_item string,"
    " qa_result string, qa_date timestamp, note string"
)

_SOURCES = ("APCD", "Medicaid", "Medicare")


def _read_log(spark: SparkSession, log_dir: str) -> DataFrame | None:
    path = os.path.join(log_dir, "etl_log")
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def log_batch(
    spark: SparkSession,
    log_dir: str,
    batch_type: str,
    data_source: str,
    date_min: str,
    date_max: str,
    delivery_date: str,
    file_name: str,
    row_cnt: int | None = None,
    note: str | None = None,
    auto_reuse: bool = True,
) -> int:
    """Register a delivered extract and return its ``etl_batch_id``.

    Mirrors ``load_metadata_etl_log_file`` (etl_log.R:16-215): validate
    the argument surface, auto-reuse the most recent batch whose
    (source, batch type, date range, file name) matches exactly
    (the R function's "near-exact match" path), otherwise mint
    ``max(etl_batch_id) + 1`` and append one row."""
    if batch_type not in ("incremental", "full"):
        raise ValueError("batch_type must be 'incremental' or 'full'")
    if data_source not in _SOURCES:
        raise ValueError(f"data_source must be one of {_SOURCES}")
    for d in (date_min, date_max, delivery_date):
        _dt.date.fromisoformat(d)  # raises on bad format like the R stop()
    if not file_name:
        raise ValueError("file_name is required")

    existing = _read_log(spark, log_dir)
    next_id = 1
    if existing is not None:
        if auto_reuse:
            match = (
                existing.filter(
                    (F.col("data_source") == data_source)
                    & (F.col("batch_type") == batch_type)
                    & (F.col("date_min") == F.lit(date_min).cast("date"))
                    & (F.col("date_max") == F.lit(date_max).cast("date"))
                    & (F.col("file_name") == file_name)
                )
                .agg(F.max("etl_batch_id").alias("m"))
                .head()
            )
            if match and match.m is not None:
                return int(match.m)
        top = existing.agg(F.max("etl_batch_id").alias("m")).head()
        next_id = int(top.m) + 1 if top and top.m is not None else 1

    row = [(
        next_id, batch_type, data_source,
        _dt.date.fromisoformat(date_min), _dt.date.fromisoformat(date_max),
        _dt.date.fromisoformat(delivery_date), file_name,
        int(row_cnt) if row_cnt is not None else None, note,
        _dt.datetime.now(),
    )]
    spark.createDataFrame(row, _LOG_SCHEMA).write.mode("append").parquet(
        os.path.join(log_dir, "etl_log")
    )
    return next_id


def latest_batch(
    spark: SparkSession, log_dir: str, data_source: str | None = None
):
    """The most recent batch row (optionally per source) — the R
    retrieval query ``ORDER BY etl_batch_id DESC`` (etl_log.R:99-118).
    Returns None when the log is empty."""
    log = _read_log(spark, log_dir)
    if log is None:
        return None
    if data_source is not None:
        log = log.filter(F.col("data_source") == data_source)
    return log.orderBy(F.col("etl_batch_id").desc()).head()


def qa_log(
    spark: SparkSession,
    log_dir: str,
    etl_batch_id: int,
    table_name: str,
    qa_item: str,
    passed: bool,
    note: str | None = None,
) -> None:
    """Append one QA-result row keyed to a batch
    (``qa_load_file.R`` recording into ``metadata.qa_mcaid``)."""
    row = [(
        int(etl_batch_id), table_name, qa_item,
        "PASS" if passed else "FAIL", _dt.datetime.now(), note,
    )]
    spark.createDataFrame(row, _QA_SCHEMA).write.mode("append").parquet(
        os.path.join(log_dir, "qa_log")
    )


def qa_file_row_count(
    spark: SparkSession,
    log_dir: str,
    etl_batch_id: int,
    loaded: DataFrame,
    expected_rows: int,
    table_name: str,
) -> bool:
    """The ``qa_load_file.R`` row-count gate: loaded-table count vs
    the delivered file's row count, recorded in the QA log either way."""
    actual = loaded.count()
    ok = actual == expected_rows
    qa_log(
        spark, log_dir, etl_batch_id, table_name, "row_count", ok,
        note=f"expected={expected_rows} actual={actual}",
    )
    return ok


def qa_column_order(
    spark: SparkSession,
    log_dir: str,
    etl_batch_id: int,
    loaded: DataFrame,
    expected_columns: list[str],
    table_name: str,
) -> bool:
    """The ``qa_load_file.R`` column-order gate
    (``load_load_raw.mcaid_elig_full.R:120-150``): the delivered
    extract's column names AND order must match the load config —
    vendor schema drift is caught before any downstream stage runs.
    Schema-only check; no job is launched."""
    actual = list(loaded.columns)
    ok = actual == list(expected_columns)
    qa_log(
        spark, log_dir, etl_batch_id, table_name, "column_order", ok,
        note=None if ok else (
            f"expected={list(expected_columns)} actual={actual}"
        ),
    )
    return ok
