"""Streaming ingest + event-time aggregation.

``streaming_ingest`` reproduces the reference's refresh contract
(``README.md:5`` — replace duplicates, append the rest) as a
Structured Streaming flow: file source → watermark →
``dropDuplicates`` on the natural keys → append sink. Exactly-once
comes from the checkpointed source offsets plus the dedup state.

``windowed_counts`` is the standard watermarked tumbling/sliding
aggregation for the extended `events` scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    natural_keys: list[str],
    ts_col: str,
    watermark: str = "1 day",
    fmt: str = "parquet",
) -> DataFrame:
    """File-source stream deduplicated on natural keys within the
    watermark horizon. ``dropDuplicatesWithinWatermark`` is the
    bounded-state form: plain ``dropDuplicates`` on keys that exclude
    the event-time column would keep every key ever seen in the state
    store forever. Late duplicates beyond the horizon are handled by
    the batch reconciliation job (``sources.io.incremental_merge``),
    the same split the reference makes between monthly refresh and
    full rebuild."""
    stream = (
        spark.readStream.format(fmt).schema(schema).load(source_dir)
    )
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        natural_keys
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling (or sliding) event-time counts."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    gcols = group_cols or []
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *gcols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *gcols,
            "n_events",
            "sum_value",
        )
    )
