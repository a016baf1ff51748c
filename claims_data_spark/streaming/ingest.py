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


def streaming_refresh(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    target_path: str,
    natural_keys: list[str],
    checkpoint_dir: str,
    fmt: str = "parquet",
):
    """Continuous form of the reference's monthly partial refresh
    (``master_mcaid_partial.R`` — replace duplicates, append the
    rest): a file-source stream drives ``foreachBatch``, and every
    micro-batch runs the SAME ``incremental_merge`` contract the batch
    loader uses (anti-join existing on the natural keys, union, atomic
    directory swap). Exactly-once across restarts comes from the
    checkpointed source offsets: a replayed batch re-merges the same
    rows, and the key-replace contract makes that idempotent — so the
    sink needs no transaction log of its own.

    Returns the ``StreamingQuery``; callers own ``awaitTermination``
    / ``stop``. Scale note: each micro-batch rewrite is bounded by
    the merge target, not the stream history; for 100 TB targets the
    same callback swaps to a MERGE INTO on a transactional table
    format (documented in ``incremental_merge``).
    """
    from claims_data_spark.sources.io import incremental_merge

    stream = (
        spark.readStream.format(fmt).schema(schema).load(source_dir)
    )

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # dedup within the batch first (a file drop may repeat keys);
        # deterministic keep-latest via max struct ordering on every
        # non-key column is overkill here — the reference replaces
        # whole key groups, so distinct on full rows suffices
        incremental_merge(
            batch_df.sparkSession,
            target_path,
            batch_df.dropDuplicates(natural_keys),
            natural_keys,
            fmt=fmt,
            write_back=True,
        )

    return (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event dedup on a stream: at-least-once sources
    (Kafka redeliveries, file re-drops) emit the same logical event
    more than once; this keeps the FIRST arrival per key and drops
    replays that land within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state: a key's
    fingerprint is held only until the watermark passes its event
    time, so state size tracks the late-data horizon, not the stream's
    lifetime — the property that makes streaming dedup viable on an
    unbounded 100 TB/day feed where ``dropDuplicates`` (which must
    remember every key forever) would OOM the state store.

    On a batch frame (the harness's oracle-comparable mode) the same
    call degrades to plain ``dropDuplicates`` semantics over the
    bounded input; the streaming path (availableNow file source +
    replay drop) is pinned by ``tests/test_corpus_curation2.py``.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def stream_enrich(
    events: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a stream against a
    batch reference table (claim-type crosswalk, geo dims, value
    sets — the same dimensions every batch builder broadcasts).

    Stream-static joins need NO watermark and keep NO state: Spark
    re-plans the static side per micro-batch (so a slowly-refreshed
    dimension picks up changes between batches) and the broadcast
    hint keeps the stream side un-shuffled — each micro-batch is a
    map-only probe, the property that lets enrichment ride at ingest
    throughput on an unbounded feed. Inner and left joins are the
    supported shapes (right/full against a stream would need the
    unmatched-static state Spark refuses).
    """
    if how not in ("inner", "left"):
        raise ValueError("stream-static enrichment supports inner/left")
    return events.join(F.broadcast(dim), keys, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    join_window: str = "interval 1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM equi-join with an event-time range constraint —
    the missing fourth join shape next to stream-static enrichment
    (claims arriving on one feed matched to eligibility/authorization
    events arriving on another; impressions-to-clicks in the corpus
    world).

    State-boundedness contract: BOTH sides carry watermarks and the
    join condition bounds the two event times against each other
    (``right_ts`` within [left_ts, left_ts + join_window]), so Spark
    can evict a buffered row the moment no future match can arrive —
    without the range condition an inner stream-stream join buffers
    both streams FOREVER. For outer joins the range + watermarks are
    mandatory (Spark refuses otherwise) and the unmatched side emits
    only after the watermark passes — the documented latency trade.

    Scale shape: one exchange per side keyed on the join key; state
    per key is the rows inside the watermark+window horizon, so state
    size tracks feed rate x horizon, never stream lifetime.
    """
    if how not in ("inner", "leftOuter", "rightOuter", "fullOuter"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    lw = left.withWatermark(left_ts, left_watermark).alias("l")
    rw = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(join_window)
        )
    )
    return lw.join(rw, cond, how)


def streaming_clean(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
    min_lang_hits: int = 1,
    blocklist: list | None = None,
    max_blocklist_hits: int = 0,
) -> DataFrame:
    """Row-local corpus cleaning gates applied ON THE STREAM — the
    continuous-ingest form of :func:`operators.corpus.
    clean_corpus_status` minus the dedup stage (exact dedup needs
    corpus-wide state; on a stream that job belongs to
    ``streaming_ingest``'s watermarked natural-key dedup or the batch
    reconciliation). Each micro-batch pays only map-side expressions
    (quality score, language markers, blocklist hits) — no state
    store, no shuffle — so the gate adds zero latency classes to the
    ingest: the same filter-first discipline the batch pipeline uses,
    applied before rows ever reach stateful operators.

    Returns the stream with ``quality`` and ``status`` columns
    (``low_quality`` | ``blocked`` | ``wrong_lang`` | ``kept``);
    filter on ``status = 'kept'`` to gate, or sink the full frame to
    keep rejection audit trails flowing into the same telemetry the
    batch report feeds.
    """
    from claims_data_spark.functions.text import (
        blocklist_hits,
        lang_marker_hits,
        quality_score,
    )

    q = F.coalesce(quality_score(text_col), F.lit(0.0))
    hits = F.coalesce(lang_marker_hits(text_col, lang), F.lit(0))
    bl = (
        F.coalesce(blocklist_hits(text_col, blocklist), F.lit(0))
        if blocklist
        else F.lit(0)
    )
    status = (
        F.when(q < min_quality, "low_quality")
        .when(bl > max_blocklist_hits, "blocked")
        .when(hits < min_lang_hits, "wrong_lang")
        .otherwise("kept")
    )
    return stream.withColumn("quality", q).withColumn("status", status)
