"""Readers, writers, and table-lifecycle operations (SURVEY.md §2.1).

The reference's load surface — ``COPY INTO`` bulk ingest
(``copy_into.R``), chunked/per-year local loads (``load_table.R``),
archive-truncate-insert incremental refresh, stage→final promotion
(``table_duplicate``/``alter_schema``) — maps onto Spark writers plus
catalog operations. No row ever passes through the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_file(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    csv_options: dict[str, str] | None = None,
) -> DataFrame:
    """Bulk file ingest (COPY INTO analog, ``copy_into.R:21-32,213-224``):
    csv/parquet/orc with an optional declared schema. Compression
    (gzip/snappy/none) is transparent to Spark readers."""
    if fmt == "csv":
        opts = {"header": "true", "sep": ","}
        opts.update(csv_options or {})
        reader = spark.read.options(**opts)
        return reader.csv(path, schema=schema) if schema else reader.option(
            "inferSchema", "true"
        ).csv(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt in ("json", "jsonl"):
        # newline-delimited JSON — the interchange format of crawl
        # dumps and annotation exports. Pass a schema at scale:
        # schema inference is a FULL extra pass over the data.
        reader = spark.read
        return reader.json(path, schema=schema) if schema else reader.json(path)
    raise ValueError(f"unsupported format {fmt!r}")


def _swap_dir(tmp: str, final: str) -> None:
    """Replace ``final`` with ``tmp`` (local-FS atomic-ish swap; on an
    object store this is the rename the table format would manage)."""
    import shutil

    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)


def with_audit(df: DataFrame) -> DataFrame:
    """Every reference load appends ``getdate() AS last_run``
    (``load_stage.mcaid_claim_header.R:1049-1055``)."""
    return df.withColumn("last_run", F.current_timestamp())


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Partition-aware table write. ``partition_by`` is the per-year
    split the reference does with a load loop
    (``load_table.R:294-375``) — here it's a property of the layout,
    and downstream readers get dynamic partition pruning for free."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def incremental_merge(
    spark: SparkSession,
    existing_path: str,
    incoming: DataFrame,
    natural_keys: list[str],
    fmt: str = "parquet",
    write_back: bool = False,
) -> DataFrame:
    """The reference's refresh contract (``README.md:5``): "old records
    will be replaced with new records where duplicates exist, and new
    records without old duplicates will simply be appended."

    Without a transactional table format this is anti-join the existing
    rows against the incoming natural keys, union the incoming, rewrite
    (the reference's archive-truncate-insert, ``load_table.R:461-805``,
    does the same full rewrite server-side). On Delta/Iceberg the same
    function is a ``MERGE INTO`` keyed on the natural keys — the
    rewrite is then limited to touched files; we keep the API so the
    storage backend can swap in.

    The returned frame LAZILY READS ``existing_path`` — writing it
    straight back over that path would delete its own input mid-read.
    Pass ``write_back=True`` to do the rewrite safely (materialize to a
    temp sibling, atomic directory swap, return a reader over the new
    data).
    """
    if os.path.exists(existing_path):
        existing = read_file(spark, existing_path, fmt)
        kept = existing.join(
            incoming.select(*natural_keys).distinct(), natural_keys, "left_anti"
        )
        merged = kept.unionByName(incoming, allowMissingColumns=True)
    else:
        merged = incoming
    if not write_back:
        return merged
    tmp = existing_path.rstrip("/") + "._merge_tmp"
    merged.write.mode("overwrite").format(fmt).save(tmp)
    _swap_dir(tmp, existing_path)
    return read_file(spark, existing_path, fmt)


def update_columns(
    target: DataFrame,
    evidence: DataFrame,
    keys: list[str],
    updates: dict[str, str],
    only_when_null: bool = True,
    assume_unique: bool = False,
) -> DataFrame:
    """UPDATE-from-join (the reference's ``elig_demo_extra`` step:
    ``master_mcaid_analytic.R:373-393`` updates demographic columns
    from claim evidence).

    ``updates`` maps target column -> evidence column. With
    ``only_when_null`` (the reference's behavior) evidence only fills
    gaps; otherwise evidence wins wherever present. Left join keeps
    every target row; evidence must be unique per key (enforced by an
    eager scan at plan-build time — a duplicate-evidence fan-out would
    silently multiply target rows). When uniqueness is already
    guaranteed upstream (a groupBy/dedup just produced the evidence),
    pass ``assume_unique=True`` to skip that extra full scan — at
    warehouse scale the guard costs a blocking job per call.
    """
    ev_cols = list(dict.fromkeys(updates.values()))
    ev = evidence.select(*keys, *ev_cols)
    if not assume_unique:
        dup = ev.groupBy(*keys).count().filter(F.col("count") > 1)
        if dup.limit(1).count() > 0:
            raise ValueError(f"evidence is not unique on {keys}")
    renamed = ev.select(
        *keys, *[F.col(c).alias(f"_ev_{c}") for c in ev_cols]
    )
    out = target.join(renamed, keys, "left")
    for tgt_col, ev_col in updates.items():
        if only_when_null:
            new_val = F.coalesce(F.col(tgt_col), F.col(f"_ev_{ev_col}"))
        else:
            new_val = F.coalesce(F.col(f"_ev_{ev_col}"), F.col(tgt_col))
        out = out.withColumn(tgt_col, new_val)
    return out.drop(*[f"_ev_{c}" for c in ev_cols])


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) catalog table — the
    Spark analog of the reference's Synapse ``DISTRIBUTION =
    HASH(id_mcaid)`` staging layout (``load_stage.mcaid_elig_month.R:51-56``).

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle (and without even a sort, if sorted): at
    100 TB this converts the warehouse's dominant join pattern
    (everything joins on the person id) from an all-to-all exchange
    into a per-bucket local merge.

    ONE FILE PER BUCKET when ``sort_cols`` is set: ``sortBy`` sorts
    each output FILE, but Spark's scan only reports the sort order to
    the planner when every bucket is a single file — with N upstream
    tasks each bucket gets N sorted fragments, the metadata is
    dropped, and downstream SortMergeJoins silently re-sort BOTH
    sides (measured at sf10: the CCW dx⋈header join carried two
    12M/7.5M-row sorts that the layout had already paid for). The
    explicit repartition on the bucket columns costs one exchange AT
    WRITE time — exactly where the reference's Synapse layout pays
    its HASH distribution — and every sorted read afterwards is
    zip-merge only.
    """
    if sort_cols:
        df = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    cluster_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a partition-pruned, min/max-skippable file layout:
    ``partitionBy`` directories for the coarse predicate columns
    (year/month/source — readers with those filters never LIST the
    other directories, let alone read them) and
    ``sortWithinPartitions`` on the fine-grained key so parquet
    row-group min/max statistics become selective — a point lookup on
    the cluster key reads one row group per file instead of all of
    them.

    This is the write-side half of the scan-performance story (the
    read-side half — pushdown and pruning — is free from Catalyst
    once the layout exists): at 100 TB the difference between a
    clustered and an unclustered layout is the difference between
    touching gigabytes and touching the whole table.
    ``test_clustered_write_prunes_partitions`` pins that a filtered
    read of this layout scans only the matching partition
    directories.
    """
    out = df
    if cluster_by:
        # repartition on the partition columns first so each output
        # directory is written by few tasks (small-file control), then
        # sort within tasks: partition cols lead so rows for one
        # directory are contiguous, cluster cols follow for row-group
        # min/max locality
        out = out.repartition(*[F.col(c) for c in partition_by]).sortWithinPartitions(
            *(partition_by + cluster_by)
        )
    out.write.mode(mode).format(fmt).partitionBy(*partition_by).save(path)


def delete_data_year(
    spark: SparkSession,
    tables: list[dict],
    delete_year: int,
    fmt: str = "parquet",
    keep_backup: bool = True,
) -> list[dict]:
    """Surgically delete ONE data year across a table family — the
    third refresh primitive next to :func:`incremental_merge` and
    :func:`promote` (``mcaid_delete_data_year.R:1-162``: expiring data
    -usage agreements require removing a year from every mcaid table).

    ``tables`` rows mirror the reference's mcaid_tables.csv contract:
    ``{"path": ..., "date_column": ...}``; a row with a date column the
    rule set doesn't know is SKIPPED and reported, exactly like the R's
    "No known way to handle this date column" branch
    (``mcaid_delete_data_year.R:60-65`` applies ``date_col LIKE
    '{year}%'`` ONLY to its whitelist CLNDR_YEAR_MNTH / FROM_SRVC_DATE
    / first_service_date and skips everything else). This port keeps
    the skip-unknown contract but validates by FORMAT instead of by
    name — stronger than the R, which trusts the csv:

    * date/timestamp-typed columns match on ``year(col)`` — format
      can't lie about a typed column;
    * int/string columns must be year-prefixed in EVERY non-null row
      (``^\\d{4}`` with the prefix in a plausible 1700-2199 range —
      covers CLNDR_YEAR_MNTH ints, yyyymmdd ints, ISO date strings).
      A column in any other shape (epoch seconds, mm/dd/yyyy, ...)
      is ``skipped_unvalidated_date_format`` — NOT silently
      "deleted 0 rows", which is how a DUA-mandated purge fails
      quietly. The validation is one extra aggregate pushed into the
      same scan.

    NULL-dated rows are KEPT and reported (``null_date_rows``): a row
    whose year is unknown is not evidence it belongs to the purge
    year, and silently deleting it would remove data outside the
    requested year. (The R's LIKE keeps NULLs too — NULL LIKE is not
    TRUE — so this also matches the reference.)

    Shape per table (mirrors the R's rename -> SELECT INTO -> QA):

    1. rewrite rows ``NOT (year-match)`` OR NULL-dated into a temp
       sibling (one scan, one write — at scale with year-partitioned
       layout this becomes a metadata-only partition drop; the filter
       is pushed to the scan here);
    2. count QA: kept + deleted == old total AND deleted equals the
       independently-counted ``df.filter(cond)`` rows, or the swap is
       refused;
    3. atomic swap; the old directory survives as ``<path>._to_delete``
       (the R's renamed table) until the caller confirms and removes —
       ``keep_backup=False`` removes it immediately.

    Returns one report dict per table: path, status, old/kept/deleted
    counts.
    """
    import shutil

    reports: list[dict] = []
    for t in tables:
        path, date_col = t["path"], t.get("date_column")
        if not date_col:
            reports.append(
                {"path": path, "status": "skipped_no_date_column"}
            )
            continue
        df = read_file(spark, path, fmt)
        if date_col not in df.columns:
            reports.append(
                {"path": path, "status": "skipped_unknown_date_column",
                 "date_column": date_col}
            )
            continue
        dtype = dict(df.dtypes)[date_col]
        c = F.col(date_col)
        if dtype in ("date", "timestamp", "timestamp_ntz"):
            cond = F.year(c) == F.lit(int(delete_year))
            stats = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(c.isNull(), 1)).alias("nulls"),
                F.count(F.when(cond, 1)).alias("hits"),
            ).first()
        else:
            # year-prefix formats only; anything else must be skipped,
            # not silently matched against zero rows
            prefix_ok = c.cast("string").rlike(r"^(1[789]|2[01])\d{2}")
            cond = c.cast("string").startswith(str(delete_year))
            stats = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(c.isNull(), 1)).alias("nulls"),
                F.count(F.when(cond, 1)).alias("hits"),
                F.count(F.when(c.isNotNull() & ~prefix_ok, 1)).alias("bad"),
            ).first()
            if stats["bad"] > 0:
                reports.append(
                    {"path": path,
                     "status": "skipped_unvalidated_date_format",
                     "date_column": date_col,
                     "unparseable_rows": stats["bad"]}
                )
                continue
        old_n, null_n, expect_del = stats["n"], stats["nulls"], stats["hits"]
        tmp = path.rstrip("/") + "._delete_tmp"
        # keep NULL-dated rows explicitly: ~cond alone drops them
        # (NULL -> not kept), deleting rows outside the purge year
        df.filter(cond.isNull() | ~cond).write.mode("overwrite").format(
            fmt
        ).save(tmp)
        kept_n = read_file(spark, tmp, fmt).count()
        deleted_n = old_n - kept_n
        # refuse the swap unless the delta equals the independently
        # counted year-matched rows (catches concurrent writes AND any
        # filter/format disagreement)
        if deleted_n != expect_del:
            shutil.rmtree(tmp)
            raise AssertionError(
                f"delete_data_year row-count anomaly on {path}: "
                f"old={old_n} kept={kept_n} "
                f"deleted={deleted_n} != expected {expect_del}"
            )
        backup = path.rstrip("/") + "._to_delete"
        if os.path.exists(backup):
            shutil.rmtree(backup)
        os.rename(path, backup)
        os.rename(tmp, path)
        if not keep_backup:
            shutil.rmtree(backup)
        reports.append(
            {"path": path, "status": "deleted", "old_rows": old_n,
             "kept_rows": kept_n, "deleted_rows": deleted_n,
             "null_date_rows": null_n}
        )
    return reports


def shard_assign(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    seed: str = "shard",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic shard assignment for a corpus release export —
    the md5-pinned hash family of ``assign_splits`` (identical across
    retries, stages, partitionings, and engines: a DuckDB verifier
    re-derives every assignment value-for-value), reduced mod
    ``num_shards``. Map-only codegen; at 100 TB the shard id is a
    free column on whatever scan already reads the release.

    NULL ids get a NULL shard — visible in the manifest and in the
    written layout (Hive default partition) rather than silently
    hashed into shard 0; an export with NULL document ids is a data
    bug the manifest should surface.
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    # 15 hex chars = 60 bits: fits a signed long exactly, and matches
    # the DuckDB mirror CAST('0x'||substring(md5(..),1,15) AS UBIGINT)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    return df.withColumn(out_col, F.pmod(h, F.lit(num_shards)).cast("int"))


def shard_manifest(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    text_col: str | None = None,
    seed: str = "shard",
    shard_col: str = "shard",
) -> DataFrame:
    """Release manifest for a sharded corpus export: one row per
    shard with the document count, total characters (when
    ``text_col`` is given), and an ORDERLESS id checksum — the sum of
    each id's 60-bit md5 integer (the ``corpus_diff_summary`` idiom)
    reduced mod 2^60 so the final value fits a BIGINT exactly on
    every engine and every JSON parser (a DECIMAL(38,0) sum survives
    Spark/DuckDB but loses low bits the moment a verifier touches it
    as a double). Modular sums stay associative-commutative, so the
    checksum reduces map-side and is partitioning-invariant. A
    downstream trainer verifies a transferred shard by recomputing
    three numbers — no ordering, no full-content comparison.

    ONE aggregation with map-side partials; output bounded by
    ``num_shards`` (+1 row for NULL ids, if any — see
    :func:`shard_assign`).
    """
    sharded = (
        df if shard_col in df.columns
        else shard_assign(df, id_col, num_shards, seed, shard_col)
    )
    id60 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(id60).alias("_sum60"),
    ]
    if text_col is not None:
        aggs.append(F.sum(F.length(F.col(text_col))).alias("n_chars"))
    out = sharded.groupBy(shard_col).agg(*aggs)
    cols = [
        F.col(shard_col),
        F.col("n_docs").cast("long").alias("n_docs"),
        # the NULL-id group's sum is NULL (md5 of NULL) — its
        # checksum is defined as 0, the checksum of "no ids"
        F.coalesce(F.pmod(F.col("_sum60"), F.lit(2 ** 60)), F.lit(0))
        .cast("long")
        .alias("id_checksum"),
    ]
    if text_col is not None:
        cols.append(F.col("n_chars").cast("long").alias("n_chars"))
    return out.select(*cols)


def export_shards(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    text_col: str | None = None,
    seed: str = "shard",
    fmt: str = "parquet",
) -> list[dict]:
    """Deterministic sharded corpus export with a verified manifest —
    the release step after dedup/decontamination/split assignment:
    write the corpus partitioned by the md5-pinned shard id (ONE
    exchange on the shard column, the physical minimum a sharded
    layout costs; one output file per shard), then recompute the
    manifest FROM THE WRITTEN FILES and verify it against the input's
    own manifest before reporting success. The export never reports a
    manifest it did not re-derive from the artifact — the
    ``cross-db copy + count QA`` contract (S5) applied to a release.

    Returns the verified manifest as a list of dicts (bounded by
    ``num_shards``), also written as ``_manifest.json`` next to the
    shard directories so a consumer can verify without Spark.

    Cost note: the verification pays one extra scan of the INPUT (the
    expected-side manifest) on top of the unavoidable re-read of the
    written artifact — the same two-sided price the S5 cross-db
    count-QA pays, accepted because a release manifest derived from
    anything but the artifact itself would be a claim, not a check.
    Persist/cache the input before calling if its lineage is
    expensive to recompute.
    """
    sharded = shard_assign(df, id_col, num_shards, seed)
    (
        sharded.repartition(num_shards, F.col("shard"))
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy("shard")
        .save(path)
    )
    expected = {
        r["shard"]: r
        for r in shard_manifest(
            sharded, id_col, num_shards, text_col, seed
        ).collect()
    }
    written = spark.read.format(fmt).load(path)
    actual = {
        r["shard"]: r
        for r in shard_manifest(
            written, id_col, num_shards, text_col, seed, shard_col="shard"
        ).collect()
    }
    if {k: tuple(v) for k, v in expected.items()} != {
        k: tuple(v) for k, v in actual.items()
    }:
        raise AssertionError(
            f"export QA failed at {path}: written manifest does not match "
            f"the input (expected {expected}, read back {actual})"
        )
    import json

    manifest = [
        {
            "shard": None if r["shard"] is None else int(r["shard"]),
            "n_docs": int(r["n_docs"]),
            "id_checksum": int(r["id_checksum"]),
            **(
                {"n_chars": int(r["n_chars"])}
                if text_col is not None
                else {}
            ),
        }
        for r in sorted(
            actual.values(), key=lambda r: (r["shard"] is None, r["shard"])
        )
    ]
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction — the maintenance primitive every
    incremental pipeline needs once :func:`incremental_merge` /
    streaming sinks have run for a while: thousands of KB-sized files
    turn a scan into a task-scheduling exercise and blow the driver's
    file-listing memory at 100 TB.

    Bin-packs the table into ``ceil(total_bytes / target)`` files via
    coalesce when shrinking (no shuffle — partitions concatenate) or
    repartition when the table has too FEW partitions (a shuffle, but
    growing file count is rare and explicit). Rewrite goes through the
    tmp-sibling + row-count QA + atomic-swap contract shared with
    :func:`promote`. Returns {files_before, files_after, rows}.
    """
    import math

    before = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith((".", "_"))
    ]
    total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = read_file(spark, path, fmt)
    n_parts = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_files <= n_parts else df.repartition(n_files)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").format(fmt).save(tmp)
    rows_before = df.count()
    rows_after = read_file(spark, tmp, fmt).count()
    if rows_before != rows_after:
        import shutil

        shutil.rmtree(tmp)
        raise AssertionError(
            f"compaction row-count mismatch on {path}: "
            f"{rows_before} -> {rows_after}"
        )
    _swap_dir(tmp, path)
    after = [
        f
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith((".", "_")) and f.endswith(fmt)
    ]
    return {
        "files_before": len(before),
        "files_after": len(after),
        "rows": rows_after,
    }


def promote(
    spark: SparkSession,
    stage_path: str,
    final_path: str,
    expected_rows: int | None = None,
    fmt: str = "parquet",
) -> int:
    """Stage→final promotion with row-count QA
    (``master_mcaid_analytic.R:433-487``): copy, verify, swap.

    Single data pass: write the tmp copy first, then count the WRITTEN
    output (a parquet metadata read, not a rescan) and gate the swap on
    it — counting before writing would read the stage table twice."""
    df = read_file(spark, stage_path, fmt)
    tmp = final_path + "._tmp"
    df.write.mode("overwrite").format(fmt).save(tmp)
    n = read_file(spark, tmp, fmt).count()
    if expected_rows is not None and n != expected_rows:
        import shutil

        shutil.rmtree(tmp)
        raise AssertionError(
            f"promotion row-count mismatch: stage={n} expected={expected_rows}"
        )
    _swap_dir(tmp, final_path)
    return n


def read_with_header_file(
    spark,
    data_path: str,
    header_path: str,
    delimiter: str = "|",
    header_delimiter: str | None = None,
) -> DataFrame:
    """Load a headerless delimited extract whose column names live in a
    sibling header-only file — the CDR raw-file pattern
    (``db_loader/cdr/00_raw_file_processing.R:35-60``: each
    ``*HeaderOnly.txt`` carries the column list for its same-named
    data file).

    The header file is read ONCE on the driver (it is one line); the
    data files stream through the normal distributed CSV reader with
    the derived names applied. All columns land as strings — the CDR
    loader types them downstream, as do we (typed projection,
    SURVEY.md §2 P1).
    """
    header_df = spark.read.text(header_path)
    first = header_df.limit(1).collect()
    if not first:
        raise ValueError(f"empty header file: {header_path}")
    hd = header_delimiter or delimiter
    names = [c.strip() for c in first[0]["value"].split(hd) if c.strip()]
    df = (
        spark.read.option("header", "false")
        .option("delimiter", delimiter)
        .csv(data_path)
    )
    if len(df.columns) != len(names):
        raise ValueError(
            f"header declares {len(names)} columns, data has "
            f"{len(df.columns)}"
        )
    return df.toDF(*names)
