"""Column-profile drift report between two corpus snapshots.

The release-QA companion of ``corpus.corpus_diff`` (which answers
"WHICH documents changed") and ``corpus.corpus_report`` (one
snapshot's card): this answers "did any column's DISTRIBUTION move"
— the check a training-data release runs before shipping snapshot
N+1, catching silent upstream changes (a feed that started emitting
NULL languages, a scraper that began truncating text, an id space
that jumped) that row-level diffs bury in noise.

Design for exactness and scale:

* every column profiles through ONE shared shape — the value's
  deterministic md5 hash bucket in ``[0, n_buckets)`` — so numeric,
  string, boolean and date columns all reduce to a ``(column,
  bucket) -> count`` table. A distribution over hash buckets moves
  iff the value distribution moves (hashing is measure-preserving on
  discrete distributions), which is exactly what a drift DETECTOR
  needs; localizing WHICH values moved is the follow-up query's job.
* drift statistics are computed in EXACT integer/decimal arithmetic
  with a single correctly-rounded division at the end, so every
  number is order-free (partitioning-invariant) and bit-identical in
  any engine: total variation ``tv = sum|cnt_new*N_old -
  cnt_old*N_new| / (2*N_old*N_new)`` and the max bucket shift
  ``linf = max|...| / (N_old*N_new)``; bucket-drift counts compare
  the cross products, never floats. No PSI / chi-square: their
  per-bucket float terms must be SUMMED, and float summation order
  is partitioning-dependent (and log's last ulp differs across
  libms) — a poisoned value for a type-sensitive compare, for zero
  analytical gain at release-QA granularity.
* scale shape: each snapshot is scanned ONCE (the per-column bucket
  projection is map-only codegen over an unpivoted literal column
  list); the single exchange carries ``n_cols x n_buckets`` partial
  counts — dimension-sized regardless of corpus size — and every
  downstream op runs on that dimension table. NULLs bucket to a
  dedicated ``-1`` row so null-rate drift is part of the same
  distribution (and also reported as an explicit rate pair).

Engine extension (training-data pipeline family): the reference repo
has no snapshot-drift step; its closest analogue is the per-load QA
row counts in `claims_db_load` (R/qa_load.R), cited for intent only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SIMPLE_TYPES = (
    "string", "long", "integer", "short", "byte", "double",
    "float", "decimal", "boolean", "date", "timestamp",
    "timestamp_ntz",
)


def _bucketed_counts(
    df: DataFrame, columns: list[str], n_buckets: int
) -> DataFrame:
    """(col_name, bucket, cnt) for one snapshot — one map-only
    projection + one dimension-grain aggregate. NULL -> bucket -1.

    Timestamp columns hash through ``unix_micros`` (an absolute
    instant), NOT ``cast(ts as string)`` — the string rendering
    depends on ``spark.sql.session.timeZone``, so two snapshots
    profiled under different session zones would show spurious drift
    on identical data (round-8 advice)."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    ts_cols = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (TimestampType, TimestampNTZType))
    }

    def _stable(c: str) -> F.Column:
        if c in ts_cols:
            return F.unix_micros(F.col(c)).cast("string")
        return F.col(c).cast("string")

    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.when(F.col(c).isNull(), F.lit(-1))
                .otherwise(
                    (
                        F.conv(
                            F.substring(F.md5(_stable(c)), 1, 15),
                            16, 10,
                        ).cast("long")
                        % F.lit(n_buckets)
                    ).cast("int")
                )
                .alias("bucket"),
            )
            for c in columns
        ]
    )
    return (
        df.select(F.explode(pairs).alias("_p"))
        .groupBy(
            F.col("_p.col_name").alias("col_name"),
            F.col("_p.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    columns: list[str] | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """Per-column drift report between two snapshots.

    Returns one row per profiled column:
    ``(col_name, n_old, n_new, null_rate_old, null_rate_new,
    n_buckets_drifted, tv_distance, linf_distance)`` where
    ``n_buckets_drifted`` counts hash buckets whose SHARE moved
    (cross-product integer compare — includes buckets present on one
    side only), ``tv_distance`` is the total-variation distance of
    the two bucket distributions (0 = identical, 1 = disjoint) and
    ``linf_distance`` the largest single-bucket share shift. All
    drift math is exact integer/decimal with one final division —
    engine-portable, partitioning-invariant, strict-oracle-safe.

    ``columns`` defaults to the intersection of both schemas (order
    = old's column order). Columns must exist on both sides; complex
    types (arrays/structs/maps) are rejected — profile a projection
    of their parts instead. An EMPTY snapshot side yields NULL rates
    and distances (never an ANSI divide-by-zero): a drift value
    against nothing is undefined, and NULL says so honestly.
    """
    if columns is None:
        new_cols = set(new.columns)
        columns = [c for c in old.columns if c in new_cols]
    if not columns:
        raise ValueError("no common columns to profile")
    for c in columns:
        if c not in old.columns or c not in new.columns:
            raise ValueError(f"column {c!r} missing from one snapshot")
    for side in (old, new):
        for f in side.schema.fields:
            if f.name in columns and f.dataType.typeName() not in _SIMPLE_TYPES:
                raise ValueError(
                    f"column {f.name!r} has unsupported type "
                    f"{f.dataType.simpleString()}; profile its parts"
                )
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")

    o = _bucketed_counts(old, columns, n_buckets).withColumnsRenamed(
        {"cnt": "cnt_old"}
    )
    n = _bucketed_counts(new, columns, n_buckets).withColumnsRenamed(
        {"cnt": "cnt_new"}
    )
    # full outer on the (col, bucket) dimension grid: a bucket present
    # on one side only is maximal drift for its mass, not a dropped row
    j = o.join(n, ["col_name", "bucket"], "full_outer").select(
        "col_name", "bucket",
        F.coalesce("cnt_old", F.lit(0)).alias("cnt_old"),
        F.coalesce("cnt_new", F.lit(0)).alias("cnt_new"),
    )
    # per-column totals via a WINDOW over the dimension table, not a
    # self-join: referencing `j` twice would re-derive BOTH corpus
    # scans (4 FileScans planned; exchange reuse is a runtime maybe,
    # not a plan guarantee) — the window keeps the tree linear with
    # exactly one scan per snapshot, over n_cols partitions of
    # <= n_buckets+1 rows each
    from pyspark.sql import Window

    wcol = Window.partitionBy("col_name")
    jt = j.withColumns({
        "n_old": F.sum("cnt_old").over(wcol),
        "n_new": F.sum("cnt_new").over(wcol),
    })
    dec = "decimal(20,0)"
    # cross products in decimal: exact at any snapshot size (counts to
    # 1e11 -> products to 1e22, sums to ~1e23; decimal(38) holds them)
    cross = (
        F.col("cnt_new").cast(dec) * F.col("n_old").cast(dec)
        - F.col("cnt_old").cast(dec) * F.col("n_new").cast(dec)
    )
    p = jt.select(
        "col_name", "bucket", "cnt_old", "cnt_new", "n_old", "n_new",
        cross.alias("_d"),
    )
    agg = p.groupBy("col_name", "n_old", "n_new").agg(
        F.sum(
            F.when(F.col("bucket") == -1, F.col("cnt_old")).otherwise(0)
        ).alias("_null_old"),
        F.sum(
            F.when(F.col("bucket") == -1, F.col("cnt_new")).otherwise(0)
        ).alias("_null_new"),
        F.sum((F.col("_d") != 0).cast("int")).alias("n_buckets_drifted"),
        F.sum(F.abs(F.col("_d"))).alias("_tv_num"),
        F.max(F.abs(F.col("_d"))).alias("_linf_num"),
    )
    denom = (F.col("n_old").cast(dec) * F.col("n_new").cast(dec)).cast(
        "double"
    )
    both = (F.col("n_old") > 0) & (F.col("n_new") > 0)
    return agg.select(
        "col_name",
        F.col("n_old").cast("long").alias("n_old"),
        F.col("n_new").cast("long").alias("n_new"),
        F.when(F.col("n_old") > 0, F.col("_null_old") / F.col("n_old"))
        .alias("null_rate_old"),
        F.when(F.col("n_new") > 0, F.col("_null_new") / F.col("n_new"))
        .alias("null_rate_new"),
        F.col("n_buckets_drifted").cast("long").alias("n_buckets_drifted"),
        F.when(
            both, F.col("_tv_num").cast("double") / (F.lit(2.0) * denom)
        ).alias("tv_distance"),
        F.when(both, F.col("_linf_num").cast("double") / denom).alias(
            "linf_distance"
        ),
    )
