"""Approximate/mergeable sketches: the scale path for distinct counts
and quantiles.

The reference computes exact COUNT DISTINCT QA checks
(``load_stage.apcd_claim_header.R:1165-1213``) — fine server-side, but
at 100 TB an exact distinct over a high-cardinality key is a full
shuffle of that key. Sketches make the common monitoring/reporting
cases one pass + tiny state:

- ``approx_count_distinct``: HLL++ built-in, no extra state.
- ``hll_partial`` / ``hll_merge``: Apache DataSketches HLL as a
  MERGEABLE column — pre-aggregate per partition/day/month, store the
  sketch bytes, merge across any rollup later without rescanning (the
  incremental-refresh pattern: each monthly load contributes a sketch;
  year-to-date distinct members is a merge, not a recount).
- ``approx_quantiles``: Greenwald-Khanna via ``percentile_approx``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_count_distinct(col: str, rsd: float = 0.02) -> Column:
    return F.approx_count_distinct(col, rsd)


def hll_partial(col: str, lg_k: int = 12) -> Column:
    """Aggregate to an HLL sketch (binary, mergeable)."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_merge_estimate(sketch_col: str, lg_k: int = 12) -> Column:
    """Merge previously-stored sketches and estimate the union's
    distinct count."""
    return F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col), F.lit(False)))


def rollup_distinct_via_sketches(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Two-level distinct counting without rescanning: sketch at the
    fine grain (e.g. per month), then merge to the coarse grain (e.g.
    per year). The fine table with sketch bytes is what you persist;
    any coarser rollup is a cheap merge."""
    fine = df.groupBy(*fine_keys).agg(
        hll_partial(value_col, lg_k).alias("_sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return fine.groupBy(*coarse_keys).agg(
        hll_merge_estimate("_sk", lg_k).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


# Deterministic md5-register HLL mirror (lg_k=8 -> m=256 registers).
# Constants are shared verbatim with the DuckDB oracle SQL so both
# engines evaluate the identical double literal.
HLL_DET_LG_K = 8
HLL_DET_M = 1 << HLL_DET_LG_K
# alpha_m for m >= 128: 0.7213 / (1 + 1.079/m); NUM = alpha * m^2 * 2^49
HLL_DET_NUM = 2.6499581405668102e19


def hll_det_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value_col: str,
) -> DataFrame:
    """Deterministic HLL register algebra, value-checkable against a
    SQL oracle — the engine-portable mirror of
    ``rollup_distinct_via_sketches`` (same store-registers-at-fine-
    grain / merge-by-max-to-coarse-grain shape, md5 in place of the
    DataSketches hash so Spark and DuckDB derive bit-identical
    registers).

    Per value: ``md5(cast(v as string))``; bucket = first 2 hex chars
    (8 bits, m=256); w = next 12 hex chars (a 48-bit word); rank =
    leading zeros of w + 1 = 49 - bitlen(w) (49 when w=0). Registers
    are ``max(rank)`` per (fine_keys, bucket); the coarse merge is
    ``max`` again — exactly the HLL union, so a green value row
    checks the MERGE path, not just the hash.

    All emitted columns are integer-exact: ``denom_scaled`` is the
    harmonic denominator scaled by 2^49 (``sum(1L << (49-reg))`` over
    present registers + ``2^49`` per absent register — every term a
    power of two summed in BIGINT, never a float), ``reg_checksum``
    pins every register's position and value, and ``est_floor`` is
    the raw-HLL estimate ``floor(NUM / denom_scaled)`` — one IEEE
    double division of a shared literal by an integer, identical
    across engines (raw estimate by design; the production estimator
    with small-range correction stays ``rollup_distinct_via_sketches``).

    Scale shape: two hash aggregates, the first exchanging at most
    ``|fine grain| * 256`` register rows regardless of input
    cardinality — the whole point of sketching at 100 TB.

    Reference intent: the distinct-count reconciliation QA in
    ``claims_db/db_loader/.../qa_load_sql.R`` — this is its
    mergeable, one-pass form.
    """
    # NULL values never update a sketch (DataSketches update semantics):
    # md5(NULL) would mint a NULL bucket whose register row inflates
    # n_present while contributing nothing to the harmonic sum.
    df = df.filter(F.col(value_col).isNotNull())
    h = F.md5(F.col(value_col).cast("string"))
    w = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    keyed = df.select(
        *[F.col(k) for k in fine_keys],
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("_bucket"),
        F.when(w == 0, F.lit(49))
        .otherwise(F.lit(49) - F.length(F.bin(w)))
        .cast("int")
        .alias("_rank"),
    )
    fine = keyed.groupBy(*fine_keys, "_bucket").agg(
        F.max("_rank").alias("_reg")
    )
    coarse = fine.groupBy(*coarse_keys, "_bucket").agg(
        F.max("_reg").alias("_reg")
    )
    m = F.lit(HLL_DET_M).cast("long")
    present_denom = F.sum(
        F.expr("shiftleft(cast(1 as bigint), 49 - _reg)")
    )
    n_present = F.count(F.lit(1))
    denom = present_denom + (m - n_present) * F.lit(1 << 49).cast("long")
    return coarse.groupBy(*coarse_keys).agg(
        m.alias("m"),
        n_present.cast("long").alias("n_present"),
        F.sum("_reg").cast("long").alias("sum_rank"),
        denom.cast("long").alias("denom_scaled"),
        F.sum((F.col("_bucket") + 1) * F.col("_reg"))
        .cast("long")
        .alias("reg_checksum"),
        F.floor(F.lit(HLL_DET_NUM) / denom.cast("double"))
        .cast("long")
        .alias("est_floor"),
    )


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Grouped approximate quantiles (percentile_approx): bounded-state
    alternative to the exact ``percentile`` used in tabulation."""
    return df.groupBy(*keys).agg(
        *[
            F.percentile_approx(value_col, p, accuracy).alias(
                f"p{str(p).replace('0.', '')}"
            )
            for p in probs
        ]
    )


def _cms_bucket(
    item: Column, depth_idx: int, width: int, seed: str, hash_family: str
) -> Column:
    """Bucket for CMS row ``depth_idx``. Two families (the minhash
    precedent): ``xxhash64`` — one native JVM call, the production
    path — and ``md5`` — engine-portable (hashlib / Spark / DuckDB
    agree), the path the value-check oracle replicates. Estimates are
    deterministic under either; only cross-ENGINE reproducibility
    needs md5."""
    if hash_family == "xxhash64":
        return F.pmod(
            F.xxhash64(item, F.lit(f"{seed}\x1f{depth_idx}")), F.lit(width)
        ).cast("long")
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(item, F.lit(f"\x1f{seed}\x1f{depth_idx}"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % F.lit(width)
    )


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 8192,
    seed: str = "cms",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Frequent-item detection with a count-min sketch: items whose
    CMS estimate reaches ``threshold``, with the estimate attached.
    Input is one row per OCCURRENCE (pre-explode n-grams/hosts/lines
    upstream); output is ``(item, est_count)``.

    Why a sketch instead of an exact groupBy-count at 100 TB: exact
    counting shuffles every distinct item; the CMS table is a FIXED
    ``depth x width`` grid of counters, and expressing its
    construction as ``groupBy(depth, bucket).count`` makes Spark's
    partial aggregation build the per-task sketch map-side — the
    exchange carries at most ``tasks x depth x width`` pre-merged
    rows, independent of item cardinality. The probe pass dedups
    candidate items (the one cardinality-bound shuffle; callers with
    a known candidate set can pre-distinct and make it map-only) and
    looks estimates up against the broadcast grid.  Default
    ``hash_family='xxhash64'`` (native, fast); pass ``'md5'`` for
    engine-portable buckets (the DuckDB value-check oracle's path —
    the guarantees are identical, only cross-engine bucket
    reproducibility differs).

    Estimates are the classic CMS upper bound: ``est >= true`` always
    (no false negatives at any threshold — every truly-frequent item
    survives), with overestimates only from bucket collisions.  The
    md5 hash family makes every collision — and therefore every
    estimate — deterministic and engine-reproducible, so unlike most
    sketches this one is VALUE-checkable against a SQL oracle, not
    just tolerance-tested.
    """
    item = F.col(item_col).cast("string")
    occ = df.select(item.alias("_item")).filter(F.col("_item").isNotNull())
    keyed = occ.select(
        "_item",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("_j"),
                    _cms_bucket(
                        F.col("_item"), j, width, seed, hash_family
                    ).alias("_b"),
                )
                for j in range(depth)
            ])
        ).alias("_k"),
    ).select("_item", "_k._j", "_k._b")
    grid = keyed.groupBy("_j", "_b").agg(F.count(F.lit(1)).alias("_n"))

    cand = occ.distinct().select(
        "_item",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("_j"),
                    _cms_bucket(
                        F.col("_item"), j, width, seed, hash_family
                    ).alias("_b"),
                )
                for j in range(depth)
            ])
        ).alias("_k"),
    ).select("_item", "_k._j", "_k._b")
    return (
        cand.join(F.broadcast(grid), ["_j", "_b"])
        .groupBy("_item")
        .agg(F.min("_n").alias("est_count"))
        .filter(F.col("est_count") >= F.lit(threshold))
        .select(F.col("_item").alias(item_col), "est_count")
    )
