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
