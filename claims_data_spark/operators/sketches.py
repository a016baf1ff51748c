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
