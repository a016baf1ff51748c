"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew, but two shapes
still need explicit salting at 100 TB:

- a groupBy where one key holds a large fraction of all rows AND
  map-side partial aggregation can't absorb it — count-distinct per
  key, collect_list/set, or aggregation directly downstream of a
  join/window where rows arrive at reducers unsorted (for plain
  sum/count over low-cardinality keys, partial aggregation already
  neutralizes skew — measure before salting);
- a non-AQE-splittable join against a skewed fact side (the claims
  analog: one mega-utilizer person id, or the NULL provider id).

Both decompose the hot key across ``salt_buckets`` partitions and
re-combine — the standard two-phase pattern, kept as reusable
DataFrame transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _det_salt(df: DataFrame, salt_buckets: int):
    """Deterministic salt from the full row content. ``rand(seed)``
    depends on partition row order, which is unstable under task retry
    downstream of a shuffle — a recomputed map task could re-salt rows
    into different buckets and double-count/drop them. Hashing the row
    is retry-stable; fully-identical rows share a bucket, which only
    matters in the degenerate all-duplicates case."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    ).cast("int")


# Aggregates that re-combine losslessly across salt buckets:
# (first-phase agg, second-phase combiner)
_COMBINABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """GroupBy with a salt pre-phase: {out: (fn, col)} where fn is one
    of sum/count/min/max (the decomposable aggregates — avg is
    sum/count at the call site).

    Phase 1 groups on (keys, salt) — the hot key spreads across
    ``salt_buckets`` reducers; phase 2 groups on keys alone over the
    ``|keys| × salt_buckets`` partials, which is tiny. Same result as
    a direct groupBy, always; use when one key dominates.
    """
    for fn, _ in aggs.values():
        if fn not in _COMBINABLE:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    salted = df.withColumn("_salt", _det_salt(df, salt_buckets))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[_COMBINABLE[fn][0](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[_COMBINABLE[fn][1](out).alias(out) for out, (fn, _) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact side to a modest dimension side when the
    dimension is too big to broadcast outright but small enough to
    replicate ``salt_buckets``×.

    Fact rows get a deterministic content salt; the dimension is
    exploded once per salt value; the join key becomes (key, salt) so
    the hot key's rows spread over ``salt_buckets`` tasks instead of
    one straggler. Only 'inner' and 'left' are valid: the replicated
    dimension side would emit unmatched rows ``salt_buckets`` times
    under right/full joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r} "
            "(replicated dim rows would duplicate under right/full)"
        )
    fact = skewed.withColumn("_salt", _det_salt(skewed, salt_buckets))
    dim = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return fact.join(dim, [key, "_salt"], how).drop("_salt")
