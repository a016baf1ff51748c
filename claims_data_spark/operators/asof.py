"""As-of / event-history joins (SURVEY.md §2.3 J14).

The reference's instance: MOUD claims qualify only if the person's
earliest OUD-diagnosis month is ≤ the service date
(``claim_bh.R:324-347``) — an "as-of the event, had X already
happened" join. Two implementations:

- ``join_to_running_min``: the reference's exact shape (join to a
  per-key MIN + inequality filter). One aggregate + one equi-join.
- ``asof_join``: the general "latest right row at or before each left
  timestamp" merge, implemented with the union + partitioned-window
  last-value trick — one shuffle on (key), no range join, no
  cartesian. This is the Spark-native equivalent of pandas
  ``merge_asof`` and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_to_running_min(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_date: str,
    right_date: str,
    min_col: str = "first_event_date",
) -> DataFrame:
    """Keep left rows where the key's earliest right-side date is on or
    before the left date; attaches that date as ``min_col``."""
    firsts = right.groupBy(key).agg(F.min(right_date).alias(min_col))
    return left.join(firsts, key).filter(F.col(min_col) <= F.col(left_date))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Attach, to each left row, the payload of the most recent right
    row with right_ts <= left_ts (direction='backward'; 'forward'
    symmetric), per key.

    Plan: tag and union both sides on (key, ts), sort within key by
    (ts, side-priority), carry the right payload forward with
    ``last(..., ignorenulls=True)`` over the running frame, then keep
    the left rows. One shuffle, one window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    # The payload is carried as ONE struct per right row, so all payload
    # fields come atomically from the same matched row — carrying columns
    # independently with last(ignorenulls) would substitute stale values
    # for genuinely-NULL fields and stitch together a row that never
    # existed. Each side simply OMITS the other side's struct and
    # ``unionByName(allowMissingColumns=True)`` fills the typed NULLs —
    # building typed NULL literals from ``.schema`` would force a full
    # Catalyst analysis of both subtrees at construction time
    # (profiled as the bulk of this operator's driver cost).
    l_tag = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rrow"),
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts so "at or before"
    # (resp. "at or after") includes ties.
    order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_asof")
    ).filter(F.col("_is_left") == 1)

    # Key columns come from the TOP-LEVEL union keys (the window's
    # partition attributes), not re-extracted from the struct: the
    # values are identical for left rows by construction, but struct
    # re-extraction mints fresh attributes that hide the exchange's
    # hash partitioning from EnsureRequirements — any downstream
    # operator keyed on the same ids (a distinct, an aggregation, a
    # window) then pays a redundant id-grain shuffle (measured on
    # fuh_followup: the rolled-distinct re-exchange, 6 -> 3 exchanges
    # together with the fused flag pass).
    return carried.select(
        *[
            F.col(c) if c in key_cols else F.col(f"_lrow.{c}").alias(c)
            for c in left.columns
        ],
        *[F.col(f"_asof.{c}").alias(c) for c in right_payload],
    )
