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

    l_tag = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            l_tag.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # Right rows sort before left rows at equal ts so "at or before" includes ties.
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = {c: F.last(f"_r_{c}", ignorenulls=True).over(w) for c in right_payload}
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = {c: F.last(f"_r_{c}", ignorenulls=True).over(w) for c in right_payload}

    carried = unioned.select(
        "*", *[carry[c].alias(f"_asof_{c}") for c in right_payload]
    ).filter(F.col("_is_left") == 1)

    return carried.select(
        F.col("_lrow.*"),
        *[F.col(f"_asof_{c}").alias(c) for c in right_payload],
    )
