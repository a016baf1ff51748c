"""Slowly-changing-dimension (type 2) merge.

The reference refreshes dimensions with a drop-and-swap (stage ->
rename to final, ``alter_schema_f``/archive swap — SURVEY.md §2 S8),
which loses history. The warehouse-native generalization is an SCD2
MERGE: each refresh closes the current version of changed keys and
opens a new one, so every key carries its full validity timeline
(valid_from / valid_to / is_current).

Spark-first plan — ONE join, ONE generator, no MERGE statement and no
multi-branch self-joins:

1. full outer join the CURRENT slice of the dimension with the
   incoming snapshot on the business key (history rows pass through
   untouched and never enter the join);
2. each joined row emits 0-2 output rows through a single
   ``explode(array(struct...))`` + filter — the close-out version,
   the new version, or the unchanged row — so the join output is
   consumed exactly once (no diamond, no re-evaluation);
3. change detection is null-safe column equality (``<=>``) over the
   tracked attributes.

At scale: the join shuffles on the business key (or broadcasts a
small snapshot), the generator is map-only, and history pass-through
is a union — the whole refresh is one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    load_date: str,
    *,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
    close_missing: bool = False,
) -> DataFrame:
    """Merge an ``incoming`` attribute snapshot into an SCD2 dimension.

    ``current`` must carry ``key_cols + tracked_cols + valid_from +
    valid_to + is_current``. Outcomes per business key:

    - attribute change: the open version closes at ``load_date - 1``
      and a new version opens at ``load_date``;
    - no change: the open version passes through untouched;
    - new key: a first version opens at ``load_date``;
    - key missing from the snapshot: passes through, or closes at
      ``load_date - 1`` when ``close_missing`` (full-snapshot feeds).

    NULL attribute values compare null-safely, so NULL -> NULL is "no
    change" and NULL -> value is a real change. Closed history rows
    never enter the join. Output schema == ``current``'s schema.
    """
    ld = F.lit(load_date).cast("date")
    out_cols = [*key_cols, *tracked_cols, valid_from_col, valid_to_col,
                current_col]
    history = current.filter(F.col(current_col) == 0).select(*out_cols)
    open_now = current.filter(F.col(current_col) == 1)

    cur = open_now.select(
        *[F.col(c).alias(f"_cur_{c}") for c in key_cols],
        *[F.col(c).alias(f"_cur_{c}") for c in tracked_cols],
        F.col(valid_from_col).alias("_cur_vf"),
        F.lit(1).alias("_in_cur"),
    )
    inc = incoming.select(
        *[F.col(c).alias(f"_inc_{c}") for c in key_cols],
        *[F.col(c).alias(f"_inc_{c}") for c in tracked_cols],
        F.lit(1).alias("_in_inc"),
    )
    cond = None
    for c in key_cols:
        e = F.col(f"_cur_{c}").eqNullSafe(F.col(f"_inc_{c}"))
        cond = e if cond is None else (cond & e)
    j = cur.join(inc, cond, "full_outer")

    # Presence is an explicit lit(1) marker, NOT key nullness: the join
    # condition is eqNullSafe, so a NULL business key can legitimately
    # match, and key-null presence tests would route that row into no
    # when() branch (emitted NULL -> explode() drops it silently).
    in_cur = F.col("_in_cur").isNotNull()
    in_inc = F.col("_in_inc").isNotNull()
    changed = None
    for c in tracked_cols:
        e = ~F.col(f"_cur_{c}").eqNullSafe(F.col(f"_inc_{c}"))
        changed = e if changed is None else (changed | e)

    def row(src: str, vf, vt, is_cur):
        return F.struct(
            *[F.col(f"_{src}_{c}").alias(c) for c in key_cols],
            *[F.col(f"_{src}_{c}").alias(c) for c in tracked_cols],
            vf.cast("date").alias(valid_from_col),
            vt.cast("date").alias(valid_to_col),
            F.lit(is_cur).cast("int").alias(current_col),
        )

    closed_prev = row("cur", F.col("_cur_vf"), F.date_sub(ld, 1), 0)
    new_version = row("inc", ld, F.lit(None), 1)
    unchanged = row("cur", F.col("_cur_vf"), F.lit(None), 1)

    emitted = (
        F.when(in_cur & in_inc & changed, F.array(closed_prev, new_version))
        .when(in_cur & in_inc, F.array(unchanged))
        .when(~in_cur & in_inc, F.array(new_version))
        .when(
            in_cur & ~in_inc,
            F.array(closed_prev) if close_missing else F.array(unchanged),
        )
    )
    merged = (
        j.select(F.explode(emitted).alias("_r"))
        .select(*[F.col(f"_r.{c}").alias(c) for c in out_cols])
    )
    return history.unionByName(merged)
