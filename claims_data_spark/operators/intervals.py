"""Interval algebra: gaps-and-islands, clipping, coverage stats, overlap
re-segmentation (SURVEY.md §2.5 — the reference's core competency).

Intervals are CLOSED ``[from_date, to_date]`` date pairs, exactly as in
the reference's person-period tables
(``load_stage.mcaid_elig_timevar.R:180-417``). Day counts are therefore
``datediff + 1``.

Scale notes
-----------
Every operator here is a single window pass partitioned by the person
id — the natural shuffle key of a claims warehouse (the reference
HASH-distributes on ``id_mcaid`` for the same reason,
``load_stage.mcaid_elig_month.R:51-56``). One shuffle on ``id``, then
all window steps (lag, running-sum island id, min/max collapse) reuse
that partitioning with no further exchange; the follow-up ``groupBy``
on ``(id, island)`` is partial-aggregated map-side. At 100 TB this is
the plan you want: shuffle once, window thrice, aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_islands(
    df: DataFrame,
    id_cols: list[str],
    from_col: str = "from_date",
    to_col: str = "to_date",
    group_cols: list[str] | None = None,
    max_gap_days: int = 1,
    out_from: str | None = None,
    out_to: str | None = None,
) -> DataFrame:
    """Collapse overlapping/adjacent closed intervals into islands.

    One output row per (id_cols, group_cols, island) with the island's
    min ``from`` / max ``to``, plus ``n_segments`` (source rows merged)
    and ``island_days`` (closed-interval day count).

    Merge rule (datediff semantics, matching the reference's literal
    formulation): an interval joins the current island when
    ``datediff(from, running_max_to) <= max_gap_days``.
    ``max_gap_days=1`` merges adjacent/abutting intervals — the
    reference's "contiguous" rule (gap of exactly 1 day merges,
    ``load_stage.mcaid_elig_timevar.R:287-385`` steps 3a-4a) and its
    ED-episode rule (visits <= 1 day apart). ``max_gap_days=0`` merges
    only intervals that truly overlap (share a day) — abutting
    closed intervals [d1,d1],[d1+1,d1+1] stay separate rows, which is
    what coverage accounting wants: disjoint segments, no double
    count, zero uncovered days between.

    Implementation is the scalable unification of the reference's three
    island idioms (W2 lag-diff + running max, W3 months-minus-rownum,
    W4 increment + running sum): a start-flag from ``lag`` of the
    running max ``to``, then a running sum of start flags as the island
    id. Unlike idiom A's two extra passes (row_number seed + MAX
    propagation, the reference's two slowest steps at 25 + 11 min,
    BASELINE.md), this is one cumulative window each way.
    """
    keys = id_cols + (group_cols or [])
    w_order = Window.partitionBy(*keys).orderBy(from_col, to_col)
    # Running max of to_date over preceding rows handles contained
    # intervals ([1,31] followed by [5,10]) that a plain lag(to) misses.
    prev_max_to = F.max(to_col).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_start = F.when(
        prev_max_to.isNull()
        | (F.datediff(F.col(from_col), prev_max_to) > max_gap_days),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_island = df.withColumn("_start", is_start).withColumn(
        "_island",
        F.sum("_start").over(w_order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    out_from = out_from or from_col
    out_to = out_to or to_col
    return (
        with_island.groupBy(*keys, "_island")
        .agg(
            F.min(from_col).alias(out_from),
            F.max(to_col).alias(out_to),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .withColumn(
            "island_days", F.datediff(F.col(out_to), F.col(out_from)) + F.lit(1)
        )
        .drop("_island")
    )


def clip_interval(
    from_col: Column | str,
    to_col: Column | str,
    win_from: Column,
    win_to: Column,
) -> tuple[Column, Column]:
    """Clip a closed interval to a request window:
    ``greatest(from, win_from)`` / ``least(to, win_to)`` — the
    reference's piecewise CASE clip (``R/claims_elig.R:703-745``)
    collapses to least/greatest."""
    f = F.col(from_col) if isinstance(from_col, str) else from_col
    t = F.col(to_col) if isinstance(to_col, str) else to_col
    return F.greatest(f, win_from), F.least(t, win_to)


def coverage_stats(
    df: DataFrame,
    id_cols: list[str],
    from_col: str,
    to_col: str,
    win_from: str,
    win_to: str,
) -> DataFrame:
    """Per-person coverage vs a request window (``R/claims_elig.R:699-781``,
    the ``##cov_time_part`` / ``##cov_time_tot`` stages):

    - ``cov_days``  total covered days inside [win_from, win_to]
      (intervals are island-collapsed first so overlaps never double
      count)
    - ``cov_pct``   cov_days / window length * 100, 1 decimal
    - ``pre_gap``   days from window start to first coverage
    - ``post_gap``  days from last coverage to window end
    - ``covgap_max`` longest uncovered run (max of internal gaps and
      the pre/post gaps — the reference's ``(SELECT MAX(v) FROM
      (VALUES ...))`` row-max, ``R/claims_elig.R:760``)
    """
    wf = F.lit(win_from).cast("date")
    wt = F.lit(win_to).cast("date")
    win_len = F.datediff(wt, wf) + F.lit(1)

    overlapping = df.filter((F.col(from_col) <= wt) & (F.col(to_col) >= wf))
    islands = collapse_islands(
        overlapping, id_cols, from_col, to_col, max_gap_days=0
    )
    cf, ct = clip_interval(from_col, to_col, wf, wt)
    clipped = islands.withColumn("_cf", cf).withColumn("_ct", ct)

    w = Window.partitionBy(*id_cols).orderBy("_cf")
    gap_before = F.datediff(F.col("_cf"), F.lag("_ct").over(w)) - F.lit(1)
    per_seg = clipped.withColumn(
        "_gap_before", F.coalesce(gap_before, F.datediff(F.col("_cf"), wf))
    )
    return (
        per_seg.groupBy(*id_cols)
        .agg(
            F.sum(F.datediff("_ct", "_cf") + F.lit(1)).alias("cov_days"),
            F.min("_cf").alias("_first"),
            F.max("_ct").alias("_last"),
            F.max("_gap_before").alias("_max_inner_gap"),
        )
        .withColumn("cov_pct", F.round(F.col("cov_days") / win_len * 100, 1))
        .withColumn("pre_gap", F.datediff("_first", wf))
        .withColumn("post_gap", F.datediff(wt, F.col("_last")))
        .withColumn(
            "covgap_max",
            F.greatest("_max_inner_gap", "pre_gap", "post_gap"),
        )
        .drop("_first", "_last", "_max_inner_gap")
    )


def resegment_overlaps(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    from_col: str = "from_date",
    to_col: str = "to_date",
    left_tag: str = "a",
    right_tag: str = "b",
) -> DataFrame:
    """Reconcile two per-person interval sets into disjoint segments
    tagged with which side(s) cover each segment — the dual
    Medicaid/Medicare timeline merge (SURVEY.md §2.5 W10,
    ``load_stage.mcaid_mcare_elig_timevar.R:108-239``).

    The reference enumerates 7 overlap cases and replicates rows 1-3×
    per case. We sweep instead: every interval contributes +1 at its
    start and -1 at ``to+1``; per person, the running sum of each
    side's deltas over the sorted breakpoints says whether that side
    covers the segment up to the next breakpoint. One shuffle on the
    id, one aggregate, one window — O(n log n) per person with NO
    per-key segment×interval join, so a mega-utilizer with thousands
    of intervals costs thousands of rows, not millions. (The
    reference's own benchmark shows why blowups lose: 39 s
    interval-permutation vs ~12 min per-day explosion,
    ``load_stage.mcaid_mcare_elig_timevar.R:99-104``.)

    Output: ``id, from_date, to_date, <left_tag>, <right_tag>``
    (boolean coverage flags), disjoint and sorted per person; segments
    covered by neither side are not emitted.
    """

    def deltas(df: DataFrame, col: str) -> DataFrame:
        starts = df.select(
            F.col(id_col).alias("_id"),
            F.col(from_col).alias("_p"),
            F.lit(1).alias(col),
        )
        ends = df.select(
            F.col(id_col).alias("_id"),
            F.date_add(to_col, 1).alias("_p"),
            F.lit(-1).alias(col),
        )
        return starts.unionByName(ends)

    da = deltas(left, "_da").withColumn("_db", F.lit(0))
    db = deltas(right, "_db").withColumn("_da", F.lit(0))
    points = (
        da.unionByName(db)
        .groupBy("_id", "_p")
        .agg(F.sum("_da").alias("_da"), F.sum("_db").alias("_db"))
    )
    w = Window.partitionBy("_id").orderBy("_p")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    swept = (
        points.withColumn("_ca", F.sum("_da").over(run))
        .withColumn("_cb", F.sum("_db").over(run))
        .withColumn("_next", F.lead("_p").over(w))
    )
    return (
        swept.filter(
            F.col("_next").isNotNull()
            & ((F.col("_ca") > 0) | (F.col("_cb") > 0))
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_p").alias(from_col),
            F.date_sub("_next", 1).alias(to_col),
            (F.col("_ca") > 0).alias(left_tag),
            (F.col("_cb") > 0).alias(right_tag),
        )
    )
