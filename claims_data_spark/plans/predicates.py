"""Dynamic predicate assembly (SURVEY.md §2.2 P4).

``claims_elig`` turns ~50 nullable user parameters into optional
``AND col = value`` / ``AND lower(col) IN (...)`` SQL fragments
(``R/claims_elig.R:441-583``). Spark-first: each non-None parameter
becomes a Column predicate; the conjunction is a fold. Catalyst then
pushes every conjunct into the parquet scan (PushedFilters) — the
pushdown the reference writes by hand is free here.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_predicate(spec: dict[str, Any], df: DataFrame | None = None) -> Column | None:
    """Build one conjunction from a spec of optional filters.

    Spec keys map column names to filter descriptors; None values are
    skipped (the reference's NULL-parameter convention):

    - scalar            -> col = value
    - list/tuple/set    -> lower(col) IN (...)   (case-insensitive,
                           like the reference's LOWER(col) IN fragments)
    - dict with any of  min/max (inclusive bounds), like (T-SQL LIKE),
      not_null (bool), between=(lo, hi)

    When ``df`` is given, spec keys are validated against its columns
    up front (the reference validates every arg before emitting SQL) —
    a typo'd filter name fails here, not at analysis time.
    """
    if df is not None:
        unknown = [k for k in spec if k not in df.columns]
        if unknown:
            raise KeyError(
                f"filter spec references unknown columns {unknown}; "
                f"available: {sorted(df.columns)}"
            )
    conds: list[Column] = []
    for name, v in spec.items():
        if v is None:
            continue
        c = F.col(name)
        if isinstance(v, dict):
            if v.get("not_null"):
                conds.append(c.isNotNull())
            if "min" in v and v["min"] is not None:
                conds.append(c >= F.lit(v["min"]))
            if "max" in v and v["max"] is not None:
                conds.append(c <= F.lit(v["max"]))
            if "between" in v and v["between"] is not None:
                lo, hi = v["between"]
                conds.append(c.between(F.lit(lo), F.lit(hi)))
            if "like" in v and v["like"] is not None:
                from claims_data_spark.functions.strings import tsql_like

                conds.append(tsql_like(c, v["like"]))
        elif isinstance(v, (list, tuple, set, frozenset)):
            vals = [str(x).lower() for x in v]
            conds.append(F.lower(c.cast("string")).isin(vals))
        else:
            conds.append(c == F.lit(v))
    if not conds:
        return None
    return reduce(lambda a, b: a & b, conds)


def apply_filters(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    pred = build_predicate(spec, df)
    return df if pred is None else df.filter(pred)
