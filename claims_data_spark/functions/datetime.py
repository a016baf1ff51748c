"""T-SQL-compatible date/time helpers (SURVEY.md §2.9 "Date" family).

The reference leans on T-SQL semantics that differ from Spark
built-ins; each helper documents the difference and the reference
call site it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tsql_datediff_month(start: Column | str, end: Column | str) -> Column:
    """T-SQL ``DATEDIFF(month, start, end)``: counts *calendar-boundary
    crossings*, not elapsed months. Jan-31 -> Feb-01 is 1.

    Spark's ``months_between`` returns fractional elapsed months, so it
    is NOT equivalent. Reference sites:
    ``load_stage.mcaid_elig_timevar.R:291,405``,
    ``load_stage.apcd_elig_timevar.R:83-104`` (islands idiom B).
    """
    s, e = _col(start), _col(end)
    return (F.year(e) - F.year(s)) * F.lit(12) + (F.month(e) - F.month(s))


def tsql_datediff_day(start: Column | str, end: Column | str) -> Column:
    """T-SQL ``DATEDIFF(day, start, end)`` == Spark ``datediff(end, start)``."""
    return F.datediff(_col(end), _col(start))


def month_end(d: Column | str) -> Column:
    """T-SQL idiom ``dateadd(day,-1,dateadd(month,1,calmonth))``
    (``load_stage.mcaid_elig_timevar.R:188``) == ``last_day``."""
    return F.last_day(_col(d))


def yyyymm_to_date(ym: Column | str) -> Column:
    """T-SQL ``CONVERT(DATE, yyyymm+'01', 112)``
    (``load_stage.mcaid_elig_timevar.R:90``): int/str yyyymm -> first
    day of month."""
    return F.to_date(F.concat(_col(ym).cast("string"), F.lit("01")), "yyyyMMdd")


def date_to_yyyymm(d: Column | str) -> Column:
    """Date -> int yyyymm (person-month key, ``CLNDR_YEAR_MNTH``)."""
    c = _col(d)
    return (F.year(c) * F.lit(100) + F.month(c)).cast("int")


def yyyymm_add(ym: Column | str, months: int) -> Column:
    """Add N months to an int yyyymm without leaving integer space.

    Used by rolling person-month frames (SURVEY.md §2.5 W6) so the
    month sequence is dense and window ``rowsBetween`` frames are
    correct even when encoded as ints.
    """
    c = _col(ym).cast("int")
    total = (c - c % 100) / 100 * 12 + (c % 100) - 1 + F.lit(months)
    return (F.floor(total / 12) * 100 + (total % 12) + 1).cast("int")


def age_years(dob: Column | str, asof: Column | str) -> Column:
    """Reference age formula ``FLOOR((datediff(day,dob,to)+1)/365.25)``
    (``R/claims_elig.R:590-594``)."""
    return F.floor((F.datediff(_col(asof), _col(dob)) + F.lit(1)) / F.lit(365.25))
