"""String classification helpers (SURVEY.md §2.9 "String" family).

All builders return JVM Column expressions (rlike / rpad / when) —
no Python UDFs in the scan path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def is_numeric(c: Column | str) -> Column:
    """T-SQL ``ISNUMERIC`` as used by the provider-ID classifier
    (``load_stage.mcaid_claim_pharm.R:63-71``) — digits-only check
    (the reference applies it to fixed-width ID strings, so the
    digits-only reading is the semantics actually relied on)."""
    return _col(c).rlike("^[0-9]+$")


def like_charset_to_regex(pattern: str) -> str:
    """Translate a T-SQL LIKE pattern (with ``[...]`` charsets, ``%``,
    ``_``) into an anchored Java regex.

    The reference matches revenue/procedure codes with charset LIKEs:
    ``'045[01269]'``, ``'9928[123458]'``, ``'T3[679]9%'``
    (``load_stage.mcaid_claim_header.R:242,285,528``).
    """
    out, i = [], 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "[":
            j = pattern.index("]", i)
            body = pattern[i + 1 : j]
            if body.startswith("^"):
                body = "^" + re.escape(body[1:]).replace(r"\-", "-")
            else:
                body = re.escape(body).replace(r"\-", "-")
            out.append(f"[{body}]")
            i = j + 1
        elif ch == "%":
            out.append(".*")
            i += 1
        elif ch == "_":
            out.append(".")
            i += 1
        else:
            out.append(re.escape(ch))
            i += 1
    return "^" + "".join(out) + "$"


def tsql_like(c: Column | str, pattern: str) -> Column:
    """``col LIKE pattern`` with T-SQL charset-class support."""
    return _col(c).rlike(like_charset_to_regex(pattern))


def provider_id_format(c: Column | str) -> Column:
    """Provider-ID format classification (P10,
    ``load_stage.mcaid_claim_pharm.R:63-71``): 10-digit starting 1/2 =
    NPI, 2-alpha + 7-digit = DEA, the known sentinel, else UNKNOWN."""
    col = _col(c)
    return (
        F.when(
            (F.length(col) == 10) & col.rlike("^[12][0-9]{9}$"), F.lit("NPI")
        )
        .when(col.rlike("^[A-Z]{2}[0-9]{7}$"), F.lit("DEA"))
        .when(col == "5123456787", F.lit("SENTINEL"))
        .otherwise(F.lit("UNKNOWN"))
    )


def zero_pad_left(c: Column | str, width: int) -> Column:
    """Zero-pad idiom ``'0'+type_of_bill``
    (``load_stage.mcaid_claim_header.R:353``), generalized via lpad."""
    return F.lpad(_col(c).cast("string"), width, "0")


def normalize_icdcm(code: Column | str, service_date: Column | str) -> Column:
    """ICD-CM normalization (``load_stage.mcaid_claim_icdcm_header.R:76-106``):

    - ICD-9 numeric 3/4-char codes right-zero-padded to 5 ('250' -> '25000')
    - V/E-prefixed 3/4-char codes are ICD-9 only before the 2015-10-01
      cutover and pad to 5
    - everything else passes through UNCHANGED — the reference pads
      only length-3/4 codes and never truncates, so a dirty overlong
      code ('V12345') or a short fragment ('V1') survives as-is rather
      than being silently corrupted (rpad truncates longer inputs)
    """
    c = F.upper(F.trim(_col(code)))
    sd = _col(service_date)
    cutover = F.lit("2015-10-01").cast("date")
    numeric9 = c.rlike("^[0-9]{3,4}$")
    ve9 = (
        c.rlike("^[VE][0-9]+$")
        & F.length(c).between(3, 4)
        & (sd < cutover)
    )
    return F.when(numeric9 | ve9, F.rpad(c, 5, "0")).otherwise(c)


def icdcm_version(code: Column | str, service_date: Column | str) -> Column:
    """Derive icdcm_version 9/10 per the cutover rule
    (``load_stage.mcaid_claim_icdcm_header.R:76-106``). Prefix
    semantics like the reference's LIKE patterns: any digit-led code
    is ICD-9 (dotted/overlong variants included); V/E-led codes are
    ICD-9 only before the cutover; other letters are ICD-10."""
    c = F.upper(F.trim(_col(code)))
    sd = _col(service_date)
    cutover = F.lit("2015-10-01").cast("date")
    is9 = c.rlike("^[0-9]") | (c.rlike("^[VE]") & (sd < cutover))
    return F.when(is9, F.lit(9)).otherwise(F.lit(10)).cast("tinyint")


def split_to_items(s: Column | str, delimiter: str) -> Column:
    """The reference's ``dbo.Split`` table-valued function
    (``analysis/Broad use functions/split function.sql``) as an array
    expression: split on a single-character delimiter, dropping empty
    slices (the T-SQL loop only inserts ``len(slice) > 0``). Explode
    the result to reproduce the one-row-per-item table shape — pure
    JVM, no UDF."""
    return F.filter(
        F.split(_col(s), re.escape(delimiter)), lambda x: F.length(x) > 0
    )


def longest_common_substring(first: Column | str, second: Column | str) -> Column:
    """The reference's ``dbo.LongestCommonSubstring``
    (``analysis/Broad use functions/longest_common_substring.sql``):
    returns a struct(match_length, first_char_in_match,
    first_char_in_string, common_string) — the longest common
    substring with 1-based positions in each input, tiebreaking on
    length DESC, position-in-first ASC, position-in-second ASC
    exactly like the T-SQL ``TOP 1 ... ORDER BY``.

    Dynamic-programming string alignment is not expressible in
    built-in expressions, so this is the sanctioned slow path: an
    Arrow-batched pandas UDF (never row-at-a-time) running the classic
    O(n*m) suffix-run DP per pair. Null inputs or no common character
    yield a NULL struct (the T-SQL function returns an empty table)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ret = (
        "match_length int, first_char_in_match int,"
        " first_char_in_string int, common_string string"
    )

    # no type hints: the module-level ``from __future__ import
    # annotations`` stringifies them, which the pandas-udf type-hint
    # inference can't resolve; an unannotated function defaults to the
    # scalar Arrow eval type, which is what we want
    def _lcs_impl(a_ser, b_ser):
        out = {"match_length": [], "first_char_in_match": [],
               "first_char_in_string": [], "common_string": []}

        def push(ml, fi, fj, cs):
            out["match_length"].append(ml)
            out["first_char_in_match"].append(fi)
            out["first_char_in_string"].append(fj)
            out["common_string"].append(cs)

        for a, b in zip(a_ser, b_ser):
            if a is None or b is None or not a or not b:
                push(None, None, None, None)
                continue
            n, m = len(a), len(b)
            best = 0
            bi = bj = -1
            prev = [0] * (m + 1)
            for i in range(1, n + 1):
                cur = [0] * (m + 1)
                ai = a[i - 1]
                for j in range(1, m + 1):
                    if ai == b[j - 1]:
                        L = prev[j - 1] + 1
                        cur[j] = L
                        # strict > keeps the FIRST maximal run in scan
                        # order == smallest start-in-first, then
                        # smallest start-in-second (the T-SQL ORDER BY)
                        if L > best:
                            best, bi, bj = L, i - L + 1, j - L + 1
                prev = cur
            if best == 0:
                push(None, None, None, None)
            else:
                push(best, bi, bj, a[bi - 1: bi - 1 + best])
        return pd.DataFrame(out)

    _lcs = pandas_udf(_lcs_impl, ret)
    return _lcs(_col(first), _col(second))
