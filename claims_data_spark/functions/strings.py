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
