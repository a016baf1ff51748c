"""Web-corpus provenance operators: URL host extraction and
per-domain document caps.

Per-domain capping is the C4/RefinedWeb crawl-curation step: a handful
of giant hosts (patent mirrors, forums, link farms) would otherwise
dominate a trained model's data mixture, so each registered host keeps
at most K documents chosen by a quality order. Blocklisted hosts drop
entirely.

Scale: the cap is a per-key top-k. The default path is one shuffle on
the host plus a row_number window — right for the common case where no
single host is a measurable fraction of the corpus. For the crawl
reality (a few hosts with 1e8+ docs on a 1000-executor cluster) the
``two_phase`` path salts the host into ``num_salts`` subkeys, takes a
LOCAL top-k per (host, salt), and only then runs the global per-host
top-k — exact for any top-k selection (min-k is decomposable), and the
skewed key's work spreads over ``num_salts`` tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def extract_host(url_col: Column | str) -> Column:
    """Lower-cased host of a URL (empty string when the value does not
    parse as scheme://host...). Pure codegen regexp — map-only."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def domain_cap(
    df: DataFrame,
    url_col: str,
    k: int,
    order_cols: list,
    id_col: str,
    blocklist: list | None = None,
    host_col: str = "host",
    rank_col: str = "domain_rank",
    two_phase: bool = False,
    num_salts: int = 16,
) -> DataFrame:
    """Keep at most ``k`` documents per URL host, ranked by
    ``order_cols`` (ties broken by ``id_col`` so the survivor set is
    deterministic). Hosts in ``blocklist`` are removed before the
    shuffle — the filter sits on the scan side, so blocked giants
    never enter the exchange.
    """
    out = df.withColumn(host_col, extract_host(url_col))
    if blocklist:
        out = out.filter(~F.col(host_col).isin([h.lower() for h in blocklist]))
    order = [*order_cols, F.col(id_col).asc()]
    if two_phase:
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_salts))
        out = (
            out.withColumn("_lrn", F.row_number().over(
                Window.partitionBy(F.col(host_col), salt).orderBy(*order)
            ))
            .filter(F.col("_lrn") <= k)
            .drop("_lrn")
        )
    w = Window.partitionBy(host_col).orderBy(*order)
    return (
        out.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


# ---------------------------------------------------------------------------
# URL canonicalization + canonical-URL dedup
# ---------------------------------------------------------------------------

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
# the tracking params every crawl pipeline strips (Google/Facebook/
# Mailchimp click attribution) — they vary per click, not per page
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|mc_cid|mc_eid|ref)="


def canonicalize_url(url_col: Column | str) -> Column:
    """Canonical form of a URL for dedup keys — pure codegen (regexp
    extracts + array ops), no UDF, map-only at any corpus scale.

    Rules (the common-crawl canonical set):
      * scheme and host lowercase; path/query case preserved
      * leading ``www.`` stripped from the host
      * default ports stripped (``:80`` for http, ``:443`` for https)
      * fragment dropped
      * tracking query params dropped (``utm_*``, ``fbclid``,
        ``gclid``, ``mc_cid``, ``mc_eid``, ``ref``); the survivors are
        SORTED so param order doesn't split a page into two keys
      * trailing slashes stripped from the path
    Non-URL strings (no ``scheme://``) canonicalize to the trimmed
    lowercase input, so the operator is total.
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.trim(c)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    # authority INCLUDING the port (``_HOST_RE`` stops at ':' — using
    # it here would silently drop ':8080' and conflate distinct
    # origins); default ports are stripped explicitly below
    host0 = F.lower(F.regexp_extract(u, _AUTHORITY_RE, 1))
    host1 = F.regexp_replace(host0, r"^www\.", "")
    host = F.when(
        (scheme == "http") & host1.endswith(":80"),
        F.regexp_replace(host1, ":80$", ""),
    ).when(
        (scheme == "https") & host1.endswith(":443"),
        F.regexp_replace(host1, ":443$", ""),
    ).otherwise(host1)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), "/+$", "")
    qparams = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(u, _QUERY_RE, 1), "&"),
            lambda p: (F.length(p) > 0)
            & ~p.rlike(_TRACKING_RE),
        )
    )
    query = F.array_join(qparams, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(query) > 0, F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme == "", F.lower(u)).otherwise(canon)


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    order_cols: list | None = None,
    canon_col: str = "canon_url",
    group_col: str = "n_variants",
) -> DataFrame:
    """One survivor per canonical URL: the crawl-dedup step that runs
    BEFORE content hashing (same page fetched as ``http://www.X/p?b=2&a=1``
    and ``https://x/p/?a=1&b=2&utm_source=feed`` is one document).

    Survivor = first row by ``order_cols`` (default: lowest ``id_col``,
    the repo's standard keep-min rule); ``group_col`` reports how many
    raw variants collapsed into the key, for crawl-health audit.

    Scale: canonicalization is map-only codegen; the dedup itself is
    ONE exchange on the canonical key (window rank + count over the
    same partitioning — Spark plans both over a single shuffle since
    the partition keys match). No driver state, no collect.
    """
    order = [F.col(c) if isinstance(c, str) else c for c in (order_cols or [])]
    order.append(F.col(id_col).asc())
    out = df.withColumn(canon_col, canonicalize_url(url_col))
    w = Window.partitionBy(canon_col)
    return (
        out.withColumn("_rn", F.row_number().over(w.orderBy(*order)))
        .withColumn(group_col, F.count(F.lit(1)).over(w).cast("long"))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
