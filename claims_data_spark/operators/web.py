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
