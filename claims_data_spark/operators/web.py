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


def _is_tracking_param(p: Column) -> Column:
    """String-op mirror of ``_TRACKING_RE`` (no per-param regex):
    ``utm_<no-=>*=`` reduces to startswith('utm_') AND contains '='
    (the utm_ prefix itself has no '='), the rest are literal
    ``name=`` prefixes."""
    return (
        (p.startswith("utm_") & (F.instr(p, "=") > 0))
        | p.startswith("fbclid=")
        | p.startswith("gclid=")
        | p.startswith("mc_cid=")
        | p.startswith("mc_eid=")
        | p.startswith("ref=")
    )


def _arith_parts(
    cu: Column, scheme0: Column
) -> tuple[Column, Column, Column]:
    """(authority, path, query) of ``cu`` by delimiter arithmetic —
    ONE instr scan per delimiter instead of three more full
    ``try_parse_url`` URI parses. Exactness: for any string that
    passes the ``_canon_from_parts`` gate (URI parses AND '://' sits
    right after the scheme), RFC 3986's hierarchical grammar makes the
    raw authority exactly the span between '://' and the first of
    '/', '?', '#'; the path runs from that '/' to the first '?' or
    '#'; the query sits between '?' and '#'. Differentially verified
    canon-identical to the 4-parse form over 18k adversarial strings
    (percent-escapes, userinfo, IPv6 brackets, empty authority —
    AUTHORITY parses to NULL where arithmetic gives '', which the
    assembly coalesces identically). Rows that fail the gate never
    read these columns (the fallback branch wins), so garbage parts
    on unparseable strings are harmless."""
    rest = F.substring(cu, F.length(scheme0) + 4, F.length(cu))
    sl0, qm0, hx0 = F.instr(rest, "/"), F.instr(rest, "?"), F.instr(rest, "#")
    sentinel = F.length(rest) + 1

    def nz(c: Column) -> Column:
        return F.when(c > 0, c).otherwise(sentinel)

    sl, qm, hx = nz(sl0), nz(qm0), nz(hx0)
    acut = F.least(sl, qm, hx)
    pend = F.least(qm, hx)
    auth = F.substring(rest, 1, acut - 1)
    path = F.when(
        (sl0 > 0) & (sl < pend), F.substring(rest, sl, pend - sl)
    ).otherwise(F.lit(""))
    query = F.when(
        (qm0 > 0) & (qm < hx), F.substring(rest, qm + 1, hx - qm - 1)
    ).otherwise(F.lit(None).cast("string"))
    return auth, path, query


def _canonical_shape_gate(u: Column) -> Column:
    """True only for (trimmed) strings PROVABLY fixed points of
    ``canonicalize_url`` — the crawl fast path that skips the URI
    parse AND the assembly for the already-canonical majority of a
    real crawl frontier. Soundness: a gate-passing string is
    all-lowercase (so the parse-FAIL fallback ``lower(u)`` is
    identity), starts with a literal lowercase ``http(s)://`` (so the
    '://'-after-scheme check holds and scheme lowering is identity),
    has no '?' or '#' (no query to filter/sort, no fragment to drop),
    no ``www.`` authority prefix, no ':80'/':443' substring ANYWHERE
    (conservative: a ':8080' port or a path ':80' just takes the slow
    path), and no trailing '/' — so on the parse-SUCCESS branch the
    reassembly ``scheme || '://' || auth || path`` reproduces the
    input byte-for-byte. Either branch is identity, so the gate can
    bypass BOTH without knowing which branch would run. Every check
    is a non-regex codegen string op (== / startswith / endswith /
    instr); false negatives are harmless, false positives impossible
    (equivalence pinned by test against the gateless form).

    Clause ORDER is a measured choice: short-circuit AND evaluates
    left to right, so the O(1) prefix/suffix checks and the
    delimiter instrs run first and the one O(len) clause — the
    full-string lowercase compare — runs LAST. On a fixture where
    every row fails the gate early this cut the gate's overhead from
    ~18% to noise (sf10), while gate-passing rows pay the full check
    once either way."""
    return (
        (u.startswith("http://") | u.startswith("https://"))
        & ~u.endswith("/")
        & (F.instr(u, "?") == 0)
        & (F.instr(u, "#") == 0)
        & ~u.startswith("http://www.")
        & ~u.startswith("https://www.")
        & (F.instr(u, ":80") == 0)
        & (F.instr(u, ":443") == 0)
        & (u == F.lower(u))
    )


def canonicalize_url(url_col: Column | str, fast_path: bool = True) -> Column:
    """Canonical form of a URL for dedup keys — ONE ``try_parse_url``
    call as the RFC-validity gate (java.net.URI accept/reject is the
    contract; a URI parse was measured ~3x cheaper than a
    regexp_extract pass at sf10) plus delimiter-arithmetic part
    extraction (`_arith_parts`) and non-regex string ops; no UDF,
    map-only at any corpus scale.

    Rules (the common-crawl canonical set):
      * scheme and host lowercase; path/query case preserved
      * leading ``www.`` stripped from the host
      * default ports stripped (``:80`` for http, ``:443`` for https)
      * fragment dropped
      * tracking query params dropped (``utm_*``, ``fbclid``,
        ``gclid``, ``mc_cid``, ``mc_eid``, ``ref``); the survivors are
        SORTED so param order doesn't split a page into two keys
      * trailing slashes stripped from the path
    Strings that do not parse as ``scheme://...`` — including RFC-
    invalid inputs URI rejects (raw spaces, doubled fragments) —
    canonicalize to the trimmed lowercase input, so the operator is
    total and the key is a fixed point either way (the idempotence
    property test covers both branches).

    ``fast_path=True`` (default) short-circuits strings the
    ``_canonical_shape_gate`` proves are already canonical — the
    dominant shape in a real crawl frontier — past both the URI parse
    and the assembly (codegen CASE WHEN: the parse never executes for
    gated rows). Semantically a no-op by the gate's soundness
    argument; ``fast_path=False`` keeps the gateless form for
    differential testing.
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.trim(c)
    scheme0 = F.try_parse_url(u, F.lit("PROTOCOL"))
    auth, path, query = _arith_parts(u, scheme0)
    slow = _canon_from_parts(u, scheme0, auth, path, query)
    if not fast_path:
        return slow
    return F.when(_canonical_shape_gate(u), u).otherwise(slow)


def _canon_from_parts(
    u: Column, scheme0: Column, auth0: Column, path0: Column, query0: Column
) -> Column:
    """Assemble the canonical form from already-extracted URI parts.

    Split out so ``url_dedup`` can MATERIALIZE the gate parse and the
    arithmetic part extraction as stepwise columns first: the
    conditional reuse below (authority feeds the www-strip and both
    port-strip branches) would otherwise re-derive the parts at every
    use site — conditional branches are invisible to codegen
    subexpression elimination, and the re-parses were the measured
    sf10 wall back when the parts were four full URI parses. The
    remaining duplicated ops here run over the SHORT extracted parts.
    """
    scheme = F.lower(scheme0)
    # URI also accepts non-hierarchical forms (mailto:x); the regex
    # contract this replaces required a literal '://' right after the
    # scheme — keep that gate so such strings take the total fallback
    parses = scheme0.isNotNull() & (
        F.instr(u, "://") == F.length(scheme0) + 1
    )
    # authority INCLUDING the port (host-only would silently drop
    # ':8080' and conflate distinct origins); default ports are
    # stripped explicitly below
    host0 = F.lower(F.coalesce(auth0, F.lit("")))
    host1 = F.when(
        host0.startswith("www."),
        F.substring(host0, 5, F.length(host0)),
    ).otherwise(host0)
    host = F.when(
        (scheme == "http") & host1.endswith(":80"),
        F.substring(host1, 1, F.length(host1) - 3),
    ).when(
        (scheme == "https") & host1.endswith(":443"),
        F.substring(host1, 1, F.length(host1) - 4),
    ).otherwise(host1)
    # strip ALL trailing slashes: two-arg rtrim, not a regex
    path = F.call_function(
        "rtrim", F.lit("/"), F.coalesce(path0, F.lit(""))
    )
    # short-circuit the common crawl shapes before paying the array
    # machinery: no query -> ''; single param (no '&') -> identity
    # filter + sort of a one-element array, i.e. the param itself or
    # '' when it's a tracking param. Real crawls are dominated by
    # 0/1-param URLs, and split/filter/array_sort/array_join was the
    # single biggest canon cost at sf10 (0.84 s of ~2.4 s).
    q0 = F.coalesce(query0, F.lit(""))
    qparams = F.array_sort(
        F.filter(
            F.split(q0, "&"),
            lambda p: (F.length(p) > 0) & ~_is_tracking_param(p),
        )
    )
    query = (
        F.when(F.length(q0) == 0, F.lit(""))
        .when(
            F.instr(q0, "&") == 0,
            F.when(_is_tracking_param(q0), F.lit("")).otherwise(q0),
        )
        .otherwise(F.array_join(qparams, "&"))
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(query) > 0, F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )
    return F.when(~parses, F.lower(u)).otherwise(canon)


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    order_cols: list | None = None,
    canon_col: str = "canon_url",
    group_col: str = "n_variants",
    fast_path: bool = True,
) -> DataFrame:
    """One survivor per canonical URL: the crawl-dedup step that runs
    BEFORE content hashing (same page fetched as ``http://www.X/p?b=2&a=1``
    and ``https://x/p/?a=1&b=2&utm_source=feed`` is one document).

    Survivor = first row by ``order_cols`` (default: lowest ``id_col``,
    the repo's standard keep-min rule); ``group_col`` reports how many
    raw variants collapsed into the key, for crawl-health audit.

    Scale: canonicalization is map-only codegen. The default survivor
    rule (no ``order_cols`` — keep the lowest ``id_col``) plans as ONE
    hash aggregate: ``min_by(row, id)`` + ``count`` get map-side
    partial aggregation, so the exchange carries one partial row per
    (task, canonical key) instead of every raw variant, and no
    per-partition sort ever runs. Custom ``order_cols`` (arbitrary
    Column orderings — desc, null placement) fall back to the rank
    window over the same single exchange. No driver state, no collect.

    Pruning caveat: the survivor struct references EVERY input column
    (the contract returns whole rows), so Catalyst cannot prune
    columns a downstream select drops — narrow ``df`` to the columns
    you need BEFORE calling, or wide payloads (document text) ride
    the exchange for nothing.
    """
    # stepwise materialization: the gate parse (the ONE try_parse_url
    # left — java.net.URI validity is the contract) and the
    # delimiter-arithmetic parts (_arith_parts) each evaluate exactly
    # ONCE per row into their own projected columns; the assembly then
    # reuses the short parts freely. A single nested Column would
    # re-derive them at every conditional use site (see
    # _canon_from_parts) — conditional branches are invisible to
    # codegen subexpression elimination. CollapseProject keeps the
    # layers apart because the parts are non-cheap and multiply
    # referenced.
    u = F.trim(F.col(url_col))
    cu = F.col("_cu")
    a, p, q = _arith_parts(cu, F.col("_cp"))
    # fast path (default): rows the shape gate proves already-canonical
    # skip the URI parse entirely — the parse column is NULL for them
    # (codegen CASE WHEN, so java.net.URI never constructs), and the
    # canon assembly takes the identity branch. Gate-NULL parse rows
    # feed NULL into _arith_parts, whose outputs the identity branch
    # never reads.
    gate = _canonical_shape_gate(cu) if fast_path else F.lit(False)
    parse = F.try_parse_url(cu, F.lit("PROTOCOL"))
    # spread(): the parse+assembly below is the CPU cost of the whole
    # operator and a single-row-group input would otherwise run it on
    # one task per scan branch (round-9 lesson, SCALE.md addendum 2);
    # no-op on real multi-row-group corpora
    from claims_data_spark.session import spread

    out = (
        spread(df).withColumn("_cu", u)
        .withColumn("_cg", gate)
        .withColumn(
            "_cp",
            F.when(~F.col("_cg"), parse) if fast_path else parse,
        )
        .withColumns({"_ca": a, "_cpt": p, "_cq": q})
        .withColumn(canon_col, F.when(F.col("_cg"), cu).otherwise(
            _canon_from_parts(
                cu, F.col("_cp"), F.col("_ca"), F.col("_cpt"), F.col("_cq"),
            )
        ))
        .drop("_cu", "_cg", "_cp", "_ca", "_cpt", "_cq")
    )
    if not order_cols:
        row = F.struct(*[F.col(c) for c in out.columns])
        agg = out.groupBy(canon_col).agg(
            F.min_by(row, F.col(id_col)).alias("_row"),
            F.count(F.lit(1)).alias(group_col),
        )
        return agg.select(
            *[F.col(f"_row.{c}").alias(c) for c in df.columns],
            canon_col,
            F.col(group_col).cast("long").alias(group_col),
        )
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    order.append(F.col(id_col).asc())
    w = Window.partitionBy(canon_col)
    return (
        out.withColumn("_rn", F.row_number().over(w.orderBy(*order)))
        .withColumn(group_col, F.count(F.lit(1)).over(w).cast("long"))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# HTML boilerplate extraction
# ---------------------------------------------------------------------------

# the entity set every crawl actually hits; chained literal replaces
# (no regex) — ORDER MATTERS: '&amp;' decodes LAST so '&amp;lt;'
# becomes the literal '&lt;' (correct double-encoding behavior), not
# '<'
_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def html_extract_text(html_col: Column | str) -> Column:
    """Visible text of an HTML document — the step BEFORE every text
    operator in a crawl pipeline (language ID, quality scoring, dedup
    all assume markup-free text). Pure regexp/replace codegen,
    map-only at any corpus scale; the patterns use no lookaround or
    backreferences, so the SAME rules run on java.util.regex (Spark)
    and RE2 (DuckDB oracle) byte-for-byte.

    Rules:
      * ``<script>``/``<style>`` ELEMENTS drop with their contents
        (case-insensitive, dotall, non-greedy; attribute-bearing open
        tags included)
      * HTML comments ``<!-- ... -->`` drop with contents
      * every remaining tag becomes ONE space (block/inline
        distinction deliberately not modeled: downstream ops tokenize
        on whitespace, so a space boundary is sufficient and cheaper
        than a newline grammar)
      * the seven crawl-frequent entities decode literally
        (``&amp;`` last, so double-encoded text stays escaped — see
        _HTML_ENTITIES); numeric character references are NOT decoded
        (deliberate: a numeric-reference table is a tokenizer concern)
      * whitespace collapses to single spaces, ends trimmed
    Malformed markup degrades safely: an unclosed ``<tag`` with no
    ``>`` anywhere is not a match for ``<[^>]*>`` and survives as
    text rather than swallowing the document tail.

    Portability boundary: java.util.regex ``\\s`` includes vertical
    tab (U+000B) where RE2's does not — inputs containing raw VT
    collapse differently under the DuckDB oracle. Run
    ``functions/text.normalize_text`` first (it deletes control
    characters) when the corpus may carry them.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    out = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_extract(
    df: DataFrame,
    html_col: str,
    text_col: str = "text_extracted",
    keep_stats: bool = True,
) -> DataFrame:
    """Frame-level HTML extraction: adds ``text_col`` plus (when
    ``keep_stats``) the crawl-audit columns ``n_links`` (anchor count)
    and ``html_ratio`` (markup bytes / total bytes — the classic
    boilerplate-heaviness signal; 0.0 for empty input). One map-only
    projection, no shuffle, no UDF."""
    c = F.col(html_col)
    out = df.withColumn(text_col, html_extract_text(c))
    if keep_stats:
        out = out.withColumn(
            "n_links",
            F.size(
                F.regexp_extract_all(c, F.lit(r"(?i)<a\s[^>]*href"), F.lit(0))
            ).cast("long"),
        ).withColumn(
            "html_ratio",
            F.when(F.length(c) > 0,
                   F.round(
                       (F.length(c) - F.length(F.col(text_col)))
                       / F.length(c).cast("double"), 6)
                   ).otherwise(F.lit(0.0)),
        )
    return out
