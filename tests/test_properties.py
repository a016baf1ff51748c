"""Property-based tests (hypothesis): the interval operators against
brute-force day-set oracles. The reference has no property testing
(SURVEY.md §5); this is our stronger replacement for its golden spot
checks — any random interval multiset must collapse/measure exactly
like the set-of-days model."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F
from hypothesis import strategies as st

from claims_data_spark.operators.intervals import collapse_islands, coverage_stats

BASE = dt.date(2020, 1, 1)

interval = st.tuples(
    st.integers(min_value=0, max_value=120),
    st.integers(min_value=0, max_value=30),
).map(lambda t: (BASE + dt.timedelta(days=t[0]), BASE + dt.timedelta(days=t[0] + t[1])))

interval_sets = st.lists(interval, min_size=1, max_size=12)


def day_set(intervals):
    days = set()
    for f, t in intervals:
        cur = f
        while cur <= t:
            days.add(cur)
            cur += dt.timedelta(days=1)
    return days


def islands_from_days(days, max_gap_days):
    """Brute-force oracle mirroring the operator's contract: a day
    extends the island when its day-difference from the island's max
    day is <= max_gap_days (datediff semantics — the reference's
    'contiguous = gap exactly 1 day' and 'ED visits <= 1 day apart'
    rules are both max_gap_days=1)."""
    out = []
    for day in sorted(days):
        if out and (day - out[-1][1]).days <= max_gap_days:
            out[-1][1] = day
        else:
            out.append([day, day])
    return [(a, b) for a, b in out]


_settings = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def islands_from_intervals(ivs, max_gap_days):
    """Sequential 10-line reference for the interval-merge contract —
    independent check of the distributed running-max/island-propagation
    window mechanics."""
    out = []
    for f, t in sorted(ivs):
        if out and (f - out[-1][1]).days <= max_gap_days:
            out[-1][1] = max(out[-1][1], t)
        else:
            out.append([f, t])
    return [(a, b) for a, b in out]


@given(ivs=interval_sets, gap=st.integers(min_value=1, max_value=3))
@_settings
def test_collapse_islands_matches_dayset_oracle(spark, ivs, gap):
    # day-set model applies for gap >= 1 (consecutive covered days
    # always merge); gap=0 island semantics are interval-based
    df = spark.createDataFrame(
        [("p", f, t) for f, t in ivs], "id string, from_date date, to_date date"
    )
    got = sorted(
        (r["from_date"], r["to_date"])
        for r in collapse_islands(df, ["id"], max_gap_days=gap).collect()
    )
    expected = islands_from_days(day_set(ivs), gap)
    assert got == expected


@given(ivs=interval_sets, gap=st.integers(min_value=0, max_value=3))
@_settings
def test_collapse_islands_matches_sequential_oracle(spark, ivs, gap):
    df = spark.createDataFrame(
        [("p", f, t) for f, t in ivs], "id string, from_date date, to_date date"
    )
    got = sorted(
        (r["from_date"], r["to_date"])
        for r in collapse_islands(df, ["id"], max_gap_days=gap).collect()
    )
    assert got == islands_from_intervals(ivs, gap)


@given(ivs_a=interval_sets, ivs_b=interval_sets)
@_settings
def test_resegment_matches_day_oracle(spark, ivs_a, ivs_b):
    from claims_data_spark.operators.intervals import resegment_overlaps

    a = spark.createDataFrame(
        [("p", f, t) for f, t in ivs_a], "id string, from_date date, to_date date"
    )
    b = spark.createDataFrame(
        [("p", f, t) for f, t in ivs_b], "id string, from_date date, to_date date"
    )
    segs = resegment_overlaps(a, b, "id").collect()
    # 1) segments are disjoint, sorted, valid
    spans = sorted((r["from_date"], r["to_date"]) for r in segs)
    for (f1, t1), (f2, t2) in zip(spans, spans[1:]):
        assert t1 < f2
    # 2) per-day flags match the day-set ground truth exactly
    da, db = day_set(ivs_a), day_set(ivs_b)
    flags = {}
    for r in segs:
        cur = r["from_date"]
        while cur <= r["to_date"]:
            flags[cur] = (r["a"], r["b"])
            cur += dt.timedelta(days=1)
    for day in da | db:
        assert flags[day] == (day in da, day in db), day
    # no uncovered day appears in any segment
    assert set(flags) == (da | db)
    # 3) flags are constant within a segment by construction; each
    # segment must be covered by at least one side
    assert all(r["a"] or r["b"] for r in segs)


@given(ivs=interval_sets)
@_settings
def test_coverage_days_matches_dayset_oracle(spark, ivs):
    win_from, win_to = dt.date(2020, 2, 1), dt.date(2020, 4, 30)
    df = spark.createDataFrame(
        [("p", f, t) for f, t in ivs], "id string, from_date date, to_date date"
    )
    out = coverage_stats(
        df, ["id"], "from_date", "to_date", str(win_from), str(win_to)
    ).collect()
    covered = {d for d in day_set(ivs) if win_from <= d <= win_to}
    if not covered:
        assert out == []
        return
    r = out[0]
    assert r["cov_days"] == len(covered)
    assert r["pre_gap"] == (min(covered) - win_from).days
    assert r["post_gap"] == (win_to - max(covered)).days
    # covgap_max: longest uncovered run within the window
    runs, cur = [], 0
    day = win_from
    while day <= win_to:
        if day in covered:
            runs.append(cur)
            cur = 0
        else:
            cur += 1
        day += dt.timedelta(days=1)
    runs.append(cur)
    assert r["covgap_max"] == max(runs)


# --- enrollment-denominator rolling frames vs a brute-force model ---

member_months = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=23),   # month offset from 201601
        st.booleans(),                            # full_benefit
        st.booleans(),                            # hospice
    ),
    min_size=1, max_size=24, unique_by=lambda t: t[0],
)


@given(mm=member_months)
@_settings
def test_enroll_denom_frames_match_bruteforce(spark, mm):
    from claims_data_spark.tables.perf_registry import (
        build_enroll_denom_full,
        yyyymm_add_py,
    )

    months = [yyyymm_add_py(201601, off) for off, _, _ in mm]
    rows = [
        ("p", ym, 1, int(fb), 0, 0, int(h), dt.date(1990, 3, 2))
        for ym, (_, fb, h) in zip(months, mm)
    ]
    df = spark.createDataFrame(
        rows,
        "id_mcaid string, year_month int, enrolled_any int,"
        " full_benefit int, dual int, tpl int, hospice int, dob date",
    )
    den = build_enroll_denom_full(df, 201601, 201712)
    got = {r.year_month: r for r in den.collect()}
    assert len(got) == 24  # densified

    fc = {ym: (1 if (ym in months and dict(
        (yyyymm_add_py(201601, o), f) for o, f, _ in mm)[ym]) else 0)
        for ym in (yyyymm_add_py(201601, k) for k in range(24))}
    hosp = {ym: (1 if (ym in months and dict(
        (yyyymm_add_py(201601, o), h) for o, _, h in mm)[ym]) else 0)
        for ym in (yyyymm_add_py(201601, k) for k in range(24))}
    all_months = sorted(fc)
    for i, ym in enumerate(all_months):
        window = all_months[max(0, i - 11): i + 1]
        prior = all_months[max(0, i - 23): max(0, i - 11)]
        ahead = all_months[i: i + 2]
        assert got[ym].full_criteria_t_12_m == sum(fc[m] for m in window), ym
        # SUM over an empty frame is NULL in both T-SQL and Spark —
        # the prior-year frame is empty for the first 12 months
        expected_prior = sum(fc[m] for m in prior) if prior else None
        assert got[ym].full_criteria_prior_t_12_m == expected_prior
        assert got[ym].hospice_p_2_m == sum(hosp[m] for m in ahead)


# --- sequence packing (operators/corpus.pack_sequences) ----------------------

def _pack_reference(tokens_by_doc, budget):
    """Sequential greedy next-fit in doc-id order — independent check
    of the Arrow-batched reset-on-overflow scan."""
    out = {}
    cur_pack, cur_tot, started = 0, 0, False
    for doc_id, t in sorted(tokens_by_doc):
        if started and cur_tot + t > budget:
            cur_pack += 1
            cur_tot = 0
        out[doc_id] = (cur_pack, cur_tot)
        cur_tot += t
        started = True
    return out


@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=60
    ),
    budget=st.integers(min_value=1, max_value=80),
)
@_settings
def test_pack_sequences_matches_sequential_reference(spark, toks, budget):
    from claims_data_spark.operators.corpus import pack_sequences

    rows = [(i, t) for i, t in enumerate(toks)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # single shard: the whole stream is one greedy scan, which is the
    # hardest case for the reference comparison (every reset shifts
    # all later assignments)
    out = pack_sequences(
        docs.withColumn("shard", F.lit(0)), budget=budget, shard_col="shard"
    ).collect()
    want = _pack_reference(rows, budget)
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"]) for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# canonicalize_url: idempotence over adversarial URL-ish strings
# ---------------------------------------------------------------------------

_url_chars = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019-._~:/?#[]@!$&'()*+,;=%é ")
    ),
    max_size=24,
)
_urls = st.one_of(
    # well-formed-ish: scheme://host[:port]/path[?query][#frag]
    st.builds(
        lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}",
        st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
        st.sampled_from(
            ["www.Ex.com", "ex.com", "EX.COM:443", "h1.org:80", "h2.org:8080"]
        ),
        st.sampled_from(["", "/", "/a/b", "/a/b///", "/A%20B"]),
        st.sampled_from(
            ["", "?a=1&b=2", "?b=2&a=1", "?utm_source=x&a=1", "?ref=z", "?"]
        ),
        st.sampled_from(["", "#frag", "#a#b"]),
    ),
    _url_chars,  # arbitrary junk: operator must stay total
)


@_settings
@given(url=_urls)
def test_canonicalize_url_idempotent(spark, url):
    """canonicalize(canonicalize(u)) == canonicalize(u): the dedup key
    must be a fixed point, or re-crawling already-canonical URLs would
    mint NEW keys and split pages across dedup groups."""
    from claims_data_spark.operators.web import canonicalize_url

    df = spark.createDataFrame([(url,)], "u string")
    once = df.select(canonicalize_url("u").alias("c")).collect()[0].c
    twice = (
        spark.createDataFrame([(once,)], "u string")
        .select(canonicalize_url("u").alias("c"))
        .collect()[0]
        .c
    )
    assert twice == once, (url, once, twice)


# ---------------------------------------------------------------------------
# bpe_encode: property equivalence vs a pure-python Sennrich apply
# ---------------------------------------------------------------------------

_bpe_words = st.lists(
    st.text(alphabet=st.sampled_from(list("abcde")), min_size=1, max_size=6),
    min_size=0, max_size=8,
)
_bpe_merge_pool = [
    ("a", "b"), ("b", "c"), ("a", "a"), ("c", "</w>"), ("ab", "c"),
    ("d", "e"), ("e", "</w>"), ("aa", "b"), ("bc", "</w>"), ("a", "bc"),
]
_bpe_merges = st.lists(
    st.sampled_from(_bpe_merge_pool), min_size=1, max_size=6, unique=True
)


@_settings
@given(words=_bpe_words, merges=_bpe_merges)
def test_bpe_encode_matches_python_apply(spark, words, merges):
    """bpe_encode's replace-chain-over-distinct-words must equal the
    direct greedy Sennrich apply for ANY corpus and merge ordering —
    including merges that never fire, overlapping runs, and merged
    symbols consumed by later merges."""
    from claims_data_spark.operators.bpe import bpe_encode

    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = bpe_encode(df, list(merges)).collect()[0]

    expect = []
    for w in words:
        s = list(w) + ["</w>"]
        for a, b in merges:
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            s = out
        expect.extend(s)
    assert list(got.tokens) == expect, (words, merges)


@_settings
@given(url=_urls)
def test_canonicalize_url_fast_path_equivalent(spark, url):
    """The canonical-shape fast path (r08) must be a semantic no-op:
    gate-passing strings are PROVABLY fixed points, so
    canonicalize_url(fast_path=True) == canonicalize_url(False) for
    every input — including junk that fails the URI parse."""
    from claims_data_spark.operators.web import canonicalize_url

    df = spark.createDataFrame([(url,)], "u string")
    row = df.select(
        canonicalize_url("u", fast_path=True).alias("f"),
        canonicalize_url("u", fast_path=False).alias("s"),
    ).collect()[0]
    assert row.f == row.s
