"""Property-based tests (hypothesis): the interval operators against
brute-force day-set oracles. The reference has no property testing
(SURVEY.md §5); this is our stronger replacement for its golden spot
checks — any random interval multiset must collapse/measure exactly
like the set-of-days model.

Round 11: every property draws a BATCH of independent cases per
hypothesis example and runs them through ONE Spark action (one id /
shard / doc per case), instead of one 1-row action per example. Same
oracles, strictly more cases per run (6 examples x up to 10-12 cases,
5 x up to 50 urls for the wide URL batches, vs 25 x 1 before), and
the per-property wall drops ~3-4x — the per-example cost was Spark
action/plan floor, not the property check.
"""

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

# a batch of independent interval cases, one Spark action for all
interval_batches = st.lists(interval_sets, min_size=1, max_size=10)


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
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
# for properties whose per-example Spark action carries a large
# data-independent plan floor (canonicalize_url's regex chain costs
# ~1-4 s of optimizer/codegen PER ACTION at any row count — measured):
# fewer examples, much wider batches, same total cases
_settings_wide = settings(
    max_examples=5,
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


def _interval_df(spark, cases):
    return spark.createDataFrame(
        [(f"c{i}", f, t) for i, ivs in enumerate(cases) for f, t in ivs],
        "id string, from_date date, to_date date",
    )


@given(cases=interval_batches, gap=st.integers(min_value=1, max_value=3))
@_settings
def test_collapse_islands_matches_dayset_oracle(spark, cases, gap):
    # day-set model applies for gap >= 1 (consecutive covered days
    # always merge); gap=0 island semantics are interval-based
    rows = collapse_islands(_interval_df(spark, cases), ["id"], max_gap_days=gap).collect()
    for i, ivs in enumerate(cases):
        got = sorted(
            (r["from_date"], r["to_date"]) for r in rows if r["id"] == f"c{i}"
        )
        assert got == islands_from_days(day_set(ivs), gap), ivs


@given(cases=interval_batches, gap=st.integers(min_value=0, max_value=3))
@_settings
def test_collapse_islands_matches_sequential_oracle(spark, cases, gap):
    rows = collapse_islands(_interval_df(spark, cases), ["id"], max_gap_days=gap).collect()
    for i, ivs in enumerate(cases):
        got = sorted(
            (r["from_date"], r["to_date"]) for r in rows if r["id"] == f"c{i}"
        )
        assert got == islands_from_intervals(ivs, gap), ivs


@given(cases=st.lists(st.tuples(interval_sets, interval_sets), min_size=1, max_size=8))
@_settings
def test_resegment_matches_day_oracle(spark, cases):
    from claims_data_spark.operators.intervals import resegment_overlaps

    a = _interval_df(spark, [ca for ca, _ in cases])
    b = _interval_df(spark, [cb for _, cb in cases])
    segs = resegment_overlaps(a, b, "id").collect()
    for i, (ivs_a, ivs_b) in enumerate(cases):
        case = [r for r in segs if r["id"] == f"c{i}"]
        # 1) segments are disjoint, sorted, valid
        spans = sorted((r["from_date"], r["to_date"]) for r in case)
        for (f1, t1), (f2, t2) in zip(spans, spans[1:]):
            assert t1 < f2
        # 2) per-day flags match the day-set ground truth exactly
        da, db = day_set(ivs_a), day_set(ivs_b)
        flags = {}
        for r in case:
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
        assert all(r["a"] or r["b"] for r in case)


@given(cases=interval_batches)
@_settings
def test_coverage_days_matches_dayset_oracle(spark, cases):
    win_from, win_to = dt.date(2020, 2, 1), dt.date(2020, 4, 30)
    out = coverage_stats(
        _interval_df(spark, cases), ["id"], "from_date", "to_date",
        str(win_from), str(win_to),
    ).collect()
    by_id = {r["id"]: r for r in out}
    for i, ivs in enumerate(cases):
        covered = {d for d in day_set(ivs) if win_from <= d <= win_to}
        r = by_id.get(f"c{i}")
        if not covered:
            assert r is None
            continue
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


@given(cases=st.lists(member_months, min_size=1, max_size=6))
@_settings
def test_enroll_denom_frames_match_bruteforce(spark, cases):
    from claims_data_spark.tables.perf_registry import (
        build_enroll_denom_full,
        yyyymm_add_py,
    )

    rows = [
        (f"p{i}", yyyymm_add_py(201601, off), 1, int(fb), 0, 0, int(h),
         dt.date(1990, 3, 2))
        for i, mm in enumerate(cases)
        for off, fb, h in mm
    ]
    df = spark.createDataFrame(
        rows,
        "id_mcaid string, year_month int, enrolled_any int,"
        " full_benefit int, dual int, tpl int, hospice int, dob date",
    )
    den = build_enroll_denom_full(df, 201601, 201712)
    got_all = {}
    for r in den.collect():
        got_all.setdefault(r.id_mcaid, {})[r.year_month] = r

    for i, mm in enumerate(cases):
        months = [yyyymm_add_py(201601, off) for off, _, _ in mm]
        got = got_all[f"p{i}"]
        assert len(got) == 24  # densified

        fc = {ym: (1 if (ym in months and dict(
            (yyyymm_add_py(201601, o), f) for o, f, _ in mm)[ym]) else 0)
            for ym in (yyyymm_add_py(201601, k) for k in range(24))}
        hosp = {ym: (1 if (ym in months and dict(
            (yyyymm_add_py(201601, o), h) for o, _, h in mm)[ym]) else 0)
            for ym in (yyyymm_add_py(201601, k) for k in range(24))}
        all_months = sorted(fc)
        for j, ym in enumerate(all_months):
            window = all_months[max(0, j - 11): j + 1]
            prior = all_months[max(0, j - 23): max(0, j - 11)]
            ahead = all_months[j: j + 2]
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
    cases=st.lists(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
        min_size=1, max_size=6,
    ),
    budget=st.integers(min_value=1, max_value=80),
)
@_settings
def test_pack_sequences_matches_sequential_reference(spark, cases, budget):
    from claims_data_spark.operators.corpus import pack_sequences

    # one shard per case: each shard is an independent greedy scan,
    # which is the hardest case for the reference comparison (every
    # reset shifts all later assignments)
    rows = [
        (i, i * 1000 + j, t)
        for i, toks in enumerate(cases)
        for j, t in enumerate(toks)
    ]
    docs = spark.createDataFrame(rows, "shard int, doc_id long, n_tokens long")
    out = pack_sequences(docs, budget=budget, shard_col="shard").collect()
    for i, toks in enumerate(cases):
        want = _pack_reference([(i * 1000 + j, t) for j, t in enumerate(toks)], budget)
        got = {
            r["doc_id"]: (r["pack_id"], r["pack_offset"])
            for r in out
            if r["doc_id"] // 1000 == i
        }
        assert got == want, toks


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
_url_batches = st.lists(_urls, min_size=1, max_size=50)


@_settings_wide
@given(urls=_url_batches)
def test_canonicalize_url_idempotent(spark, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u): the dedup key
    must be a fixed point, or re-crawling already-canonical URLs would
    mint NEW keys and split pages across dedup groups."""
    from claims_data_spark.operators.web import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = (
        df.select("u", canonicalize_url("u").alias("c1"))
        .select("u", "c1", canonicalize_url("c1").alias("c2"))
        .collect()
    )
    for r in rows:
        assert r.c2 == r.c1, (r.u, r.c1, r.c2)


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
@given(docs=st.lists(_bpe_words, min_size=1, max_size=6), merges=_bpe_merges)
def test_bpe_encode_matches_python_apply(spark, docs, merges):
    """bpe_encode's replace-chain-over-distinct-words must equal the
    direct greedy Sennrich apply for ANY corpus and merge ordering —
    including merges that never fire, overlapping runs, and merged
    symbols consumed by later merges. One doc per drawn word list,
    all encoded in one pass (the merge table is per-call)."""
    from claims_data_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: list(r.tokens) for r in bpe_encode(df, list(merges)).collect()}

    for i, words in enumerate(docs):
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
        assert got[i] == expect, (words, merges)


@_settings_wide
@given(urls=_url_batches)
def test_canonicalize_url_fast_path_equivalent(spark, urls):
    """The canonical-shape fast path (r08) must be a semantic no-op:
    gate-passing strings are PROVABLY fixed points, so
    canonicalize_url(fast_path=True) == canonicalize_url(False) for
    every input — including junk that fails the URI parse."""
    from claims_data_spark.operators.web import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        "u",
        canonicalize_url("u", fast_path=True).alias("f"),
        canonicalize_url("u", fast_path=False).alias("s"),
    ).collect()
    for r in rows:
        assert r.f == r.s, r.u
