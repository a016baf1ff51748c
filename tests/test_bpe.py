"""Distributed BPE induction (operators/bpe) vs a pure-python
Sennrich mirror — merges and final segmentations must match exactly
(same deterministic tiebreak: count desc, then lexicographic pair)."""
import re
from collections import Counter, defaultdict

import pytest

from claims_data_spark.operators.bpe import learn_bpe


def _mirror(texts, num_merges, min_pair_count=2, end="</w>"):
    words = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if w:
                words[w] += 1
    segs = {w: list(w) + [end] for w in words}
    merges = []
    for _ in range(num_merges):
        cnt = defaultdict(int)
        for w, n in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += n
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w in segs:
            s, out = segs[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            segs[w] = out
    return merges, segs


TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


@pytest.fixture(scope="module")
def learned(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges, vocab = learn_bpe(df, num_merges=8)
    segs = {r.word: list(r.syms) for r in vocab.collect()}
    return merges, segs


def test_merges_match_sennrich_mirror(learned):
    merges, _ = learned
    expect, _ = _mirror(TEXTS, 8)
    assert merges == expect


def test_final_segmentations_match_mirror(learned):
    _, segs = learned
    _, expect = _mirror(TEXTS, 8)
    assert segs == expect


def test_early_stop_below_min_count(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    merges, _ = learn_bpe(df, num_merges=10, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_greedy_overlap_rule(spark):
    # 'aaa' with merge (a,a): greedy left-to-right gives [aa, a, </w>]
    df = spark.createDataFrame([("aaaa aaa aaa aaa",)], "text string")
    merges, vocab = learn_bpe(df, num_merges=1, min_pair_count=2)
    assert merges == [("a", "a")]
    segs = {r.word: list(r.syms) for r in vocab.collect()}
    assert segs["aaa"] == ["aa", "a", "</w>"]
    assert segs["aaaa"] == ["aa", "aa", "</w>"]


# ---------------------------------------------------------------------------
# bpe_encode: apply a merge table to a corpus
# ---------------------------------------------------------------------------

from claims_data_spark.operators.bpe import bpe_encode  # noqa: E402


def _mirror_encode(text, merges, end="</w>"):
    """Independent greedy Sennrich APPLY: per word, seed chars+end,
    then one greedy left-to-right fold per merge, in merge order."""
    toks = []
    for w in re.sub(r"\s+", " ", text.strip().lower()).split(" "):
        if not w:
            continue
        s = list(w) + [end]
        for a, b in merges:
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            s = out
        toks.extend(s)
    return toks


ENC_TEXTS = [
    "low low lower lowest",
    "newest new news",
    "aaaa aaa a",
    "",
    "   ",
    "The THE the",
    "wider low newest",
]
ENC_MERGES = [
    ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ("a", "a"), ("n", "e"), ("w", "</w>"),
]


def test_bpe_encode_matches_mirror(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ENC_TEXTS)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in bpe_encode(df, ENC_MERGES).collect()
    }
    assert len(got) == len(ENC_TEXTS)  # one row per input row
    for i, t in enumerate(ENC_TEXTS):
        expect = _mirror_encode(t, ENC_MERGES)
        assert got[i] == (expect, len(expect)), (i, t, got[i], expect)


def test_bpe_encode_consistent_with_learn(spark):
    """Encoding the training corpus with the learned merges must
    reproduce learn_bpe's own final segmentation of every word."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges, vocab = learn_bpe(df, num_merges=8)
    segs = {r.word: list(r.syms) for r in vocab.collect()}
    for r in bpe_encode(df, merges).collect():
        expect = []
        for w in TEXTS[r.doc_id].split():
            expect.extend(segs[w])
        assert list(r.tokens) == expect


def test_bpe_encode_checkpoint_chunking(spark):
    """A merge chain longer than checkpoint_every must produce
    identical output (the chunk boundary is invisible)."""
    df = spark.createDataFrame(
        [(0, "low lower lowest newest")], "doc_id long, text string"
    )
    a = bpe_encode(df, ENC_MERGES, checkpoint_every=3).collect()[0]
    b = bpe_encode(df, ENC_MERGES, checkpoint_every=64).collect()[0]
    assert list(a.tokens) == list(b.tokens)


def test_bpe_encode_greedy_ltr_on_runs(spark):
    # ' a  a  a ' must encode to [aa, a, </w>]-style greedy LTR, never
    # pairing the middle symbol twice
    df = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
    r = bpe_encode(df, [("a", "a")]).collect()[0]
    assert list(r.tokens) == ["aa", "a", "</w>"]


def test_bpe_encode_empty_merges_raises(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_encode(df, [])


def test_learn_bpe_oracle_matches_engine_with_early_stop(spark, tmp_path):
    """The unrolled DuckDB oracle (__spark_entry__._learn_bpe_oracle)
    must reproduce learn_bpe EXACTLY — including the early-stop break:
    on a fixture whose pair counts dry up before num_merges rounds,
    the engine breaks and the oracle's empty winner CTEs pass the
    table through, yielding the same (shorter) merge list."""
    import duckdb

    import __spark_entry__ as entrymod

    rows = [
        (0, "aa aa aa bb"),     # (a,a) rich; after merges counts dry up
        (1, "aa bb cc"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    merges, _ = __import__(
        "claims_data_spark.operators.bpe", fromlist=["learn_bpe"]
    ).learn_bpe(df.filter("text is not null"), num_merges=8)
    assert len(merges) < 8, "fixture must actually early-stop"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    got = con.execute(entrymod._learn_bpe_oracle(8, 2)).fetchall()
    got = [(a, b) for _, a, b in sorted(got)]
    assert got == merges
