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
