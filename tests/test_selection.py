"""DSIR importance resampling (operators/selection.py) and exact
shared-substring spans (operators/dedup.substring_dup_spans)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from claims_data_spark.operators.dedup import substring_dup_spans
from claims_data_spark.operators.selection import (
    bucket_counts,
    dsir_log_ratios,
    dsir_score,
    dsir_select,
    hashed_features,
)


def _bucket_py(tok: str, dim: int, seed: str = "dsir") -> int:
    return int(hashlib.md5((tok + seed).encode()).hexdigest()[:8], 16) % dim


def test_bucket_counts_match_pure_python(spark):
    rows = [(1, "the cat sat"), (2, "the dog"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bucket_counts(df.filter(F.col("text").isNotNull()),
                        "text", dim=16)
    want: dict[int, int] = {}
    for _, text in rows:
        if text is None:
            continue
        for w in text.split():
            b = _bucket_py(w, 16)
            want[b] = want.get(b, 0) + 1
    assert got == want


def test_dsir_scores_favor_target_like_docs(spark):
    target = spark.createDataFrame(
        [(i, "medical claim diagnosis provider") for i in range(20)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "medical claim diagnosis provider visit"),
         (2, "football game score highlights replay"),
         (3, "medical diagnosis notes"),
         (4, "random words apple banana")],
        "doc_id long, text string",
    )
    tc = bucket_counts(target, "text", dim=64)
    rc = bucket_counts(raw, "text", dim=64)
    lam = dsir_log_ratios(tc, rc, 64)
    scored = {r["doc_id"]: r["logw"]
              for r in dsir_score(raw, "text", lam, 64).collect()}
    # target-like docs outscore off-domain docs
    assert scored[1] > scored[2]
    assert scored[3] > scored[4]


def test_dsir_score_matches_pure_python(spark):
    """Value-level mirror: λ from smoothed integer counts + sequential
    fold, every ln rounded to 6dp — same recipe in pure python."""
    target = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "a b"), (2, "c c d")], "doc_id long, text string"
    )
    dim = 8
    tc = bucket_counts(target, "text", dim=dim)
    rc = bucket_counts(raw, "text", dim=dim)
    lam_py = {}
    tot_t = sum(tc.values()) + dim
    tot_r = sum(rc.values()) + dim
    for b in range(dim):
        lam_py[b] = round(
            math.log((tc.get(b, 0) + 1) / tot_t)
            - math.log((rc.get(b, 0) + 1) / tot_r), 6
        )
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_score(
            raw, "text", dsir_log_ratios(tc, rc, dim), dim
        ).collect()
    }
    for doc_id, text in [(1, "a b"), (2, "c c d")]:
        s = 0.0
        for w in text.split():
            s += lam_py[_bucket_py(w, dim)]
        assert got[doc_id] == pytest.approx(round(s, 6), abs=2e-6)


def test_dsir_select_exact_k_and_determinism(spark):
    target = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 3 == 0 else "zeta eta theta")
         for i in range(30)],
        "doc_id long, text string",
    )
    out = dsir_select(raw, target, "text", "doc_id", k=8, dim=32)
    rows = out.collect()
    assert len(rows) == 8
    assert sorted(r["rank"] for r in rows) == list(range(1, 9))
    # deterministic across partitioning
    again = dsir_select(
        raw.repartition(7), target, "text", "doc_id", k=8, dim=32
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # selection is biased toward target-like docs (10 of 30 match)
    picked = {r["doc_id"] for r in rows}
    assert len([d for d in picked if d % 3 == 0]) >= 5


def test_hashed_features_bigrams(spark):
    df = spark.createDataFrame([(1, " The  cat sat ")], "i long, t string")
    got = df.select(
        hashed_features(F.col("t"), word_ngrams=2).alias("f")
    ).first()["f"]
    assert got == ["the", "cat", "sat", "the cat", "cat sat"]


# --- substring_dup_spans ----------------------------------------------------

LICENSE = "this software is provided as is without warranty of any kind"


def test_substring_spans_finds_planted_passage(spark):
    shared = (LICENSE + " ") * 3                       # ~180 chars shared
    docs = spark.createDataFrame(
        [
            (1, "unique preamble one " + shared + " tail one"),
            (2, "different intro text " + shared + " other ending"),
            (3, "totally unrelated document about weather and sports"),
        ],
        "doc_id long, text string",
    )
    out = substring_dup_spans(docs, span=50, stride=10)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(1, 2)}
    # aligned spans verify exactly: re-check one row against the text
    row = out.first()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert (texts[row["id_a"]][row["pos_a"] - 1:row["pos_a"] - 1 + 50]
            == texts[row["id_b"]][row["pos_b"] - 1:row["pos_b"] - 1 + 50])


def test_substring_spans_no_false_pairs(spark):
    docs = spark.createDataFrame(
        [(i, f"document {i} " + " ".join(f"w{i}x{j}" for j in range(40)))
         for i in range(10)],
        "doc_id long, text string",
    )
    assert substring_dup_spans(docs, span=50, stride=10).count() == 0


def test_substring_spans_guarantee_threshold(spark):
    """A duplicated region of span + stride - 1 chars is guaranteed to
    be caught when both docs emit it on their stride grids; engineer
    alignment by placing the shared block at position 1 in both."""
    shared = "x" * 59 + "."                     # span 50 + stride 10 - 1
    docs = spark.createDataFrame(
        [(1, shared + " unique a tail padding beyond"),
         (2, shared + " other b ending entirely different")],
        "doc_id long, text string",
    )
    out = substring_dup_spans(docs, span=50, stride=10)
    assert out.filter((F.col("id_a") == 1) & (F.col("id_b") == 2)).count() > 0


def test_substring_spans_partitioning_invariance(spark):
    shared = (LICENSE + " ") * 2
    docs = spark.createDataFrame(
        [(i, f"head {i} " + shared + f" tail {i}") for i in range(6)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, substring_dup_spans(docs).collect()))
    b = sorted(map(tuple,
                   substring_dup_spans(docs.repartition(5)).collect()))
    assert a == b and len(a) > 0


def test_corpus_report_one_row_card(spark):
    from claims_data_spark.operators.corpus import corpus_report

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"),
         (2, "the quick brown fox"),      # exact dup of 1
         (3, "something else entirely!"),
         (4, ""),                          # empty
         (5, None)],                       # null
        "doc_id long, text string",
    )
    row = corpus_report(docs).first()
    assert row["n_docs"] == 5
    assert row["n_distinct_ids"] == 5
    assert row["n_empty"] == 2
    assert row["n_tokens"] == 4 + 4 + 3
    assert row["n_distinct_texts"] == 2   # two distinct non-empty texts
    # 3 non-empty docs, 2 distinct -> 1 duplicate -> rate 1/3
    assert row["exact_dup_rate"] == pytest.approx(0.3333, abs=1e-4)
    assert 0.0 <= row["avg_punct_ratio"] <= 1.0
    assert len(row["token_quantiles"]) == 3


# --- incremental_minhash_dedup ----------------------------------------------

def _doc(base: str, salt: str = "") -> str:
    return (base + " " + salt).strip()


def test_incremental_dedup_across_batches(spark):
    from claims_data_spark.operators.dedup import incremental_minhash_dedup

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight") * 2
    other = ("completely different content about medical claims and "
             "eligibility spans for washington state members") * 2
    b1 = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    clean1, idx1 = incremental_minhash_dedup(None, b1)
    assert {r["doc_id"] for r in clean1.collect()} == {1, 2}
    assert idx1.count() == 2

    # batch 2: near-dup of indexed doc 1, an intra-batch dup pair, and
    # one genuinely new doc
    fresh = ("totally novel text discussing training data pipelines "
             "and shuffle topology at warehouse scale today") * 2
    b2 = spark.createDataFrame(
        [
            (10, base),                     # dups the INDEX (doc 1)
            (11, fresh),                    # new — keep
            (12, fresh),                    # dups 11 intra-batch
        ],
        "doc_id long, text string",
    )
    clean2, idx2 = incremental_minhash_dedup(idx1, b2)
    assert {r["doc_id"] for r in clean2.collect()} == {11}
    # index grew by exactly the survivor
    assert {r["doc_id"] for r in idx2.select("doc_id").collect()} == {1, 2, 11}


def test_incremental_dedup_partitioning_invariance(spark):
    from claims_data_spark.operators.dedup import incremental_minhash_dedup

    docs = spark.createDataFrame(
        [(i, f"document number {i} with shared boilerplate text "
              * 3) for i in range(12)],
        "doc_id long, text string",
    )
    _, idx = incremental_minhash_dedup(None, docs)
    batch = spark.createDataFrame(
        [(100 + i, f"document number {i} with shared boilerplate text "
                   * 3) for i in range(6)]
        + [(200, "entirely unrelated fresh material appearing once " * 3)],
        "doc_id long, text string",
    )
    a, _ = incremental_minhash_dedup(idx, batch)
    b, _ = incremental_minhash_dedup(idx, batch.repartition(7))
    assert (sorted(r["doc_id"] for r in a.collect())
            == sorted(r["doc_id"] for r in b.collect()))
    # every batch doc near-duplicating the index was dropped
    assert all(r["doc_id"] == 200 for r in a.collect())


def test_incremental_dedup_null_text_and_band_guard(spark):
    """Round-7 ADVICE fixes: NULL-text rows pass through to the clean
    batch (unsigned != duplicate) and never enter the index; indivisible
    num_hashes/bands raises instead of silently truncating recall."""
    import pytest

    from claims_data_spark.operators.dedup import incremental_minhash_dedup

    b = spark.createDataFrame(
        [(1, "some real document text repeated for shingles " * 3),
         (2, None)],
        "doc_id long, text string",
    )
    clean, idx = incremental_minhash_dedup(None, b)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    assert {r["doc_id"] for r in idx.collect()} == {1}

    with pytest.raises(ValueError, match="divisible"):
        incremental_minhash_dedup(None, b, num_hashes=32, bands=5)


def test_kmeans_fit_fewer_rows_than_k(spark):
    """Round-7 ADVICE fix: < k rows raises a clear ValueError instead
    of an opaque IndexError mid-iteration."""
    import pytest

    from claims_data_spark.operators.cluster import kmeans_fit

    two = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="k=5"):
        kmeans_fit(two, k=5)
    with pytest.raises(ValueError, match="k=1"):
        kmeans_fit(two.filter("vec_id < 0"), k=1)


def test_substring_spans_mega_bucket_cap(spark):
    """A span shared by MORE docs than max_bucket_docs is dropped (the
    too-common-shingle cut: universal boilerplate belongs to line
    dedup, and O(D^2) pairs from one bucket would flood the output);
    buckets at or under the cap still pair."""
    shared = "z" * 60
    docs = spark.createDataFrame(
        [(i, shared + f" unique tail number {i} with more text")
         for i in range(5)],
        "doc_id long, text string",
    )
    capped = substring_dup_spans(docs, span=50, stride=10,
                                 max_bucket_docs=3)
    assert capped.count() == 0
    uncapped = substring_dup_spans(docs, span=50, stride=10,
                                   max_bucket_docs=64)
    assert uncapped.count() > 0


def test_dsir_fast_path_equivalent_shape(spark):
    """portable=False (xxhash64 buckets) selects exactly k, is
    deterministic across partitionings, and keeps the target bias —
    the production-speed twin of the oracle-exact md5 path."""
    target = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 3 == 0 else "zeta eta theta")
         for i in range(30)],
        "doc_id long, text string",
    )
    out = dsir_select(raw, target, "text", "doc_id", k=8, dim=32,
                      portable=False)
    rows = out.collect()
    assert len(rows) == 8
    again = dsir_select(raw.repartition(5), target, "text", "doc_id",
                        k=8, dim=32, portable=False)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    assert len([r for r in rows if r["doc_id"] % 3 == 0]) >= 5


def test_contamination_report_fractions(spark):
    from claims_data_spark.operators.corpus import contamination_report

    bench = spark.createDataFrame(
        [(1, "the capital of france is paris and it is large")],
        "q long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the full bench sentence -> high overlap
            (1, "quiz answer: the capital of france is paris and it is "
                "large indeed everyone knows"),
            # no 5-gram overlap at all
            (2, "completely unrelated text about spark shuffles and "
                "exchanges in a warehouse"),
            # shorter than n words
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    out = contamination_report(docs, bench, n=5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["n_overlap"] > 0
    assert got[1]["overlap_pct"] > 30.0
    assert got[2]["n_overlap"] == 0 and got[2]["overlap_pct"] == 0.0
    assert got[3]["n_grams"] == 0 and got[3]["overlap_pct"] == 0.0
    # exact fraction check for doc 1
    r = got[1]
    assert r["overlap_pct"] == round(r["n_overlap"] * 100.0 / r["n_grams"], 2)


# ---------------------------------------------------------------------------
# redact_spans (the apply side of substring_dup_spans)
# ---------------------------------------------------------------------------

def test_redact_spans_exact_rebuild_and_merge(spark):
    from claims_data_spark.operators.dedup import redact_spans

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "untouched text")],
        "doc_id long, text string",
    )
    # spans of length 5 at positions 3 and 6 overlap -> one island 3-10
    spans = spark.createDataFrame(
        [(1, 3), (1, 6)], "doc_id long, pos long"
    )
    out = {r["doc_id"]: r for r in redact_spans(
        docs, spans, span=5).collect()}
    assert out[1]["text_redacted"] == "ab" + "klmnopqrstuvwxyz"
    assert out[1]["n_redacted_spans"] == 1
    assert out[1]["chars_removed"] == 8
    assert out[2]["text_redacted"] == "untouched text"
    assert out[2]["n_redacted_spans"] == 0
    assert out[2]["chars_removed"] == 0


def test_redact_spans_marker_tail_clip_and_determinism(spark):
    from claims_data_spark.operators.dedup import redact_spans

    docs = spark.createDataFrame(
        [(1, "0123456789")], "doc_id long, text string"
    )
    # island 9-13 runs past the end; marker inserted once
    spans = spark.createDataFrame([(1, 9)], "doc_id long, pos long")
    r = redact_spans(docs, spans, span=5, marker="<DUP>").collect()[0]
    assert r["text_redacted"] == "01234567" + "<DUP>"
    assert r["chars_removed"] == 2  # '89' removed
    # disjoint spans keep the middle segment; partitioning invariant
    docs2 = spark.createDataFrame(
        [(7, "a" * 30)], "doc_id long, text string"
    )
    spans2 = spark.createDataFrame(
        [(7, 1), (7, 21)], "doc_id long, pos long"
    )
    a = redact_spans(docs2, spans2, span=5).collect()[0]
    b = redact_spans(
        docs2.repartition(3), spans2.repartition(5), span=5
    ).collect()[0]
    assert a["text_redacted"] == "a" * 15 + "a" * 5  # 6-20 and 26-30 kept
    assert a["n_redacted_spans"] == 2
    assert (a["text_redacted"], a["chars_removed"]) == (
        b["text_redacted"], b["chars_removed"])


def test_redact_spans_roundtrip_with_substring_dup_spans(spark):
    from claims_data_spark.operators.dedup import (
        redact_spans,
        substring_dup_spans,
    )

    lic = ("this license text is exactly repeated across both of the "
           "two documents here")  # 77 chars
    docs = spark.createDataFrame(
        [
            (1, lic + " then doc one continues with its own words"),
            (2, lic + " and doc two goes elsewhere after the prefix"),
            (3, "totally unrelated content with no shared prefix at all"),
        ],
        "doc_id long, text string",
    )
    pairs = substring_dup_spans(docs, span=20, stride=1)
    # keep-min policy: the lower id keeps its copy, redact the later
    out = {r["doc_id"]: r for r in redact_spans(
        docs,
        pairs.selectExpr("id_b AS doc_id", "pos_b AS pos"),
        span=20,
    ).collect()}
    assert out[1]["n_redacted_spans"] == 0          # keeper untouched
    assert out[3]["n_redacted_spans"] == 0
    assert out[2]["n_redacted_spans"] >= 1
    assert lic not in out[2]["text_redacted"]       # shared prefix gone
    assert out[2]["text_redacted"].endswith(
        "goes elsewhere after the prefix")          # own tail kept
