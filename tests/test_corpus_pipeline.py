"""End-to-end training-data release pipeline (corpus_pipeline):
stage composition, QA gates, and failure cases."""

import pytest
from pyspark.sql import functions as F

from claims_data_spark.corpus_pipeline import run_corpus_pipeline

# per-doc distinct vocabulary so the cleaning dedup/n-gram stages
# only fire where planted; 'the/and/of/to/a' markers pass lang=en
_PAD = ("the quality of this document is fine and it goes on to say "
        "a number of distinct things about topic ")
_BENCH_A = ("the secret benchmark question alpha asks about the rain "
            "in spain falling mainly on the plain of castile today")
# 63-word bench item; the paraphrase suffixes every 7th word, so NO
# 8-gram survives (exact gate blind) while trigram jaccard stays 0.325
_BENCH_B = " ".join(
    f"the quiz item b{k} covers topic t{k}" for k in range(9)
)
_PARA_B = " ".join(
    w + "x" if i % 7 == 3 else w
    for i, w in enumerate(_BENCH_B.split())
)


def _corpus(spark):
    rows = []
    for i in range(120):
        src = "web" if i % 3 else "books"   # 80 web / 40 books
        rows.append((i, _PAD + f"variant {i} " + " ".join(
            f"w{i}x{j}" for j in range(10)), src))
    rows += [
        (900, rows[3][1], "web"),            # exact dup of doc 3
        (901, None, "web"),                  # null text
        (902, "zzz", "web"),                 # low quality
        (903, _BENCH_A, "web"),              # exact benchmark copy
        (904, _PARA_B, "web"),               # fuzzy-only paraphrase
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(5000, _BENCH_A), (5001, _BENCH_B)], "bench_id long, text string"
    )
    return docs, bench


def test_corpus_pipeline_end_to_end(spark):
    docs, bench = _corpus(spark)
    out = run_corpus_pipeline(
        docs, bench,
        min_quality=0.3,
        target_mix={"web": 0.5, "books": 0.5},
        weight_col=None,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        split_group_col="source",
        decontaminate_n=8,
        fuzzy_threshold=0.3,
        fuzzy_bands=32,  # r=1 banding: any shared minhash -> candidate
        seed="t",
    )
    # every gate green
    assert all(ok for _, (_, ok, _) in out["qa"]), out["qa"]
    rej = out["rejected"]
    # clean: null + low-quality + the exact dup of doc 3
    assert rej["clean"] == 3
    # exact 8-gram gate catches the verbatim benchmark copy
    assert rej["decontaminate"] == 1
    # the paraphrase shares no 8-gram but IS a near-dup
    assert rej["fuzzy_decontaminate"] == 1
    # rebalance: books (40) binds at 0.5 -> web thins toward 40
    assert rej["rebalance"] > 0
    final = out["docs"]
    assert {r["split"] for r in final.select("split").distinct().collect()} \
        <= {"train", "val", "test"}
    # group split: every row of a source lands in ONE split
    per_src = final.groupBy("source").agg(
        F.countDistinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_src)
    # card reflects the final survivors
    assert int(out["card"].collect()[0]["n_docs"]) == final.count()
    # planted contamination is gone
    ids = {r["doc_id"] for r in final.select("doc_id").collect()}
    assert not {901, 902, 903, 904} & ids


def test_corpus_pipeline_stages_optional(spark):
    docs, _ = _corpus(spark)
    out = run_corpus_pipeline(docs, None, min_quality=0.3, strict_qa=True)
    stages = {s for s, _ in out["qa"]}
    assert stages == {"clean", "card"}
    assert "decontaminate" not in out["rejected"]
    # no split requested -> no split column
    assert "split" not in out["docs"].columns


def test_corpus_pipeline_strict_qa_raises(spark):
    docs, bench = _corpus(spark)
    # poison the card gate by asking for an impossible mixture? no —
    # inject a failing gate the honest way: make every doc low-quality
    # so kept-nonempty fails
    bad = docs.withColumn("text", F.lit("zz"))
    with pytest.raises(AssertionError, match="QA FAIL clean"):
        run_corpus_pipeline(bad, bench, min_quality=0.9)
    # strict_qa=False records the failure and continues
    out = run_corpus_pipeline(bad, bench, min_quality=0.9, strict_qa=False)
    assert any(not ok for _, (_, ok, _) in out["qa"])


def test_corpus_pipeline_export_stage(spark, tmp_path):
    docs, bench = _corpus(spark)
    out = run_corpus_pipeline(
        docs, bench, min_quality=0.3,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        decontaminate_n=8, fuzzy_threshold=0.3, fuzzy_bands=32,
        export_path=str(tmp_path / "release"),
        export_shards_n=4,
    )
    assert all(ok for _, (_, ok, _) in out["qa"])
    stages = [s for s, _ in out["qa"]]
    assert "export" in stages
    m = out["manifest"]
    assert sum(r["n_docs"] for r in m) == out["docs"].count()
    # the artifact is readable and carries the split column
    back = spark.read.parquet(str(tmp_path / "release"))
    assert back.count() == out["docs"].count()
    assert "split" in back.columns
