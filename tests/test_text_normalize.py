"""Unicode text normalization (functions/text.normalize_text)."""
from pyspark.sql import functions as F

from claims_data_spark.functions.text import normalize_text


def _run(spark, s, **kw):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(normalize_text("t", **kw).alias("o")).collect()[0].o


def test_typographic_folding(spark):
    s = "“Smart” ‘quotes’ — em–dashes … and NBSP"
    assert _run(spark, s) == '"smart" \'quotes\' - em-dashes ... and nbsp'


def test_zero_width_and_controls_deleted(spark):
    s = "a​b‌c‍d﻿e­f\x01g"
    assert _run(spark, s) == "abcdefg"


def test_whitespace_collapse_and_flags(spark):
    s = "  A　B \t C  "
    assert _run(spark, s) == "a b c"
    assert _run(spark, s, lowercase=False) == "A B C"
    assert _run(spark, s, lowercase=False, collapse_ws=False) == "  A B \t C  "


def test_tabs_newlines_survive_when_not_collapsing(spark):
    assert _run(spark, "a\tb\nc", collapse_ws=False) == "a\tb\nc"


def test_idempotent(spark):
    s = "“X” – …  y"
    once = _run(spark, s)
    assert _run(spark, once) == once
