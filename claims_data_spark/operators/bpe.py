"""Distributed BPE vocabulary induction (byte-pair-encoding merges).

The training side of subword tokenization — the counterpart of
``functions/tokenize`` (which APPLIES a vocabulary): learn the merge
table from the corpus itself, the Sennrich et al. 2016 algorithm:

1. represent the corpus as its distinct-WORD frequency table (the
   classic reduction — pair statistics are identical whether counted
   over raw text or over (word, count) rows, and the word table is
   orders of magnitude smaller than the corpus);
2. per round: count adjacent symbol pairs weighted by word count,
   take the argmax pair (deterministic tiebreak: count desc, then
   lexicographic pair), and re-segment every word by greedily merging
   that pair left-to-right.

Distribution shape: the corpus is touched ONCE (word-count groupBy —
the only corpus-scale shuffle). Every merge round runs on the word
table: one partial-aggregated pair-count exchange + a 1-row argmax
collect (bounded driver state: the winning pair) + a map-only
re-segmentation fold, checkpoint-truncated so round N's plan does not
contain rounds 1..N-1. At 100 TB the word table is ~10^7-10^8 rows —
dimension-scale — so merge rounds cost seconds each regardless of
corpus size.

The merge LOOP is inherently data-dependent (each round's input is
the previous round's argmax), so this operator is pytest-verified
against a pure-python Sennrich mirror rather than SQL-oracle-checked
— the same ruling as the HLL sketch rollup (documented in
COVERAGE.md); the driver sees a rows-only entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _merge_pair_expr(sym_col, a: str, b: str, merged: str):
    """Greedy left-to-right merge of adjacent (a, b) -> merged over a
    symbol array — a single JVM ``aggregate`` fold (state = the output
    array; a step either extends it or replaces its tail)."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_symbol_table(
    docs: DataFrame, text_col: str = "text", end_mark: str = "</w>"
) -> DataFrame:
    """(word, n, syms) — distinct words with corpus counts, segmented
    into characters with the end-of-word marker appended (so merges
    can learn suffixes). The ONE corpus-scale pass."""
    words = docs.select(
        F.explode(
            F.filter(
                F.split(
                    F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "),
                    " ",
                ),
                lambda w: F.length(w) > 0,
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n")).select(
        "word",
        "n",
        F.concat(
            # drop the trailing empty element Spark's split(-1 limit)
            # emits for the lookahead pattern
            F.filter(
                F.split(F.col("word"), "(?!^)"), lambda s: F.length(s) > 0
            ),
            F.array(F.lit(end_mark)),
        ).alias("syms"),
    )


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_pair_count: int = 2,
    end_mark: str = "</w>",
) -> "tuple[list, DataFrame]":
    """Learn ``num_merges`` BPE merges; returns ``(merges, vocab)``
    where ``merges`` is the ordered list of ``(left, right)`` pairs
    (feed to a tokenizer, or to ``functions/tokenize`` as a vocab) and
    ``vocab`` is the final (word, n, syms) table. Stops early when no
    pair reaches ``min_pair_count``.
    """
    table = word_symbol_table(docs, text_col, end_mark).localCheckpoint(
        eager=True
    )
    merges: list = []
    for _ in range(num_merges):
        pairs = (
            table.select(
                "n",
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("syms"), i).alias("a"),
                                F.element_at(F.col("syms"), i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast(
                        "array<struct<a:string,b:string>>"
                    )),
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()  # bounded driver state: ONE row
        if not top or top[0].cnt < min_pair_count:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        table = table.select(
            "word", "n", _merge_pair_expr(F.col("syms"), a, b, a + b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, table


# ---------------------------------------------------------------------------
# Encoding: apply a learned merge table to a corpus
# ---------------------------------------------------------------------------

_SEP = "  "  # double space BETWEEN symbols; single space at both ends


def _seed_symbol_string(word) -> "F.Column":
    """`` a  b  c</w> `` — the word's characters (plus the end mark)
    joined by DOUBLE spaces with single-space sentinels at both ends.
    Words come from a whitespace split, so a symbol can never contain
    a space: the space is the one delimiter the alphabet cannot
    collide with (unlike '|' or control chars, which survive a
    whitespace tokenizer)."""
    chars = F.filter(F.split(word, "(?!^)"), lambda s: F.length(s) > 0)
    return F.concat(
        F.lit(" "),
        F.array_join(F.concat(chars, F.array(F.lit("</w>"))), _SEP),
        F.lit(" "),
    )


def _apply_merge(sym_str, a: str, b: str):
    """One BPE merge round as ONE non-overlapping left-to-right
    ``replace``. In the delimited form, greedy Sennrich re-segmentation
    IS string replace: '` a  b `' -> '` ab `'. The boundary algebra
    holds under consecutive matches — the replacement re-emits a
    single edge space on each side and the unconsumed half of each
    double separator survives, so ``' a  a  a '`` -> ``' aa  a '``
    (greedy LTR), never ``' aa  aa '``. Symbols never contain spaces,
    so a pattern can match neither inside a symbol nor across the
    string ends. Equivalence to the per-symbol fold
    (`_merge_pair_expr`) is pinned by test against a pure-python
    Sennrich mirror."""
    return F.replace(
        sym_str,
        F.lit(f" {a}{_SEP}{b} "),
        F.lit(f" {a}{b} "),
    )


def bpe_encode(
    docs: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 64,
) -> DataFrame:
    """Tokenize a corpus with a learned BPE merge table — the apply
    side of ``learn_bpe`` (reference for the induction semantics:
    Sennrich et al. 2016; the greedy longest-match APPLY counterpart
    for a flat vocabulary lives in ``functions/tokenize``).

    Returns one row per input row: ``(id_col, tokens array<string>,
    n_tokens)``. Unknown characters need no handling: every character
    is its own base symbol, so encoding is total.

    Scale shape (the same reduction as training): the corpus is
    touched for the word split + count, then every merge round runs on
    the DISTINCT-WORD dimension table (~10^7-10^8 rows at 100 TB), as
    one map-only ``replace`` each — no per-round shuffle, no python.
    The encoded word table broadcast-joins back to the per-doc word
    stream (dimension-scale right side), and the per-doc token
    sequence reassembles with one aggregation keyed by the input row.
    Long merge chains checkpoint every ``checkpoint_every`` rounds so
    whole-stage codegen never compiles past the JVM's 64 KB method
    cliff (SCALE.md lesson: the knn_ivf unroll)."""
    if not merges:
        raise ValueError("merges must be a non-empty list of (a, b)")
    # per-doc word stream WITH position, so the token sequence
    # reassembles in document order after the join
    words = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(
                    F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "),
                    " ",
                ),
                lambda w: F.length(w) > 0,
            )
        ).alias("_pos", "_word"),
    )
    dim = words.select("_word").distinct()
    sym = _seed_symbol_string(F.col("_word"))
    out = dim.withColumn("_sym", sym)
    for i, (a, b) in enumerate(merges):
        out = out.withColumn("_sym", _apply_merge(F.col("_sym"), a, b))
        if (i + 1) % checkpoint_every == 0 and (i + 1) < len(merges):
            out = out.localCheckpoint(eager=False)
    encoded = out.select(
        "_word",
        F.split(F.trim(F.col("_sym")), _SEP).alias("_toks"),
    )
    joined = words.join(F.broadcast(encoded), "_word")
    per_doc = joined.groupBy(id_col).agg(
        F.flatten(
            F.array_sort(
                F.collect_list(F.struct("_pos", "_toks"))
            ).getField("_toks")
        ).alias("tokens")
    )
    # keep word-less rows (empty/whitespace text): one row per input
    # row, empty token sequence
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "tokens", F.array().cast("array<string>")
            ).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("long"))
    )
