"""Document deduplication at scale: exact, MinHash+LSH, SimHash, and
n-gram Jaccard (engine extension for training-data pipelines).

Design for 100 TB:
- Exact dedup is a fingerprint groupBy — one shuffle on a 32-byte key.
- Near-dup never compares all pairs. MinHash signatures are computed
  row-local (higher-order functions over the shingle array, pure JVM),
  then banded: a candidate pair must collide in ≥1 band, so the join
  is an equi-join on (band_id, band_hash) — shuffle ~H/r rows per doc,
  not O(n²). SimHash analogously bands its 64-bit fingerprint into
  16-bit chunks.
- All hash functions are seeded Spark built-ins (murmur3 ``hash`` /
  ``xxhash64`` / ``md5``), so results are deterministic run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.functions.text import doc_fingerprint
from claims_data_spark.session import spread


def _norm_words(text: Column) -> Column:
    return F.split(
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " "
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles (distinct) of the normalized text, as an array —
    row-local, no shuffle.

    Round-10 form: the sliding window is ``arrays_zip`` of k shifted
    ``slice`` views — regular codegen expressions — so the only
    interpreted higher-order lambda left is a ``concat_ws`` over the
    zipped struct's fields, replacing the old
    ``transform(sequence(...), i → concat_ws(slice(words, i, k)))``
    whose per-ELEMENT slice allocated an array per gram with no
    codegen. Value-identical to the old form (exact array equality,
    order included — interleaved sweep 0 mismatches at sf0.1 AND sf1;
    NULL/empty/short-text edges pinned in
    ``tests/test_dedup_gram_builders.py``): fewer-than-k-word texts
    yield the single whole-text shingle and NULL text yields ``[""]``,
    matching the old ``greatest(..., 1)`` guard. k=1 short-circuits to
    ``array_distinct`` of the words (no lambda at all). Interleaved
    full-query A/B on minhash_near_dup: 1.07 → 0.81 s sf0.1,
    5.31 → 3.22 s sf1 (an MLlib NGram variant tied at sf1, 3.26, but
    pays a Scala-UDF conversion boundary and two temp columns — the
    zip form stays in one codegen span)."""
    t = F.col(text) if isinstance(text, str) else text
    words = _norm_words(t)
    if k == 1:
        return F.when(
            words.isNotNull(), F.array_distinct(words)
        ).otherwise(F.array(F.lit("")))
    n = F.size(words)
    m = n - F.lit(k - 1)
    zipped = F.arrays_zip(
        *[F.slice(words, i + 1, m).alias(f"g{i}") for i in range(k)]
    )
    grams = F.transform(
        zipped, lambda x: F.concat_ws(" ", *[x[f"g{i}"] for i in range(k)])
    )
    return F.when(n >= F.lit(k), F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", words))
    )


def word_shingles_frame(
    df: DataFrame, text_col: str, k: int, out_col: str = "_sh"
) -> DataFrame:
    """DISTINCT k-word shingles attached as ``out_col`` — thin frame
    wrapper over ``word_shingles`` kept as the call-site idiom for the
    corpus-grain side of the shingle pipelines."""
    return df.withColumn(out_col, word_shingles(text_col, k))


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup on the normalized-content fingerprint: keep one doc
    (min/max id) per distinct content. Returns the surviving rows.

    Single pass: one shuffle on the fingerprint, rank-1 window — the
    groupBy + semi-join form scans the corpus twice; at 100 TB the
    second scan is the dominant cost.

    NULL-text rows have no content to compare, so they all survive
    (a NULL fingerprint must not act as a shared hash that collapses
    distinct empty documents into one)."""
    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    w = Window.partitionBy("_fp").orderBy(order)
    fp = F.when(
        F.col(text_col).isNotNull(), doc_fingerprint(text_col)
    ).otherwise(F.concat(F.lit("__null__"), F.col(id_col).cast("string")))
    return (
        df.withColumn("_fp", fp)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def minhash_signature(
    shingle_col: Column | str, num_hashes: int = 32
) -> Column:
    """MinHash signature: for hash i, min over shingles of
    murmur3(shingle, i). Array<int> of length num_hashes, computed
    entirely row-local."""
    if isinstance(shingle_col, str):
        return F.expr(
            "array(" + ", ".join(
                f"array_min(transform(`{shingle_col}`, s -> hash(s, {i})))"
                for i in range(num_hashes)
            ) + ")"
        )
    return F.array(
        *[
            F.array_min(
                F.transform(shingle_col, lambda s: F.hash(s, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_signature_portable(
    shingle_col: Column | str, num_hashes: int = 32
) -> Column:
    """MinHash signature over an ENGINE-PORTABLE hash family: for seed
    i, the lexicographic MIN of md5(i || ':' || shingle) hex strings.
    Any permutation-like hash gives a valid min-hash estimator; md5
    hex is bit-identical across engines (DuckDB, Trino, Spark), so an
    ANSI-SQL oracle can reproduce the candidate set exactly — used by
    the driver-checked variant. ~3× the CPU of the murmur3 family;
    production callers keep :func:`minhash_signature`."""
    # compiled to ONE parsed expression when given a COLUMN NAME: 32
    # transform/md5 lambdas through the Column API cost ~0.3 s of py4j
    # round-trips per build (profiled); the parsed tree is identical.
    # A Column argument falls back to the per-seed Column form.
    if isinstance(shingle_col, str):
        return F.expr(
            "array(" + ", ".join(
                f"array_min(transform(`{shingle_col}`,"
                f" s -> md5(concat('{i}:', s))))"
                for i in range(num_hashes)
            ) + ")"
        )
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_col,
                    lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s)),
                )
            )
            for i in range(num_hashes)
        ]
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    sig_col: str = "_sig",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Explode a signature into (band_id, band_hash) rows — the LSH
    bucketing join key."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.hash(
                    *[F.col(sig_col)[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return df.select(id_col, F.explode(band_structs).alias("_b")).select(
        id_col, F.col("_b.band_id").alias("band_id"), F.col("_b.band_hash").alias("band_hash")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.8,
    eager_cleanup: bool = False,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Pipeline: shingle → minhash → band → self-equi-join on band bucket
    → exact Jaccard verification on the candidate pairs only (shingle
    sets re-joined from the docs; array_intersect/union are row-local).

    ``portable=True`` swaps the murmur3 hash family for the md5-hex
    one (:func:`minhash_signature_portable`) and uses the raw
    concatenated band slice as the bucket key, so an ANSI-SQL oracle
    reproduces the exact candidate set — the driver-checked variant.

    ``eager_cleanup=True`` materializes the (small) pair output via
    ``localCheckpoint`` and unpersists the signature cache before
    returning — use in long-lived sessions / pipelines so repeated
    calls don't accumulate cached partitions until LRU eviction. The
    default keeps the plan fully lazy (caller owns the action and may
    call ``.unpersist()`` on cached deps when done).
    """
    rows_per_band = num_hashes // bands
    sig_fn = minhash_signature_portable if portable else minhash_signature
    with_sig = word_shingles_frame(
        spread(df.select(id_col, F.col(text_col))).filter(
            F.col(text_col).isNotNull()
        ),
        text_col, shingle_k, "_sh",
    ).withColumn("_sig", sig_fn("_sh", num_hashes))
    # persisted because banding + two verification joins reuse it; the
    # cache is LRU-evictable and bounded by the shingle arrays — at
    # warehouse scale prefer checkpointing this frame to storage and
    # unpersisting after the pairs are materialized
    with_sig = with_sig.persist()
    if portable:
        # fixed-width md5 components -> '|'-concat is an unambiguous
        # bucket key both engines build identically
        band_structs = F.expr(
            "array(" + ", ".join(
                f"named_struct('band_id', {b}, 'band_hash', concat_ws('|', "
                + ", ".join(
                    f"_sig[{b * rows_per_band + r}]"
                    for r in range(rows_per_band)
                )
                + "))"
                for b in range(bands)
            ) + ")"
        )
        banded = with_sig.select(
            id_col, F.explode(band_structs).alias("_b")
        ).select(
            id_col,
            F.col("_b.band_id").alias("band_id"),
            F.col("_b.band_hash").alias("band_hash"),
        )
    else:
        banded = minhash_bands(with_sig, id_col, "_sig", bands, rows_per_band)

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh = with_sig.select(F.col(id_col), F.col("_sh"))
    verified = (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    if eager_cleanup:
        out = verified.localCheckpoint(eager=True)
        with_sig.unpersist()
        return out
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    block_col: Column | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key.

    With an explicit ``block_col`` the result is exact within blocks
    (equi-join, never cartesian). Without one, blocking falls back to
    MinHash bands (``minhash_near_dup_pairs`` with exact-Jaccard
    verification): a first-word-style content key creates one
    quadratic hot block on stopword-led corpora ("the ..." = 30% of
    documents), while banded LSH spreads candidates across
    (band_id, band_hash) buckets with a published recall contract
    1-(1-s^r)^b — at threshold 0.5 with 16 hashes / 8 bands that is
    ~0.9 recall and no skew: the scale-safe default.
    """
    if block_col is None:
        return minhash_near_dup_pairs(
            df, id_col, text_col, shingle_k=shingle_k,
            num_hashes=16, bands=8, jaccard_threshold=threshold,
        )
    t = F.col(text_col)
    block = block_col
    base = word_shingles_frame(
        spread(
            df.select(F.col(id_col), t.alias(text_col), block.alias("_blk"))
        ),
        text_col, shingle_k, "_sh",
    ).select(F.col(id_col), "_sh", "_blk")
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a._sh", "b._sh"))
            / F.size(F.array_union("a._sh", "b._sh")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


def simhash64(text_col: Column | str, token_k: int = 1) -> Column:
    """64-bit SimHash of the document's token set: bit j is set when
    the sum over tokens of ±1 (sign = bit j of xxhash64(token)) is
    positive. Pure higher-order expressions, row-local (shift amounts
    are Python ints — Spark's shift functions take literal bit
    counts)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    tokens = word_shingles(t, token_k)
    hashes = F.transform(tokens, lambda s: F.xxhash64(s))

    def bit_sum(j: int) -> Column:
        def merge(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) != 0, 1
            ).otherwise(-1)

        return F.aggregate(hashes, F.lit(0), merge)

    out = F.lit(0).cast("long")
    for j in range(64):
        # bit 63 is the sign bit of a signed 64-bit long
        mask = (1 << j) if j < 63 else -(1 << 63)
        out = out.bitwiseOR(
            F.when(bit_sum(j) > 0, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash_table(
    df: DataFrame, id_col: str, text_col: str, token_k: int = 1
) -> DataFrame:
    """(id, _sh64) via the scalable explode→groupBy plan: one row per
    (doc, token), 64 conditional sums in ONE aggregate pass (map-side
    partial-combined), then the bit assembly on the tiny per-doc
    result. Replaces 64 per-row array-fold aggregates with vectorized
    codegen — the per-row ``simhash64`` expression is kept for
    composability but this is the plan to use on a corpus."""
    tokens = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(word_shingles(text_col, token_k)).alias("_tok"),
    )
    hashed = tokens.select(id_col, F.xxhash64("_tok").alias("_h"))
    # the ±1 vote sum is 2·(count of set bits) − n_tokens, so each of
    # the 64 aggregates is a branchless shift-and-mask SUM and the
    # sign test moves to the tiny per-doc result (2b > n ⇔ vote > 0,
    # exact integer equivalence — fingerprints are bit-identical to
    # the ±1 form)
    bit_aggs = [
        F.sum(
            F.shiftrightunsigned("_h", j).bitwiseAND(F.lit(1))
        ).alias(f"_b{j}")
        for j in range(64)
    ]
    sums = hashed.groupBy(id_col).agg(
        *bit_aggs, F.count(F.lit(1)).alias("_n")
    )
    # FLAT bit assembly (round 9): the old form chained 64 nested
    # bitwiseOR(when(...)) Column nodes — a 64-deep expression tree
    # Catalyst re-walks on every optimizer pass (the knn_ivf
    # literal-node lesson, BASELINE.md round-7), measured at 2.5 s vs
    # 0.9 s for the portable twin's flat expr on identical data. One
    # flat SUM of disjoint bit terms plans in milliseconds; adding
    # the masks is exact because the terms never share a bit (and the
    # j=63 term is the long MIN_VALUE, which two's-complement
    # addition sets as the sign bit).
    masks = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]
    fp = F.expr(
        "cast("
        + " + ".join(
            f"(case when 2 * _b{j} > _n then {masks[j]}L else 0L end)"
            for j in range(64)
        )
        + " as bigint)"
    )
    return sums.select(F.col(id_col), fp.alias("_sh64"))


def simhash_table_portable(
    df: DataFrame, id_col: str, text_col: str, token_k: int = 1
) -> DataFrame:
    """(id, _fp60) SimHash fingerprint as a 60-bit BIGINT over the md5
    hash family: token hash = first 15 hex digits of md5(token) parsed
    as an integer (15 digits so the value fits a signed 64-bit long in
    every engine — Spark ``conv(x, 16, 10)`` and DuckDB
    ``('0x' || x)::BIGINT`` agree bit-for-bit); fingerprint bit j is
    set when more than half the tokens have bit j set.

    Same explode→groupBy shape as :func:`simhash_table` (one
    partial-aggregated pass, 60 branchless integer bit sums — the only
    string work is ONE md5 per token), but every operation exists
    identically in ANSI engines, so a DuckDB oracle reproduces
    fingerprints, banding and hamming verification bit-for-bit."""
    tokens = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(word_shingles(text_col, token_k)).alias("_tok"),
    )
    hashed = tokens.select(
        id_col,
        F.expr(
            "cast(conv(substring(md5(_tok), 1, 15), 16, 10) as bigint)"
        ).alias("_h"),
    )
    bit_aggs = [
        F.expr(f"sum((_h div {1 << j}) % 2)").alias(f"_b{j}")
        for j in range(60)
    ]
    sums = hashed.groupBy(id_col).agg(
        *bit_aggs, F.count(F.lit(1)).alias("_n")
    )
    fp = F.expr(
        "cast("
        + " + ".join(
            f"(case when 2 * _b{j} > _n then {1 << j} else 0 end)"
            for j in range(60)
        )
        + " as bigint)"
    )
    return sums.select(F.col(id_col), fp.alias("_fp60"))


def simhash_near_dup_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
) -> DataFrame:
    """Oracle-checkable twin of :func:`simhash_near_dup_pairs`: 60-bit
    integer fingerprints from :func:`simhash_table_portable`, banding
    on four 15-bit chunks (div/mod — pigeonhole guarantee holds for
    hamming <= 3 exactly as in the 64-bit form), hamming via
    bit_count(xor) — every step ANSI-reproducible and pure integer
    codegen."""
    # persist the per-doc fingerprint table: the banded self-join
    # consumes it TWICE and Catalyst does not reuse the exchange
    # across the aliased sides (measured: the whole explode->60-agg
    # pipeline executed twice; 1 row/doc, so the cached footprint is
    # id+fingerprint — the table a production deployment would store
    # anyway). bench/tests clearCache() after each query.
    base = simhash_table_portable(df, id_col, text_col).persist()
    chunks = F.array(*[
        F.struct(
            F.lit(c).alias("chunk_id"),
            F.expr(f"(_fp60 div {1 << (15 * c)}) % 32768")
            .alias("chunk_val"),
        )
        for c in range(4)
    ])
    banded = base.select(
        id_col, "_fp60", F.explode(chunks).alias("_c")
    ).select(
        id_col, "_fp60",
        F.col("_c.chunk_id").alias("chunk_id"),
        F.col("_c.chunk_val").alias("chunk_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a._fp60").bitwiseXOR(F.col("b._fp60"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit fingerprint into four
    16-bit chunks, equi-join on chunks, verify with bit_count(xor).

    Recall contract: by pigeonhole, every pair with hamming ≤ 3 is
    guaranteed to collide in at least one chunk; for
    ``max_hamming > 3`` the banding is a CANDIDATE FILTER — a pair
    whose differing bits spread 1-per-chunk across all four chunks is
    never generated (the standard approximate-LSH tradeoff; use more/
    overlapping bands for a hard guarantee at wider radii)."""
    # persisted for the same double-consumption reason as the
    # portable twin (see simhash_near_dup_pairs_portable)
    base = simhash_table(df, id_col, text_col).persist()
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftrightunsigned("_sh64", c * 16)
                .bitwiseAND(F.lit(0xFFFF).cast("long"))
                .alias("chunk_val"),
            )
            for c in range(4)
        ]
    )
    banded = base.select(id_col, "_sh64", F.explode(chunks).alias("_c")).select(
        id_col, "_sh64", F.col("_c.chunk_id").alias("chunk_id"), F.col("_c.chunk_val").alias("chunk_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a._sh64").bitwiseXOR(F.col("b._sh64"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Exact shared-substring spans (Lee et al. 2021, arXiv:2107.06499 —
# "Deduplicating Training Data Makes Language Models Better")
# ---------------------------------------------------------------------------

def substring_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 50,
    stride: int = 10,
    max_bucket_docs: int = 64,
) -> DataFrame:
    """Cross-document EXACT duplicated character spans — the ExactSubstr
    signal of Lee et al. 2021: long verbatim passages shared between
    training documents (boilerplate, licenses, wholesale copies) that
    document-level near-dup misses.

    The paper builds a single-node suffix array; that does not shard.
    The Spark-native form is strided shingle fingerprinting: every
    document emits its ``span``-char substring at positions 1, 1+stride,
    ... (md5-keyed), equal fingerprints group, and surviving pairs
    verify by EXACT substring equality — an md5 collision can only cost
    a verify, never a wrong row.

    Detection contract (precise, because callers must not assume
    span-length completeness): both documents emit spans on the SAME
    stride grid anchored at position 1, so a duplicated region is
    guaranteed detected only when (a) it is at least ``span + stride -
    1`` chars long AND (b) the two copies start at offsets congruent
    mod ``stride``. A copy shifted by one character escapes detection
    entirely, regardless of length. ``stride=1`` removes the alignment
    condition and is span-complete; ``stride=k`` accepts a 1-1/k miss
    probability on randomly-aligned copies in exchange for a k-fold
    smaller exchange (the Lee et al. pipeline's sensitivity/cost dial;
    templated/boilerplate copies are usually grid-aligned because the
    shared prefix aligns the grids).

    Scale shape: ONE exchange of the shingle stream, keyed on the
    fingerprint — each fp bucket collects into a list and pairs
    generate ROW-LOCALLY from the list, so no self-join ever
    re-shuffles or recomputes the shingle stream (the
    groupBy-then-join-back first cut paid the shingle exchange twice
    and ran 17 s at sf1; this shape runs ~1.5 s). The verify (exact
    substring equality, an md5 collision guard) is also row-local.
    Output: one row per (id_a < id_b, pos_a, pos_b) aligned duplicated
    span, plus the fingerprint.

    ``max_bucket_docs`` bounds the inherent quadratic: a span shared
    by D documents produces O(D^2) pairs — at D in the thousands
    (universal boilerplate/licenses) that is millions of pairs NOBODY
    consumes pairwise; buckets wider than the cap are dropped, exactly
    the "too-common shingle" cut every production LSH/suffix pipeline
    makes (that signal belongs to line/boilerplate dedup,
    ``corpus.line_dedup``). The cap also bounds per-row memory for the
    local pair arrays.
    """
    from claims_data_spark.session import spread

    t = F.col(text_col)
    positions = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - F.lit(span - 1), F.lit(0)),
        F.lit(stride),
    )
    shingles = (
        spread(docs.filter(F.length(t) >= span))
        .select(
            F.col(id_col),
            F.explode(positions).alias("pos"),
            t.alias("_t"),
        )
        .select(
            id_col, "pos",
            F.substring(F.col("_t"), F.col("pos"), F.lit(span))
            .alias("_s"),
        )
        .select(id_col, "pos", F.md5("_s").alias("fp"), "_s")
    )
    buckets = (
        shingles.groupBy("fp")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("id"),
                        F.col("pos").alias("pos"),
                        F.col("_s").alias("s"),
                    )
                )
            ).alias("_grp")
        )
        .withColumn(
            "_ndocs",
            F.size(F.array_distinct(
                F.transform(F.col("_grp"), lambda x: x["id"])
            )),
        )
        .filter(
            (F.col("_ndocs") >= 2)
            & (F.col("_ndocs") <= F.lit(max_bucket_docs))
            # and a same-span-repeated-WITHIN-doc guard: total bucket
            # entries stay within 4x the doc cap
            & (F.size("_grp") <= F.lit(max_bucket_docs * 4))
        )
    )
    n = F.size("_grp")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.col("_grp")[i - 1].alias("a"),
                    F.col("_grp")[j - 1].alias("b"),
                ),
            ),
        )
    )
    return (
        buckets.select("fp", F.explode(pairs).alias("_p"))
        .filter(F.col("_p.a.id") < F.col("_p.b.id"))
        .filter(F.col("_p.a.s") == F.col("_p.b.s"))   # exact verify
        .select(
            F.col("_p.a.id").alias("id_a"),
            F.col("_p.b.id").alias("id_b"),
            F.col("_p.a.pos").alias("pos_a"),
            F.col("_p.b.pos").alias("pos_b"),
            "fp",
        )
        .distinct()
    )


def redact_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pos_col: str = "pos",
    span: int = 50,
    marker: str = "",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Remove flagged character spans from documents — the APPLY side
    of :func:`substring_dup_spans` (Lee et al. 2021 remove the
    duplicated substrings rather than dropping whole documents; the
    usual keep-min policy feeds this the LATER copy's positions, e.g.
    ``pairs.select(id_b, pos_b)``).

    ``spans`` is one row per (doc, 1-indexed start position) of a
    fixed ``span``-length region; overlapping/adjacent regions merge
    into islands first (the gaps-and-islands idiom over integer
    offsets — same shape as the date-interval operators), then each
    document's redacted text is rebuilt by concatenating the kept
    segments around the islands, with ``marker`` in place of each
    removed region.

    Scale shape: the island merge is one window + one aggregate over
    the SPAN table (flagged docs only — a tiny fraction of the
    corpus); the rebuild joins one island-array row per flagged doc
    back to the text and runs row-local; unflagged docs pass through
    the left join untouched (``out_col`` = original text). No UDFs —
    the segment rebuild is a sorted higher-order fold compiled to
    codegen.

    Added columns: ``out_col``, ``n_redacted_spans`` (merged islands;
    0 for untouched docs), ``chars_removed``.
    """
    if span < 1:
        raise ValueError("span must be >= 1")
    s0 = spans.select(
        F.col(id_col),
        F.col(pos_col).cast("long").alias("_s"),
        (F.col(pos_col).cast("long") + F.lit(span - 1)).alias("_e"),
    ).distinct()
    w = Window.partitionBy(id_col).orderBy("_s")
    prev_max_e = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        s0.withColumn(
            "_new",
            F.when(
                prev_max_e.isNull() | (F.col("_s") > prev_max_e + 1), 1
            ).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w))
        .groupBy(id_col, "_isl")
        .agg(F.min("_s").alias("_s"), F.max("_e").alias("_e"))
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_s"), F.col("_e")))
            ).alias("_isls")
        )
    )
    t = F.col(text_col)
    n = F.length(t)
    # fold over the sorted islands: emit the kept segment before each
    # island (clipped to the text) + the marker; finish with the tail
    acc0 = F.struct(
        F.lit(1).cast("long").alias("cur"), F.lit("").alias("out")
    )
    folded = F.aggregate(
        F.col("_isls"),
        acc0,
        lambda acc, isl: F.struct(
            F.greatest(acc["cur"], isl["_e"] + 1).alias("cur"),
            F.concat(
                acc["out"],
                F.substring(
                    t, acc["cur"].cast("int"),
                    F.greatest(
                        isl["_s"] - acc["cur"], F.lit(0).cast("long")
                    ).cast("int"),
                ),
                F.lit(marker),
            ).alias("out"),
        ),
        lambda acc: F.concat(
            acc["out"],
            F.when(
                acc["cur"] <= n,
                F.substring(
                    t, acc["cur"].cast("int"), (n - acc["cur"] + 1).cast("int")
                ),
            ).otherwise(F.lit("")),
        ),
    )
    out = docs.join(islands, id_col, "left")
    redacted = F.when(F.col("_isls").isNotNull(), folded).otherwise(t)
    n_spans = F.coalesce(F.size("_isls"), F.lit(0))
    return (
        out.withColumn(out_col, redacted)
        .withColumn("n_redacted_spans", n_spans.cast("long"))
        .withColumn(
            "chars_removed",
            (F.coalesce(n, F.lit(0))
             - F.coalesce(F.length(F.col(out_col)), F.lit(0))
             + n_spans * F.length(F.lit(marker))).cast("long"),
        )
        .drop("_isls")
    )


# ---------------------------------------------------------------------------
# Incremental near-dup: new batch vs a persisted signature index
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 8,
    hash_family: str = "md5",
    fps_col: str = "fps",
) -> DataFrame:
    """Winnowing document fingerprints — Schleimer, Wilkerson &
    Aiken 2003 (the MOSS algorithm), the classic local fingerprinting
    scheme between "hash everything" (too many fingerprints) and
    "hash every Nth gram" (a 1-char shift escapes): hash every
    character ``k``-gram of the normalized text, slide a window of
    ``w`` consecutive gram hashes, and keep each window's MINIMUM.
    Guarantee: any shared substring of length >= ``k + w - 1`` shares
    at least one selected fingerprint REGARDLESS of alignment — the
    property the strided grid of :func:`substring_dup_spans` trades
    away (its docstring's mod-``stride`` congruence condition).
    Density: ~2/(w+1) of gram positions select, so the fingerprint
    set is a tunable fraction of document length.

    Output: one row per document with at least one full gram —
    ``(id, fps array<bigint> DISTINCT SORTED, n_fps)``. Documents
    shorter than a full window (but >= ``k`` chars) fall back to one
    fingerprint (the global gram-hash min), so short docs still
    participate. Selection keeps VALUES, not positions: for dedup
    bucketing the distinct minima set is the fingerprint (MOSS keeps
    positions only to localize matches — span localization is
    ``substring_dup_spans``'s job).

    Scale shape: map-only codegen — one ``transform`` hashing the
    gram stream (O(L) md5 calls per doc), one ``transform`` of
    window minima over the in-row array (O(L*w) long compares, no
    allocation beyond the two arrays), ``array_distinct`` +
    ``array_sort``. No shuffle, no UDF, no state; at 100 TB this is
    a projected column on the corpus scan. ``hash_family='md5'``
    (default) is the engine-portable oracle-checked stream;
    ``'xxhash64'`` is the production stream (native JVM hash, same
    selection algebra).
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(
            f"hash_family must be 'md5' or 'xxhash64', got {hash_family!r}"
        )

    # LET-BINDING via 1-element transforms (a hard-won evaluation-
    # order lesson): an expression referenced inside a higher-order-
    # function lambda is re-evaluated AT EVERY lambda invocation
    # unless whole-stage codegen's subexpression elimination happens
    # to rescue it — and large plans (a union of minted fixture
    # branches was enough) fall off the codegen cliff into the
    # interpreted path, which has no CSE. A naive
    # ``slice(hashes, j, w)`` per window then re-runs the ENTIRE
    # gram-hash transform per window — O(L^2 * w) md5 calls per
    # document; measured as a multi-hour stall on a 10k-doc fixture.
    # Wrapping each heavy intermediate in a one-element array and
    # binding it as a ``transform`` lambda VARIABLE makes every
    # re-reference a free variable read in BOTH evaluation modes:
    # the normalized text evaluates once, the gram-hash array
    # evaluates once (one md5 per gram), and the per-window work is
    # w long-compares on the bound array.
    def gram_hash(tt: Column, i: Column) -> Column:
        gram = F.substring(tt, i, k)
        if hash_family == "md5":
            return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
        return F.xxhash64(gram)

    def bind(expr: Column, fn) -> Column:
        """Let-binding: evaluate ``expr`` ONCE, hand it to ``fn`` as a
        lambda variable (free to re-reference in either eval mode)."""
        return F.element_at(F.transform(F.array(expr), fn), 1)

    def window_minima(hs: Column) -> Column:
        """Sliding-window minima by sparse-table DOUBLING: m_width[j]
        = min(hs[j .. j+width-1]) builds in log2(w) zip_with(least)
        passes (zip_with pads the shifted side with NULL; least skips
        NULLs, and the partial-window tail entries are cut by the
        final slice). O(L log w) long-compares and ~log w array
        allocations per document — the naive per-window
        ``array_min(slice(...))`` allocates L small arrays, which in
        the interpreted HOF path (no whole-stage codegen for higher-
        order functions) measured ~10x slower at sf1."""
        p = 1 << ((w - 1).bit_length() - 1) if w > 1 else 1  # 2^a <= w

        def doubled(m: Column, width: int) -> Column:
            if width >= p:
                if p == w:
                    return m
                shifted = F.slice(
                    m, w - p + 1, F.greatest(F.size(m) - (w - p), F.lit(0))
                )
                return F.zip_with(m, shifted, lambda a, b: F.least(a, b))
            nxt = F.zip_with(
                m,
                F.slice(
                    m, width + 1,
                    F.greatest(F.size(m) - width, F.lit(0)),
                ),
                lambda a, b: F.least(a, b),
            )
            return bind(nxt, lambda mm: doubled(mm, width * 2))

        n_windows = F.size(hs) - F.lit(w - 1)
        return F.when(
            n_windows >= 1,
            F.slice(doubled(hs, 1), 1, n_windows),
        ).otherwise(F.array(F.array_min(hs)))

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    fps = bind(
        norm,
        lambda tt: bind(
            F.transform(
                F.sequence(F.lit(1), F.length(tt) - F.lit(k - 1)),
                lambda i: gram_hash(tt, i),
            ),
            window_minima,
        ),
    )
    return (
        # spread() the CPU-heavy map stage (round 9): a unioned or
        # few-file input reaches here with a handful of partitions —
        # the sf10 fixture ran its entire O(L log w) fingerprinting
        # on 3 of 42 tasks (the union's three branches), a 39-idle-
        # cores straggler tail visible in every scale row. Round-
        # robin to the default parallelism ONLY when under it (the
        # spread() contract: a no-op on real multi-split corpora).
        spread(docs.filter(F.col(text_col).isNotNull()))
        # on the NORMALIZED length: whitespace collapse can shorten a
        # trim-passing string below k, and sequence(1, 0) counts DOWN
        # in Spark — the guard must see the same string fps sees
        .filter(F.length(norm) >= k)
        .select(
            F.col(id_col),
            F.array_sort(F.array_distinct(fps)).alias(fps_col),
        )
        .withColumn("n_fps", F.size(fps_col).cast("long"))
    )


def winnow_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 8,
    min_shared: int = 2,
    max_bucket_docs: int = 64,
    hash_family: str = "md5",
) -> DataFrame:
    """Near-duplicate candidate pairs by shared winnowing fingerprints
    — the MOSS match step re-expressed as the repo's bucket-local pair
    pattern: fingerprints explode to ``(fp, id, n_fps)``, each fp
    bucket collects its (capped) doc list and emits pairs ROW-LOCALLY,
    and a pair-key aggregate counts shared fingerprints. Output:
    ``(id_a < id_b, shared_fps, n_a, n_b, jaccard_est)`` where
    ``jaccard_est = shared / (n_a + n_b - shared)`` over the selected
    (winnowed) fingerprints. Exact only when no shared fingerprint
    hits the ``max_bucket_docs`` cap: capped fingerprints still count
    in ``n_a``/``n_b`` but can never count in ``shared_fps``, so for
    pairs sharing boilerplate-heavy fingerprints the estimate is a
    LOWER BOUND on the selected-set Jaccard (the conservative
    direction for a dedup gate — the cap can only under-merge, never
    over-merge; raw-shingle Jaccard is a different quantity either
    way).

    Scale: TWO exchanges, both candidate-grain — the fp stream
    (keyed on the 60-bit fingerprint, list-collected per bucket, so
    pairs never re-shuffle the stream) and the pair rollup. NEVER
    all-pairs: ``max_bucket_docs`` drops fingerprints shared by more
    documents than the cap (universal boilerplate — the same
    too-common-shingle cut as :func:`substring_dup_spans`; that
    signal belongs to ``corpus.line_dedup``), which also bounds the
    per-row pair array. Exact integer/rational arithmetic throughout
    — engine-portable under the md5 family.
    """
    fps = winnow_fingerprints(
        docs, id_col, text_col, k=k, w=w, hash_family=hash_family
    )
    exploded = fps.select(
        F.col(id_col), "n_fps", F.explode("fps").alias("_fp")
    )
    buckets = (
        exploded.groupBy("_fp")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("i"), "n_fps"))
            ).alias("_ds"),
        )
        .filter(
            (F.size("_ds") >= 2) & (F.size("_ds") <= max_bucket_docs)
        )
    )
    n = F.size("_ds")
    # row-local pair generation: flatten the triangular index grid
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda a: F.transform(
                        F.sequence(a + 1, n),
                        lambda b: F.struct(
                            F.element_at("_ds", a).getField("i").alias("ia"),
                            F.element_at("_ds", a).getField("n_fps").alias("na"),
                            F.element_at("_ds", b).getField("i").alias("ib"),
                            F.element_at("_ds", b).getField("n_fps").alias("nb"),
                        ),
                    ),
                )
            )
        ).alias("_p")
    )
    out = (
        pairs.groupBy(
            F.col("_p.ia").alias("id_a"),
            F.col("_p.ib").alias("id_b"),
            F.col("_p.na").alias("n_a"),
            F.col("_p.nb").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    return out.select(
        "id_a", "id_b",
        F.col("shared_fps").cast("long").alias("shared_fps"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (
            F.col("shared_fps")
            / (F.col("n_a") + F.col("n_b") - F.col("shared_fps"))
        ).alias("jaccard_est"),
    )


def sig_jaccard_estimate(sig_a: Column, sig_b: Column) -> Column:
    """MinHash's own similarity estimator: the fraction of agreeing
    signature positions is an unbiased estimate of Jaccard — the
    verification an INDEX can support, since it stores signatures
    (1 row/doc), not shingle sets."""
    agree = F.size(
        F.filter(
            F.zip_with(sig_a, sig_b, lambda a, b: a == b),
            lambda x: x,
        )
    )
    return agree / F.size(sig_a)


def incremental_minhash_dedup(
    index: DataFrame | None,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.8,
) -> tuple[DataFrame, DataFrame]:
    """Deduplicate a NEW batch against an existing corpus without
    touching the old documents — the daily-ingest shape (the
    reference's replace-dups refresh contract applied to NEAR-dups):
    yesterday's corpus is represented only by its signature index
    ``(id, sig)``, today's batch drops documents near-duplicating the
    index OR an earlier (lower-id) batch member, and the index grows
    by the survivors. Returns ``(clean_new_docs, updated_index)``.

    Scale shape: the index is never re-shingled — bands re-derive from
    stored signatures map-only; the cross join is banded (new bands ⋈
    index bands equi-join), candidates verify with the signature-
    agreement estimator (the verification an index CAN support;
    full-text exact Jaccard would mean storing every shingle set
    forever). Intra-batch dedup reuses the exact-verify pair path over
    just the batch. State carried between batches = one row per
    surviving document.

    NULL-text rows carry no signature, so they can never be identified
    as duplicates — they pass through to ``clean`` unmodified (and add
    nothing to the index) rather than being silently conflated with
    duplicates.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}): truncating the band width silently ignores the "
            "trailing signature positions and lowers recall"
        )
    rows_per_band = num_hashes // bands
    new_sigs = (
        word_shingles_frame(
            spread(new_docs.select(id_col, text_col)).filter(
                F.col(text_col).isNotNull()
            ),
            text_col, shingle_k, "_sh",
        )
        .withColumn("sig", minhash_signature("_sh", num_hashes))
        .select(id_col, "sig")
        .persist()
    )
    vs_index_dups = None
    if index is not None:
        nb = minhash_bands(
            new_sigs, id_col, "sig", bands, rows_per_band
        )
        ib = minhash_bands(
            index.withColumnRenamed(id_col, "_old_id"),
            "_old_id", "sig", bands, rows_per_band,
        )
        cand = (
            nb.join(ib, ["band_id", "band_hash"])
            .select(id_col, "_old_id")
            .distinct()
        )
        vs_index_dups = (
            cand.join(new_sigs, id_col)
            .join(
                index.select(
                    F.col(id_col).alias("_old_id"),
                    F.col("sig").alias("_old_sig"),
                ),
                "_old_id",
            )
            .filter(
                sig_jaccard_estimate(F.col("sig"), F.col("_old_sig"))
                >= F.lit(jaccard_threshold)
            )
            .select(id_col)
            .distinct()
        )
    survivors = (
        new_sigs.join(vs_index_dups, id_col, "left_anti")
        if vs_index_dups is not None
        else new_sigs
    )
    # intra-batch: exact-verify pairs over the surviving docs only,
    # greedy keep-lowest-id (the semantic_dedup rule)
    batch_pairs = minhash_near_dup_pairs(
        new_docs.join(survivors.select(id_col), id_col),
        id_col, text_col,
        shingle_k=shingle_k, num_hashes=num_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    batch_dups = batch_pairs.select(
        F.col("id_b").alias(id_col)
    ).distinct()
    kept_ids = survivors.select(id_col).join(
        batch_dups, id_col, "left_anti"
    )
    # anti-join against the DROPPED ids (not inner-join on kept ids):
    # NULL-text rows have no signature, hence no kept row — an inner
    # join would silently conflate "unsigned" with "duplicate"
    dropped_ids = (
        vs_index_dups.unionByName(batch_dups)
        if vs_index_dups is not None
        else batch_dups
    )
    clean = new_docs.join(dropped_ids, id_col, "left_anti")
    kept_sigs = new_sigs.join(kept_ids, id_col)
    updated_index = (
        index.unionByName(kept_sigs) if index is not None else kept_sigs
    )
    # the persist served the multi-branch plan above; the returned
    # frames re-derive lazily, so don't pin executor memory past return
    new_sigs.unpersist()
    return clean, updated_index
