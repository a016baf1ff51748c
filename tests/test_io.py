"""Source/sink layer: declared-schema reads, bucketed co-located
joins (shuffle elimination), promotion QA."""

import pytest
from pyspark.sql import functions as F

from claims_data_spark.schema import struct_type
from claims_data_spark.sources.io import (
    promote,
    read_file,
    with_audit,
    write_bucketed,
    write_table,
)


def test_csv_read_with_declared_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,amount,when\n1,10.50,2020-01-02\n2,99.99,2020-02-03\n")
    schema = struct_type({"id": "bigint", "amount": "numeric(10,2)", "when": "date"})
    df = read_file(spark, str(p), "csv", schema=schema)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "decimal(10,2)", "date",
    ]
    assert df.count() == 2


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.orc")
    spark.range(10).toDF("id").write.orc(p)
    assert read_file(spark, p, "orc").count() == 10


def test_audit_column(spark):
    df = with_audit(spark.range(3))
    assert "last_run" in df.columns
    assert df.filter(F.col("last_run").isNull()).count() == 0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with
    zero Exchange operators — the co-located join the reference gets
    from HASH distribution."""
    import shutil

    for t in ("t_orders_b", "t_lines_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    lines = spark.range(3000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v2")
    )
    write_bucketed(orders, "t_orders_b", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(lines, "t_lines_b", ["k"], num_buckets=8, sort_cols=["k"])
    # disable auto-broadcast: at test size the planner would broadcast
    # (and skip bucketing); at 100 TB neither side is broadcastable and
    # the bucketed sort-merge path is exactly what runs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(spark.table("t_lines_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_update_columns_from_evidence(spark):
    import pytest

    from claims_data_spark.sources.io import update_columns

    demo = spark.createDataFrame(
        [("p1", None), ("p2", "Female"), ("p3", None)], "id string, gender string"
    )
    evidence = spark.createDataFrame(
        [("p1", "Female"), ("p2", "Male")], "id string, gender_claim string"
    )
    out = update_columns(demo, evidence, ["id"], {"gender": "gender_claim"})
    got = {r["id"]: r["gender"] for r in out.collect()}
    # evidence fills p1's gap; p2's existing value is NOT overwritten;
    # p3 (no evidence) stays null
    assert got == {"p1": "Female", "p2": "Female", "p3": None}
    forced = update_columns(
        demo, evidence, ["id"], {"gender": "gender_claim"}, only_when_null=False
    )
    assert {r["id"]: r["gender"] for r in forced.collect()}["p2"] == "Male"
    dup_ev = spark.createDataFrame(
        [("p1", "A"), ("p1", "B")], "id string, gender_claim string"
    )
    with pytest.raises(ValueError, match="not unique"):
        update_columns(demo, dup_ev, ["id"], {"gender": "gender_claim"})


def test_incremental_merge_write_back(spark, tmp_path):
    from claims_data_spark.sources.io import incremental_merge

    p = str(tmp_path / "tbl")
    write_table(spark.createDataFrame([(1, "old"), (2, "old")], "id int, v string"), p)
    incoming = spark.createDataFrame([(2, "new"), (3, "new")], "id int, v string")
    out = incremental_merge(spark, p, incoming, ["id"], write_back=True)
    # returned frame reads the REWRITTEN path; in-place write was safe
    assert {(r["id"], r["v"]) for r in out.collect()} == {
        (1, "old"), (2, "new"), (3, "new"),
    }
    assert {(r["id"], r["v"]) for r in read_file(spark, p).collect()} == {
        (1, "old"), (2, "new"), (3, "new"),
    }


def test_schema_apply_strict_catches_drift(spark):
    from claims_data_spark.schema import SchemaRegistry

    reg = SchemaRegistry()
    reg.declare("stage.t", {"id": "bigint", "v": "int"})
    df = spark.createDataFrame([("7", "ok-ish")], "id string, v string")
    # non-strict try_cast: silent NULL coercion (documented)
    assert reg.apply(df, "stage.t").collect()[0]["v"] is None
    import pytest

    # strict ANSI cast: the job fails on the un-parseable value
    with pytest.raises(Exception):
        reg.apply(df, "stage.t", strict=True).collect()


def test_predicates_unknown_column_fails_fast(spark):
    import pytest

    from claims_data_spark.plans.predicates import apply_filters

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(KeyError, match="unknown columns"):
        apply_filters(df, {"typo_col": 5})


def test_promote_rowcount_gate(spark, tmp_path):
    stage = str(tmp_path / "stage")
    final = str(tmp_path / "final")
    write_table(spark.range(5).toDF("id"), stage)
    n = promote(spark, stage, final, expected_rows=5)
    assert n == 5
    assert read_file(spark, final).count() == 5
    with pytest.raises(AssertionError):
        promote(spark, stage, final, expected_rows=99)


def test_read_with_header_file(spark, tmp_path):
    from claims_data_spark.sources.io import read_with_header_file

    data = tmp_path / "tbl.txt"
    data.write_text("1|alpha|2019-01-01\n2|beta|2019-02-01\n")
    header = tmp_path / "tbl.HeaderOnly.txt"
    header.write_text("member_id|name|start_date\n")
    df = read_with_header_file(
        spark, str(data), str(header)
    )
    assert df.columns == ["member_id", "name", "start_date"]
    rows = {r["member_id"]: r for r in df.collect()}
    assert rows["2"]["name"] == "beta"

    bad_header = tmp_path / "bad.HeaderOnly.txt"
    bad_header.write_text("only_one_column\n")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_with_header_file(spark, str(data), str(bad_header))


def test_cdr_raw_file_processing(spark, tmp_path):
    """CDR loader kernel (db_loader/cdr/00_raw_file_processing.R):
    header-file schema with vendor-name sanitization, |@| delimiter,
    ~@~ noise strip, printable-ASCII byte cleaning, etl_id audit
    column, and the row/field-count QA."""
    from claims_data_spark.sources.cdr import (
        cdr_load_qa,
        header_columns,
        load_cdr_raw,
        sanitize_column_name,
    )

    assert sanitize_column_name("Member ID (Hashed)") == "member_id_hashed"
    assert sanitize_column_name("DOB, Year/Month-Day") == "dob_year_month_day"

    header = "Member ID (Hashed)|@|Svc-Date|@|~@~Amount\n"
    cols = header_columns(header)
    assert [c for _, c in cols] == ["member_id_hashed", "svc_date", "amount"]

    data = tmp_path / "cdr_claims_20260101.txt"
    data.write_bytes(
        b"abc123|@|2024-01-01|@|19.50\n"
        b"def\x019|@|2024-\x8001-02|@|7.25\n"   # non-printable bytes
        b"ragged|@|2024-01-03\n"
    )
    df = load_cdr_raw(spark, str(data), header, etl_id=7)
    rows = {r["member_id_hashed"]: r for r in df.collect()}
    assert rows["abc123"]["svc_date"] == "2024-01-01"
    assert rows["abc123"]["etl_id"] == 7
    # bytes outside 0x20-0x7E became spaces, like clean_ascii_only_gzip
    assert rows["def 9"]["svc_date"] == "2024- 01-02"
    # ragged row NULL-pads and is counted by QA
    assert rows["ragged"]["amount"] is None

    qa = cdr_load_qa(df, expected_rows=3, header_text=header)
    assert qa["rows_match"] and qa["n_ragged"] == 1 and qa["n_cols"] == 3
    assert qa["cols_match"]
    qa_bad = cdr_load_qa(df, expected_rows=5, header_text=header)
    assert not qa_bad["rows_match"]
    # cols_match is an INDEPENDENT signal: QA against a truncated
    # header must fail on the frame loaded with the full header
    truncated = "Member ID (Hashed)|@|Svc-Date\n"
    qa_trunc = cdr_load_qa(df, expected_rows=3, header_text=truncated)
    assert not qa_trunc["cols_match"]


def test_read_jsonl(spark, tmp_path):
    from claims_data_spark.sources.io import read_file

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
    )
    df = read_file(spark, str(p), fmt="jsonl")
    rows = {r.doc_id: (r.text, r.lang) for r in df.collect()}
    assert rows == {1: ("hello", "en"), 2: ("bonjour", "fr")}
    # declared schema path: no inference pass, types as declared
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df2 = read_file(spark, str(p), fmt="json", schema=sch)
    assert df2.schema == sch and df2.count() == 2


def test_clustered_write_prunes_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from claims_data_spark.sources.io import write_clustered

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).alias("part_key"),
        (F.col("id") * 37 % 1000).alias("cluster_key"),
    )
    path = str(tmp_path / "clustered")
    write_clustered(df, path, ["part_key"], cluster_by=["cluster_key"])

    back = spark.read.parquet(path).filter(F.col("part_key") == 2)
    assert back.count() == 250
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan carries the partition filter and
    # reports a single matched partition directory
    assert "PartitionFilters" in plan and "part_key" in plan
    import os

    dirs = [d for d in os.listdir(path) if d.startswith("part_key=")]
    assert sorted(dirs) == [f"part_key={i}" for i in range(4)]
    # rows inside each file are sorted by the cluster key (row-group
    # min/max selectivity): verify per input-file ordering
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(
        F.monotonically_increasing_id()
    )
    chk = (
        spark.read.parquet(path)
        .withColumn("_prev", F.lag("cluster_key").over(w))
        .filter(F.col("_prev").isNotNull())
        .filter(F.col("_prev") > F.col("cluster_key"))
    )
    assert chk.count() == 0


def test_delete_data_year(spark, tmp_path):
    """mcaid_delete_data_year.R mirror: one year removed across a table
    family, before/after count gates, unknown date columns skipped, old
    data preserved as the _to_delete backup."""
    import os

    from claims_data_spark.sources.io import delete_data_year, read_file

    elig = spark.createDataFrame(
        [(1, 201501), (2, 201512), (3, 201601), (4, 201703)],
        "id long, CLNDR_YEAR_MNTH int",
    )
    claims = spark.createDataFrame(
        [(1, "2015-03-04"), (2, "2016-07-01"), (3, "2015-12-31")],
        "id long, first_service_date string",
    )
    odd = spark.createDataFrame([(1, 5)], "id long, weird_col int")
    p_elig = str(tmp_path / "mcaid_elig")
    p_claims = str(tmp_path / "mcaid_claim")
    p_odd = str(tmp_path / "mcaid_odd")
    elig.write.parquet(p_elig)
    claims.write.parquet(p_claims)
    odd.write.parquet(p_odd)

    reports = delete_data_year(
        spark,
        [
            {"path": p_elig, "date_column": "CLNDR_YEAR_MNTH"},
            {"path": p_claims, "date_column": "first_service_date"},
            {"path": p_odd, "date_column": "not_there"},
            {"path": p_odd},
        ],
        2015,
    )
    by_path = {}
    for r in reports:
        by_path.setdefault(r["path"], []).append(r)
    e = by_path[p_elig][0]
    assert (e["old_rows"], e["kept_rows"], e["deleted_rows"]) == (4, 2, 2)
    c = by_path[p_claims][0]
    assert (c["old_rows"], c["kept_rows"], c["deleted_rows"]) == (3, 1, 2)
    assert by_path[p_odd][0]["status"] == "skipped_unknown_date_column"
    assert by_path[p_odd][1]["status"] == "skipped_no_date_column"

    # surviving rows are exactly the non-2015 ones
    kept = {r["CLNDR_YEAR_MNTH"] for r in read_file(spark, p_elig).collect()}
    assert kept == {201601, 201703}
    # rollback copy intact
    backup = {r["CLNDR_YEAR_MNTH"]
              for r in spark.read.parquet(p_elig + "._to_delete").collect()}
    assert backup == {201501, 201512, 201601, 201703}
    # keep_backup=False removes it (idempotent re-run over the new data)
    delete_data_year(
        spark, [{"path": p_elig, "date_column": "CLNDR_YEAR_MNTH"}],
        2015, keep_backup=False,
    )
    assert not os.path.exists(p_elig + "._to_delete")
    assert read_file(spark, p_elig).count() == 2


def test_delete_data_year_format_and_null_guards(spark, tmp_path):
    """Round-7 ADVICE fix: (a) a date column in an unvalidated format
    (epoch ints, mm/dd/yyyy) is SKIPPED with a report — never silently
    'deleted 0 rows'; (b) NULL-dated rows are KEPT, not purged; (c)
    typed date columns match on year() rather than the string prefix."""
    from claims_data_spark.sources.io import delete_data_year, read_file

    epoch = spark.createDataFrame(
        [(1, 1420070400), (2, 1451606400)], "id long, svc_epoch long"
    )
    mdy = spark.createDataFrame(
        [(1, "03/04/2015"), (2, "07/01/2016")], "id long, svc_mdy string"
    )
    nully = spark.createDataFrame(
        [(1, "2015-03-04"), (2, None), (3, "2016-01-01")],
        "id long, first_service_date string",
    )
    typed = spark.createDataFrame(
        [(1, "2015-03-04"), (2, None), (3, "2016-01-01")],
        "id long, d string",
    ).withColumn("d", F.col("d").cast("date"))
    paths = {}
    for name, df in [("epoch", epoch), ("mdy", mdy), ("nully", nully),
                     ("typed", typed)]:
        p = str(tmp_path / name)
        df.write.parquet(p)
        paths[name] = p

    reports = delete_data_year(
        spark,
        [
            {"path": paths["epoch"], "date_column": "svc_epoch"},
            {"path": paths["mdy"], "date_column": "svc_mdy"},
            {"path": paths["nully"], "date_column": "first_service_date"},
            {"path": paths["typed"], "date_column": "d"},
        ],
        2015,
    )
    by_path = {r["path"]: r for r in reports}
    # (a) unvalidated formats refuse rather than no-op
    assert by_path[paths["epoch"]]["status"] == "skipped_unvalidated_date_format"
    assert by_path[paths["epoch"]]["unparseable_rows"] == 2
    assert by_path[paths["mdy"]]["status"] == "skipped_unvalidated_date_format"
    assert read_file(spark, paths["epoch"]).count() == 2  # untouched
    # (b) the NULL-dated row survives the purge and is reported
    r = by_path[paths["nully"]]
    assert (r["status"], r["deleted_rows"], r["null_date_rows"]) == (
        "deleted", 1, 1,
    )
    kept = {row["id"] for row in read_file(spark, paths["nully"]).collect()}
    assert kept == {2, 3}
    # (c) typed date column: year() match, NULL kept
    t = by_path[paths["typed"]]
    assert (t["status"], t["deleted_rows"], t["null_date_rows"]) == (
        "deleted", 1, 1,
    )
    assert {row["id"] for row in read_file(spark, paths["typed"]).collect()} \
        == {2, 3}


def test_compact_table(spark, tmp_path):
    """Small-file compaction: many tiny files collapse toward the
    target size, rows preserved, atomic swap."""
    from claims_data_spark.sources.io import compact_table, read_file

    p = str(tmp_path / "fragged")
    df = spark.range(10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(p)
    n_before = len([f for f in __import__("os").listdir(p)
                    if f.endswith(".parquet")])
    assert n_before == 64
    report = compact_table(spark, p, target_file_bytes=10**9)
    assert report["rows"] == 10000
    assert report["files_after"] < n_before
    assert report["files_after"] <= 2
    out = read_file(spark, p)
    assert out.count() == 10000
    assert out.agg(F.sum("v")).first()[0] == 2 * sum(range(10000))


def test_shard_assign_deterministic_and_partitioning_invariant(spark):
    """The shard id depends only on (id, seed): same values across
    partitionings, full coverage of [0, n), NULL id -> NULL shard."""
    from claims_data_spark.sources.io import shard_assign

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shard"]
         for r in shard_assign(df, "doc_id", 8).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in shard_assign(df.repartition(13), "doc_id", 8).collect()}
    assert a == b
    assert set(a.values()) == set(range(8))
    # a different seed reshuffles assignments
    c = {r["doc_id"]: r["shard"]
         for r in shard_assign(df, "doc_id", 8, seed="v2").collect()}
    assert a != c
    # NULL ids surface as NULL shards, never silently hashed
    nul = spark.createDataFrame([(None,), (1,)], "doc_id long")
    got = {r["doc_id"]: r["shard"]
           for r in shard_assign(nul, "doc_id", 8).collect()}
    assert got[None] is None and got[1] is not None
    with pytest.raises(ValueError):
        shard_assign(df, "doc_id", 0)


def test_export_shards_roundtrip_manifest(spark, tmp_path):
    """export_shards writes one directory per shard, re-derives the
    manifest from the WRITTEN files, QA-matches it against the input,
    and the _manifest.json totals equal the input's own totals."""
    import json
    import os

    from claims_data_spark.sources.io import export_shards

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )
    path = str(tmp_path / "release")
    manifest = export_shards(spark, df, path, "doc_id", 4, text_col="text")
    assert sorted(m["shard"] for m in manifest) == [0, 1, 2, 3]
    assert sum(m["n_docs"] for m in manifest) == 500
    total_chars = df.agg(F.sum(F.length("text"))).first()[0]
    assert sum(m["n_chars"] for m in manifest) == total_chars
    # layout: one directory per shard, readable with partition pruning
    dirs = {d for d in os.listdir(path) if d.startswith("shard=")}
    assert dirs == {f"shard={i}" for i in range(4)}
    with open(os.path.join(path, "_manifest.json")) as f:
        assert json.load(f) == manifest
    # read-back parity (the QA inside export_shards already asserted
    # this; re-assert from a fresh session read)
    back = spark.read.parquet(path)
    assert back.count() == 500
    per_shard = {r["shard"]: r["cnt"] for r in
                 back.groupBy("shard").agg(F.count("*").alias("cnt"))
                 .collect()}
    assert per_shard == {m["shard"]: m["n_docs"] for m in manifest}


def test_export_shards_null_ids_visible(spark, tmp_path):
    """NULL document ids land in the Hive default partition and get
    their own manifest row (shard None) instead of polluting shard 0."""
    from claims_data_spark.sources.io import export_shards

    df = spark.createDataFrame(
        [(None, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    path = str(tmp_path / "withnulls")
    manifest = export_shards(spark, df, path, "doc_id", 2, text_col="text")
    null_rows = [m for m in manifest if m["shard"] is None]
    assert len(null_rows) == 1 and null_rows[0]["n_docs"] == 1
    assert sum(m["n_docs"] for m in manifest) == 3


def test_spread_detects_single_row_group_parquet(spark, tmp_path):
    """round-9: Spark reports defaultParallelism byte-range splits for
    a single-row-group file, but only the row-group-bearing split
    carries rows — spread() must see through the partition count via
    the parquet footers and round-robin (the sf10 winnow fingerprint
    pass ran 3 of 42 tasks before this; 380 -> 212 s)."""
    from claims_data_spark.session import spread

    p = str(tmp_path / "onegroup.parquet")
    spark.range(50_000).selectExpr(
        "id", "repeat('x', 50) as text"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, min_partitions=8)
    # the probe must force a real redistribution: no partition may
    # hold everything
    counts = (
        out.selectExpr("count(*) as n")
        .collect()
    )
    assert counts[0]["n"] == 50_000
    per_part = out.rdd.glom().map(len).collect()
    assert max(per_part) < 50_000
    assert sum(1 for c in per_part if c > 0) >= 8
