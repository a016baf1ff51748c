"""profile_drift — snapshot column-distribution drift: exact-mirror
tests vs a pure-python bucket profiler, identity/disjoint bounds,
null-rate channel, empty-side NULL semantics, partitioning
invariance, and the dimension-grain plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from claims_data_spark.operators.profile import profile_drift


def _bucket(v, n_buckets):
    if v is None:
        return -1
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % n_buckets


def _py_drift(old_vals, new_vals, n_buckets=16):
    from collections import Counter
    co = Counter(_bucket(v, n_buckets) for v in old_vals)
    cn = Counter(_bucket(v, n_buckets) for v in new_vals)
    No, Nn = len(old_vals), len(new_vals)
    buckets = set(co) | set(cn)
    ds = {b: cn.get(b, 0) * No - co.get(b, 0) * Nn for b in buckets}
    return {
        "n_old": No, "n_new": Nn,
        "null_rate_old": co.get(-1, 0) / No if No else None,
        "null_rate_new": cn.get(-1, 0) / Nn if Nn else None,
        "n_buckets_drifted": sum(1 for d in ds.values() if d != 0),
        "tv_distance": sum(abs(d) for d in ds.values()) / (2.0 * No * Nn)
        if No and Nn else None,
        "linf_distance": max((abs(d) for d in ds.values()), default=0)
        / (No * Nn) if No and Nn else None,
    }


def test_profile_drift_matches_python_mirror(spark):
    old_rows = [(i, f"s{i % 7}", None if i % 10 == 0 else i * 1.5)
                for i in range(200)]
    new_rows = [(i, f"s{i % 5}", None if i % 4 == 0 else i * 1.5)
                for i in range(300)]
    old = spark.createDataFrame(old_rows, "id long, cat string, x double")
    new = spark.createDataFrame(new_rows, "id long, cat string, x double")
    got = {r["col_name"]: r.asDict() for r in
           profile_drift(old, new).collect()}
    assert set(got) == {"id", "cat", "x"}
    for ci, cname in enumerate(["id", "cat", "x"]):
        exp = _py_drift([r[ci] for r in old_rows], [r[ci] for r in new_rows])
        g = got[cname]
        for k, v in exp.items():
            assert g[k] == v, (cname, k, g[k], v)


def test_profile_drift_identity_is_zero(spark):
    df = spark.createDataFrame(
        [(i, f"v{i % 9}") for i in range(500)], "id long, v string"
    )
    out = {r["col_name"]: r for r in profile_drift(df, df).collect()}
    for r in out.values():
        assert r["tv_distance"] == 0.0
        assert r["linf_distance"] == 0.0
        assert r["n_buckets_drifted"] == 0


def test_profile_drift_disjoint_tv_is_one(spark):
    # single constant value per side, different values hashing to
    # different buckets -> distributions disjoint -> tv = 1
    old = spark.createDataFrame([("aaa",)] * 50, "v string")
    new = spark.createDataFrame([("bbb",)] * 70, "v string")
    r = profile_drift(old, new).collect()[0]
    assert r["tv_distance"] == 1.0
    assert r["linf_distance"] == 1.0


def test_profile_drift_null_shift_detected(spark):
    old = spark.createDataFrame([(i, "x") for i in range(100)],
                                "id long, v string")
    new = spark.createDataFrame(
        [(i, None if i < 40 else "x") for i in range(100)],
        "id long, v string")
    r = {x["col_name"]: x for x in profile_drift(old, new).collect()}
    assert r["v"]["null_rate_old"] == 0.0
    assert r["v"]["null_rate_new"] == 0.4
    assert r["v"]["tv_distance"] == 0.4
    assert r["id"]["tv_distance"] == 0.0


def test_profile_drift_empty_side_yields_nulls(spark):
    old = spark.createDataFrame([], "v string")
    new = spark.createDataFrame([("x",)] * 5, "v string")
    r = profile_drift(old, new).collect()[0]
    assert r["n_old"] == 0 and r["n_new"] == 5
    assert r["tv_distance"] is None and r["null_rate_old"] is None


def test_profile_drift_validation_errors(spark):
    a = spark.createDataFrame([(1, [1, 2])], "id long, arr array<int>")
    b = spark.createDataFrame([(1, [3])], "id long, arr array<int>")
    with pytest.raises(ValueError, match="unsupported type"):
        profile_drift(a, b)
    c = spark.createDataFrame([(1,)], "id long")
    d = spark.createDataFrame([("x",)], "other string")
    with pytest.raises(ValueError, match="no common columns"):
        profile_drift(c, d)
    with pytest.raises(ValueError, match="missing from one snapshot"):
        profile_drift(c, d, columns=["id"])
    with pytest.raises(ValueError, match="n_buckets"):
        profile_drift(c, c, n_buckets=1)


def test_profile_drift_partitioning_invariance(spark):
    old = spark.createDataFrame(
        [(i, f"c{i % 13}") for i in range(400)], "id long, c string")
    new = spark.createDataFrame(
        [(i, f"c{i % 11}") for i in range(350)], "id long, c string")
    a = sorted(map(tuple, profile_drift(old, new).collect()))
    b = sorted(map(tuple, profile_drift(
        old.repartition(23), new.repartition(7)).collect()))
    assert a == b


def test_profile_drift_single_scan_per_snapshot(spark, tmp_path):
    # each snapshot parquet is scanned exactly once in the plan
    p1, p2 = str(tmp_path / "o.parquet"), str(tmp_path / "n.parquet")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(50)],
                               "id long, v string")
    df.write.parquet(p1); df.write.parquet(p2)
    old, new = spark.read.parquet(p1), spark.read.parquet(p2)
    plan = profile_drift(old, new)._jdf.queryExecution() \
        .executedPlan().toString()
    # exactly two scans in the whole plan: one per snapshot (the plan
    # renderer truncates paths, so count scan nodes, not file names)
    assert plan.count("FileScan parquet") == 2
