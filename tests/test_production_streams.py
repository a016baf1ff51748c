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
    # The aggregate twins deterministically yield rows on the sf0.001
    # fixture (every document lands in a split; common words clear the
    # CMS threshold). The pair-generating twins (minhash/simhash/
    # winnow) may legitimately find zero near-dup pairs at this scale,
    # so for them the pinned property is schema parity + runnability.
    must_have_rows = {"split_assign", "cms_heavy_hitters"}
    for name, fn in prod.items():
        twin = qs[name](spark, sf_dir)
        out = fn(spark, sf_dir)
        assert [f.name for f in out.schema.fields] == [
            f.name for f in twin.schema.fields
        ], name
        n_out, n_twin = out.count(), twin.count()
        if name in must_have_rows:
            assert n_out > 0, f"{name}: production twin returned no rows"
            assert n_twin > 0, f"{name}: oracle stream returned no rows"
