"""Oracle-parity guard: every queries() entry with an oracle_sql()
must match DuckDB on sf0.001 (the driver runs the same compare at
sf0.01). Keeping this in the suite means an operator change that
breaks parity fails CI immediately."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.parity import TABLES, frame_to_rows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


ORACLES = entrymod.oracle_sql()
ALL = list(entrymod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_parity(spark, con, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract: must execute
        return
    odf = con.execute(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert frame_to_rows(sdf) == frame_to_rows(odf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
