"""Every queries() entry with an oracle must hash-match DuckDB — this is
the same gate the driver runs (CORRECTNESS_r{N}.json), run at sf0.001 for
speed (driver uses sf0.01)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(spark, sf_dir, duck, name):
    assert name in QUERIES, f"oracle_sql has {name} but queries() doesn't"
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, ORACLES[name], duck)
    assert ok, f"{name}: {msg}"


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
