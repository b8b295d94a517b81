"""Spark-vs-DuckDB oracle parity for every registered query, at
sf0.001 (fast). The driver runs the same comparison at sf0.01; this
test catches engine-divergence regressions (float policy, rounding,
column naming) inside `python -m pytest` itself."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_oracles import TABLES, compare  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_tiny):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_tiny}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, sf_tiny, con):
    df = QUERIES[name](spark, sf_tiny)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only contract
        return
    msg = compare(name, df, ORACLES[name], con)
    assert msg.startswith("PASS"), msg
