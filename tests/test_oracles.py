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


def test_sim_quantize_int8_invariants(spark, sf_tiny):
    """|q| <= 127, the max-|v| element hits exactly +/-127, and the
    reconstruction error is bounded by scale/2."""
    from handprint_spark.operators.similarity import q_sim_quantize_int8

    rows = q_sim_quantize_int8(spark, sf_tiny).collect()
    assert rows
    for r in rows:
        assert r.n_clip >= 1  # the max element quantizes to the rail
        # both fields are rounded to 6 decimals -> 1e-6 slack
        assert r.max_recon_err <= r.scale / 2 + 1e-6
