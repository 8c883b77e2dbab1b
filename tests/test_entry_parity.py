"""Mirror of the driver's correctness gate: every queries() entry vs
its DuckDB oracle at sf0.001 (row count, columns, value hash)."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_parity import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    from canal_spark.operators.common import release_cached_deps

    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    release_cached_deps(sdf)  # the session is shared across all 59 queries
    oracle = entrymod.oracle_sql().get(name)
    assert oracle is not None, f"{name} has no oracle"
    rel = duck.sql(oracle)
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(rel.columns)
    assert len(s_rows) == len(d_rows)
    assert value_hash(s_rows, s_cols) == value_hash(d_rows, rel.columns)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"source", "n_docs", "total_tokens", "min_tok", "max_tok"}
