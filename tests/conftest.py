import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from canal_spark import get_spark

    s = get_spark("canal-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_root(tmp_path):
    root = tmp_path / "tbl"
    yield str(root)
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture()
def token_table(spark, tmp_table_root):
    """A small fragmented token table + its base rows (for oracles)."""
    from canal_spark import create_table
    from canal_spark.changelog import base_table_df, synth_token_rows
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(1200)
    append(spark, t, base_table_df(spark, 1200).repartition(12))
    return t, base


def scan_dict(spark, table, **kw):
    return {
        r["doc_id"]: (list(r["tokens"]) if r["tokens"] is not None else None,
                      r["n_tok"], r["source"])
        for r in table.scan(spark, **kw).collect()
    }


def oracle_dict(base_rows, changes):
    from canal_spark.changelog import python_oracle_apply

    state = python_oracle_apply({r[0]: (r[1], r[2], r[3]) for r in base_rows}, changes)
    return {k: (list(v[0]), v[1], v[2]) for k, v in state.items()}
