"""Cross-engine parity on degenerate text the stock fixtures don't
contain: NULL text, empty text, doubled/leading whitespace.

The driver's correctness gate runs on fixtures with well-formed text,
so a Spark/DuckDB divergence in NULL or empty-word handling is latent
there — these tests pin the contract on a synthetic `documents` table
built to contain exactly the degenerate rows (review finding: Spark's
`size(split(NULL))` = -1 is summed where DuckDB skips a NULL, and a
`||`-injected oracle NULL-propagates where `concat_ws` NULL-skips).
"""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tools.check_parity import value_hash

# every operator that tokenizes `text` by whitespace
TEXT_QUERIES = [
    "train_split",
    "mixture_plan",
    "doc_chunk",
    "quality_cut",
    "dsir_weight",
    "length_bucket_plan",
    "dup_span_detect",
    "dup_span_cut",
    "token_drift",
]


def _degenerate_docs():
    rows = []
    texts = [
        None,                       # NULL text
        "",                         # empty text
        "a  b",                     # doubled space -> phantom '' word
        " lead",                    # leading space
        "trail ",                   # trailing space
        "the a plain words here",   # well-formed control
        "the " * 40 + "end",        # long doc (chunking/windows)
    ]
    for i, t in enumerate(texts * 3):  # 21 docs, ids 0..20 hit all mods
        rows.append(
            {
                "doc_id": i if i < len(texts) else i * 7 + 1,
                "text": t,
                "lang": "en",
                "source": f"src{i % 3}",
                "n_chars": len(t) if t is not None else 0,
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def degen_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_sf")
    _degenerate_docs().to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def degen_duck(degen_sf):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(degen_sf, 'documents.parquet')}'"
    )
    return con


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_degenerate_text_parity(spark, degen_sf, degen_duck, name):
    from canal_spark.operators.common import release_cached_deps

    fn = entrymod.queries()[name]
    sdf = fn(spark, degen_sf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    release_cached_deps(sdf)
    rel = degen_duck.sql(entrymod.oracle_sql()[name])
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(rel.columns), name
    assert len(s_rows) == len(d_rows), name
    assert value_hash(s_rows, s_cols) == value_hash(d_rows, rel.columns), name
