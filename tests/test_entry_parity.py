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
    # the EXTERNAL driver canonicalizes through pandas factorize, which
    # crashes on unhashable cells — no query may emit array/map/struct
    # output columns (digest them; round-4 pack_materialize lesson)
    bad = [f.name for f in sdf.schema.fields
           if f.dataType.typeName() in ("array", "map", "struct")]
    assert not bad, f"{name}: non-scalar output columns {bad}"
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


def test_registry_window_holds_priority_queries():
    """Registry ORDER IS LOAD-BEARING: the external driver checks only
    the first 50 entries.  Pin that the round-5 priority set — every
    query that had never received an external oracle row before round 5,
    plus the round-5 additions — sits inside the window, so an innocent
    module reorder can't silently push them back out."""
    first50 = list(entrymod.queries())[:50]
    priority = {
        # similarity (incl. the maintained-store read path)
        "embed_cosine_topk", "embed_ivf_topk", "semantic_dedup",
        "embed_near_dup", "label_outliers", "near_dup_sweep",
        "ann_index_search",
        # temporal / curation / tokenops / funcreg / multimodal
        "asof_join", "range_join", "train_split", "mixture_plan",
        "doc_chunk", "quality_cut", "dsir_weight", "length_bucket_plan",
        "dup_span_detect", "dup_span_cut", "token_drift",
        "filter_func_custom", "media_meta_extract", "frame_sample",
        # late text ops (incl. the repaired pack_materialize)
        "pack_materialize", "bpe_pair_counts", "bigram_lm_score",
        "decontaminate_spans", "oov_rate", "epoch_shuffle", "tfidf_topk",
    }
    missing = priority - set(first50)
    assert not missing, f"priority queries outside the driver window: {sorted(missing)}"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"source", "n_docs", "total_tokens", "min_tok", "max_tok"}
