"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pipeline: it builds a fragmented
token table from sf0.001 documents (deterministic tokenization),
applies a binlog-style changelog through the full maintenance engine
(MERGE INTO -> bin-pack compaction -> Z-order clustering -> snapshot
expiry) and returns the post-maintenance per-source scan rollup.

`queries()` / `oracle_sql()` expose every SQL-expressible operator
from SURVEY.md §2 plus the training-data pipeline ops (dedup suite,
text analysis, similarity search) with DuckDB-checkable oracles.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _tokenize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token table from `documents` (FIXTURES.md §4):
    tokens = 60-bit md5 hash of each word mod 50257 — pure JVM exprs."""
    from canal_spark.etl import tokenize_documents
    from canal_spark.operators.common import load

    return tokenize_documents(load(spark, sf_dir, "documents"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full maintenance pass on /root/testdata/sf0.001."""
    import datetime as dt

    from pyspark.sql import functions as F

    from canal_spark import create_table
    from canal_spark.maintenance import run_pass
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    sf_dir = "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="canal_spark_entry_")
    shutil.rmtree(root, ignore_errors=True)

    table = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = _tokenize_documents(spark, sf_dir).repartition(16)  # fragmented
    append(spark, table, base)

    # binlog-style changelog: updates (doc_id%5==1 -> truncate to 8 tokens),
    # deletes (doc_id%13==0).  Ordinals are pure deterministic expressions
    # (2n+1 for U, 2n+2 for D) — unique per (op, doc), delete-wins on the
    # overlap, and strictly positive, with NO unpartitioned row_number
    # window and no driver-side count() barrier.
    e = dt.datetime(2026, 1, 1)
    num = F.expr("CAST(split(doc_id, ':')[1] AS BIGINT)")
    upd = (
        _tokenize_documents(spark, sf_dir)
        .where(num % 5 == 1)
        .select(
            (num * 2 + 1).cast("long").alias("ordinal"),
            F.lit("U").alias("op"),
            "doc_id",
            F.slice("tokens", 1, 8).alias("tokens"),
            F.least(F.col("n_tok"), F.lit(8)).cast("int").alias("n_tok"),
            "source",
            F.lit(e).alias("es"),
            F.lit(1).cast("long").alias("batch_id"),
        )
    )
    dels = (
        _tokenize_documents(spark, sf_dir)
        .where(num % 13 == 0)
        .select(
            (num * 2 + 2).cast("long").alias("ordinal"),
            F.lit("D").alias("op"),
            "doc_id",
            F.lit(None).cast("array<int>").alias("tokens"),
            F.lit(None).cast("int").alias("n_tok"),
            F.lit(None).cast("string").alias("source"),
            F.lit(e).alias("es"),
            F.lit(2).cast("long").alias("batch_id"),
        )
    )
    changes = upd.unionByName(dels)

    # branch= runs the flagship governance shape: every commit of the
    # pass stages on a branch, one fast-forward publishes (multi-commit
    # write-audit-publish) — same final state as the direct pass, now in
    # the driver-smoke path; bench.py measures its overhead separately.
    run_pass(
        spark, table, changes,
        target_file_bytes=4 << 20, target_file_rows=200,
        keep_snapshots=3, measure=False,
        branch="entry_audit", publish_branch=True,
    )
    result = (
        table.scan(spark)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("n_tok").cast("long").alias("min_tok"),
            F.max("n_tok").cast("long").alias("max_tok"),
        )
        .orderBy("source")
    )
    # materialize before the temp dir could be cleaned by the caller
    return result


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    training-data pipeline ops (dedup / text / similarity)."""
    from canal_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every queries() entry."""
    from canal_spark.operators import all_oracles

    return all_oracles()
