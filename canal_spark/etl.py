"""Full-load ETL: build the token table from a source corpus.

The reference's initial-load path (S7:
client-adapter/rdb/.../RdbEtlService.importData:39-128 — full SELECT,
then chunked parallel import once the row count crosses 10k) restated
declaratively: the source DataFrame is partitioned into
ceil(rows / target_file_rows) writer tasks and appended as one
snapshot, with a lineage row recording volume.  On a cluster the
"chunking" is just Spark parallelism — `spark.read.jdbc(...,
numPartitions)` or a parquet scan both arrive pre-chunked.

`tokenize_documents` is the deterministic corpus -> token-table
transform shared by the driver entry point and the bench: tokens are
60-bit md5 word hashes mod 50257 (pure JVM expressions, cross-checkable
in DuckDB — operators/common.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.format import Table, create_table
from canal_spark.table.writer import append

# null/whitespace-safe: a NULL text must produce tokens=[] / n_tok=0,
# never tokens=NULL / n_tok=-1 (F.size of null is -1 under non-ANSI
# defaults — violating the n_tok == size(tokens) invariant every audit
# and pack_by budget depends on); consecutive/leading spaces must not
# hash phantom md5('') tokens
_TOKENS_EXPR = (
    "transform(filter(split(coalesce(text, ''), ' '), w -> w != ''), "
    "w -> CAST(CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT) % 50257 AS INT))"
)


def tokenize_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, source, ...) -> token-table rows."""
    toks = F.expr(_TOKENS_EXPR)
    return docs.select(
        F.concat_ws(":", "source", F.col("doc_id").cast("string")).alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        "source",
    )


def full_load(
    spark: SparkSession,
    source: DataFrame,
    table_root: str,
    partition_by: list[str] | None = None,
    target_file_rows: int = 500_000,
    min_parallel_rows: int = 10_000,
    lineage_root: str | None = None,
    job_id: str | None = None,
) -> Table:
    """Create + load a token table from ``source`` in one snapshot."""
    import uuid

    from canal_spark.checkpoint import ensure_lineage, record

    job_id = job_id or uuid.uuid4().hex[:12]
    n = source.count()
    table = create_table(
        table_root, TOKEN_TABLE_SCHEMA,
        partition_by=["source"] if partition_by is None else partition_by,
    )
    # chunked parallel import above the threshold, single writer below —
    # the RdbEtlService:76-80 switch, with Spark tasks as the workers.
    # RANGE partitioning (not hash): hash-partitioned files would each
    # span the whole key space, so per-file doc_id min/max never prunes
    # and the FIRST incremental merge would copy-on-write the entire
    # table; range layout gives disjoint key intervals from day one
    # (the one-time sampling job is a rounding error on a full load)
    if n >= min_parallel_rows:
        writers = max(1, -(-n // target_file_rows))
        out = source.repartitionByRange(writers, "doc_id")
    else:
        out = source.coalesce(1)
    snap, entries = append(
        spark, table, out, summary={"phase": "full_load", "job-id": job_id}
    )
    if lineage_root:
        record(
            spark, ensure_lineage(lineage_root), job_id, "full_load",
            snapshot_id=snap.snapshot_id, files_rewritten=len(entries),
            bytes_shuffled=sum(e.bytes for e in entries),
        )
    return table
