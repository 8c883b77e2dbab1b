"""Export a pinned table state as sharded training-ready Parquet.

The consumption half of the tag/branch pinning primitives: a training
job doesn't read the live table (which the maintenance engine keeps
rewriting under it) — it exports a TAGGED snapshot once and reads the
immutable export. This is the delivery role the reference's adapters
play (client-adapter launcher writing downstream stores), re-expressed
as the lakehouse's "publish a training set" step.

Layout contract: ``shards`` output directories (``shard=K/``), each
holding one Parquet file whose rows are in deterministic seeded epoch
order — so data-parallel rank K streams ``shard=K`` sequentially and
the global visit order is the same permutation every re-run
(reproducible training, resumable mid-epoch by file offset).

Scale shape: shard assignment is a seeded md5 hash (uniform, and the
SAME family the `epoch_shuffle` driver query uses), so the one
repartition exchange is balanced; within-shard epoch order is
``sortWithinPartitions`` — a per-shard external sort, NEVER a global
order-by (no single-partition funnel at any corpus size). Each shard
writes one file via the same repartition(shards, key)+partitionBy
trick the table writer uses.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.common import md5int
from canal_spark.table.format import Table


@dataclass
class ExportResult:
    out_dir: str
    snapshot_id: int
    rows: int
    shards: int
    epoch_seed: int


def export_snapshot(
    spark: SparkSession,
    table: Table,
    out_dir: str,
    snapshot_id: int | None = None,
    tag: str | None = None,
    shards: int = 8,
    epoch_seed: int = 0,
    overwrite: bool = False,
) -> ExportResult:
    """Materialize one pinned snapshot (by id, or by tag/branch ref via
    ``tag``) into ``out_dir`` as ``shards`` epoch-ordered Parquet
    shards.  Refuses a non-empty ``out_dir`` unless ``overwrite`` —
    an export is an immutable artifact, not a place to accumulate."""
    if shards < 1:
        raise ValueError("shards must be >= 1")
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        if not overwrite:
            raise FileExistsError(
                f"{out_dir} is not empty — exports are immutable artifacts; "
                "pass overwrite=True to replace it"
            )
    snap = table.resolve_snapshot(snapshot_id, tag=tag)
    if snap is None:
        raise ValueError("table has no snapshot to export")
    df = table.scan(spark, snapshot_id=snap.snapshot_id)
    # the shard/sort-key columns must not SHADE a same-named data
    # column (withColumn silently replaces): the exported values would
    # be corrupted and partitionBy would consume the data column
    for reserved in ("_sg_export_sk", "shard"):
        if reserved in df.columns:
            raise ValueError(
                f"table has a column named {reserved!r}, which the export "
                "shard layout reserves — rename it or export manually"
            )
    # an EMPTY snapshot (tag set pre-load, fully-deleted table) would
    # write only _SUCCESS and the count read-back would crash with
    # UNABLE_TO_INFER_SCHEMA — after overwrite already destroyed the
    # previous good artifact.  Refuse before touching out_dir.
    if df.limit(1).count() == 0:
        raise ValueError(
            f"snapshot {snap.snapshot_id} has no rows — refusing to "
            "replace an export artifact with an empty directory"
        )
    key_col = table.key_cols[0]
    sk = md5int(
        F.concat_ws(
            "#", F.col(key_col).cast("string"), F.lit(str(epoch_seed))
        )
    )
    out = (
        df.withColumn("_sg_export_sk", sk)
        .withColumn(
            "shard", F.pmod(F.col("_sg_export_sk"), F.lit(shards)).cast("int")
        )
        # one balanced exchange on the shard id, then a per-shard
        # external sort — the epoch order never funnels through one task
        .repartition(shards, "shard")
        .sortWithinPartitions("shard", "_sg_export_sk", key_col)
        .drop("_sg_export_sk")
    )
    # always overwrite: the guard above is the immutability contract
    # (empty-or-explicit-overwrite); Spark's errorifexists tests path
    # EXISTENCE, not emptiness, so a pre-created empty out_dir
    # (mkdir -p orchestration) would fail the write despite passing
    # the guard
    out.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    rows = spark.read.parquet(out_dir).count()
    return ExportResult(
        out_dir=out_dir,
        snapshot_id=snap.snapshot_id,
        rows=rows,
        shards=shards,
        epoch_seed=epoch_seed,
    )
