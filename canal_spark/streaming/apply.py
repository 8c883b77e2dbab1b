"""Streaming CDC apply: changelog file stream -> MERGE INTO per micro-batch.

Maps the reference's consumer loop (client-adapter/launcher/...
/CanalAdapterWorker.java:83-135 — getWithoutAck -> sync -> ack,
rollback+retry on error) onto Structured Streaming:

- source discovery / ordering  = file-stream source over the staged
  changelog directory (S2's LocalBinLogConnection analogue);
- get/ack cursor               = the stream's checkpointLocation
  (offsets) PLUS the table's merge high-water mark — the latter is
  authoritative, so a replayed micro-batch (crash before the stream
  checkpoint commits, after the table commit) filters to a no-op;
- apply                        = `merge_into` (salted/skew-aware COW
  MERGE), one atomic table snapshot per micro-batch = the reference's
  per-batch transaction (BatchExecutor commit).

Scale notes: the file source lists incrementally (maxFilesPerTrigger
caps batch size, the MEMSIZE-style flow control of
store/.../MemoryEventStoreWithBuffer.java:308-330); each micro-batch
is small next to the table, so the merge join broadcasts the batch
side and prunes target files by manifest min/max.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from canal_spark.merge import merge_into
from canal_spark.schema import CHANGELOG_SCHEMA
from canal_spark.table.format import Table


def stream_changelog_reader(
    spark: SparkSession,
    changelog_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame over a directory of changelog parquet files."""
    r = spark.readStream.schema(CHANGELOG_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(changelog_dir)


@dataclass
class StreamApplyResult:
    batches_seen: int = 0
    batches_applied: int = 0
    merges: list = field(default_factory=list)


def stream_apply(
    spark: SparkSession,
    table: Table,
    changelog_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    target_file_rows: int = 200_000,
    available_now: bool = True,
    await_seconds: float | None = None,
) -> StreamApplyResult:
    """Run the streaming apply loop; with ``available_now`` (default)
    drains everything currently in ``changelog_dir`` then stops —
    the batch-oriented test/ops mode.  Set ``available_now=False``
    + ``await_seconds`` for a continuously-running stream."""
    result = StreamApplyResult()

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        result.batches_seen += 1
        # refresh: another writer (compaction) may have committed between
        # micro-batches; merge must see the latest snapshot + hwm
        t = table.refresh()
        m = merge_into(spark, t, batch_df, target_file_rows=target_file_rows)
        if m.applied:
            result.batches_applied += 1
            result.merges.append(
                {"epoch": epoch_id, "hwm": m.high_water_mark,
                 "snapshot_id": m.snapshot_id, "rows_upserted": m.rows_upserted}
            )

    stream = stream_changelog_reader(spark, changelog_dir, max_files_per_trigger)
    w = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = w.trigger(processingTime="1 second").start()
        q.awaitTermination(timeout=await_seconds)
        q.stop()
        q.awaitTermination()
    return result
