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
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from canal_spark.merge import merge_into
from canal_spark.schema import CHANGELOG_SCHEMA
from canal_spark.table.format import Table


# FlatMessage wire envelope as produced by deliver.build_mq_frame /
# deliver_kafka (protocol/.../FlatMessage.java; `old` carries ONLY the
# changed columns of an UPDATE, RdbSyncService.update:296-314)
FLAT_MESSAGE_WIRE_SCHEMA = (
    "database string, table string, type string, es bigint, ts bigint, "
    "pkNames array<string>, data array<map<string,string>>, "
    "old array<map<string,string>>"
)


def kafka_changelog_frame(raw: DataFrame) -> DataFrame:
    """Decode a Kafka-source frame into the engine's changelog frame —
    the ingest half of C7, symmetric with ``deliver_kafka``
    (CanalKafkaProducer.java:81-190 produce side,
    CanalAdapterKafkaWorker consume side).

    ``raw`` has Spark's Kafka source columns (key/value binary, topic,
    partition, offset, timestamp); works identically on a batch frame
    with the same columns (how the sandbox tests it, brokers absent).

    A FlatMessage BATCHES rows (``data`` is an array —
    MQMessageUtils.messageConverter packs a whole get() batch into one
    message); every element is exploded into its own changelog row,
    paired with its ``old[i]`` before-image.  Non-row-change messages
    (DDL: type=CREATE/ALTER/..., data=null) are dropped — DDL flows
    through ``Table.evolve_schema``, not the row path.

    Positions map onto merge's GTID mode: ``ordinal`` encodes
    (offset, row-in-message) as ``((offset + 1) << 16) + row_idx`` —
    THE v1 mark format of this ingest path: strictly monotone in
    Kafka's consumption order (row counts per message are bounded
    below 2^16 — Canal's canalBatchSize default is 50 — and violations
    raise rather than spill into the next offset's range), and the +1
    keeps every partition's offset-0 message applied (merge filters
    ``ordinal > mark`` with unseen streams at 0).  ``stream_id`` =
    ``topic-partition`` — per-partition replays filter to no-ops
    independently.

    Strictness: DDL messages drop; an UNPARSEABLE value or a row-change
    message missing its key RAISES (a malformed message silently
    skipped while the checkpoint advances would be permanent data
    loss with zero signal).  All decode is JVM-side
    from_json/posexplode/casts.
    """
    m = F.from_json(F.col("value").cast("string"), FLAT_MESSAGE_WIRE_SCHEMA)
    # one output row per data[] element; a null data array (DDL, or
    # unparseable JSON) is kept as ONE placeholder row so the
    # malformed-message guard below can still see and reject it —
    # posexplode of null would silently drop it before any check runs
    data_or_probe = F.coalesce(
        m["data"], F.array(F.lit(None).cast("map<string,string>"))
    )
    rows = raw.select(
        "topic", "partition", "offset",
        # PERMISSIVE from_json turns corrupt JSON into an ALL-NULL
        # struct (not a null struct); every valid FlatMessage carries
        # `type`, so a NON-NULL value with a null type is the
        # unparseable signature.  A null VALUE is a compaction
        # tombstone — a benign, well-known Kafka record kind that must
        # DROP (raising would wedge the stream at that offset forever).
        (F.col("value").isNotNull() & m["type"].isNull()).alias("_bad_json"),
        m["type"].alias("_mtype"),
        m["es"].alias("_es"),
        m["old"].alias("_old"),
        F.posexplode(data_or_probe).alias("_idx", "_cells"),
    )
    op = (
        F.when(F.col("_mtype") == "INSERT", "I")
        .when(F.col("_mtype") == "UPDATE", "U")
        .when(F.col("_mtype") == "DELETE", "D")
    )  # anything else (DDL) -> null op, dropped by the guard filter
    cells = F.col("_cells")
    old = F.col("_old")[F.col("_idx")]
    doc_id = cells["doc_id"]
    malformed = (
        F.col("_bad_json")
        | (op.isNotNull() & doc_id.isNull())
        | (F.col("_idx") >= (1 << 16))
    )
    # the guard IS the filter: evaluating the keep-condition raises on
    # malformed rows (so Catalyst cannot optimize the check away), keeps
    # row changes, and drops DDL
    keep = F.when(
        malformed,
        F.raise_error(
            F.concat(
                F.lit("malformed FlatMessage: topic="), F.col("topic"),
                F.lit(" partition="), F.col("partition").cast("string"),
                F.lit(" offset="), F.col("offset").cast("string"),
            )
        ).cast("boolean"),
    ).otherwise(op.isNotNull())
    return (
        rows.withColumn("_op", op)
        .where(keep)
        .select(
            (
                ((F.col("offset").cast("long") + 1) * F.lit(1 << 16))
                + F.col("_idx")
            ).alias("ordinal"),
            F.col("_op").alias("op"),
            doc_id.alias("doc_id"),
            # D rows carry NO after-image by changelog contract; Canal's
            # DELETE convention puts the deleted row's image in data[]
            # (RdbSyncService.delete builds from `data`), so those cells
            # are the BEFORE image — normalized below, never left here
            F.when(
                F.col("_op") != "D", F.from_json(cells["tokens"], "array<int>")
            ).alias("tokens"),
            F.when(F.col("_op") != "D", cells["n_tok"].cast("int")).alias("n_tok"),
            # D rows carry source=null by changelog contract; doc_id
            # embeds the source prefix for I/U (deliver routes on it)
            F.when(F.col("_op") != "D", F.split(doc_id, ":")[0]).alias("source"),
            F.timestamp_millis(F.col("_es")).alias("es"),
            F.lit(None).cast("long").alias("batch_id"),
            # before-image: `old[i]` when the producer sent one (this
            # engine's deliver always does for U/D); a Canal-convention
            # DELETE (old=null, image in data[]) falls back to the data
            # cells — either way the prior image lands in before_*
            F.coalesce(
                F.from_json(old["tokens"], "array<int>"),
                F.when(
                    F.col("_op") == "D",
                    F.from_json(cells["tokens"], "array<int>"),
                ),
            ).alias("before_tokens"),
            F.coalesce(
                old["n_tok"].cast("int"),
                F.when(F.col("_op") == "D", cells["n_tok"].cast("int")),
            ).alias("before_n_tok"),
            F.concat_ws("-", "topic", F.col("partition").cast("string")).alias(
                "stream_id"
            ),
        )
    )


def stream_changelog_reader(
    spark: SparkSession,
    changelog_dir: str,
    max_files_per_trigger: int | None = None,
    reader: str = "files",  # "files" | "kafka"
    kafka_options: dict[str, str] | None = None,
    kafka_subscribe_mode: str = "subscribe",  # "subscribe" | "subscribePattern" | "assign"
) -> DataFrame:
    """Streaming changelog frame from either source.

    * ``reader="files"``: parquet file-stream over ``changelog_dir``
      (S2's LocalBinLogConnection analogue);
    * ``reader="kafka"``: ``readStream.format("kafka")`` with
      ``changelog_dir`` as the topic list (``kafka_subscribe_mode=
      "subscribe"``, comma-separated literal topics — the default),
      a regex (``"subscribePattern"``, e.g. ``tokens\\..*`` for
      deliver's per-source topics), or explicit partitions
      (``"assign"``); decoded by :func:`kafka_changelog_frame` (S1's
      network dump analogue — requires the spark-sql-kafka package +
      brokers; the decode logic itself is broker-independent and
      unit-tested).  Flow control via
      ``kafka_options={"maxOffsetsPerTrigger": ...}`` (the MEMSIZE-style
      batch cap) plus bootstrap servers etc.
    """
    if reader == "kafka":
        if kafka_subscribe_mode not in ("subscribe", "subscribePattern", "assign"):
            raise ValueError(f"unknown kafka_subscribe_mode {kafka_subscribe_mode!r}")
        r = spark.readStream.format("kafka").option(
            kafka_subscribe_mode, changelog_dir
        )
        opts = dict(kafka_options or {})
        # a fresh checkpoint must consume the EXISTING backlog: Spark's
        # default startingOffsets is 'latest', which would silently skip
        # every already-produced message on first run — the exact
        # data-loss-with-zero-signal class the decode guard exists for
        opts.setdefault("startingOffsets", "earliest")
        for k, v in opts.items():
            r = r.option(k, str(v))
        return kafka_changelog_frame(r.load())
    if reader != "files":
        raise ValueError(f"unknown reader {reader!r}")
    r = spark.readStream.schema(CHANGELOG_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(changelog_dir)


# A continuously-running query commits one entry per trigger forever;
# unbounded per-epoch histories would be a slow driver leak in the
# always-on fleet mode, so each list keeps the most recent window and
# the *_total counters carry the lifetime truth (what health() reads).
MAX_EPOCH_HISTORY = 256


@dataclass
class StreamApplyResult:
    batches_seen: int = 0
    batches_applied: int = 0
    merges: list = field(default_factory=list)
    # WAP mode: micro-batches whose staged merge failed the audit and
    # was aborted — {epoch, checks}; their ordinals stay above the hwm
    quarantined: list = field(default_factory=list)
    # per-micro-batch derived-store syncs (band/IVF index): {epoch,
    # kind, applied, files_rewritten}
    index_refreshes: list = field(default_factory=list)
    # lifetime counts (the lists above are windows of the most recent
    # MAX_EPOCH_HISTORY entries each)
    merges_total: int = 0
    quarantined_total: int = 0
    index_refreshes_total: int = 0

    def _push(self, lst: list, entry: dict) -> None:
        lst.append(entry)
        if len(lst) > MAX_EPOCH_HISTORY:
            del lst[: len(lst) - MAX_EPOCH_HISTORY]


@dataclass
class StreamApplyHandle:
    """A RUNNING continuous apply query (``stream_apply(return_query=
    True)``): the supervisor owns the lifecycle.  ``result`` fills in
    live as micro-batches commit (the foreachBatch closure runs on the
    driver, so reading it from the supervising thread is safe)."""

    query: "StreamingQuery"
    result: StreamApplyResult

    def stop(self, await_seconds: float | None = 30.0) -> StreamApplyResult:
        """Graceful stop: halt the trigger loop, wait for the in-flight
        micro-batch to finish (merge commits are atomic either way —
        a killed batch just replays on restart)."""
        self.query.stop()
        self.query.awaitTermination(timeout=await_seconds)
        return self.result


def stream_apply(
    spark: SparkSession,
    table: Table,
    changelog_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    target_file_rows: int = 200_000,
    available_now: bool = True,
    await_seconds: float | None = None,
    reader: str = "files",
    kafka_options: dict[str, str] | None = None,
    kafka_subscribe_mode: str = "subscribe",
    merge_mode: str = "cow",
    max_pending_delete_files: int | None = None,
    convert_eq_debt_files: int | None = None,
    rewrite_pos_debt_files: int | None = None,
    wap: bool = False,
    wap_max_delete_fraction: float | None = None,
    quarantine_dir: str | None = None,
    transform=None,
    return_query: bool = False,
    band_index: "Table | None" = None,
    ivf_index: "Table | None" = None,
    ivf_emb_col: str = "embedding",
) -> StreamApplyResult | StreamApplyHandle:
    """Run the streaming apply loop; with ``available_now`` (default)
    drains everything currently in ``changelog_dir`` then stops —
    the batch-oriented test/ops mode.  Set ``available_now=False``
    + ``await_seconds`` for a continuously-running stream.

    ``merge_mode="mor"`` is the low-latency shape: each micro-batch
    commits O(batch) equality-delete + upsert files with zero base-table
    rewrites, keeping trigger latency flat no matter how wide the
    batch's keys spray; set ``max_pending_delete_files`` to fold the
    accumulated delete debt inline once that many pile up (leave None to
    defer repayment entirely to the next maintenance pass).
    ``convert_eq_debt_files`` is the cheaper middle policy: once that
    many EQUALITY-delete files accumulate (below the materialize
    threshold), convert them to position deletes
    (``merge.convert_eq_deletes`` — zero data rewrites) so readers in
    the window pay the 2-key anti-join instead of the key+sequence
    join; the one conversion scan amortizes across that many
    micro-batches, keeping trigger latency flat.
    ``rewrite_pos_debt_files`` consolidates pos-delete files once that
    many accumulate (merges small delete files, GCs dangling rows, zero
    data rewrites).

    ``wap=True`` write-audit-publishes EVERY micro-batch: the merge is
    staged, audited (key uniqueness, token-array invariant, optional
    ``wap_max_delete_fraction`` runaway-delete bound) and published —
    or aborted, in which case the batch is QUARANTINED in
    ``result.quarantined`` and the stream keeps going: the hwm never
    advanced, so after the upstream fix a replay of the quarantined
    ordinals applies cleanly while already-published batches replay to
    no-ops.  Readers of the table only ever see audited snapshots.

    ``transform`` (optional) rewrites the streaming frame before the
    sink — the instance server uses it for the per-destination
    source white/black filters.  ``return_query=True`` starts the
    continuous query and returns a :class:`StreamApplyHandle`
    immediately instead of blocking — the multi-instance supervisor's
    mode (its caller owns stop/health).

    ``band_index`` / ``ivf_index`` (optional) keep the derived stores
    in sync PER MICRO-BATCH: after each applied merge the batch's
    changed keys refresh the MinHash band index / IVF cell index
    through the same manifest-pruned incremental path the batch pass
    uses — the always-on shape of the reference's adapter sync
    (ESSyncService syncs the derived view per consumed batch, not per
    maintenance window).  Work per trigger is O(batch + overlapping
    index files); a crash between merge and refresh self-heals: the
    epoch replays to a merge no-op and the refresh re-runs with the
    same keys (idempotent), and the next corpus_dedup/semantic_prune
    pass folds any residual drift."""
    if not return_query and not available_now and await_seconds is None:
        raise ValueError(
            "available_now=False with await_seconds=None (and no "
            "return_query) would block in awaitTermination forever — "
            "pass await_seconds, or return_query=True to own the "
            "lifecycle"
        )
    result = StreamApplyResult()
    # WAP delete-bound denominator, maintained incrementally: computed
    # once on the first epoch, then replaced by each PUBLISHED epoch's
    # audited live count — never a per-trigger O(table) scan (which a
    # debt-carrying MoR stream would otherwise pay on EVERY batch, its
    # delete_files() being permanently non-empty).  Row-preserving
    # concurrent rewrites (compact/cluster) don't drift it; a restart
    # recomputes it fresh.
    parent_rows_cache: list[int] = []

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        result.batches_seen += 1
        # refresh: another writer (compaction) may have committed between
        # micro-batches; merge must see the latest snapshot + hwm
        t = table.refresh()
        if wap:
            from canal_spark.maintenance import wap_finalize, wap_parent_rows

            if not parent_rows_cache:
                parent_rows_cache.append(wap_parent_rows(spark, t))
            parent_rows = parent_rows_cache[0]
        m = merge_into(
            spark, t, batch_df, target_file_rows=target_file_rows,
            mode=merge_mode, stage_only=wap,
        )
        if wap and m.applied:
            # the shared gate: publishes, or aborts the stage on EVERY
            # failure path — an exception (e.g. publish CommitConflict
            # under concurrent compaction) propagates, failing the
            # query so Structured Streaming re-runs the epoch against
            # the new base; nothing staged ever leaks
            fin = wap_finalize(
                spark, t, m,
                parent_rows=parent_rows,
                max_delete_fraction=wap_max_delete_fraction,
            )
            if not fin["published"]:
                entry = {"epoch": epoch_id, "checks": fin["checks"]}
                if quarantine_dir is not None:
                    # dead-letter the batch for offline triage/replay —
                    # epoch-keyed dir so a retried epoch overwrites its
                    # own quarantine rather than duplicating it
                    dest = f"{quarantine_dir}/epoch={epoch_id:020d}"
                    batch_df.write.mode("overwrite").parquet(dest)
                    entry["quarantine_path"] = dest
                result.quarantined_total += 1
                result._push(result.quarantined, entry)
                return
            # the published snapshot's audited live count IS the next
            # epoch's delete-bound denominator
            parent_rows_cache[0] = int(fin["rows"])
        # one manifest walk serves both debt thresholds — this runs on
        # the latency-sensitive trigger path of an always-on stream
        dels = t.delete_files()
        if (
            max_pending_delete_files is not None
            and len(dels) >= max_pending_delete_files
        ):
            from canal_spark.merge import materialize_deletes

            materialize_deletes(spark, t)
        elif (
            convert_eq_debt_files is not None
            and sum(1 for d in dels if d.content == "eq-deletes")
            >= convert_eq_debt_files
        ):
            from canal_spark.merge import convert_eq_deletes

            convert_eq_deletes(spark, t)
        if (
            rewrite_pos_debt_files is not None
            and len(t.pos_delete_files()) >= rewrite_pos_debt_files
        ):
            from canal_spark.merge import rewrite_pos_deletes

            rewrite_pos_deletes(spark, t, min_files=rewrite_pos_debt_files)
        if m.applied:
            result.batches_applied += 1
            result.merges_total += 1
            result._push(
                result.merges,
                {"epoch": epoch_id, "hwm": m.high_water_mark,
                 "snapshot_id": m.snapshot_id, "rows_upserted": m.rows_upserted},
            )
        if band_index is not None or ivf_index is not None:
            # sync even on a no-op merge: a replayed epoch whose merge
            # no-ops may still be repairing a crash that landed between
            # last epoch's merge and its index refresh
            keys = batch_df.select(t.key_cols[0]).distinct()
            if band_index is not None:
                from canal_spark.dedup_index import refresh_band_index

                # refresh(): the handle is stale after the PREVIOUS
                # epoch's index commit — planning the rewrite from old
                # metadata drops rows
                # report_candidates=False: the dup-candidate metrics
                # cost an index semi-join + two extra actions per
                # trigger and this path never reads them (the batch
                # pass does; a stream consults corpus_dedup instead)
                rb = refresh_band_index(
                    spark, t, band_index.refresh(), keys=keys,
                    report_candidates=False,
                )
                result.index_refreshes_total += 1
                result._push(
                    result.index_refreshes,
                    {"epoch": epoch_id, "kind": "band",
                     "applied": rb.applied,
                     "files_rewritten": rb.files_rewritten},
                )
            if ivf_index is not None:
                from canal_spark.ann_index import refresh_ivf_index

                rv = refresh_ivf_index(
                    spark, t, ivf_index.refresh(), keys=keys,
                    emb_col=ivf_emb_col,
                )
                result.index_refreshes_total += 1
                result._push(
                    result.index_refreshes,
                    {"epoch": epoch_id, "kind": "ivf",
                     "applied": rv.applied,
                     "files_rewritten": rv.files_rewritten},
                )

    stream = stream_changelog_reader(
        spark, changelog_dir, max_files_per_trigger,
        reader=reader, kafka_options=kafka_options,
        kafka_subscribe_mode=kafka_subscribe_mode,
    )
    if transform is not None:
        stream = transform(stream)
    w = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if return_query:
        q = w.trigger(processingTime="1 second").start()
        return StreamApplyHandle(query=q, result=result)
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = w.trigger(processingTime="1 second").start()
        q.awaitTermination(timeout=await_seconds)
        q.stop()
        q.awaitTermination()
    return result
