"""Changelog delivery: export change streams as FlatMessage JSON in
pk-hash-partitioned, per-topic lanes.

The reference's MQ delivery path (C7: CanalMQStarter worker ->
topic routing MQMessageUtils.messageTopics:107-148 -> pk-hash
partitioning messagePartition:158-241 -> Kafka/RocketMQ producer)
restated as a distributed file sink: each output lane is an ordered
JSON-lines file, the unit a Kafka partition would consume.  Swap the
writer for `df.write.format("kafka")` on a cluster with brokers —
the routing/partitioning/envelope logic is identical.

Invariants preserved from the reference:
- per-key order: all changes of one doc_id land in ONE lane, ordered
  by ordinal (P1/P3 — same pk never applied out of order);
- DDL/topic isolation: routing first, hashing within topic;
- FlatMessage envelope: {database, table, type, es, ts, pkNames,
  data[{col->string}]} — stringly-typed cells exactly like
  protocol/.../FlatMessage.java.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Route on the doc_id prefix, not the row's `source` column: D rows carry
# source=null, so routing on source would send a key's deletes to a
# different topic than its inserts/updates — a consumer of one topic/lane
# would never see the delete.  doc_id embeds the source prefix and is
# delete-stable, preserving the per-key single-(topic, lane) invariant
# (the reference routes by static table config for the same reason,
# server/.../MQMessageUtils.messageTopics:107-148).
DEFAULT_TOPIC_EXPR = "concat('tokens.', split(doc_id, ':')[0])"


def flat_message_col(
    database: str = "lakehouse", table: str = "tokens", with_old: bool = False
):
    """FlatMessage JSON envelope for a changelog row (A12 wire shape).

    ``with_old=True`` (requires the changelog's before-image columns)
    adds the ``old`` field: one map per row holding ONLY the columns
    whose value actually changed — the reference's UPDATE wire contract
    (FlatMessage.java ``old``; RdbSyncService.update:296-314 sets only
    changed columns).  Null for INSERT/DELETE and when nothing changed.
    """
    op_name = (
        F.when(F.col("op") == "I", "INSERT")
        .when(F.col("op") == "U", "UPDATE")
        .otherwise("DELETE")
    )
    data_map = F.map_from_arrays(
        F.array(F.lit("doc_id"), F.lit("n_tok"), F.lit("tokens")),
        F.array(
            F.col("doc_id"),
            F.col("n_tok").cast("string"),
            F.to_json(F.col("tokens")),
        ),
    )
    fields = [
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        op_name.alias("type"),
        F.unix_millis(F.col("es")).alias("es"),
        F.unix_millis(F.current_timestamp()).alias("ts"),
        F.array(F.lit("doc_id")).alias("pkNames"),
        F.array(data_map).alias("data"),
    ]
    if with_old:
        # array<struct<k,v,changed>> -> filter changed -> map  (all JVM)
        cells = F.array(
            F.struct(
                F.lit("tokens").alias("k"),
                F.to_json(F.col("before_tokens")).alias("v"),
                (~F.col("before_tokens").eqNullSafe(F.col("tokens"))).alias("chg"),
            ),
            F.struct(
                F.lit("n_tok").alias("k"),
                F.col("before_n_tok").cast("string").alias("v"),
                (~F.col("before_n_tok").eqNullSafe(F.col("n_tok"))).alias("chg"),
            ),
        )
        changed = F.filter(cells, lambda s: s["chg"])
        old_map = F.map_from_entries(
            F.transform(changed, lambda s: F.struct(s["k"], s["v"]))
        )
        has_before = F.col("before_tokens").isNotNull() | F.col(
            "before_n_tok"
        ).isNotNull()
        fields.append(
            F.when(
                # U AND D: the changelog contract puts the prior image in
                # before_* for both (schema.py), and the decode side reads
                # old[] first — emitting old only for U would strip the
                # DELETE's before-image from every deliver->ingest trip
                F.col("op").isin("U", "D") & has_before & (F.size(changed) > 0),
                F.array(old_map),
            ).alias("old")
        )
    return F.to_json(F.struct(*fields))


@dataclass(frozen=True)
class SinkProfile:
    """How a frame's ``lane`` maps onto a sink's physical unit (Kafka
    partition / RocketMQ queue) — the per-destination partition config
    of MQProperties.CanalDestination, sink-agnostic.

    The three RocketMQ placement modes
    (server/.../rocketmq/CanalRocketMQProducer.java:92-101,152-167,
    175-213 and MQMessageUtils.messagePartition:381-458), which are a
    superset of the Kafka ones:

    * ``fixed_partition`` set -> every message to that ONE queue
      (``mqs.get(destination.getPartition())``); must be < ``queues``
      — the reference's MessageQueueSelector raises
      "partition number is error" past the queue count
      (CanalRocketMQProducer.java:126), we raise at frame-build time;
    * ``hash_cols`` set -> pk-hash over THOSE columns instead of the
      table pk (the ``db.table:col1^col2`` pkHashConfigs form);
    * ``table_hash``    -> hash the table name only, all rows of one
      table in one queue (the ``db.table`` hash-by-table form,
      MQMessageUtils HashMode.tableHash);
    * none of the above -> auto pk-hash (``.*\\..*:$pk$``), the
      existing doc_id lane.

    Hash fidelity note: placement uses xxhash64 uniformly, not Java's
    ``String.hashCode`` XOR fold — the preserved invariant is per-key
    stable single-queue order, not hash-value equality.
    """

    queues: int = 8
    fixed_partition: int | None = None
    hash_cols: tuple[str, ...] | None = None
    table_hash: bool = False

    def lane_col(self, table: str):
        if self.fixed_partition is not None:
            if not (0 <= self.fixed_partition < self.queues):
                raise ValueError(
                    f"partition number is error, config num: "
                    f"{self.fixed_partition}, mq num: {self.queues}"
                )
            return F.lit(self.fixed_partition).cast("int")
        if self.table_hash:
            return F.pmod(F.xxhash64(F.lit(table)), F.lit(self.queues)).cast("int")
        cols = list(self.hash_cols) if self.hash_cols else ["doc_id"]
        return F.pmod(F.xxhash64(*cols), F.lit(self.queues)).cast("int")


def build_mq_frame(
    changes: DataFrame,
    lanes: int = 8,
    topic_expr: str = DEFAULT_TOPIC_EXPR,
    database: str = "lakehouse",
    table: str = "tokens",
    profile: SinkProfile | None = None,
) -> DataFrame:
    """The producer frame all writers share: (topic, lane, key, ordinal,
    value) with identical routing/partitioning/envelope logic — the
    MQMessageUtils half of CanalMQStarter, independent of the sink.
    ``profile`` overrides the default auto-pk lane placement (see
    SinkProfile); ``lanes`` is shorthand for the default profile's
    queue count."""
    if profile is None:
        profile = SinkProfile(queues=lanes)
    # a frame may capture only ONE before-image column (merge supports
    # per-column before_pairs); flat_message_col references both, so
    # fill the absent one with a typed null instead of failing analysis
    with_old = any(
        c in changes.columns for c in ("before_tokens", "before_n_tok")
    )
    if with_old:
        if "before_tokens" not in changes.columns:
            changes = changes.withColumn(
                "before_tokens", F.lit(None).cast("array<int>")
            )
        if "before_n_tok" not in changes.columns:
            changes = changes.withColumn("before_n_tok", F.lit(None).cast("int"))
    return changes.select(
        F.expr(topic_expr).alias("topic"),
        profile.lane_col(table).alias("lane"),
        F.col("doc_id").alias("key"),
        F.col("ordinal"),
        flat_message_col(database, table, with_old=with_old).alias("value"),
    )


def deliver_kafka(
    changes: DataFrame,
    bootstrap_servers: str,
    lanes: int = 8,
    topic_expr: str = DEFAULT_TOPIC_EXPR,
    database: str = "lakehouse",
    table: str = "tokens",
) -> None:
    """Kafka producer path (C7, CanalKafkaProducer.java:81-190): the
    same frame, written with Spark's kafka sink — `partition` pins the
    pk-hash lane so per-key order survives into the Kafka partition,
    exactly like the reference's messagePartition routing.

    Requires the spark-sql-kafka package + brokers; not exercisable in
    the sandbox (unit tests cover the frame contract instead).
    """
    frame = build_mq_frame(changes, lanes, topic_expr, database, table)
    (
        frame.select(
            F.col("key").cast("string"),
            F.col("value").cast("string"),
            "topic",
            F.col("lane").cast("int").alias("partition"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .save()
    )


def deliver_rocketmq(
    changes: DataFrame,
    namesrv_addr: str,
    producer_group: str = "canal_spark",
    profile: SinkProfile | None = None,
    topic_expr: str = DEFAULT_TOPIC_EXPR,
    database: str = "lakehouse",
    table: str = "tokens",
) -> None:
    """RocketMQ producer path (C7, CanalRocketMQProducer.java:62-213):
    the SAME frame as the Kafka/file sinks, placed per SinkProfile and
    sent with an executor-side producer whose MessageQueueSelector pins
    ``mqs.get(lane)`` — per-key single-queue order survives exactly as
    in the reference.

    Messages within one (topic, lane) are sent in ordinal order from a
    single task (the frame is repartitioned on the lane key first), so
    queue order equals changelog order.  Requires the `rocketmq`
    python client + a nameserver; not available in the sandbox (unit
    tests cover the frame contract instead).
    """
    profile = profile or SinkProfile()
    frame = build_mq_frame(
        changes, topic_expr=topic_expr, database=database, table=table,
        profile=profile,
    )
    routed = frame.repartition(profile.queues, "topic", "lane").sortWithinPartitions(
        "topic", "lane", "ordinal"
    )

    def _send(rows) -> None:
        from rocketmq.client import Message, Producer  # import-gated

        producer = Producer(producer_group)
        producer.set_name_server_address(namesrv_addr)
        producer.start()
        try:
            for r in rows:
                msg = Message(r["topic"])
                msg.set_keys(r["key"])
                msg.set_body(r["value"])
                # queue selector analogue: the client's send_orderly
                # sharding key pins the queue by lane, like
                # mqs.get(index) in CanalRocketMQProducer.java:121-131
                producer.send_orderly_with_sharding_key(msg, str(r["lane"]))
        finally:
            producer.shutdown()

    routed.foreachPartition(_send)


def deliver_flat_messages(
    changes: DataFrame,
    out_dir: str,
    lanes: int = 8,
    topic_expr: str = DEFAULT_TOPIC_EXPR,
    database: str = "lakehouse",
    table: str = "tokens",
    batch_id: int | None = None,
) -> int:
    """Write one delivery batch as
    ``{out_dir}/batch=<id>/topic=*/lane=*/part-*.txt``, each lane file
    ordered by ordinal (a Kafka-partition stand-in).  Returns the batch
    id used.

    Batch-keyed subdirectories give the file sink the two Kafka-path
    properties a bare append or overwrite each lose:

    * **re-delivery idempotence** — the same batch (same ``batch_id``,
      default: the batch's max ordinal, deterministic for a given
      changelog slice) overwrites ONLY its own subdir, never
      duplicating messages on a retry.  Multi-stream changelogs
      (a ``stream_id`` column: GTID/Kafka-ingested frames) have
      per-stream ordinals that overlap across streams, so the default
      id mixes a fingerprint of the batch's distinct stream ids into
      the low digits — two batches from different stream subsets can
      no longer collide (and silently overwrite each other).  An
      EMPTY frame has no deterministic id at all and raises: pass an
      explicit ``batch_id`` if empty deliveries must be recorded;
    * **recoverable cross-batch order** — prior batches' files are
      untouched, and a consumer replays batch dirs in zero-padded id
      order then lanes within (bare append would restart part-file
      numbering at part-00000 every batch with the ordinal dropped
      from the payload, making interleaved-name replay silently
      reorder batches).  Ordered replay REQUIRES ids monotone with
      delivery order: the single-stream default (max ordinal) is; the
      multi-stream default is NOT — it guarantees only uniqueness
      (a later batch covering a smaller stream subset can get a
      smaller id: {s1≤100, s2≤50} then {s2 51..60} sorts the second
      batch first and reorders s2).  Multi-stream deliverers that
      replay by dir order must pass an explicit monotone ``batch_id``
      from their delivery sequence, exactly as a Kafka producer owns
      its offsets.
    """
    # the default batch id needs ONE extra action over `changes`; persist
    # so the id and the written rows come from the SAME materialization
    # (a live/growing source re-scanned between the two actions could
    # name the directory for a different slice than it contains) and the
    # upstream derivation is not computed twice
    _persisted = None
    if batch_id is None:
        _persisted = changes = changes.persist()
    routed = build_mq_frame(changes, lanes, topic_expr, database, table).drop("key")
    if batch_id is None:
        has_streams = "stream_id" in changes.columns
        aggs = [F.max("ordinal").alias("m"), F.count(F.lit(1)).alias("n")]
        if has_streams:
            aggs.append(F.collect_set("stream_id").alias("sids"))
        row = changes.agg(*aggs).collect()[0]
        if int(row["n"]) == 0:
            raise ValueError(
                "empty delivery frame has no deterministic default "
                "batch_id (0 would overwrite a real batch 0); pass an "
                "explicit batch_id"
            )
        batch_id = int(row["m"] or 0)
        sids = sorted(str(s) for s in (row["sids"] or [])) if has_streams else []
        if sids:
            # per-stream ordinals overlap across streams — max ordinal
            # alone is not unique.  crc32 of the sorted stream-id set is
            # deterministic across runs (re-delivery hits the same dir)
            # and keeps ids monotone within one stream subset.
            fp = zlib.crc32(",".join(sids).encode()) % 1_000_000
            batch_id = batch_id * 1_000_000 + fp
    try:
        (
            routed.repartition(lanes, "topic", "lane")
            .sortWithinPartitions("topic", "lane", "ordinal")
            .drop("ordinal")
            .write.partitionBy("topic", "lane")
            .mode("overwrite")  # scoped to THIS batch's subdir only
            .format("text")
            .save(f"{out_dir}/batch={batch_id:020d}")
        )
    finally:
        if _persisted is not None:
            _persisted.unpersist()
    return batch_id
