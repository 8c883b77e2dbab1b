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


def flat_message_col(database: str = "lakehouse", table: str = "tokens"):
    """FlatMessage JSON envelope for a changelog row (A12 wire shape)."""
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
    return F.to_json(
        F.struct(
            F.lit(database).alias("database"),
            F.lit(table).alias("table"),
            op_name.alias("type"),
            F.unix_millis(F.col("es")).alias("es"),
            F.unix_millis(F.current_timestamp()).alias("ts"),
            F.array(F.lit("doc_id")).alias("pkNames"),
            F.array(data_map).alias("data"),
        )
    )


def deliver_flat_messages(
    changes: DataFrame,
    out_dir: str,
    lanes: int = 8,
    topic_expr: str = DEFAULT_TOPIC_EXPR,
    database: str = "lakehouse",
    table: str = "tokens",
) -> None:
    """Write the changelog as `{out_dir}/topic=*/lane=*/part-*.json`,
    each lane file ordered by ordinal (a Kafka-partition stand-in)."""
    routed = changes.select(
        F.expr(topic_expr).alias("topic"),
        F.pmod(F.xxhash64("doc_id"), F.lit(lanes)).cast("int").alias("lane"),
        F.col("ordinal"),
        flat_message_col(database, table).alias("value"),
    )
    (
        routed.repartition(lanes, "topic", "lane")
        .sortWithinPartitions("topic", "lane", "ordinal")
        .drop("ordinal")
        .write.partitionBy("topic", "lane")
        .mode("overwrite")
        .format("text")
        .save(out_dir)
    )
