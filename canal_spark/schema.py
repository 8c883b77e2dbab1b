"""Canonical schemas: the token table and the binlog-style changelog.

Token table shape is fixed by BASELINE.json.input_hint:
``(doc_id string, tokens array<int>, n_tok int, source string)``.

The changelog mirrors the reference's row-change protocol
(protocol/.../EntryProtocol.proto:111-153 — RowChange with
INSERT/UPDATE/DELETE event types and before/after images;
FlatMessage's ``es`` event-time / ``ts`` processing-time split,
server/.../MQMessageUtils.java:290-291) flattened to one row per
change event with a strictly increasing ``ordinal`` standing in for
(logfileName, logfileOffset) — the resume token
(protocol/.../position/EntryPosition.java).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TOKEN_TABLE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)

CHANGELOG_SCHEMA = StructType(
    [
        StructField("ordinal", LongType(), False),  # binlog position analogue
        StructField("op", StringType(), False),  # I / U / D
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), True),  # after-image
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
        StructField("es", TimestampType(), True),  # event time (executeTime)
        StructField("batch_id", LongType(), True),  # txn framing analogue
        # before-image (RowData.beforeColumns,
        # protocol/EntryProtocol.proto:111-121): the row state the event
        # replaced.  Full-capture style — U/D rows carry the prior
        # tokens/n_tok; I rows carry null.  Enables (a) no-op-update
        # suppression in MERGE (before == after -> no rewrite,
        # LogEventConvert.isUpdate:905-929 column-change pruning) and
        # (b) the `old` field of delivered FlatMessages (FlatMessage.java).
        StructField("before_tokens", ArrayType(IntegerType(), False), True),
        StructField("before_n_tok", IntegerType(), True),
    ]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("phase", StringType(), False),  # merge|compact|cluster|expire
        StructField("partition", StringType(), True),
        StructField("ordinal", LongType(), True),  # high-water mark applied
        StructField("snapshot_id", LongType(), True),
        StructField("files_rewritten", IntegerType(), True),
        StructField("bytes_shuffled", LongType(), True),
        StructField("stat_tightness", StructType().add("before", "double").add("after", "double"), True),
        StructField("ts", TimestampType(), False),
        # free-form per-phase counters (dup_candidates, hot_buckets_capped,
        # …) — the prometheus-label analogue; nullable so old rows read null
        StructField("metrics", MapType(StringType(), LongType()), True),
    ]
)

SOURCES = ["web", "books", "code", "wiki"]
