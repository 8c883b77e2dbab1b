"""Structured Streaming surface of the engine.

The reference is an always-on pipeline (binlog dump loop ->
ring-buffer store -> consumer get/ack — SURVEY.md §2.9, §3.2); the
Spark restatement keeps the micro-batch CDC-apply loop but lets
Structured Streaming own source discovery, offset tracking and
trigger pacing, while the table's own merge high-water mark keeps
`foreachBatch` replays idempotent (at-least-once delivery +
idempotent keyed apply = exactly-once table state — the ack/rollback
algebra of store/.../MemoryEventStoreWithBuffer.java:416-470 done
set-based).
"""

from canal_spark.streaming.apply import stream_apply, stream_changelog_reader
from canal_spark.streaming.metrics import stream_traffic_metrics, stream_delay_metrics
from canal_spark.streaming.stateful import stream_dedupe_last_wins

__all__ = [
    "stream_apply",
    "stream_changelog_reader",
    "stream_traffic_metrics",
    "stream_delay_metrics",
    "stream_dedupe_last_wins",
]
