"""Streaming operational metrics: windowed traffic + replication delay.

The reference exports per-instance counters (rows/bytes in
`prometheus/.../StoreCollector.java:32-42` — canal_instance_put_rows,
canal_instance_traffic_delay etc.) and keeps liveness with heartbeat
entries injected every 3 s idle (AbstractEventParser.java:494-521).
On Spark, event-time windows + watermark replace both: the watermark
keeps time advancing without synthetic heartbeat rows, and windowed
aggregates give the same rows/bytes/delay series, late data included
up to the allowed lateness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_traffic_metrics(
    changes: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Tumbling-window rows/ops/token-bytes per source over a streaming
    (or batch — same plan) changelog DataFrame keyed on event time."""
    return (
        changes.withWatermark("es", watermark)
        .groupBy(F.window("es", window).alias("win"), "source")
        .agg(
            F.count("*").alias("n_changes"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0))).alias("tokens_in"),
            F.max("ordinal").alias("max_ordinal"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "source", "n_changes", "n_deletes", "tokens_in", "max_ordinal",
        )
    )


def stream_delay_metrics(
    changes: DataFrame,
    *,  # keyword-only: `window` was inserted before `watermark`, and a
    # legacy positional watermark arg would silently become the window
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Replication delay: processing time minus latest event time per
    event-time window and source (the reference's
    canal_instance_traffic_delay).  Windowed like the traffic metric —
    an unwindowed groupBy would keep cumulative all-time state (the
    watermark would evict nothing and ``n_changes`` would be a running
    total, not the window's)."""
    return (
        changes.withWatermark("es", watermark)
        .groupBy(F.window("es", window).alias("win"), "source")
        .agg(
            F.count("*").alias("n_changes"),
            F.max("es").alias("latest_event_time"),
            (
                F.unix_millis(F.current_timestamp()) - F.unix_millis(F.max("es"))
            ).alias("delay_ms"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "source", "n_changes", "latest_event_time", "delay_ms",
        )
    )
