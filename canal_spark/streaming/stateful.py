"""Custom stateful streaming operator: cross-micro-batch last-wins
dedupe with applyInPandasWithState.

The batch engine dedupes *within* a slice (merge.py::dedupe_max_by);
a continuously-running stream also needs the per-key winner carried
*across* micro-batches — the reference holds the equivalent state as
the per-key apply order inside its pk-hash lanes
(client-adapter/rdb/.../RdbSyncService.java:156-171).  Here the state
is explicit: one (ordinal, op) pair per doc_id in Spark's state store,
updated per Arrow batch (vectorized pandas inside the group fn), and
only *improved* winners are emitted downstream — so a late or replayed
change with a stale ordinal is suppressed exactly like the engine's
high-water-mark filter.

State size note for 10^12 keys: state is partitioned by the shuffle on
doc_id (RocksDB state store on a real cluster); the value is 16 bytes
+ key, and entries can be expired with a processing-time timeout when
changelogs are ordinal-bounded per window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id string, ordinal long, op string"
STATE_SCHEMA = "ordinal long, op string"


def _dedupe_fn(key: tuple, pdf_iter, state: GroupState):
    import pandas as pd

    doc_id = key[0]
    best_ord, best_op = state.get if state.exists else (-1, None)
    improved = False
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        i = pdf["ordinal"].idxmax()
        if int(pdf.at[i, "ordinal"]) > best_ord:
            best_ord = int(pdf.at[i, "ordinal"])
            best_op = str(pdf.at[i, "op"])
            improved = True
    # emit ONLY on improvement — a replayed/stale batch (every ordinal
    # <= stored winner) produces no downstream rows at all
    if improved:
        state.update((best_ord, best_op))
        yield pd.DataFrame(
            {"doc_id": [doc_id], "ordinal": [best_ord], "op": [best_op]}
        )


def stream_dedupe_last_wins(changes: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-key winners (doc_id, ordinal, op),
    one update row per key per micro-batch in which its winner improved."""
    return (
        changes.select("doc_id", "ordinal", "op")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _dedupe_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
