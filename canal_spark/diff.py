"""Incremental snapshot-diff read: reconstruct the row-change stream
between two snapshots of the token table.

This is the table-level analogue of the consumer 'get batch' (C2,
server/.../CanalServerWithEmbedded.java:289-371) and of Iceberg's
incremental changelog scan: downstream consumers that missed the
original changelog can diff two retained snapshots and receive exactly
the I/U/D rows (with after-images) that transform one into the other.

Plan shape: full outer join of the two snapshot scans on doc_id —
  old=null            -> I (insert, after-image from new)
  new=null            -> D (delete)
  both, content diff  -> U (update)
Content comparison uses xxhash64 over the token array + n_tok + source
(JVM-side, no Python), so unchanged rows are dropped before anything
wide is shuffled onward.

Scale notes: both sides are manifest-pruned scans; the join shuffles on
doc_id, which both sides' file layout is already sorted by, and AQE
handles size/skew.  For a 10^12-row table the diff is still O(table),
as it must be — the *changelog* is the cheap path; the diff is the
recovery path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.table.format import Table

_SIG = "xxhash64(tokens, n_tok, source)"


def snapshot_diff(
    spark: SparkSession,
    table: Table,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """DataFrame of (op, doc_id, tokens, n_tok, source) changes that
    turn ``from_snapshot_id`` into ``to_snapshot_id`` (default: current)."""
    to_snapshot_id = to_snapshot_id or table.current_snapshot_id
    old = table.scan(spark, snapshot_id=from_snapshot_id).select(
        F.col("doc_id"),
        F.expr(_SIG).alias("_osig"),
    )
    new = table.scan(spark, snapshot_id=to_snapshot_id).select(
        "doc_id", "tokens", "n_tok", "source", F.expr(_SIG).alias("_nsig")
    )
    joined = old.join(new, "doc_id", "full_outer")
    return (
        joined.select(
            F.when(F.col("_osig").isNull(), F.lit("I"))
            .when(F.col("_nsig").isNull(), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "doc_id",
            "tokens",
            "n_tok",
            "source",
            (F.col("_osig") == F.col("_nsig")).alias("_same"),
        )
        .where(F.col("_same").isNull() | ~F.col("_same"))
        .drop("_same")
    )


def apply_diff_oracle(old_state: dict, diff_rows) -> dict:
    """Pure-Python replay of a diff (for tests): returns the new state."""
    state = dict(old_state)
    for r in diff_rows:
        if r["op"] == "D":
            state.pop(r["doc_id"], None)
        else:
            state[r["doc_id"]] = (list(r["tokens"]), r["n_tok"], r["source"])
    return state
