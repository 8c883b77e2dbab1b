"""Lineage + checkpoint bookkeeping for maintenance jobs.

Two layers, mirroring the reference's split between *positions*
(parse/.../index/* LogPositionManagers — the authoritative resume
token) and *meta* (meta/.../CanalMetaManager.java — per-client cursor
+ batch bookkeeping):

1. **Authoritative checkpoint** — the merge high-water ordinal lives
   *inside the snapshot summary* (canal_spark.merge.CKPT_KEY), so data
   and checkpoint commit in one atomic metadata swap.  That is what
   makes replay idempotent; nothing here is load-bearing for
   correctness.
2. **Lineage table** (this module) — an append-only mini-table of
   per-job metrics rows (FIXTURES.md §3): job_id, phase, partition,
   ordinal, snapshot_id, files_rewritten, bytes_shuffled,
   stat-tightness before/after, timestamp.  The observability
   analogue of the reference's prometheus collectors
   (prometheus/.../CanalInstanceExports.java).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession

from canal_spark.schema import LINEAGE_SCHEMA
from canal_spark.table.format import Table, create_table, load_table
from canal_spark.table.writer import append


def _load_with_grace(root: str, attempts: int = 50, delay_s: float = 0.1) -> Table:
    """Load a table that a CONCURRENT creator may still be mid-create
    (metadata/ made, v0.metadata.json not yet linked): poll briefly,
    then re-raise the real error.  The ONE grace loop both of
    ensure_lineage's race windows share."""
    import time as _time

    for _ in range(attempts):
        try:
            return load_table(root)
        except FileNotFoundError:
            _time.sleep(delay_s)
    return load_table(root)  # raise the real error after the grace


def ensure_lineage(root: str) -> Table:
    if os.path.exists(os.path.join(root, "metadata")):
        t = _load_with_grace(root)
        # round-3 lineage tables predate the metrics column: evolve in
        # place (metadata-only; old rows read null) so record() can
        # always write the full row shape
        if "metrics" not in t.spark_schema().fieldNames():
            t.evolve_schema(add=[("metrics", "map<string,bigint>")])
        return t
    try:
        return create_table(root, LINEAGE_SCHEMA)
    except FileExistsError:
        # check-then-create race: a concurrent job created it first —
        # losers load through the same grace window
        return _load_with_grace(root)


def record(
    spark: SparkSession,
    lineage: Table,
    job_id: str,
    phase: str,
    partition: str | None = None,
    ordinal: int | None = None,
    snapshot_id: int | None = None,
    files_rewritten: int | None = None,
    bytes_shuffled: int | None = None,
    tightness_before: float | None = None,
    tightness_after: float | None = None,
    metrics: dict[str, int | None] | None = None,
) -> None:
    """Extra counters land in the free-form ``metrics`` map (e.g.
    ``metrics={"dup_candidates": 3}``) — the prometheus-label analogue.
    An explicit dict, NOT a ``**kwargs`` catch-all: with a catch-all a
    misspelled named parameter (``files_rewriten=5``) silently becomes
    a metrics entry while the real lineage column stays null."""
    mmap = {
        k: int(v) for k, v in (metrics or {}).items() if v is not None
    } or None
    row = [
        (
            job_id,
            phase,
            partition,
            ordinal,
            snapshot_id,
            files_rewritten,
            bytes_shuffled,
            {"before": tightness_before, "after": tightness_after}
            if tightness_before is not None or tightness_after is not None
            else None,
            # tz-AWARE: Spark converts an aware datetime to the correct
            # UTC instant regardless of session timezone; a naive UTC
            # wall-clock would be read in session-local time, shifting
            # every lineage ts by the tz offset on non-UTC clusters
            _dt.datetime.now(_dt.timezone.utc),
            mmap,
        )
    ]
    df = spark.createDataFrame(row, LINEAGE_SCHEMA).coalesce(1)
    append(spark, lineage, df, summary={"phase": "lineage"})


def read_lineage(spark: SparkSession, lineage: Table) -> DataFrame:
    return lineage.scan(spark)


def last_checkpoint(spark: SparkSession, lineage: Table, phase: str) -> dict | None:
    from pyspark.sql import functions as F

    rows = (
        lineage.scan(spark)
        # column expression, not string interpolation: a phase value
        # containing a quote must filter, not ParseException
        .where(F.col("phase") == F.lit(phase))
        .orderBy("ts", ascending=False)
        .limit(1)
        .collect()
    )
    return rows[0].asDict() if rows else None
