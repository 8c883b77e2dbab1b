"""MERGE INTO: apply a changelog slice to the token table (CDC apply).

This is the Spark restatement of the reference's apply engine
(client-adapter/rdb/.../RdbSyncService.java — keyed INSERT :212-268,
UPDATE :276-324, DELETE :332-352, pk-hash parallel lanes :156-171 with
per-batch transactional commit via BatchExecutor).  One declarative
plan replaces the lane machinery:

    read slice (ordinal > checkpoint)            -- C2 'get batch'
      -> last-wins dedupe per key                -- P1/P3 per-key order
      -> manifest-prune affected target files    -- predicate pushdown
      -> copy-on-write rewrite:
           untouched rows (left_anti on key)     -- keep, written back
           shuffle-free (sorted files stay sorted; D rows just vanish)
           + after-images of final I/U rows      -- upsert, written as
           their own range-sorted files (small batch, tiny shuffle)
      -> one atomic snapshot commit
      -> checkpoint = high-water ordinal in the snapshot summary

Exactly-once table state falls out of idempotence: the high-water mark
commits **atomically with the data** (it lives in the snapshot
summary), so a replayed slice filters to empty and the re-run is a
no-op — the reference gets the same effect from ack/rollback cursor
algebra (store/.../MemoryEventStoreWithBuffer.java:416-470).

Scale design: the changes side of every join is the (deduped) batch —
small next to the table — so Catalyst broadcasts it; AQE skew-join
covers the residual case.  Zipf-hot keys are collapsed *before* any
shuffle by `max_by` partial aggregation (map-side combine), which is
strictly better than salting a window function.  Target-file pruning
is manifest-level (driver interval check against per-file doc_id
min/max), so a point-y batch on a 100 TB table rewrites only the files
it actually touches.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from canal_spark.table.format import DataFile, Table, prune_files
from canal_spark.table.writer import write_datafiles

CKPT_KEY = "merge-hwm-ordinal"  # high-water mark in snapshot summary
DATA_COLS = ["doc_id", "tokens", "n_tok", "source"]


# --------------------------------------------------------------------------
# checkpoint algebra (K1/K4 analogue)
# --------------------------------------------------------------------------


def merge_high_water_mark(table: Table) -> int:
    """Largest changelog ordinal already applied.

    Start-position resolution analogue of
    parse/.../MysqlEventParser.findStartPositionInternal:422-521 —
    precedence: table property (survives snapshot expiry) > any
    retained snapshot summary > 0 (beginning).
    """
    hwm = int(table.properties.get(CKPT_KEY, 0))
    for s in table.snapshots:
        v = s.summary.get(CKPT_KEY)
        if v is not None:
            hwm = max(hwm, int(v))
    return hwm


# --------------------------------------------------------------------------
# dedupe strategies
# --------------------------------------------------------------------------


def dedupe_max_by(changes: DataFrame) -> DataFrame:
    """Last-wins via max_by aggregation — partial (map-side) combine
    makes zipf-hot keys cheap: duplicates collapse before the shuffle."""
    cols = [c for c in changes.columns if c != "doc_id"]
    agg = changes.groupBy("doc_id").agg(
        F.max_by(F.struct(*cols), F.col("ordinal")).alias("_last")
    )
    return agg.select("doc_id", *[F.col(f"_last.{c}").alias(c) for c in cols])


def dedupe_two_phase_salted(changes: DataFrame, n_salts: int = 16) -> DataFrame:
    """Explicit salted two-phase dedupe (window variant), kept for
    plan-shape comparison and for operators where max_by can't apply
    (e.g. carrying window rank).  Phase 1 reduces per (key, salt);
    phase 2 reduces the ≤n_salts survivors per key."""
    salted = changes.withColumn("_salt", F.pmod(F.xxhash64("ordinal"), F.lit(n_salts)))
    w1 = Window.partitionBy("doc_id", "_salt").orderBy(F.col("ordinal").desc())
    p1 = salted.withColumn("_rn", F.row_number().over(w1)).where(F.col("_rn") == 1)
    w2 = Window.partitionBy("doc_id").orderBy(F.col("ordinal").desc())
    return (
        p1.withColumn("_rn2", F.row_number().over(w2))
        .where(F.col("_rn2") == 1)
        .drop("_rn", "_rn2", "_salt")
    )


# --------------------------------------------------------------------------
# merge
# --------------------------------------------------------------------------


@dataclass
class MergeResult:
    applied: bool
    snapshot_id: int | None = None
    high_water_mark: int = 0
    files_rewritten: int = 0
    files_added: int = 0
    files_pruned: int = 0
    rows_upserted: int = 0
    rows_deleted: int = 0
    bytes_rewritten: int = 0
    job_id: str = ""
    extra: dict = field(default_factory=dict)


def _affected_files(
    entries: list[DataFile], keys: np.ndarray
) -> tuple[list[DataFile], list[DataFile]]:
    """Split manifest entries into (affected, untouched) by whether any
    changed key falls inside the file's doc_id [min, max].  O(F log K)
    driver-side — manifest scale, never data scale."""
    affected, untouched = [], []
    for e in entries:
        st = e.stats.get("doc_id") or {}
        lo, hi = st.get("min"), st.get("max")
        if lo is None or hi is None:
            affected.append(e)  # no stats -> must assume overlap
            continue
        i = np.searchsorted(keys, lo, side="left")
        if i < len(keys) and keys[i] <= hi:
            affected.append(e)
        else:
            untouched.append(e)
    return affected, untouched


def merge_into(
    spark: SparkSession,
    table: Table,
    changes: DataFrame,
    target_file_rows: int = 200_000,
    max_driver_keys: int = 2_000_000,
    max_broadcast_keys: int = 5_000_000,
    job_id: str | None = None,
) -> MergeResult:
    """Apply a changelog DataFrame (CHANGELOG_SCHEMA) to ``table``."""
    job_id = job_id or uuid.uuid4().hex[:12]
    hwm = merge_high_water_mark(table)

    # C2 'get batch': only changes past the checkpoint; replay-safe.
    slice_df = changes.where(F.col("ordinal") > F.lit(hwm))
    final = dedupe_max_by(slice_df)

    # split final ops: survivors (I/U after-images) vs tombstones (D)
    upserts = final.where(F.col("op") != "D").select(*DATA_COLS)

    # Key-frequency stats in one parallel two-stage aggregation (cheap
    # hash aggs, nothing wide shipped to the driver): distinct keys,
    # high-water mark, row count, and the hottest key's multiplicity —
    # the skew signal.  This is the "salting decision from key-frequency
    # stats" of the apply design: a zipf-hot key shows up as max_freq ≫
    # n_rows/n_keys, and the plan already neutralizes it — dedupe_max_by
    # collapses duplicates in the map-side partial aggregate (strictly
    # better than salting a window), and the join's build side is the
    # *deduped* key set, so no hot key ever crosses a shuffle.  The
    # stats are recorded in the MergeResult for observability.
    row = (
        slice_df.groupBy("doc_id")
        .agg(F.count("*").alias("c"), F.max("ordinal").alias("mo"))
        .agg(
            F.count("*").alias("n"),
            F.max("mo").alias("hwm"),
            F.sum("c").alias("rows"),
            F.max("c").alias("max_freq"),
        )
        .collect()[0]
    )
    n_keys, new_hwm = row["n"] or 0, row["hwm"]
    if n_keys == 0:
        return MergeResult(applied=False, high_water_mark=hwm, job_id=job_id)
    skew_stats = {
        "slice_rows": int(row["rows"]),
        "hot_key_freq": int(row["max_freq"]),
        "mean_key_freq": round(row["rows"] / n_keys, 2),
        "join_strategy": "broadcast" if n_keys <= max_broadcast_keys
        else "shuffle_aqe_skewjoin",
    }

    # the changed-key set: lazy, column-pruned (Catalyst reduces it to a
    # distinct over the slice's doc_id column); reused as the broadcast
    # side of the anti-join so it is computed by executors, not shipped
    # through the driver
    keys_df = slice_df.select("doc_id").distinct()

    entries = table.files()
    if n_keys <= max_driver_keys:
        # manifest pruning needs the key list driver-side (O(K log F)
        # searchsorted against per-file min/max); bounded by contract
        keys = np.sort(
            np.array([r[0] for r in keys_df.collect()], dtype=object)
        )
        affected, untouched = _affected_files(entries, keys)
    else:
        # huge backfill: a batch this size is a full-table rewrite anyway
        affected, untouched = entries, []

    # Copy-on-write rewrite, shuffle-free on the big side: kept rows of
    # each affected file are anti-joined against the (broadcast) key set
    # and written straight back out — scan partitions of a doc_id-sorted
    # file are contiguous ranges, so outputs stay sorted, no exchange,
    # no range-sampling pass.  The (small) upsert batch alone goes
    # through a range shuffle into its own sorted files; layout debt
    # (extra overlapping files) is exactly what the compaction/cluster
    # phases exist to repay — rewrite amplification stays bounded by the
    # touched files, never the table.
    new_entries = []
    if affected:
        paths = [f"{table.root}/{e.path}" for e in affected]
        target_affected = spark.read.schema(table.spark_schema()).parquet(*paths)
        # CDC batches are normally small → broadcast the key set (no
        # shuffle at all).  A huge backfill batch must NOT be broadcast:
        # fall through to a shuffled anti-join and let AQE's skew-join
        # splitting absorb hot doc_id ranges (keys are already deduped,
        # so the build side has no hot keys of its own).
        keys_side = F.broadcast(keys_df) if n_keys <= max_broadcast_keys else keys_df
        keep = target_affected.join(keys_side, "doc_id", "left_anti")
        new_entries += write_datafiles(
            spark, table, keep, sort_within_by=["doc_id"]
        )
    # hash (not range) partition the upsert batch: range partitioning
    # would run a sampling job that recomputes the whole dedupe plan.
    # Upsert files are sorted within themselves but may overlap each
    # other in doc_id — layout debt the next cluster pass repays; kept
    # files stay range-disjoint either way.  m_out sized by n_keys (an
    # upper bound on upserts; deletes just yield slimmer files).
    m_out = max(1, -(-n_keys // target_file_rows))
    upsert_entries = write_datafiles(
        spark,
        table,
        upserts.repartition(m_out, "doc_id"),
        sort_within_by=["doc_id"],
    )
    new_entries += upsert_entries
    rows_out = sum(e.rows for e in new_entries)
    rows_in = sum(e.rows for e in affected)
    n_up = sum(e.rows for e in upsert_entries)

    snap = table.commit(
        added=new_entries,
        removed_paths=[e.path for e in affected],
        operation="overwrite",
        summary={
            CKPT_KEY: int(new_hwm),
            "job-id": job_id,
            "phase": "merge",
            "keys-changed": int(n_keys),
            "files-pruned": len(untouched),
        },
        # checkpoint ALSO persisted as a table property so it survives
        # snapshot expiry — data + checkpoint in one atomic commit.
        new_properties={CKPT_KEY: int(new_hwm)},
    )
    return MergeResult(
        applied=True,
        snapshot_id=snap.snapshot_id,
        high_water_mark=int(new_hwm),
        files_rewritten=len(affected),
        files_added=len(new_entries),
        files_pruned=len(untouched),
        rows_upserted=n_up,
        rows_deleted=max(0, rows_in + n_up - rows_out),
        bytes_rewritten=sum(e.bytes for e in affected),
        job_id=job_id,
        extra=skew_stats,
    )
