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

import os
import uuid
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from canal_spark.table.format import (
    BRANCH_KEY,
    CKPT_PROP,
    GTID_PROP,
    POSITION_RESET_KEY,
    WAP_STAGED_KEY,
    DataFile,
    Table,
    prune_files,
)
from canal_spark.table.writer import write_datafiles

# checkpoint keys are OWNED by the format layer (rollback_to resets them
# as the sanctioned redelivery path); historical local names kept
CKPT_KEY = CKPT_PROP  # high-water mark in snapshot summary
GTID_KEY = GTID_PROP  # {stream_id: ordinal} for multi-stream sources
# Null stream_id rows checkpoint under this sentinel stream.  Without
# it, a null key JSON-serializes as the string "null" in the stored
# gtid-set while gmap[null] yields null -> coalesce -> 0 on the filter
# side, so null-stream rows would NEVER be filtered by their checkpoint
# and a stale redelivery could re-apply old values over newer state.
NULL_STREAM = "\x00null-stream"
# retained for back-compat with callers that import it; merge_into itself
# derives data columns from the target table's schema
DATA_COLS = ["doc_id", "tokens", "n_tok", "source"]


# --------------------------------------------------------------------------
# checkpoint algebra (K1/K4 analogue)
# --------------------------------------------------------------------------


def _position_reset_id(table: Table, branch: str | None = None) -> int | None:
    """Snapshot id of the LATEST position-reset (a redelivery
    ``rollback_to``) at or below the head, or None.  Marks from
    snapshots older than it no longer count: they belong to batches the
    rollback un-applied — counting them would make those ordinals
    permanently undeliverable.

    Deliberately NOT a parent-link walk: snapshot expiry can remove
    intermediate ancestors (a tag may pin an older snapshot while the
    chain between it and the head expires), and a broken walk would
    silently report "no reset" — resurrecting pre-rollback marks and
    swallowing the redelivery.  Resets are mainline commits, so every
    retained reset with id <= head id is in the head's ancestry; ids
    are globally monotone (commit assigns max+1).  A reset newer than
    a branch's FORK point can over-apply to that branch's view, which
    errs low — the safe direction (redelivered ordinals replay as
    idempotent no-ops)."""
    head_id = None
    if branch is not None:
        ref = table.refs.get(branch)
        if ref is not None:
            head_id = ref["snapshot_id"]
    if head_id is None:
        head_id = table.current_snapshot_id
    if head_id is None:
        return None
    resets = [
        s.snapshot_id
        for s in table.snapshots
        if s.summary.get(POSITION_RESET_KEY) and s.snapshot_id <= head_id
    ]
    return max(resets, default=None)


def merge_high_water_mark(table: Table, branch: str | None = None) -> int:
    """Largest changelog ordinal already applied.

    Start-position resolution analogue of
    parse/.../MysqlEventParser.findStartPositionInternal:422-521 —
    precedence: table property (survives snapshot expiry) > any
    retained snapshot summary > 0 (beginning).

    ``branch``: compute the mark AS SEEN FROM that branch — mainline
    marks plus the branch's own (unpublished) chain summaries, so
    chained branch merges resume from each other while staying
    invisible to mainline resume until fast-forward.
    """
    hwm = int(table.properties.get(CKPT_KEY, 0))
    reset_id = _position_reset_id(table, branch)
    for s in table.snapshots:
        if reset_id is not None and s.snapshot_id < reset_id:
            # rolled-back era: a redelivery rollback_to reset the
            # position — these batches are un-applied history
            continue
        if s.summary.get(WAP_STAGED_KEY):
            # an unpublished (WAP-staged) merge must NOT advance the
            # effective mark: if its audit aborts, the batch has to
            # re-apply — its summary only counts after publish
            continue
        b = s.summary.get(BRANCH_KEY)
        if b is not None and b != branch:
            # same deferral for branch commits: their marks count on
            # their own branch and after fast_forward, never before
            continue
        v = s.summary.get(CKPT_KEY)
        if v is not None:
            hwm = max(hwm, int(v))
    return hwm


def merge_gtid_set(table: Table, branch: str | None = None) -> dict[str, int]:
    """Per-stream high-water marks — the GTID-set analogue.

    Multi-master sources carry per-stream positions (GTID mode,
    MysqlEventParser.java:422-521 prefers GTID over file+offset when
    present; MemoryEventStoreWithBuffer.java:339-348 ack points).  A
    changelog with a ``stream_id`` column checkpoints {stream: max
    ordinal} instead of one global ordinal, so interleaved streams with
    independent sequences resume independently.  Same persistence
    precedence as the scalar mark: property ∪ retained summaries,
    max-merged per stream.
    """
    def norm(k):
        # legacy migration: marks written before the NULL_STREAM
        # sentinel stored the null stream under dict key None, which
        # JSON serializes as the string "null" — without this mapping
        # an upgraded table would read that stream's mark as 0 and
        # re-apply stale null-stream redeliveries
        return NULL_STREAM if k in (None, "null") else k

    out: dict[str, int] = {}
    for k, v in (table.properties.get(GTID_KEY) or {}).items():
        k = norm(k)
        out[k] = max(int(out.get(k, 0)), int(v))
    reset_id = _position_reset_id(table, branch)
    for s in table.snapshots:
        if reset_id is not None and s.snapshot_id < reset_id:
            continue  # rolled-back era: un-applied history (redelivery)
        if s.summary.get(WAP_STAGED_KEY):
            continue  # unpublished stage: marks count only after publish
        b = s.summary.get(BRANCH_KEY)
        if b is not None and b != branch:
            continue  # other/unpublished branch: same deferral rule
        for k, v in (s.summary.get(GTID_KEY) or {}).items():
            k = norm(k)
            out[k] = max(int(out.get(k, 0)), int(v))
    return {k: int(v) for k, v in out.items()}


# --------------------------------------------------------------------------
# dedupe strategies
# --------------------------------------------------------------------------


def dedupe_max_by(changes: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Last-wins via max_by aggregation — partial (map-side) combine
    makes zipf-hot keys cheap: duplicates collapse before the shuffle.
    ``key_cols`` supports composite keys (HbaseSyncService composite
    rowkey :72-82 analogue)."""
    key_cols = list(key_cols or ["doc_id"])
    cols = [c for c in changes.columns if c not in key_cols]
    agg = changes.groupBy(*key_cols).agg(
        F.max_by(F.struct(*cols), F.col("ordinal")).alias("_last")
    )
    return agg.select(*key_cols, *[F.col(f"_last.{c}").alias(c) for c in cols])


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


def _canon_driver_keys(vals) -> np.ndarray | None:
    """Collected driver keys canonicalized to the MANIFEST-STATS form
    (writer._json_native JSON-natives footer min/max: dates/timestamps
    to isoformat strings) so `_affected_files`' searchsorted compares
    like against like — a raw datetime.date vs a stats string raises
    TypeError mid-merge.  Isoformat is ordering-preserving, so string
    pruning stays exact for temporal keys.  Decimal/bytes keys return
    None — their string form does NOT sort numerically, so the caller
    must skip pruning (every file affected: slower, never wrong).
    None keys are dropped (rejected loudly by the batch stats agg)."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    out = []
    for v in vals:
        if v is None:
            continue
        if isinstance(v, (_Dec, bytes, bytearray)):
            return None
        if isinstance(v, (_dt.datetime, _dt.date)):
            v = v.isoformat()
        out.append(v)
    return np.sort(np.array(out, dtype=object))


def _affected_files(
    entries: list[DataFile],
    keys: np.ndarray,
    key_col: str = "doc_id",
    table_root: str | None = None,
    prune_stats: dict | None = None,
) -> tuple[list[DataFile], list[DataFile]]:
    """Split manifest entries into (affected, untouched) by whether any
    changed key falls inside the file's ``key_col`` [min, max].
    O(F log K) driver-side — manifest scale, never data scale.  For
    composite keys the first key column's stats are used (a safe
    superset: less pruning, never a miss).

    Range survivors are then refined by MEMBERSHIP when the file
    carries a bloom sidecar (table/bloom.py; opt-in via the
    ``write.bloom.col`` table property and ``table_root``): a point-y
    batch on an interleaved layout — where every file's [min, max]
    straddles every key — prunes to the files that actually contain
    the keys plus ~1% false positives.  Key hashes are computed ONCE
    per batch (never per file) and only for batches under
    PROBE_MAX_KEYS; a missing/foreign sidecar degrades to the range
    verdict, never an error.  ``prune_stats`` (when given) records how
    many prunes each level contributed — the observability split that
    tells an operator whether blooms are earning their write cost."""
    from canal_spark.table import bloom as _bloom

    probe_ok = table_root is not None and 0 < len(keys) <= _bloom.PROBE_MAX_KEYS
    hashes: np.ndarray | None = None
    affected, untouched = [], []
    for e in entries:
        st = e.stats.get(key_col) or {}
        lo, hi = st.get("min"), st.get("max")
        if lo is None or hi is None:
            affected.append(e)  # no stats -> must assume overlap
            continue
        i = np.searchsorted(keys, lo, side="left")
        j = np.searchsorted(keys, hi, side="right")
        if i >= j:  # no key inside the range
            untouched.append(e)
            if prune_stats is not None:
                prune_stats["range"] = prune_stats.get("range", 0) + 1
            continue
        marker = st.get("bloom")
        if probe_ok and marker:
            side = _bloom.load_sidecar(os.path.join(table_root, e.path))
            if side is not None and side[0] == marker.get("m"):
                if hashes is None:
                    hashes = _bloom.key_hashes(keys)
                if not _bloom.probe_any(side[1], side[0], hashes[i:j]):
                    untouched.append(e)
                    if prune_stats is not None:
                        prune_stats["bloom"] = prune_stats.get("bloom", 0) + 1
                    continue
        affected.append(e)
    return affected, untouched


def _refine_noops(
    spark: SparkSession,
    table: Table,
    final: DataFrame,
    key_cols: list[str],
    max_probe_keys: int = 2_000_000,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Clear the ``_noop`` flag on keys NOT currently present in the table.

    All-no-op suppression (reference: LogEventConvert.isUpdate:905-929 —
    a U whose captured before-images equal its after-images changes
    nothing) is only valid when the key's current table row anchors the
    before-image chain.  A no-op U on an ABSENT key (deleted in a prior
    batch) must re-insert the after-image, matching the single-threaded
    replay oracle.

    Cost: zero when the batch has no all-no-op keys (one count on the
    persisted dedupe).  Otherwise a manifest-pruned, column-pruned read
    of only the files whose key range covers the no-op keys, leftsemi
    against the (small, broadcast) key set.  Above ``max_probe_keys``
    the probe is skipped conservatively — every no-op key upserts,
    which is always correct, just forgoes the suppression optimization.
    The probe reads through ``read_files_live`` so pending merge-on-read
    deletes count as absence.
    """
    noops = final.where(F.col("_noop")).select(*key_cols)
    n_noop = noops.count()
    if n_noop == 0:
        return final
    if n_noop > max_probe_keys:
        return final.withColumn("_noop", F.lit(False))
    keys = _canon_driver_keys(
        r[0] for r in noops.select(key_cols[0]).collect()
    )
    if keys is None:  # Decimal/bytes key: pruning skipped, probe all
        candidates = table.files(snapshot_id)
    else:
        candidates, _ = _affected_files(
            table.files(snapshot_id), keys, key_cols[0],
            table_root=table.root,
        )
    if not candidates:
        return final.withColumn("_noop", F.lit(False))
    live = table.read_files_live(
        spark, candidates, delete_entries=table.delete_files(snapshot_id)
    ).select(*key_cols)
    present_rows = [
        tuple(r)
        for r in live.join(F.broadcast(noops), key_cols, "leftsemi")
        .distinct()
        .collect()
    ]
    if not present_rows:
        return final.withColumn("_noop", F.lit(False))
    cur = {f.name: f for f in table.spark_schema().fields}
    key_schema = StructType([cur[k] for k in key_cols])
    present = spark.createDataFrame(present_rows, key_schema).withColumn(
        "_present", F.lit(True)
    )
    return (
        final.join(F.broadcast(present), key_cols, "left")
        .withColumn(
            "_noop", F.col("_noop") & F.coalesce(F.col("_present"), F.lit(False))
        )
        .drop("_present")
    )


def merge_into(
    spark: SparkSession,
    table: Table,
    changes: DataFrame,
    target_file_rows: int = 200_000,
    max_driver_keys: int = 2_000_000,
    max_broadcast_keys: int = 5_000_000,
    job_id: str | None = None,
    mode: str = "cow",
    stage_only: bool = False,
    advance_checkpoint: bool = True,
    branch: str | None = None,
) -> MergeResult:
    """Apply a changelog DataFrame (CHANGELOG_SCHEMA shape) to ``table``.

    Key columns come from the table's ``key-cols`` property (composite
    keys supported); data columns from the table schema — a second
    table shape is config, not code.  Changelogs carrying before-image
    columns (``before_<col>``) get no-op updates suppressed: a U row
    whose captured before-images all equal the after-images rewrites
    nothing (column-change pruning, LogEventConvert.isUpdate:905-929 /
    RdbSyncService.update:296-314) — but the high-water mark still
    advances past it (the cursor moves even when nothing applies, F6).

    ``mode="cow"`` (default) is copy-on-write: affected target files
    rewrite in place — reads stay delete-free, writes cost O(affected
    files).  ``mode="mor"`` is merge-on-read (Iceberg v2 equality
    deletes): the batch commits as upsert data files plus ONE
    equality-delete file of the changed keys, with ZERO reads or
    rewrites of the base table — write cost is O(batch) no matter how
    wide the batch's key range sprays across a 100 TB table.  Scans
    anti-join pending deletes (sequence-aware, so insert-after-delete
    works) until ``materialize_deletes`` repays the debt.  Both modes
    share the checkpoint algebra, so they can interleave on one table.

    ``branch="name"`` applies the batch ON a writable branch (the
    multi-commit WAP flow): the base read, checkpoint resume marks, and
    the commit all pin to the branch head; mainline readers and resume
    accounting see nothing until ``table.fast_forward(name)`` publishes
    the chain (``delete_branch`` discards it and the batch re-applies
    on the main line later).  Mutually exclusive with ``stage_only``
    (single-commit WAP).
    """
    if mode not in ("cow", "mor"):
        raise ValueError(f"unknown merge mode {mode!r} (expected 'cow' or 'mor')")
    job_id = job_id or uuid.uuid4().hex[:12]
    key_cols = table.key_cols
    data_cols = table.spark_schema().fieldNames()
    if branch is not None:
        if stage_only:
            raise ValueError("stage_only and branch are mutually exclusive")
        table.refresh()
        table.branch_chain(branch)  # validates: exists and is a branch
        # every base read below pins to the branch head; commit()
        # re-validates the ref per retry attempt
        base_sid: int | None = table.refs[branch]["snapshot_id"]
    else:
        base_sid = None
    hwm = merge_high_water_mark(table, branch=branch)
    # checkpoint CAS pins for commit time: a concurrent merge advancing
    # the marks between our planning and our commit makes a PURE-ADD
    # plan double-apply, the one shape the manifest removal checks
    # cannot catch.  Mainline pins the checkpoint PROPERTIES; branches
    # (whose marks live in chain summaries, not properties) pin the
    # planning-time ref head instead (validate_branch_base below)
    planned_props = (
        {
            CKPT_KEY: table.properties.get(CKPT_KEY),
            GTID_KEY: table.properties.get(GTID_KEY),
        }
        if branch is None and advance_checkpoint
        else None
    )

    # C2 'get batch': only changes past the checkpoint; replay-safe.
    # GTID mode: a `stream_id` column switches to per-stream positions —
    # each stream's rows filter against ITS mark (unseen streams start
    # at 0), so interleaved multi-master sequences resume independently.
    has_streams = "stream_id" in changes.columns
    # the literal name "null" is RESERVED: it is what legacy JSON
    # serialization called the null stream, and merge_gtid_set migrates
    # that key to the sentinel — a real stream under it would be
    # conflated with (and mis-filtered against) the null stream's mark,
    # so reject it loudly instead
    stream_key = F.when(
        F.col("stream_id") == "null",
        F.raise_error(
            F.lit('stream_id "null" is reserved (legacy JSON null-key); rename the stream')
        ),
    ).otherwise(F.coalesce(F.col("stream_id"), F.lit(NULL_STREAM)))
    # CONTRACT: per-stream ordinal domains are independent of the scalar
    # domain and of each other — an unseen stream always starts at mark
    # 0, even on a table whose scalar hwm is high (mixed-mode tables are
    # supported: the quiet-stream property no-regress depends on it).
    # Consequence for OPERATORS migrating a scalar source to stream
    # tags: already-applied pre-migration events must NOT be redelivered
    # under a new stream_id — the engine cannot attribute the scalar
    # mark to any stream and would re-apply them as that stream's fresh
    # history.  Start the tagged stream at its own first NEW position.
    if has_streams:
        gset = merge_gtid_set(table, branch=branch)
        if gset:
            gmap = F.create_map(
                *[x for k, v in sorted(gset.items()) for x in (F.lit(k), F.lit(v))]
            )
            stream_hwm = F.coalesce(
                gmap[stream_key], F.lit(0).cast("long")
            )
        else:
            stream_hwm = F.lit(0).cast("long")
        slice_df = changes.where(F.col("ordinal") > stream_hwm)
    else:
        slice_df = changes.where(F.col("ordinal") > F.lit(hwm))
    if not advance_checkpoint:
        # out-of-band maintenance batch (e.g. corpus self-dedup): the
        # rows are ENGINE-GENERATED, not changelog events — their
        # ordinals carry no position meaning, so they neither filter
        # against nor advance the hwm/GTID marks (a synthetic ordinal
        # above the mark would collide with a not-yet-applied upstream
        # event and silently swallow it).  Idempotence comes from the
        # caller's planner (re-runs find nothing to change), the same
        # contract as compaction.
        slice_df = changes

    # Per-EVENT no-op detection, before the dedupe: a U row whose
    # captured before-images all equal its after-images changes nothing
    # when applied (exact null-safe array equality, not a hash).  A KEY
    # is suppressible only if EVERY event of the key in this slice is
    # such a no-op — then final state == initial state == table state.
    # Comparing just the final event's before/after would be wrong: its
    # before-image reflects the previous event in the slice, not the
    # table (the reference gets this for free by applying events one at
    # a time and skipping each individual no-op,
    # RdbSyncService.update:296-314).
    before_pairs = [
        (c, f"before_{c}") for c in data_cols if f"before_{c}" in slice_df.columns
    ]
    if before_pairs:
        captured = F.lit(False)
        same = F.lit(True)
        for c, b in before_pairs:
            captured = captured | F.col(b).isNotNull()
            same = same & F.col(b).eqNullSafe(F.col(c))
        evt_noop = (F.col("op") == "U") & captured & same
    else:
        evt_noop = F.lit(False)
    slice_df = slice_df.withColumn("_evt_noop", evt_noop)
    # GTID mode reads the slice TWICE (per-key dedupe + per-stream ack
    # marks): persist it so both aggregations see ONE materialization —
    # marks must cover exactly the events the dedupe saw, never a
    # re-executed scan of a source that may have grown in between (a
    # mark covering an unseen event would permanently skip it).  The
    # mark aggregation cannot run on `final` instead: a per-key-deduped
    # loser event would replay next batch, win against nothing, and
    # overwrite the newer applied row with stale data.
    _slice_persisted = None
    if has_streams:
        slice_df = _slice_persisted = slice_df.persist()

    # ONE shuffle produces per-key last-wins rows AND the key-frequency
    # stats: max_by collapses duplicates in the map-side partial
    # aggregate (strictly better than salting a window — no hot key
    # ever crosses the shuffle), _freq/_mo/_noop ride along in the same
    # agg.
    non_key = [
        c for c in slice_df.columns if c not in key_cols and c != "_evt_noop"
    ]
    # deterministic last-wins order: cross-stream ordinal ties break on
    # stream_id (lexicographic struct comparison) in GTID mode
    ord_key = (
        F.struct(F.col("ordinal"), F.col("stream_id"))
        if has_streams
        else F.col("ordinal")
    )
    per_key = slice_df.groupBy(*key_cols).agg(
        F.count("*").alias("_freq"),
        F.max("ordinal").alias("_mo"),
        F.min(F.col("_evt_noop").cast("int")).alias("_all_noop"),
        F.max_by(F.struct(*non_key), ord_key).alias("_last"),
    )
    final = per_key.select(
        *key_cols, "_freq", "_mo",
        (F.col("_all_noop") == 1).alias("_noop"),
        *[F.col(f"_last.{c}").alias(c) for c in non_key],
    )
    # the deduped batch is small next to the table by CDC contract —
    # persist it: stats, manifest pruning, anti-join build side, and the
    # upsert write all reuse it without recomputing the dedupe shuffle
    final = _persisted = final.persist()

    try:
        # suppression is only sound for keys PRESENT in the table: the
        # CDC before-image contract chains table == before_1 == after_1
        # == ... == after_N only when the chain is anchored to a live
        # row.  A U on a key deleted in an earlier batch must upsert
        # (the oracle puts the after-image regardless) — reclassify
        # those here via a manifest-pruned presence probe.
        final = _refine_noops(
            spark, table, final, key_cols, max_probe_keys=max_driver_keys,
            snapshot_id=base_sid,
        )
        # NULL keys are poison, not data: unmatchable by any later event
        # and unorderable in the driver key paths — counted for free in
        # the stats agg and rejected with a diagnosable batch error
        null_key = None
        for k in key_cols:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        row = final.agg(
            F.count("*").alias("n"),
            F.max("_mo").alias("hwm"),
            F.sum("_freq").alias("rows"),
            F.max("_freq").alias("max_freq"),
            F.sum(F.when(null_key, 1).otherwise(0)).alias("n_null_keys"),
            F.sum(F.col("_noop").cast("long")).alias("n_noop"),
            F.sum(
                ((~F.col("_noop")) & (F.col("op") != "D")).cast("long")
            ).alias("n_up_keys"),
            F.sum(
                ((~F.col("_noop")) & (F.col("op") == "D")).cast("long")
            ).alias("n_d_keys"),
        ).collect()[0]
        n_keys_all, new_hwm = row["n"] or 0, row["hwm"]
        if n_keys_all == 0:
            return MergeResult(applied=False, high_water_mark=hwm, job_id=job_id)
        n_null = int(row["n_null_keys"] or 0)
        if n_null:
            raise ValueError(
                f"{n_null} changelog event(s) carry a NULL key "
                f"({key_cols}): a null key is unmatchable by any later "
                "event — repair or filter them upstream (the batch was "
                "not applied)"
            )
        n_noop = int(row["n_noop"] or 0)
        n_keys = n_keys_all - n_noop  # keys that actually change state
        n_up_keys = int(row["n_up_keys"] or 0)
        n_d_keys = int(row["n_d_keys"] or 0)
        new_gset = None
        if has_streams:
            # per-stream ack points (bounded by stream count)
            new_gset = dict(merge_gtid_set(table, branch=branch))
            for r in slice_df.groupBy(stream_key.alias("stream_id")).agg(
                F.max("ordinal").alias("mo")
            ).collect():
                sid = r["stream_id"]
                new_gset[sid] = max(int(new_gset.get(sid, 0)), int(r["mo"]))
        skew_stats = {
            "mode": mode,
            "slice_rows": int(row["rows"]),
            "hot_key_freq": int(row["max_freq"]),
            "mean_key_freq": round(row["rows"] / n_keys_all, 2),
            "noop_updates_suppressed": n_noop,
            "join_strategy": "broadcast" if n_keys <= max_broadcast_keys
            else "shuffle_aqe_skewjoin",
        }
        if new_gset is not None:
            skew_stats["gtid_set"] = dict(new_gset)

        # the changed-key set (no-op keys excluded: their files must NOT
        # rewrite); one row per key already — no distinct needed
        effective = final.where(~F.col("_noop"))
        keys_df = effective.select(*key_cols)
        upserts = effective.where(F.col("op") != "D").select(*data_cols)

        entries = table.files(base_sid)
        # pending merge-on-read deletes (equality + position) from
        # earlier batches: every COW read of old files must fold them
        # in, or rewritten survivors would resurrect deleted rows
        # (their new sequence and path stop the pending delete from
        # applying)
        pending_dels = table.delete_files(base_sid)
        # planning snapshot for commit-time rewrite validation: a MoR
        # delete committed between this read and our commit would be
        # stranded by the rewrite (validate_no_new_deletes_since)
        plan_sid = table.planning_snapshot_id(base_sid)
        new_entries = []
        rows_del = 0
        if mode == "mor":
            # merge-on-read: no base-table read, no rewrite — the batch
            # commits as upsert files + ONE equality-delete file of all
            # changed keys (key-sorted so its footer min/max stats let
            # materialize_deletes prune the files it must rewrite).
            # Updated keys need the delete too: it kills the PREVIOUS
            # version in older-sequence files, while the new version
            # (same commit sequence) is exempt by the strict inequality.
            affected, untouched = [], entries
            if n_keys > 0:
                m_del = max(1, -(-n_keys // 5_000_000))
                del_entries = write_datafiles(
                    spark,
                    table,
                    keys_df.repartition(m_del, *key_cols),
                    sort_within_by=key_cols,
                    build_bloom=False,  # no reader probes a delete bloom
                )
                for e in del_entries:
                    e.content = "eq-deletes"
                new_entries += del_entries
        elif n_keys == 0:
            affected, untouched = [], entries
        elif n_keys <= max_driver_keys:
            # manifest pruning needs the key list driver-side (O(K log F)
            # searchsorted against per-file min/max); bounded by contract
            keys = _canon_driver_keys(
                r[0] for r in keys_df.select(key_cols[0]).collect()
            )
            if keys is None:  # Decimal/bytes key: no pruning, all affected
                affected, untouched = entries, []
            else:
                prune_stats: dict[str, int] = {}
                affected, untouched = _affected_files(
                    entries, keys, key_cols[0], table_root=table.root,
                    prune_stats=prune_stats,
                )
                if prune_stats.get("bloom"):
                    skew_stats["files_pruned_bloom"] = prune_stats["bloom"]
        else:
            # huge backfill: a batch this size is a full-table rewrite anyway
            affected, untouched = entries, []

        # Copy-on-write rewrite, shuffle-free on the big side: kept rows
        # of each affected file are anti-joined against the (broadcast)
        # key set and written straight back out — scan partitions of a
        # key-sorted file are contiguous ranges, so outputs stay sorted,
        # no exchange, no range-sampling pass.  The (small) upsert batch
        # alone goes through a hash shuffle into its own sorted files;
        # layout debt (extra overlapping files) is exactly what the
        # compaction/cluster phases exist to repay — rewrite
        # amplification stays bounded by the touched files, never the
        # table.
        if affected:
            # era-aware read (with pending eq-deletes applied): affected
            # files may predate renames/widenings and may carry MoR debt
            target_affected = table.read_files_live(
                spark, affected, delete_entries=pending_dels
            )
            # Cluster-tag preservation: when every affected file carries
            # the same curve tag (steady state on a clustered table),
            # each file's kept rows are written back as THEIR OWN file —
            # grouped by source file (task-local, zero exchange: the
            # broadcast anti-join preserves scan locality) and re-sorted
            # within the group by the recomputed curve key.  Outputs
            # stay stratum-pure (partition attribution survives),
            # curve-sorted, and tagged, so the next clustering pass
            # rewrites ONLY the upsert files (batch-sized) instead of
            # every merged file: at the 10^12-row design point this
            # halves the pass's write amplification (cold kept bytes are
            # written once, not merge-rewritten and then re-clustered).
            # Without the per-file grouping, scan-task coalescing of
            # small files would concatenate strata into mixed files that
            # never regain partition attribution once the tag suppresses
            # re-clustering.
            # Only the BROADCAST anti-join keeps the big side
            # exchange-free; the shuffled fallback (huge backfill) moves
            # rows across tasks, so its outputs get the legacy
            # doc_id-sorted untagged treatment (the next cluster pass
            # re-sorts them, correctly).
            keep_tags = {e.sort_order for e in affected}
            keep_tag = (
                keep_tags.pop()
                if len(keep_tags) == 1 and n_keys <= max_broadcast_keys
                else None
            )
            if keep_tag and keep_tag.rsplit("-", 1)[0] not in ("zorder", "hilbert"):
                keep_tag = None  # unknown order: cannot re-sort by it
            if n_d_keys > 0:
                # exact delete count: table rows matching final-D keys.
                # (The old rows_in+n_up-rows_out arithmetic counted every
                # REPLACED row of an updated key as a delete.)  Key-only
                # column-pruned scan of the affected files, skipped
                # entirely for update-only batches.
                d_keys = effective.where(F.col("op") == "D").select(*key_cols)
                # same broadcast gate as the anti-join below: a mass-delete
                # backfill must not force a multi-million-key broadcast for
                # what is only a stats counter — let AQE pick the strategy
                d_side = (
                    F.broadcast(d_keys)
                    if n_d_keys <= max_broadcast_keys
                    else d_keys
                )
                rows_del = (
                    target_affected.select(*key_cols)
                    .join(d_side, key_cols, "leftsemi")
                    .count()
                )
            # CDC batches are normally small → broadcast the key set (no
            # shuffle at all).  A huge backfill batch must NOT be
            # broadcast: fall through to a shuffled anti-join and let
            # AQE's skew-join splitting absorb hot key ranges (keys are
            # already deduped, so the build side has no hot keys).
            keys_side = F.broadcast(keys_df) if n_keys <= max_broadcast_keys else keys_df
            if keep_tag:
                from canal_spark.cluster import cluster_dims, with_cluster_key

                src = table.read_files_live(
                    spark, affected, delete_entries=pending_dels,
                    with_file_path="_fp",
                )
                keep = (
                    src.join(keys_side, key_cols, "left_anti")
                    # compact group id per source file (the raw path has
                    # separators partitionBy can't use as a dir value)
                    .withColumn("_kgrp", F.md5(F.col("_fp")))
                    .drop("_fp")
                )
                keep = with_cluster_key(
                    keep, curve=keep_tag.rsplit("-", 1)[0], doc_col=key_cols,
                    source_col=cluster_dims(table)[1],
                )
                new_entries += write_datafiles(
                    spark, table, keep,
                    group_col="_kgrp", group_local=True,
                    sort_within_by=["_ckey"], drop_cols=["_ckey"],
                    sort_order=keep_tag,
                )
            else:
                keep = target_affected.join(keys_side, key_cols, "left_anti")
                new_entries += write_datafiles(
                    spark, table, keep, sort_within_by=key_cols
                )
        # hash (not range) partition the upsert batch: range partitioning
        # would run a sampling job that recomputes the whole dedupe plan.
        upsert_entries = []
        if n_up_keys > 0:
            m_out = max(1, -(-n_up_keys // target_file_rows))
            upsert_entries = write_datafiles(
                spark,
                table,
                upserts.repartition(m_out, *key_cols),
                sort_within_by=key_cols,
            )
        new_entries += upsert_entries
        n_up = sum(e.rows for e in upsert_entries)
    finally:
        _persisted.unpersist()
        if _slice_persisted is not None:
            _slice_persisted.unpersist()

    summary = {
        CKPT_KEY: int(new_hwm),
        "job-id": job_id,
        "phase": "merge",
        "merge-mode": mode,
        "keys-changed": int(n_keys),
        "files-pruned": len(untouched),
    }
    if skew_stats.get("files_pruned_bloom"):
        summary["files-pruned-bloom"] = skew_stats["files_pruned_bloom"]
    # checkpoint ALSO persisted as table properties so it survives
    # snapshot expiry — data + checkpoint in one atomic commit.
    # max() against the pre-batch mark: in GTID mode a batch from a
    # quiet stream can carry ordinals far below the stored global mark,
    # and overwriting the property with this batch's max would REGRESS
    # the scalar checkpoint once expiry drops the summaries that carried
    # the larger value (stale redeliveries would then re-apply).
    props = {CKPT_KEY: max(hwm, int(new_hwm))}
    if new_gset is not None:
        summary[GTID_KEY] = new_gset
        props[GTID_KEY] = new_gset
    if not advance_checkpoint:
        # out-of-band batch: record the phase, never the position marks
        summary.pop(CKPT_KEY, None)
        summary.pop(GTID_KEY, None)
        summary["out-of-band"] = True
        props = None
        new_hwm = hwm
    snap = table.commit(
        added=new_entries,
        removed_paths=[e.path for e in affected],
        operation="overwrite",
        summary=summary,
        new_properties=props,
        stage_only=stage_only,
        branch=branch,
        # only rewrites can strand a concurrent delete; pure-add commits
        # (MoR, upsert-only) are delete-safe by the sequence rules
        validate_no_new_deletes_since=plan_sid if affected else None,
        validate_properties=planned_props,
        # branch twin of the property CAS (the resume marks live in
        # chain summaries, not properties): pin the head the plan read
        validate_branch_base=base_sid,
    )
    return MergeResult(
        applied=True,
        snapshot_id=snap.snapshot_id,
        high_water_mark=int(new_hwm),
        files_rewritten=len(affected),
        files_added=len(new_entries),
        files_pruned=len(untouched),
        rows_upserted=n_up,
        rows_deleted=rows_del,
        bytes_rewritten=sum(e.bytes for e in affected),
        job_id=job_id,
        extra=skew_stats,
    )


# --------------------------------------------------------------------------
# merge-on-read debt repayment
# --------------------------------------------------------------------------


@dataclass
class MaterializeResult:
    applied: bool
    snapshot_id: int | None = None
    files_rewritten: int = 0
    files_added: int = 0
    files_pruned: int = 0
    delete_files_removed: int = 0
    rows_deleted: int = 0
    bytes_rewritten: int = 0


def delete_where(
    spark: SparkSession,
    table: Table,
    condition: str,
    mode: str = "mor",
    job_id: str | None = None,
    stage_only: bool = False,
    branch: str | None = None,
) -> MergeResult:
    """Predicate DELETE — Iceberg's ``DELETE FROM t WHERE cond`` for
    curation cuts that aren't keyed changelogs (drop a source, purge a
    quality band, expire a date range).

    ONE live scan finds the matching rows (manifest pruning + parquet
    predicate pushdown apply to ``condition`` like any read, so a
    selective predicate touches only the files whose stats overlap);
    their keys become an engine-generated OUT-OF-BAND delete changelog
    through the ordinary MERGE — ``mode="mor"`` (default) commits one
    equality-delete file (O(matches) write, zero base rewrites — the
    right shape when the predicate sprays keys across a 100 TB table),
    ``mode="cow"`` rewrites only the affected files, and
    ``mode="mor-pos"`` commits POSITION-delete files ((file_path, pos)
    rows — Iceberg v2's second delete form: exact physical targeting,
    no key-column read at scan time, and the scan-side anti-join is a
    two-column equi-join instead of a key-plus-sequence residual; the
    commit validates the referenced files still exist, so a racing
    rewrite conflicts instead of stranding the delete).  Out-of-band means
    the hwm/GTID marks neither filter nor advance (the synthetic
    ordinal carries no position meaning — same contract as corpus
    self-dedup), so upstream changelog replay is unaffected and a
    later re-insert of a deleted key applies normally.  ``stage_only``
    (WAP) and ``branch`` compose because the MERGE is shared.

    Idempotent: a re-run scans the post-delete table, finds no matching
    live rows, and no-ops."""
    if mode == "mor-pos":
        return _delete_where_positions(
            spark, table, condition,
            job_id=job_id, stage_only=stage_only, branch=branch,
        )
    key_cols = table.key_cols
    schema = table.spark_schema()
    # branch mode: match against the BRANCH head's live rows
    matches = table.scan(spark, tag=branch) if branch else table.scan(spark)
    sel = [
        F.lit(1).cast("long").alias("ordinal"),
        F.lit("D").alias("op"),
    ]
    for f in schema.fields:
        if f.name in key_cols:
            sel.append(F.col(f.name))
        else:
            sel.append(F.lit(None).cast(f.dataType).alias(f.name))
    # persist: merge_into runs several actions over the changelog; each
    # would otherwise re-execute the predicate scan
    changelog = matches.where(condition).select(*sel).persist()
    try:
        return merge_into(
            spark, table, changelog,
            job_id=job_id, mode=mode, stage_only=stage_only, branch=branch,
            advance_checkpoint=False,
        )
    finally:
        changelog.unpersist()


def _metadata_decide_files(
    spark: SparkSession,
    table: Table,
    condition: str,
    entries: list[DataFile],
) -> tuple[list[DataFile], list[DataFile]]:
    """Classify files against the predicate from manifest metadata
    alone — Iceberg's metadata-delete test.  Returns
    ``(wholly_matching, undecidable)``; everything else is decided
    wholly NON-matching and needs no scan at all.

    Sound exactly when (a) the predicate's referenced columns are all
    partition columns (checked by analyzing it against a frame that has
    ONLY those columns — anything else fails analysis), (b) the file
    carries a value for every partition column (spec evolution can
    leave older files without one — those are conservatively
    undecidable), and (c) the file's footer records ZERO nulls in every
    partition column — the pinned value comes from min==max, which says
    nothing about null rows.  Every row of a decidable file then shares
    the file's partition tuple, so the predicate evaluates identically
    for every row: tuple-TRUE files match wholly, tuple-FALSE (or
    tuple-NULL) files match nowhere.  When the predicate is NOT
    partition-only, every file is undecidable (row-level path).
    Evaluation reuses Spark itself: one driver-local filter over an
    O(#files) frame of (path, partition values) — the predicate
    semantics are exactly the scan's, never a re-implementation."""
    pcols = table.partition_by
    if not pcols:
        return [], list(entries)
    from pyspark.sql.types import StringType, StructField, StructType

    # pfields MUST be in pcols order: the value tuples below are built
    # as [e.partition[c] for c in pcols], and a spec whose column order
    # differs from the schema's would otherwise bind values to the
    # wrong columns — with same-typed partition columns that is a
    # SILENT misclassification (wrong files dropped/kept), not an error
    by_name = {f.name: f for f in table.spark_schema().fields}
    if any(c not in by_name for c in pcols):
        return [], list(entries)  # renamed/dropped partition column era
    pfields = [by_name[c] for c in pcols]
    probe = spark.createDataFrame([], StructType(pfields))
    try:
        fdf = probe.where(condition)
        fdf.schema  # analysis-only; no job
        # a NON-DETERMINISTIC predicate (rand() < 0.5) references no
        # columns, so the partition-only analysis passes — but the
        # per-file evaluation below would collapse it to one coin flip
        # PER FILE, wholly dropping/keeping files instead of sampling
        # rows: silent wrong result.  Catalyst already knows; ask it.
        exprs = fdf._jdf.queryExecution().analyzed().expressions().iterator()
        while exprs.hasNext():
            if not exprs.next().deterministic():
                return [], list(entries)  # row-level path, evaluated per row
    except Exception:
        return [], list(entries)  # non-partition columns: row-level only
    decidable, undecidable = [], []
    for e in entries:
        ok = all(
            c in e.partition and (e.stats.get(c) or {}).get("nulls") == 0
            for c in pcols
        )
        (decidable if ok else undecidable).append(e)
    if not decidable:
        return [], undecidable
    try:
        part_df = spark.createDataFrame(
            [tuple([e.path] + [e.partition[c] for c in pcols]) for e in decidable],
            StructType([StructField("_sg_path", StringType())] + pfields),
        )
        hit = {r["_sg_path"] for r in part_df.where(condition).collect()}
    except Exception:
        # manifest partition values are JSON-native (a DateType pin is
        # an isoformat string, a Decimal a string) and may not coerce
        # into the real Spark type here — fall back to the row-level
        # path rather than crash the DELETE; correctness never depended
        # on this fast path
        return [], list(entries)
    return [e for e in decidable if e.path in hit], undecidable


def _write_pos_delete_entries(
    spark: SparkSession,
    table: Table,
    pos_df: DataFrame,
    n: int,
) -> list[DataFile]:
    """Write a (file_path, pos) frame as pos-delete files: hash-
    partitioned by path (~5M rows per file) and sorted by (path, pos)
    so each file's file_path footer min/max stays tight for the
    read-side delete-file pruning.  Shared by every pos-delete writer
    (predicate delete, eq→pos conversion, pos-file consolidation)."""
    m = max(1, -(-n // 5_000_000))
    entries = write_datafiles(
        spark, table,
        pos_df.repartition(m, "file_path"),
        sort_within_by=["file_path", "pos"],
        build_bloom=False,  # no reader probes a delete bloom
    )
    for e in entries:
        e.content = "pos-deletes"
    return entries


def _collect_eq_delete_keys(
    spark: SparkSession, table: Table, eq_dels: list[DataFile]
) -> np.ndarray | None:
    """The distinct pending equality-delete keys as a sorted driver
    array in manifest-stats canonical form — the input
    `_affected_files` manifest pruning wants — or None for key types
    whose canonical form is not order-preserving (callers skip pruning:
    every subject file affected).  Only called under a
    ``max_driver_keys`` bound (batch-sized by the maintenance
    contract)."""
    d_paths = [f"{table.root}/{d.path}" for d in eq_dels]
    kfield = [
        f for f in table.spark_schema().fields if f.name == table.key_cols[0]
    ]
    return _canon_driver_keys(
        r[0]
        for r in spark.read.schema(StructType(kfield))
        .parquet(*d_paths)
        .distinct()
        .collect()
    )


def _delete_where_positions(
    spark: SparkSession,
    table: Table,
    condition: str,
    job_id: str | None = None,
    stage_only: bool = False,
    branch: str | None = None,
) -> MergeResult:
    """``delete_where(mode="mor-pos")``: commit the matching rows'
    physical identities ((table-relative file path, row index)) as
    position-delete files — Iceberg v2 position deletes — with the
    METADATA-DELETE fast path folded in.

    Fast path first: files the predicate wholly matches by manifest
    metadata alone (partition-column-only predicates against complete
    partition tuples — `_metadata_decide_files`) drop straight from
    the manifest, never read, and wholly-NON-matching files are
    excluded from the residual scan entirely.  ``DELETE FROM t WHERE
    source = 'x'`` on a source-partitioned partition-pure table is a
    pure metadata commit with ZERO data jobs at ANY table size — the
    Iceberg metadata-delete contract.  Only undecidable files
    (partition value missing under spec evolution, nulls in a
    partition column, or a predicate touching data columns) take the
    position scan.

    The residual scan reads with ``with_file_path``/``with_pos``
    (manifest pruning + parquet predicate pushdown apply to
    ``condition`` as usual — the `_metadata.row_index` column stays
    correct under row-group skipping); the (path, pos) pairs write
    hash-partitioned by path and sorted by (path, pos), so each delete
    file's footer min/max on ``file_path`` lets readers prune delete
    files that cannot reference the files they scan.  Both halves land
    in ONE atomic commit: dropped files validate through the removal
    check, residual references through ``validate_files_exist`` — a
    concurrent rewrite of either raises ``CommitConflict`` instead of
    losing rows or dangling (the Iceberg ``validateDataFilesExist``
    contract).  Out-of-band like the other delete_where modes: position
    marks neither filter nor advance.

    ``rows_deleted`` is exact: wholly-dropped files count their LIVE
    rows (manifest row counts when no pending delete can touch them,
    a footer-cheap live count when MoR debt references them).

    Scale shape at 10^12 rows: partition-aligned cuts are O(#files)
    driver metadata; otherwise O(matched rows) written, zero data files
    rewritten, and the read-side cost is one broadcast two-column
    equi-anti-join applied only to scans of referenced files."""
    job_id = job_id or uuid.uuid4().hex[:12]
    table.refresh()
    base_sid: int | None = None
    if branch is not None:
        table.branch_chain(branch)  # validates: exists and is a branch
        base_sid = table.refs[branch]["snapshot_id"]
    entries = table.files(base_sid)
    dels = table.delete_files(base_sid)
    abs_root = os.path.abspath(table.root)

    # three-way metadata classification: wholly-matching files drop
    # without a read, wholly-non-matching files are EXCLUDED from the
    # residual scan (on a partition-pure layout the residual is empty
    # and the whole DELETE runs zero data jobs), only undecidable files
    # get scanned
    whole, rest = _metadata_decide_files(spark, table, condition, entries)

    n_whole = 0
    if whole:
        # exact live-row accounting: manifest counts are live unless
        # pending MoR debt can REACH the dropped files — prune the
        # delete set against exactly these files first (same machinery
        # as the scan), so unrelated debt elsewhere in the keyspace
        # keeps the metadata drop a zero-data-job commit
        eq_r, pos_r = table.prune_deletes_for(whole, dels)
        if eq_r or pos_r:
            n_whole = table.read_files_live(
                spark, whole, delete_entries=eq_r + pos_r
            ).count()
        else:
            n_whole = sum(e.rows for e in whole)

    matches = table.read_files_live(
        spark, rest, delete_entries=dels,
        with_file_path="_sg_fp", with_pos="_sg_pos",
    )
    pos_df = (
        matches.where(condition)
        .select(
            F.expr(f"substring(_sg_fp, {len(abs_root) + 2})").alias("file_path"),
            F.col("_sg_pos").cast("long").alias("pos"),
        )
        .persist()
    )
    try:
        n = pos_df.count()
        hwm = merge_high_water_mark(table, branch=branch)
        if n == 0 and not whole:
            return MergeResult(applied=False, high_water_mark=hwm, job_id=job_id)
        referenced = [r[0] for r in pos_df.select("file_path").distinct().collect()]
        del_entries: list[DataFile] = []
        if n > 0:
            del_entries = _write_pos_delete_entries(spark, table, pos_df, n)
        snap = table.commit(
            added=del_entries,
            removed_paths=[e.path for e in whole],
            operation="overwrite",
            summary={
                "phase": "delete-where",
                "mode": "mor-pos",
                "job-id": job_id,
                "out-of-band": True,
                "rows-pos-deleted": int(n),
                "files-dropped-metadata": len(whole),
                "rows-dropped-metadata": int(n_whole),
                "files-referenced": len(referenced),
            },
            stage_only=stage_only,
            branch=branch,
            validate_files_exist=referenced,
        )
        return MergeResult(
            applied=True,
            snapshot_id=snap.snapshot_id,
            high_water_mark=hwm,
            files_added=len(del_entries),
            rows_deleted=int(n) + int(n_whole),
            job_id=job_id,
            extra={"files_dropped_metadata": len(whole)},
        )
    finally:
        pos_df.unpersist()


def rewrite_pos_deletes(
    spark: SparkSession,
    table: Table,
    min_files: int = 2,
    job_id: str | None = None,
    branch: str | None = None,
) -> MergeResult:
    """Consolidate pending position-delete files and GC dangling
    references — the other half of Iceberg's
    ``rewrite_position_delete_files`` (``convert_eq_deletes`` is the
    convert half).

    Repeated predicate cuts / streaming micro-batches each commit their
    own pos-delete file; every one is a separate broadcast build side
    and a separate footer-pruning candidate at scan time.  This job
    reads them all, drops rows whose referenced data file is no longer
    live (danglers left behind by rewrites — harmless to reads but dead
    weight), dedupes (file_path, pos), and writes back hash-partitioned
    by path, sorted by (path, pos) — one tight delete file per ~5M rows
    with tight file_path footer min/max.  Zero data files touched; the
    commit swaps delete entries atomically, and ``validate_files_exist``
    on the surviving references closes the racing-rewrite window.

    No-ops below ``min_files`` unless dangling rows exist (then the GC
    alone justifies the rewrite).  Scale: O(pending pos rows) — batch-
    sized by the maintenance contract — plus an O(#files) driver set.
    """
    job_id = job_id or uuid.uuid4().hex[:12]
    base_sid: int | None = None
    if branch is not None:
        table.refresh()
        table.branch_chain(branch)
        base_sid = table.refs[branch]["snapshot_id"]
    else:
        table.refresh()
    pos_dels = [
        d for d in table.delete_files(base_sid) if d.content == "pos-deletes"
    ]
    hwm = merge_high_water_mark(table, branch=branch)
    if not pos_dels:
        return MergeResult(applied=False, high_water_mark=hwm, job_id=job_id)
    live_paths = {e.path for e in table.files(base_sid)}
    p_paths = [os.path.join(table.root, d.path) for d in pos_dels]
    raw = spark.read.schema("file_path string, pos long").parquet(*p_paths)
    live_df = spark.createDataFrame(
        [(p,) for p in sorted(live_paths)], "file_path string"
    )
    pos_df = (
        raw.join(F.broadcast(live_df), "file_path", "left_semi")
        .distinct()
        .persist()
    )
    try:
        n = pos_df.count()
        n_raw = sum(d.rows for d in pos_dels)
        dangling = int(n_raw - n)  # includes exact-duplicate rows, if any
        if len(pos_dels) < min_files and dangling == 0:
            return MergeResult(
                applied=False, high_water_mark=hwm, job_id=job_id,
                extra={"pos_files": len(pos_dels), "dangling_rows": 0},
            )
        referenced = [r[0] for r in pos_df.select("file_path").distinct().collect()]
        added: list[DataFile] = []
        if n > 0:
            added = _write_pos_delete_entries(spark, table, pos_df, n)
        snap = table.commit(
            added=added,
            removed_paths=[d.path for d in pos_dels],
            operation="overwrite",
            summary={
                "phase": "rewrite-pos-deletes",
                "job-id": job_id,
                "pos-delete-files-removed": len(pos_dels),
                "pos-delete-files-written": len(added),
                "dangling-rows-dropped": dangling,
                "rows-pos-deleted": int(n),
            },
            branch=branch,
            validate_files_exist=referenced,
        )
        return MergeResult(
            applied=True,
            snapshot_id=snap.snapshot_id,
            high_water_mark=hwm,
            files_added=len(added),
            rows_deleted=int(n),
            job_id=job_id,
            extra={"pos_files_removed": len(pos_dels),
                   "dangling_rows": dangling},
        )
    finally:
        pos_df.unpersist()


def update_where(
    spark: SparkSession,
    table: Table,
    condition: str,
    assignments: dict[str, str],
    mode: str = "cow",
    job_id: str | None = None,
    stage_only: bool = False,
    branch: str | None = None,
) -> MergeResult:
    """Predicate UPDATE — Iceberg's ``UPDATE t SET col = expr WHERE
    cond`` (the third DML verb next to MERGE and :func:`delete_where`;
    bulk re-scoring, source renames, metadata backfills).

    ``assignments`` maps column name -> SQL expression evaluated over
    the matching row (e.g. ``{"source": "'web-v2'", "n_tok":
    "size(tokens)"}``); key columns cannot be assigned (a key change is
    a D+I changelog event, the A10 PK-change contract — reject rather
    than silently corrupt identity).  One live scan finds the matches
    (manifest pruning + predicate pushdown), the assignments project
    map-side, and the full after-images apply as an OUT-OF-BAND ``U``
    changelog through the ordinary MERGE.  ``mode="cow"`` (default —
    an update must land the new images, so files rewrite either way
    and COW leaves no debt); ``mode="mor"`` commits the new images +
    one equality-delete file, O(matches) write, for spray-keyed bulk
    updates.  Same out-of-band cursor contract and idempotence shape
    as delete_where — though an update whose assignments change
    nothing (expr == old value) still no-ops via the merge's own
    no-op suppression only when before-images are carried; here a
    re-run re-applies the same images, which the MERGE reduces to a
    content-identical rewrite (row effect idempotent)."""
    key_cols = table.key_cols
    bad = sorted(set(assignments) & set(key_cols))
    if bad:
        raise ValueError(
            f"cannot assign key column(s) {bad}: a key change is a D+I "
            "changelog event (PK-change contract), not an UPDATE"
        )
    schema = table.spark_schema()
    unknown = sorted(set(assignments) - set(schema.fieldNames()))
    if unknown:
        raise ValueError(f"unknown column(s) in assignments: {unknown}")
    matches = table.scan(spark, tag=branch) if branch else table.scan(spark)
    filtered = matches.where(condition)
    exprs = {n: F.expr(e) for n, e in assignments.items()}
    # analyze the assignment types once: cast only on a REAL type
    # mismatch — an unconditional cast trips Spark's nullability rule
    # (array<int> nullable -> non-null is CAST_WITHOUT_SUGGESTION even
    # though the element type is identical)
    probe = filtered.select(*[c.alias(n) for n, c in exprs.items()]).schema
    sel = [
        F.lit(1).cast("long").alias("ordinal"),
        F.lit("U").alias("op"),
    ]
    for f in schema.fields:
        if f.name in exprs:
            col = exprs[f.name]
            if probe[f.name].dataType.simpleString() != f.dataType.simpleString():
                col = col.cast(f.dataType)
            sel.append(col.alias(f.name))
        else:
            sel.append(F.col(f.name))
    changelog = filtered.select(*sel).persist()
    try:
        return merge_into(
            spark, table, changelog,
            job_id=job_id, mode=mode, stage_only=stage_only, branch=branch,
            advance_checkpoint=False,
        )
    finally:
        changelog.unpersist()


def materialize_deletes(
    spark: SparkSession,
    table: Table,
    max_driver_keys: int = 2_000_000,
    branch: str | None = None,
) -> MaterializeResult:
    """Fold pending merge-on-read deletes (equality AND position) into
    the data files and drop the delete files — the debt-repayment phase
    of merge-on-read (Iceberg's rewrite_position_delete_files /
    rewrite_data_files delete-compaction).

    Only files a delete can actually hit rewrite: for EQUALITY deletes,
    a data file is subject when its sequence is below some delete's
    sequence AND its key min/max overlaps the pending key set
    (driver-side manifest pruning, same machinery as COW merge); for
    POSITION deletes, subject = exactly the files the (file_path, pos)
    rows reference (an O(#referenced-files) driver collect of the
    distinct paths — manifest scale).  Unaffected files are provably
    clean — min/max pruning has no false negatives and pos references
    are exact — so ALL pending delete files drop in the same atomic
    commit, even when nothing rewrites (dead AND dangling deletes —
    pos rows whose referenced file was since rewritten — are pure
    metadata removal).

    Cluster tags are preserved the same way the COW keep-side does:
    when every rewritten file carries one curve tag, survivors write
    back per source file, re-sorted by the recomputed curve key, so the
    next clustering pass skips them.
    """
    base_sid: int | None = None
    if branch is not None:
        table.refresh()
        table.branch_chain(branch)  # validates: exists and is a branch
        base_sid = table.refs[branch]["snapshot_id"]
    dels = table.delete_files(base_sid)
    if not dels:
        return MaterializeResult(applied=False)
    eq_dels = [d for d in dels if d.content == "eq-deletes"]
    pos_dels = [d for d in dels if d.content == "pos-deletes"]
    plan_sid = table.planning_snapshot_id(base_sid)
    key_cols = table.key_cols
    entries = table.files(base_sid)
    n_del_keys = sum(d.rows for d in dels)

    affected: list[DataFile] = []
    untouched: list[DataFile] = []
    if eq_dels:
        max_dseq = max(int(d.seq or 0) for d in eq_dels)
        subject = [e for e in entries if int(e.seq or 0) < max_dseq]
        n_eq_keys = sum(d.rows for d in eq_dels)
        if subject and 0 < n_eq_keys <= max_driver_keys:
            # exact pending-key list (bounded by the maintenance contract:
            # batch-sized deltas times passes since the last materialize)
            keys = _collect_eq_delete_keys(spark, table, eq_dels)
            if keys is None:  # non-order-preserving key type: no pruning
                affected, untouched = subject, []
            else:
                affected, untouched = _affected_files(
                    subject, keys, key_cols[0], table_root=table.root
                )
        else:
            affected, untouched = subject, []
    if pos_dels:
        # the distinct referenced paths: O(#files) driver rows, the same
        # scale bound as the manifest itself
        p_paths = [f"{table.root}/{d.path}" for d in pos_dels]
        referenced = {
            r[0]
            for r in spark.read.schema("file_path string, pos long")
            .parquet(*p_paths)
            .select("file_path")
            .distinct()
            .collect()
        }
        already = {e.path for e in affected}
        extra = [
            e for e in entries if e.path in referenced and e.path not in already
        ]
        affected = affected + extra
        extra_paths = {e.path for e in extra}
        untouched = [e for e in untouched if e.path not in extra_paths]

    new_entries: list[DataFile] = []
    if affected:
        keep_tags = {e.sort_order for e in affected}
        # per-file survivor writes stay task-local ONLY while the delete
        # anti-join inside read_files_live broadcasts (same
        # max_broadcast_delete_rows gate); a shuffled anti-join sprays
        # each source file's rows across tasks, and group-local writes
        # would then emit up to n_tasks small files PER rewritten file —
        # the exact small-file explosion the COW keep-side gates against
        keep_tag = (
            keep_tags.pop()
            if len(keep_tags) == 1 and n_del_keys <= 5_000_000
            else None
        )
        if keep_tag and keep_tag.rsplit("-", 1)[0] not in ("zorder", "hilbert"):
            keep_tag = None
        if keep_tag:
            from canal_spark.cluster import cluster_dims, with_cluster_key

            src = table.read_files_live(
                spark, affected, delete_entries=dels, with_file_path="_fp"
            )
            keep = src.withColumn("_kgrp", F.md5(F.col("_fp"))).drop("_fp")
            keep = with_cluster_key(
                keep, curve=keep_tag.rsplit("-", 1)[0], doc_col=key_cols,
                source_col=cluster_dims(table)[1],
            )
            new_entries = write_datafiles(
                spark, table, keep,
                group_col="_kgrp", group_local=True,
                sort_within_by=["_ckey"], drop_cols=["_ckey"],
                sort_order=keep_tag,
            )
        else:
            keep = table.read_files_live(spark, affected, delete_entries=dels)
            new_entries = write_datafiles(spark, table, keep, sort_within_by=key_cols)

    snap = table.commit(
        added=new_entries,
        removed_paths=[e.path for e in affected] + [d.path for d in dels],
        operation="overwrite",
        summary={
            "phase": "materialize-deletes",
            "delete-files-removed": len(dels),
            "pending-delete-keys": int(n_del_keys),
            "eq-delete-files": len(eq_dels),
            "pos-delete-files": len(pos_dels),
        },
        branch=branch,
        # only a REWRITE can strand a concurrent delete; when every
        # pending delete is dead (affected == []) this commit is a pure
        # metadata drop, and validating would spuriously conflict with
        # any MoR merge landing mid-flight — under sustained write load
        # the dead-delete GC could then never commit
        validate_no_new_deletes_since=plan_sid if affected else None,
    )
    return MaterializeResult(
        applied=True,
        snapshot_id=snap.snapshot_id,
        files_rewritten=len(affected),
        files_added=len(new_entries),
        files_pruned=len(entries) - len(affected),
        delete_files_removed=len(dels),
        rows_deleted=sum(e.rows for e in affected) - sum(e.rows for e in new_entries),
        bytes_rewritten=sum(e.bytes for e in affected),
    )


def convert_eq_deletes(
    spark: SparkSession,
    table: Table,
    max_driver_keys: int = 2_000_000,
    job_id: str | None = None,
    branch: str | None = None,
) -> MergeResult:
    """Convert pending EQUALITY deletes to POSITION deletes without
    rewriting any data files — the minor delete compaction of Iceberg's
    ``rewrite_position_delete_files`` convert-equality-deletes path.

    Why: the two MoR forms price differently on the two sides.  The eq
    form is the cheap WRITE (a keyed changelog commits its delete keys
    with no scan at all) but the expensive READ (every scan pays a
    key-join with a per-row sequence residual — measured 2.63 s vs a
    clean 0.15 s at sf0.1×40, BASELINE.md); the pos form reads cheap
    (2-key hash anti-join, no residual, footer-pruned — 0.52 s) but
    writing it directly needs a scan.  Converting once after a burst of
    MoR merges buys the cheap read for every subsequent scan while
    still deferring the data-file rewrite to ``materialize_deletes``.

    Mechanics: ONE column-pruned scan (key columns + file metadata
    only, never the token arrays) of the manifest-pruned subject files
    — the inverse join of the live read: a LEFT SEMI against the
    pending eq-delete keys with the same strictly-smaller-sequence
    residual yields exactly the killed rows' (file_path, pos) pairs.
    The atomic commit adds the pos-delete files and removes the eq
    files; ``validate_files_exist`` makes a racing rewrite of a subject
    file a clean conflict (the standard replan), and the removal
    validation makes a racing ``materialize_deletes`` one.  Scan
    results are bit-identical before and after by construction.

    Scale shape at 10^12 rows: subject files come from the same
    manifest pruning as COW merge (key min/max overlap, bloom sidecars
    when present), the scan reads one key column + row indexes of only
    those files, the delete side broadcasts (batch-sized by the
    maintenance contract), and the output is O(killed rows)."""
    from pyspark.sql.types import StructType

    job_id = job_id or uuid.uuid4().hex[:12]
    base_sid: int | None = None
    if branch is not None:
        table.refresh()
        table.branch_chain(branch)  # validates: exists and is a branch
        base_sid = table.refs[branch]["snapshot_id"]
    else:
        table.refresh()
    eq_dels = [
        d for d in table.delete_files(base_sid) if d.content == "eq-deletes"
    ]
    hwm = merge_high_water_mark(table, branch=branch)
    if not eq_dels:
        return MergeResult(applied=False, high_water_mark=hwm, job_id=job_id)
    key_cols = table.key_cols
    entries = table.files(base_sid)
    max_dseq = max(int(d.seq or 0) for d in eq_dels)
    subject = [e for e in entries if int(e.seq or 0) < max_dseq]
    n_eq_keys = sum(d.rows for d in eq_dels)
    if subject and 0 < n_eq_keys <= max_driver_keys:
        # same manifest pruning as materialize/COW merge: only files
        # whose key range (and bloom sidecar, when present) can contain
        # a pending key are scanned at all
        keys = _collect_eq_delete_keys(spark, table, eq_dels)
        if keys is not None:  # None: non-order-preserving key, no pruning
            subject, _ = _affected_files(
                subject, keys, key_cols[0], table_root=table.root
            )
    if not subject:
        # dead eq deletes (no file can contain their keys): dropping
        # them is pure metadata removal, nothing to convert
        snap = table.commit(
            added=[],
            removed_paths=[d.path for d in eq_dels],
            operation="overwrite",
            summary={
                "phase": "convert-deletes",
                "job-id": job_id,
                "eq-delete-files-removed": len(eq_dels),
                "rows-pos-deleted": 0,
            },
            branch=branch,
        )
        return MergeResult(
            applied=True, snapshot_id=snap.snapshot_id, high_water_mark=hwm,
            job_id=job_id, extra={"eq_files_removed": len(eq_dels)},
        )

    abs_root = os.path.abspath(table.root)
    fp, pos = "_sg_fp", "_sg_pos"
    df = table.read_files(
        spark, subject, with_file_path=fp, with_pos=pos
    ).select(*key_cols, fp, pos)
    # the semi half of read_files_live's anti join — ONE shared
    # implementation of the sequence rules (path normalization, seq
    # defaulting, key+seq residual), so conversion output can never
    # drift from scan semantics
    pos_df = (
        table.eq_delete_join(spark, df, subject, eq_dels, fp, "left_semi")
        .select(
            F.expr(f"substring({fp}, {len(abs_root) + 2})").alias("file_path"),
            F.col(pos).cast("long").alias("pos"),
        )
        .persist()
    )
    try:
        n = pos_df.count()
        referenced = [r[0] for r in pos_df.select("file_path").distinct().collect()]
        added: list[DataFile] = []
        if n > 0:
            added = _write_pos_delete_entries(spark, table, pos_df, n)
        snap = table.commit(
            added=added,
            removed_paths=[d.path for d in eq_dels],
            operation="overwrite",
            summary={
                "phase": "convert-deletes",
                "job-id": job_id,
                "eq-delete-files-removed": len(eq_dels),
                "rows-pos-deleted": int(n),
                "files-referenced": len(referenced),
            },
            branch=branch,
            validate_files_exist=referenced,
        )
        return MergeResult(
            applied=True,
            snapshot_id=snap.snapshot_id,
            high_water_mark=hwm,
            files_added=len(added),
            rows_deleted=int(n),
            job_id=job_id,
            extra={"eq_files_removed": len(eq_dels)},
        )
    finally:
        pos_df.unpersist()
