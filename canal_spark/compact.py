"""Small-file compaction: greedy bin-packing into target-size files.

The reference's byte-budgeted batching (MEMSIZE mode: a batch is
``batchSize x 1024`` *bytes*, not a row count —
store/.../MemoryEventStoreWithBuffer.java:308-330, BatchMode.java:15)
reappears here as the compaction sizing rule: data files are packed by
byte budget into ~512 MB targets (optionally by exact ``sum(n_tok)``
token budget, per BASELINE.json.north_star).

Plan is computed **driver-side over the manifest** (O(#files), never
O(rows)); the rewrite is one Spark job: victims are read, every row is
tagged with its bin via a broadcast path->bin map, and the
repartition(n, bin) + partitionBy(bin) write emits exactly one file
per bin, sorted by doc_id within the file so manifest min/max stats
stay tight for merge pruning.

Resumability: ``max_bins_per_commit`` chunks large compactions into
several atomic commits; a crash between chunks loses nothing — the
re-run replans from the current manifest, already-compacted files now
exceed ``small_file_bytes`` and are skipped (idempotent at bin
granularity).  A crash *during* a chunk leaves only orphaned staging
files, never a half-commit.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from canal_spark.table.format import DataFile, Table
from canal_spark.table.writer import write_datafiles

TARGET_FILE_BYTES = 512 * 1024 * 1024


@dataclass
class CompactionResult:
    bins_written: int = 0
    files_removed: int = 0
    bytes_compacted: int = 0
    commits: int = 0
    snapshot_ids: list[int] = field(default_factory=list)
    job_id: str = ""


def plan_bins(
    entries: list[DataFile],
    target_bytes: int = TARGET_FILE_BYTES,
    small_file_bytes: int | None = None,
    weights: dict[str, int] | None = None,
    target_weight: int | None = None,
) -> list[list[DataFile]]:
    """Greedy first-fit-decreasing pack of small files into bins.

    Packing never crosses a partition boundary (files of different
    ``source`` partitions stay separate, like Iceberg's per-partition
    rewrite groups).  Only bins that actually coalesce (≥2 files) are
    returned.  ``weights``/``target_weight`` switch the budget from
    bytes to an arbitrary per-file weight (e.g. exact token sums).
    """
    small = small_file_bytes if small_file_bytes is not None else target_bytes // 2

    def w(e: DataFile) -> int:
        if weights is None:
            return e.bytes
        # a zero-row victim file produces no groupBy row in
        # token_weights, so it is legitimately absent from the dict — it
        # packs for free (and the rewrite drops it).  Any OTHER missing
        # path is a lookup-key mismatch (stale weights, path
        # normalization drift) and must fail at planning time, not pack
        # everything into one unbounded bin at weight 0.
        return 0 if e.rows == 0 else weights[e.path]

    budget = target_weight if weights is not None else target_bytes

    groups: dict[str, list[DataFile]] = {}
    for e in entries:
        if e.bytes < small:
            groups.setdefault(json.dumps(e.partition, sort_keys=True), []).append(e)

    bins: list[list[DataFile]] = []
    for _, files in sorted(groups.items()):
        files.sort(key=w, reverse=True)
        open_bins: list[tuple[int, list[DataFile]]] = []
        for e in files:
            placed = False
            for i, (tot, members) in enumerate(open_bins):
                if tot + w(e) <= budget:
                    open_bins[i] = (tot + w(e), members + [e])
                    placed = True
                    break
            if not placed:
                open_bins.append((w(e), [e]))
        bins.extend(members for _, members in open_bins if len(members) >= 2)
    return bins


def token_weights(
    spark: SparkSession,
    table: Table,
    entries: list[DataFile],
    weight_col: str = "n_tok",
) -> dict[str, int]:
    """Exact sum(weight_col) per file — a column-pruned scan of only the
    weight column (Parquet reads one column; tokens never leave disk).

    The weight column is resolved against the table's CURRENT schema:
    after ``evolve_schema(rename=[("n_tok", ...)])`` the old name no
    longer exists and packing by it must fail loudly, not with an
    AnalysisException deep inside the select."""
    names = table.spark_schema().fieldNames()
    if weight_col not in names:
        raise ValueError(
            f"pack_by weight column {weight_col!r} not in the table's current "
            f"schema {names} — if the column was renamed via evolve_schema, "
            "pass its current name"
        )
    rows = (
        table.read_files(spark, entries, with_file_path="fp")
        .select("fp", weight_col)
        .groupBy("fp")
        # coalesce: a file written before the column was added (or with
        # all-null values) sums to NULL — weight 0, not a TypeError
        .agg(F.coalesce(F.sum(weight_col), F.lit(0)).alias("w"))
        .collect()
    )
    import os

    by_abs = {os.path.abspath(f"{table.root}/{e.path}"): e.path for e in entries}
    return {by_abs[r["fp"]]: int(r["w"]) for r in rows if r["fp"] in by_abs}


def compact(
    spark: SparkSession,
    table: Table,
    target_bytes: int = TARGET_FILE_BYTES,
    small_file_bytes: int | None = None,
    pack_by: str = "bytes",  # "bytes" | a weight column name (e.g. "n_tok")
    tokens_per_target: int | None = None,
    max_bins_per_commit: int = 64,
    job_id: str | None = None,
    branch: str | None = None,
) -> CompactionResult:
    """Rewrite small files into ~target-size files; scan-equivalent.

    ``pack_by`` is either ``"bytes"`` or the name of a numeric column in
    the table's *current* schema whose per-file sum becomes the bin
    budget (validated in :func:`token_weights` — survives renames as
    long as the caller passes the current name).

    ``branch``: operate ON a writable branch — victims, pending deletes
    and every chunk commit pin to the branch head; mainline readers see
    nothing until ``fast_forward``."""
    job_id = job_id or uuid.uuid4().hex[:12]
    base_sid: int | None = None
    if branch is not None:
        table.refresh()
        table.branch_chain(branch)  # validates: exists and is a branch
        base_sid = table.refs[branch]["snapshot_id"]
    entries = table.files(base_sid)
    # ONE cutoff shared with plan_bins: if the victim pick and the
    # plan's grouping ever diverged, plan_bins would KeyError on a
    # small file token_weights never weighed
    small = small_file_bytes if small_file_bytes is not None else target_bytes // 2
    if pack_by != "bytes":
        victims = [e for e in entries if e.bytes < small]
        weights = token_weights(spark, table, victims, weight_col=pack_by)
        tgt_w = tokens_per_target or target_bytes // 4  # ~4 B/token
        bins = plan_bins(
            entries, target_bytes, small, weights=weights, target_weight=tgt_w
        )
    else:
        bins = plan_bins(entries, target_bytes, small)

    # Cluster-tag preservation: a bin whose members ALL carry the same
    # curve tag (cluster's sort_order, e.g. "zorder-v1") is re-sorted by
    # that CURVE key and the output keeps the tag — merging
    # curve-sorted files of one partition stays clustered.  Without
    # this, compaction emits untagged doc_id-sorted files that the NEXT
    # pass's incremental clustering rewrites again: cold data would
    # ping-pong between cluster and compact forever, and at the
    # 10^12-row design point that churn (every cold byte rewritten
    # twice per pass) dominates the whole engine's write amplification.
    # Bins are grouped by tag so each write stamps one sort_order;
    # mixed/untagged bins keep the legacy doc_id sort.
    by_tag: dict[str | None, list[list[DataFile]]] = {}
    for members in bins:
        tags = {e.sort_order for e in members}
        tag = tags.pop() if len(tags) == 1 else None
        curve = (tag or "").rsplit("-", 1)[0]
        if curve not in ("zorder", "hilbert"):
            tag = None  # unknown order: re-sorting by it is impossible
        by_tag.setdefault(tag, []).append(members)

    result = CompactionResult(job_id=job_id)
    for tag in sorted(by_tag, key=lambda t: t or ""):
        tag_bins = by_tag[tag]
        for start in range(0, len(tag_bins), max_bins_per_commit):
            chunk = tag_bins[start : start + max_bins_per_commit]
            result = _rewrite_chunk(
                spark, table, chunk, tag, job_id, result,
                branch=branch, base_sid=base_sid,
            )
    return result


def _rewrite_chunk(
    spark: SparkSession,
    table: Table,
    chunk: list[list[DataFile]],
    tag: str | None,
    job_id: str,
    result: CompactionResult,
    branch: str | None = None,
    base_sid: int | None = None,
) -> CompactionResult:
    """Read one chunk of bins, rewrite each bin into one file (curve-
    sorted + tagged when ``tag`` is set, doc_id-sorted otherwise), and
    commit atomically, accumulating into ``result``."""
    import os

    path_to_bin = {}
    removed = []
    for b, members in enumerate(chunk):
        for e in members:
            path_to_bin[os.path.abspath(f"{table.root}/{e.path}")] = b
            removed.append(e.path)

    bin_map = spark.createDataFrame(
        [(p, b) for p, b in path_to_bin.items()], ["_fp", "_bin"]
    )
    flat = [e for m in chunk for e in m]
    pending_dels = table.delete_files(base_sid)
    # planning snapshot for commit-time rewrite validation: a MoR delete
    # landing between this read and the chunk commit must conflict, not
    # be stranded by the rewrite (earlier chunk commits of this same
    # compaction add no deletes, so they never trip it)
    plan_sid = table.planning_snapshot_id(base_sid)
    df = (
        # live read: pending MoR equality-deletes fold in here, or the
        # rewritten bins (new sequence) would resurrect deleted rows
        # (branch mode: the BRANCH's pending deletes)
        table.read_files_live(
            spark, flat, delete_entries=pending_dels, with_file_path="_fp"
        )
        .join(F.broadcast(bin_map), "_fp")
        .drop("_fp")
    )
    sort_by, drop_cols = table.key_cols, None
    if tag is not None:
        # recompute the curve key (vectorized Arrow kernel over only
        # the bin rows) and keep the bin internally curve-sorted
        from canal_spark.cluster import cluster_dims, with_cluster_key

        curve = tag.rsplit("-", 1)[0]
        df = with_cluster_key(
            df, curve=curve, doc_col=table.key_cols,
            source_col=cluster_dims(table)[1],
        )
        sort_by, drop_cols = ["_ckey"], ["_ckey"]
    # guard against silent path-join misses: rows in must equal rows
    # out — except while MoR delete debt is pending, when the live read
    # legitimately drops deleted rows and manifest counts are only an
    # upper bound (the exact check resumes once materialize_deletes
    # repays the debt)
    expected_rows = sum(e.rows for m in chunk for e in m)
    # a delete is RELEVANT to this chunk only if its sequence exceeds
    # some member file's (the strict inequality read_files_live applies)
    # — deletes that cannot touch the chunk must not disable the guard,
    # or any path-join miss would silently commit data loss while
    # unrelated delete debt merely exists
    min_member_seq = min(int(e.seq or 0) for m in chunk for e in m)
    deletes_pending = any(
        int(d.seq or 0) > min_member_seq for d in pending_dels
    )
    new_entries = write_datafiles(
        spark,
        table,
        df,
        group_col="_bin",
        n_groups=len(chunk),
        sort_within_by=sort_by,
        drop_cols=drop_cols,
        sort_order=tag,
    )
    got_rows = sum(e.rows for e in new_entries)
    if got_rows != expected_rows and not (deletes_pending and got_rows < expected_rows):
        raise RuntimeError(
            f"compaction row mismatch: read {expected_rows}, wrote {got_rows} "
            "(path-join miss?) — aborting before commit"
        )
    snap = table.commit(
        added=new_entries,
        removed_paths=removed,
        operation="replace",
        summary={
            "phase": "compact",
            "job-id": job_id,
            "bins": len(chunk),
            "sort-order": tag or "",
        },
        branch=branch,
        validate_no_new_deletes_since=plan_sid,
    )
    result.bins_written += len(chunk)
    result.files_removed += len(removed)
    result.bytes_compacted += sum(e.bytes for m in chunk for e in m)
    result.commits += 1
    result.snapshot_ids.append(snap.snapshot_id)
    return result
