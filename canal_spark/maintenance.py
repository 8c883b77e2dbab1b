"""The maintenance pass: merge -> cluster -> compact -> expire.

The Spark restatement of the reference's adapter consume loop
(client-adapter/launcher/.../CanalAdapterWorker.java:83-135 —
get batch -> apply -> ack, rollback+retry on failure): each phase is
an atomic snapshot commit; a crash anywhere leaves the table at the
last committed phase, and a re-run resumes — merge replays filter to
empty (high-water mark), compaction replans only still-small files,
clustering and expiry are idempotent rewrites.  Every phase appends a
lineage row with its metrics.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from canal_spark import cluster as _cluster
from canal_spark import compact as _compact
from canal_spark import checkpoint as _ckpt
from canal_spark import merge as _merge
from canal_spark.table.format import Table


@dataclass
class MaintenanceReport:
    job_id: str
    merge: dict = field(default_factory=dict)
    wap: dict = field(default_factory=dict)
    ivf_index: dict = field(default_factory=dict)
    materialize: dict = field(default_factory=dict)
    convert: dict = field(default_factory=dict)
    pos_rewrite: dict = field(default_factory=dict)
    span_cut: dict = field(default_factory=dict)
    compact: dict = field(default_factory=dict)
    cluster: dict = field(default_factory=dict)
    expire: dict = field(default_factory=dict)
    band_index: dict = field(default_factory=dict)
    branch: dict = field(default_factory=dict)
    # wall seconds per phase — the per-pass cost breakdown an operator
    # reads first when a pass regresses (which phase grew?)
    timings: dict = field(default_factory=dict)


def audit_snapshot(
    spark: SparkSession,
    table: Table,
    snapshot_id: int,
    parent_rows: int | None = None,
    max_delete_fraction: float | None = None,
) -> dict:
    """The audit half of write-audit-publish: structural invariants of
    a staged snapshot, computed in ONE aggregation over its scan.

    Checks (each a named count, 0 = pass):

    * ``null_keys`` — no key column is null (a null key can never be
      matched by a later changelog event: the row would be unreachable).
    * ``dup_keys`` — MERGE output is key-unique (last-wins applied).
    * ``bad_token_arrays`` — the north-rule per-row invariant on token
      tables: ``n_tok == size(tokens)`` and ``tokens`` non-null
      (skipped when the schema has no tokens column).
    * ``delete_bound`` — optional runaway-delete guard: the staged row
      count must be >= ``parent_rows * (1 - max_delete_fraction)``
      (the classic WAP use: a bug that deletes half the table must not
      publish).
    """
    from pyspark.sql import functions as F

    df = table.scan(spark, snapshot_id=snapshot_id)
    cols = set(df.columns)
    key_cols = [k for k in table.key_cols if k in cols]
    aggs = [F.count(F.lit(1)).alias("rows")]
    if key_cols:
        null_key = None
        for k in key_cols:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        aggs.append(F.sum(F.when(null_key, 1).otherwise(0)).alias("null_keys"))
        aggs.append(F.count_distinct(F.struct(*key_cols)).alias("distinct_keys"))
    if {"tokens", "n_tok"} <= cols:
        # eqNullSafe: a NULL n_tok must COUNT as bad — with a plain !=
        # the comparison is NULL, F.when(NULL, 1).otherwise(0) scores 0,
        # and the exact row class this audit exists to quarantine
        # publishes cleanly
        bad = F.col("tokens").isNull() | ~F.size("tokens").eqNullSafe(
            F.col("n_tok")
        )
        aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias("bad_token_arrays"))
    row = df.agg(*aggs).collect()[0].asDict()
    rows = int(row["rows"] or 0)
    checks = {
        "null_keys": int(row.get("null_keys") or 0),
        "dup_keys": (rows - int(row["distinct_keys"])) if key_cols else 0,
        "bad_token_arrays": int(row.get("bad_token_arrays") or 0),
    }
    if max_delete_fraction is not None and parent_rows:
        floor_rows = int(parent_rows * (1.0 - max_delete_fraction))
        checks["delete_bound"] = max(0, floor_rows - rows)
    ok = all(v == 0 for v in checks.values())
    return {"ok": ok, "rows": rows, "checks": checks}


def wap_parent_rows(spark: SparkSession, table: Table) -> int:
    """Live row count of the CURRENT snapshot for the delete-bound
    audit.  The manifest sum (`row_count`) is an upper bound that
    ignores pending merge-on-read delete debt — comparing it against
    the staged scan's LIVE count would falsely quarantine healthy
    batches on a debt-carrying table — so fall to an actual scan count
    only when delete files are pending (the uncommon window)."""
    if table.delete_files():
        return table.scan(spark).count()
    return table.row_count()


def wap_finalize(
    spark: SparkSession,
    table: Table,
    merge_result,
    parent_rows: int | None = None,
    max_delete_fraction: float | None = None,
) -> dict:
    """Audit a staged merge and publish it — the one shared
    publish-or-abort gate for every WAP flow (batch pass, streaming
    micro-batch, corpus self-dedup).

    The staged snapshot NEVER outlives this call on a failure path:
    a failed audit aborts it (returned with ``published: False``); an
    exception from the audit scan or from publish (e.g.
    :class:`CommitConflict` because the mainline advanced past the
    stage's parent — expected under concurrent compaction) aborts it
    and re-raises, so the caller's retry re-stages against the new
    base instead of leaking an expire-proof snapshot."""
    try:
        audit = audit_snapshot(
            spark, table, merge_result.snapshot_id,
            parent_rows=parent_rows,
            max_delete_fraction=max_delete_fraction,
        )
    except BaseException:
        table.abort_staged(merge_result.snapshot_id)
        raise
    rep = {"staged_snapshot_id": merge_result.snapshot_id, **audit}
    if not audit["ok"]:
        table.abort_staged(merge_result.snapshot_id)
        rep["published"] = False
        return rep
    try:
        table.publish(merge_result.snapshot_id)
    except BaseException:
        table.abort_staged(merge_result.snapshot_id)
        raise
    rep["published"] = True
    return rep


def run_pass(
    spark: SparkSession,
    table: Table,
    changes: DataFrame | None = None,
    lineage_root: str | None = None,
    target_file_bytes: int = _compact.TARGET_FILE_BYTES,
    target_file_rows: int = 500_000,
    pack_by: str = "n_tok",  # north_rule: bin-pack by token sums
    curve: str = "zorder",
    cluster_scope: str = "incremental",
    do_cluster: bool = True,
    do_compact: bool = True,
    keep_snapshots: int = 5,
    measure: bool = True,
    job_id: str | None = None,
    band_index: Table | None = None,
    ivf_index: Table | None = None,
    merge_mode: str = "cow",
    max_pending_delete_files: int = 8,
    convert_eq_debt: bool = False,
    rewrite_pos_debt_files: int | None = None,
    wap: bool = False,
    wap_max_delete_fraction: float | None = None,
    branch: str | None = None,
    publish_branch: bool = True,
    span_cut: bool = False,
    span_cut_w: int | None = None,
    span_cut_sample_mod: int = 1,
    span_cut_max_fraction: float = 0.5,
) -> MaintenanceReport:
    """One maintenance pass.  ``merge_mode="mor"`` applies the changelog
    as merge-on-read equality deletes (O(batch) write, zero base-table
    reads); the accumulated delete debt is repaid by
    ``materialize_deletes`` once ``max_pending_delete_files`` pile up —
    the amortization knob: higher defers rewrite I/O across more
    batches, at the cost of one extra broadcast anti-join per scan in
    the window.  ``convert_eq_debt=True`` adds the middle policy: below
    the threshold, pending equality deletes convert to position deletes
    (``convert_eq_deletes`` — zero data rewrites) so the in-window scan
    tax drops to the cheap 2-key form.  ``rewrite_pos_debt_files=k``
    consolidates pos-delete files once k accumulate
    (``rewrite_pos_deletes`` — merges small delete files, GCs dangling
    rows, zero data rewrites).

    ``branch="name"`` runs the WHOLE pass on a writable branch
    (Iceberg's ``spark.wap.branch`` flow): merge, debt materialization,
    clustering and compaction all commit to the branch (created here if
    absent), mainline readers see the pre-pass table throughout, and
    the chain publishes atomically at the end (``publish_branch=True``,
    the default) or stays for out-of-band audit (``False`` — publish
    with ``table.fast_forward``, discard with ``delete_branch``).  A
    concurrent mainline writer makes the publish CONFLICT rather than
    lose either side's work — the report carries ``branch.published``.
    Mutually exclusive with ``wap`` (branches ARE multi-commit WAP) and
    with derived-index sync (indexes track PUBLISHED mainline state —
    sync them on the next mainline pass after the branch publishes).
    Snapshot expiry is skipped unless the branch published."""
    if branch is not None:
        if wap:
            raise ValueError("wap and branch are mutually exclusive "
                             "(a branch pass IS the multi-commit WAP)")
        if band_index is not None or ivf_index is not None:
            raise ValueError(
                "derived-index sync tracks published mainline state — "
                "run it on a mainline pass, not a branch pass"
            )
        if span_cut:
            raise ValueError(
                "span_cut applies an out-of-band mainline merge — "
                "run it on a mainline pass, not a branch pass"
            )
    job_id = job_id or uuid.uuid4().hex[:12]
    lineage = _ckpt.ensure_lineage(lineage_root) if lineage_root else None
    rep = MaintenanceReport(job_id=job_id)
    if branch is not None:
        table.refresh()
        ref = table.refs.get(branch)
        if ref is None:
            table.create_branch(branch)
        elif ref.get("type") != "branch":
            raise ValueError(f"ref {branch!r} exists and is not a branch")

    merge_live = False
    if changes is not None:
        _t0 = time.perf_counter()
        # write-audit-publish: merge into a STAGED snapshot (readers keep
        # the pre-batch table; hwm/GTID marks defer with it), audit its
        # structural invariants, then publish — or abort, leaving the
        # batch unapplied so the next pass retries it after the upstream
        # bug is fixed.  Exactly Iceberg's spark.wap.id flow, run by the
        # pass itself.
        # the live-row count feeds ONLY the delete-fraction bound — on a
        # debt-carrying MoR table it is a full anti-joined scan, so skip
        # it when no bound is configured (audit_snapshot ignores it)
        parent_rows = (
            wap_parent_rows(spark, table)
            if wap and wap_max_delete_fraction is not None
            else None
        )
        m = _merge.merge_into(
            spark, table, changes, target_file_rows=target_file_rows, job_id=job_id,
            mode=merge_mode, stage_only=wap, branch=branch,
        )
        merge_live = m.applied
        if wap and m.applied:
            rep.wap = wap_finalize(
                spark, table, m,
                parent_rows=parent_rows,
                max_delete_fraction=wap_max_delete_fraction,
            )
            if not rep.wap["published"]:
                merge_live = False  # batch stays unapplied; indexes skip
        # an aborted stage reports applied=False: nothing reached readers
        rep.merge = {**m.__dict__, "applied": merge_live}
        rep.timings["merge"] = round(time.perf_counter() - _t0, 3)
        if lineage and merge_live:
            _ckpt.record(
                spark, lineage, job_id, "merge",
                ordinal=m.high_water_mark, snapshot_id=m.snapshot_id,
                files_rewritten=m.files_rewritten, bytes_shuffled=m.bytes_rewritten,
            )
        # Derived-store sync (ES-adapter analogue): keep the MinHash band
        # index in step with the batch's keys, right after the data
        # merge so the index reads the post-merge row states.  Keys come
        # from the changelog (a superset of applied keys is fine — the
        # refresh is idempotent per key).  Runs ALSO when the merge was
        # a pure replay (m.applied False because the hwm already covers
        # the batch): that is the recovery path for a crash BETWEEN the
        # merge commit and the index commit — without it the re-run
        # would skip the sync forever and the index would stay stale
        # for the batch's keys.  A WAP-aborted stage (m.applied True,
        # published False) must NOT sync: readers never saw the batch.
        sync_indexes = merge_live or not m.applied
        if band_index is not None and sync_indexes:
            from canal_spark.dedup_index import refresh_band_index

            _t0 = time.perf_counter()

            b = refresh_band_index(
                spark, table, band_index,
                keys=changes.select("doc_id"),
                job_id=job_id,
            )
            rep.band_index = b.__dict__
            rep.timings["band_index"] = round(time.perf_counter() - _t0, 3)
            if lineage and b.applied:
                _ckpt.record(
                    spark, lineage, job_id, "band_index",
                    snapshot_id=b.snapshot_id,
                    files_rewritten=b.files_rewritten,
                    metrics={
                        "dup_candidates": b.dup_candidates,
                        "hot_buckets_capped": b.hot_buckets_capped,
                    },
                )
        # Second derived store: the IVF (ANN) cell index — changed keys
        # re-assign under the FROZEN codebook, deletes fall out.
        # Same replay-heals-crash gate as the band index above.
        if ivf_index is not None and sync_indexes:
            from canal_spark.ann_index import refresh_ivf_index

            _t0 = time.perf_counter()
            v = refresh_ivf_index(
                spark, table, ivf_index,
                keys=changes.select(table.key_cols[0]),
                job_id=job_id,
            )
            rep.ivf_index = v.__dict__
            rep.timings["ivf_index"] = round(time.perf_counter() - _t0, 3)
            if lineage and v.applied:
                _ckpt.record(
                    spark, lineage, job_id, "ivf_index",
                    snapshot_id=v.snapshot_id,
                    files_rewritten=v.files_rewritten,
                    metrics={"vecs_changed": v.vecs_changed},
                )

    # Repay merge-on-read debt BEFORE clustering: once enough delete
    # files accumulate, fold them into the data files in one pass (the
    # rewrite prunes to files the pending keys can actually hit and
    # preserves cluster tags).  Below the threshold the debt rides —
    # scans pay one small broadcast anti-join, writes pay nothing.
    if branch is not None:
        table.refresh()
        pending = table.delete_files(table.refs[branch]["snapshot_id"])
    else:
        pending = table.delete_files()
    if len(pending) >= max_pending_delete_files:
        _t0 = time.perf_counter()
        mat = _merge.materialize_deletes(spark, table, branch=branch)
        rep.materialize = mat.__dict__
        rep.timings["materialize"] = round(time.perf_counter() - _t0, 3)
        if lineage and mat.applied:
            _ckpt.record(
                spark, lineage, job_id, "materialize",
                snapshot_id=mat.snapshot_id,
                files_rewritten=mat.files_rewritten,
                bytes_shuffled=mat.bytes_rewritten,
            )
    elif convert_eq_debt and any(d.content == "eq-deletes" for d in pending):
        # below the materialize threshold the debt rides — but eq debt
        # taxes every scan with a key-join + sequence residual (~5× the
        # pos form's 2-key anti-join, BASELINE.md).  The convert policy
        # pays ONE column-pruned scan of the manifest-pruned subject
        # files to flip the debt to the cheap form, still deferring the
        # data rewrite to the threshold materialize.
        _t0 = time.perf_counter()
        conv = _merge.convert_eq_deletes(spark, table, branch=branch)
        rep.convert = {k: v for k, v in conv.__dict__.items() if k != "extra"}
        rep.convert.update(conv.extra)
        rep.timings["convert"] = round(time.perf_counter() - _t0, 3)
        if lineage and conv.applied:
            _ckpt.record(
                spark, lineage, job_id, "convert-deletes",
                snapshot_id=conv.snapshot_id,
                files_rewritten=0,
                metrics={"rows_pos_deleted": conv.rows_deleted,
                         "eq_files_removed": conv.extra.get(
                             "eq_files_removed", 0)},
            )
    # pos-file consolidation is independent of the eq policies above
    # (skipped when materialize just cleared everything): many small
    # pos-delete files — each a separate broadcast build side — merge
    # into tight ones and dangling rows GC, zero data files touched
    if rewrite_pos_debt_files is not None:
        if branch is not None:
            table.refresh()
            # the shared helper owns the content-string filter: a new
            # delete form added there can never be missed here
            pos_pending = table.pos_delete_files(
                table.refs[branch]["snapshot_id"]
            )
        else:
            pos_pending = table.pos_delete_files()
        if len(pos_pending) >= rewrite_pos_debt_files:
            _t0 = time.perf_counter()
            pr = _merge.rewrite_pos_deletes(
                spark, table, min_files=rewrite_pos_debt_files, branch=branch
            )
            rep.pos_rewrite = {
                k: v for k, v in pr.__dict__.items() if k != "extra"
            }
            rep.pos_rewrite.update(pr.extra)
            rep.timings["pos_rewrite"] = round(time.perf_counter() - _t0, 3)
            if lineage and pr.applied:
                _ckpt.record(
                    spark, lineage, job_id, "rewrite-pos-deletes",
                    snapshot_id=pr.snapshot_id,
                    files_rewritten=0,
                    metrics={
                        "pos_files_removed": pr.extra.get("pos_files_removed", 0),
                        "dangling_rows": pr.extra.get("dangling_rows", 0),
                    },
                )

    # Span-level curation BEFORE clustering: excise cross-document
    # duplicated token runs (dupspan.py) so the cluster/compact phases
    # below lay out the CUT arrays, not bytes about to be rewritten
    # again.  Out-of-band merge by contract; touched keys refresh the
    # band index inside the pass (same path as the changelog sync).
    if span_cut:
        from canal_spark.dupspan import dup_span_cut_pass
        from canal_spark.operators.tokenops import DUP_W

        _t0 = time.perf_counter()
        sc = dup_span_cut_pass(
            spark, table,
            w=span_cut_w or DUP_W,
            sample_mod=span_cut_sample_mod,
            max_cut_fraction=span_cut_max_fraction,
            index=band_index,
            job_id=job_id,
        )
        rep.span_cut = {
            k: v for k, v in sc.__dict__.items() if k != "extra"
        }
        rep.timings["span_cut"] = round(time.perf_counter() - _t0, 3)
        if lineage and sc.applied:
            _ckpt.record(
                spark, lineage, job_id, "span_cut",
                snapshot_id=sc.snapshot_id,
                metrics={
                    "dup_windows": sc.dup_windows,
                    "docs_affected": sc.docs_affected,
                    "docs_deleted": sc.docs_deleted,
                    "tokens_removed": sc.tokens_removed,
                },
            )

    # Cluster BEFORE compacting: the incremental cluster pass rewrites
    # every untagged file (exactly what merge just produced) into
    # ~target-size, curve-ordered, range-disjoint files — so compacting
    # those same files first would be a pure double rewrite (every byte
    # written twice per pass, the dominant write-amplification cost at
    # the 10^12-row design point).  Compaction afterwards is the
    # residual pass: it coalesces whatever is still small (clustered
    # remainders, tiny partitions), usually a no-op.
    if do_cluster:
        _t0 = time.perf_counter()
        z = _cluster.cluster(
            spark, table, curve=curve, target_file_rows=target_file_rows,
            measure=measure, scope=cluster_scope, job_id=job_id, branch=branch,
        )
        rep.timings["cluster"] = round(time.perf_counter() - _t0, 3)
        rep.cluster = {
            "snapshot_id": z.snapshot_id, "curve": z.curve,
            "files_before": z.files_before, "files_after": z.files_after,
            "tightness_before": z.tightness_before, "tightness_after": z.tightness_after,
        }
        if lineage:
            _ckpt.record(
                spark, lineage, job_id, "cluster",
                snapshot_id=z.snapshot_id, files_rewritten=z.files_before,
                tightness_before=z.tightness_before.get("hash_range"),
                tightness_after=z.tightness_after.get("hash_range"),
            )

    if do_compact:
        _t0 = time.perf_counter()
        c = _compact.compact(
            spark, table, target_bytes=target_file_bytes, pack_by=pack_by,
            job_id=job_id, branch=branch,
        )
        rep.compact = c.__dict__
        rep.timings["compact"] = round(time.perf_counter() - _t0, 3)
        if lineage and c.commits:
            _ckpt.record(
                spark, lineage, job_id, "compact",
                snapshot_id=c.snapshot_ids[-1], files_rewritten=c.files_removed,
                bytes_shuffled=c.bytes_compacted,
            )

    published = branch is None
    if branch is not None:
        # publish the whole pass atomically — merge + materialize +
        # cluster + compact become visible in one ref swing, or none do
        _t0 = time.perf_counter()
        from canal_spark.table.format import CommitConflict

        table.refresh()
        chain = table.branch_chain(branch)
        if not publish_branch:
            rep.branch = {"name": branch, "published": False,
                          "kept": True, "commits": len(chain)}
        elif not chain:
            # nothing committed this pass (empty changelog, no-op
            # phases): drop the ref rather than leak an empty branch
            table.delete_branch(branch)
            rep.branch = {"name": branch, "published": False,
                          "empty": True, "commits": 0}
        else:
            try:
                pub = table.fast_forward(branch)
                published = True
                rep.branch = {"name": branch, "published": True,
                              "snapshot_id": pub.snapshot_id,
                              "commits": len(chain)}
            except CommitConflict as exc:
                # a concurrent mainline writer advanced past the fork
                # base — neither side's work is lost: the chain stays
                # for inspection; delete_branch re-queues the batch
                rep.branch = {"name": branch, "published": False,
                              "conflict": str(exc), "commits": len(chain)}
        rep.timings["publish"] = round(time.perf_counter() - _t0, 3)

    if published:
        _t0 = time.perf_counter()
        e = table.expire_snapshots(keep_last=keep_snapshots)
        rep.expire = e
        rep.timings["expire"] = round(time.perf_counter() - _t0, 3)
        if lineage and e.get("expired"):
            _ckpt.record(spark, lineage, job_id, "expire",
                         snapshot_id=table.current_snapshot_id)
    # The derived stores are tables like any other: without their own
    # expiry every per-batch COW refresh retains all historical index
    # files forever (unbounded disk + metadata growth at one snapshot
    # per changelog batch).
    # Derived stores get the SAME small-file hygiene as the primary:
    # every per-batch COW refresh adds O(batch) files, and without
    # compaction a year of hourly batches leaves the index scan opening
    # ~10^4 tiny files.  They're engine tables, so the ordinary
    # bin-packing compactor applies (by bytes — no n_tok column).
    if band_index is not None:
        rep.band_index = {
            **rep.band_index,
            "compact": _compact.compact(
                spark, band_index, target_bytes=target_file_bytes,
                pack_by="bytes", job_id=job_id,
            ).__dict__,
            "expire": band_index.expire_snapshots(keep_last=keep_snapshots),
        }
    if ivf_index is not None:
        rep.ivf_index = {
            **rep.ivf_index,
            "compact": _compact.compact(
                spark, ivf_index, target_bytes=target_file_bytes,
                pack_by="bytes", job_id=job_id,
            ).__dict__,
            "expire": ivf_index.expire_snapshots(keep_last=keep_snapshots),
        }
    return rep


def prometheus_metrics(rep: MaintenanceReport, destination: str = "tokens") -> dict:
    """One flat metric dict per pass — the engine's scrape surface.

    Names follow the reference's prometheus exposition
    (prometheus/.../EntryCollector, StoreCollector, MetaCollector —
    canal_instance_put_rows, canal_instance_ack_rows,
    canal_instance_store_produce_seq, canal_instance_transactions)
    wherever the semantics genuinely align: a pass's batch is one
    transaction, rows merged are the put==ack rows (batch-atomic
    commit means apply and ack are the same event), and the high-water
    mark is the produced sequence.  Engine-specific phase gauges use a
    ``canal_spark_`` prefix rather than overloading reference names
    whose semantics they don't share.  Keys carry the destination
    label inline (``name{destination="…"}``), exposition-style, so the
    dump is greppable and dashboard-portable as-is."""
    lbl = f'{{destination="{destination}"}}'
    m, c, z, x, b = rep.merge, rep.compact, rep.cluster, rep.expire, rep.band_index
    put = int(m.get("rows_upserted", 0)) + int(m.get("rows_deleted", 0))
    vals: dict[str, float] = {
        f"canal_instance_transactions{lbl}": 1 if m.get("applied") else 0,
        f"canal_instance_put_rows{lbl}": put,
        f"canal_instance_ack_rows{lbl}": put if m.get("applied") else 0,
        f"canal_instance_store_produce_seq{lbl}": int(m.get("high_water_mark", 0)),
        f"canal_spark_merge_files_rewritten{lbl}": int(m.get("files_rewritten", 0)),
        f"canal_spark_merge_files_pruned{lbl}": int(m.get("files_pruned", 0)),
        f"canal_spark_merge_bytes_rewritten{lbl}": int(m.get("bytes_rewritten", 0)),
        f"canal_spark_compact_files_removed{lbl}": int(c.get("files_removed", 0)),
        f"canal_spark_compact_bins_written{lbl}": int(c.get("bins_written", 0)),
        f"canal_spark_compact_bytes{lbl}": int(c.get("bytes_compacted", 0)),
        f"canal_spark_expire_snapshots{lbl}": int(x.get("expired", 0) or 0),
    }
    if rep.materialize:
        mt = rep.materialize
        vals[f"canal_spark_materialize_files_rewritten{lbl}"] = int(
            mt.get("files_rewritten", 0)
        )
        vals[f"canal_spark_materialize_delete_files_removed{lbl}"] = int(
            mt.get("delete_files_removed", 0)
        )
        vals[f"canal_spark_materialize_rows_deleted{lbl}"] = int(
            mt.get("rows_deleted", 0)
        )
    if rep.convert:
        cv = rep.convert
        vals[f"canal_spark_convert_rows_pos_deleted{lbl}"] = int(
            cv.get("rows_deleted", 0)
        )
        vals[f"canal_spark_convert_eq_files_removed{lbl}"] = int(
            cv.get("eq_files_removed", 0)
        )
    if z:
        vals[f"canal_spark_cluster_files_before{lbl}"] = int(z.get("files_before", 0))
        vals[f"canal_spark_cluster_files_after{lbl}"] = int(z.get("files_after", 0))
        tb = (z.get("tightness_before") or {}).get("hash_range")
        ta = (z.get("tightness_after") or {}).get("hash_range")
        if tb is not None:
            vals[f"canal_spark_cluster_tightness_before{lbl}"] = float(tb)
        if ta is not None:
            vals[f"canal_spark_cluster_tightness_after{lbl}"] = float(ta)
    if b:
        vals[f"canal_spark_band_index_dup_candidates{lbl}"] = int(
            b.get("dup_candidates", 0)
        )
        vals[f"canal_spark_band_index_hot_buckets_capped{lbl}"] = int(
            b.get("hot_buckets_capped", 0)
        )
        vals[f"canal_spark_band_index_files_rewritten{lbl}"] = int(
            b.get("files_rewritten", 0)
        )
    if rep.ivf_index:
        iv = rep.ivf_index
        vals[f"canal_spark_ivf_index_vecs_changed{lbl}"] = int(
            iv.get("vecs_changed", 0)
        )
        vals[f"canal_spark_ivf_index_files_rewritten{lbl}"] = int(
            iv.get("files_rewritten", 0)
        )
        vals[f"canal_spark_ivf_index_codebook_version{lbl}"] = int(
            iv.get("codebook_version", 0)
        )
    if rep.pos_rewrite:
        pz = rep.pos_rewrite
        vals[f"canal_spark_pos_rewrite_files_removed{lbl}"] = int(
            pz.get("pos_files_removed", 0)
        )
        vals[f"canal_spark_pos_rewrite_dangling_rows{lbl}"] = int(
            pz.get("dangling_rows", 0)
        )
    if rep.span_cut:
        sc = rep.span_cut
        vals[f"canal_spark_span_cut_docs_affected{lbl}"] = int(
            sc.get("docs_affected", 0)
        )
        vals[f"canal_spark_span_cut_tokens_removed{lbl}"] = int(
            sc.get("tokens_removed", 0)
        )
        vals[f"canal_spark_span_cut_docs_deleted{lbl}"] = int(
            sc.get("docs_deleted", 0)
        )
    return vals
