"""Table consistency checker ("doctor"): manifest vs physical files.

The operational safety net a 100 TB lakehouse needs before trusting a
snapshot: verifies that every manifest entry points at a real file
whose Parquet footer agrees with the manifest's row/byte counts, that
no path is referenced twice within a snapshot, and that recorded
partition values are consistent with per-file stats.  The reference
ships the same instinct as its meta-manager consistency checks and
ETL row-count verification (client-adapter/rdb/.../RdbEtlService.java
count-compare after full load); here the check is metadata + footer
only — O(#files), never a data scan (footer reads fan out to
executors via the writer's harvest path).

Usage:
    from canal_spark.doctor import check_table
    report = check_table(spark, table)          # current snapshot
    report = check_table(spark, table, snapshot_id=...)
    assert report["ok"], report["violations"]
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from canal_spark.table.format import Table

STALE_STAGE_HOURS = 24.0  # unpublished WAP stage older than this -> flag


def _safe_footer_rows(spark: SparkSession, paths: list[str]) -> dict[str, int | None]:
    """{path: footer row count, or None if the footer is unreadable}.
    Per-file exception containment — a single corrupt footer must
    become a violation, not crash the doctor.  Distributed over
    executors for large file counts (same fan-out as the write path's
    stat harvest)."""

    def one(p: str):
        from canal_spark.table.writer import _footer_stats

        try:
            rows, _stats = _footer_stats(p)
            return (p, rows)
        except Exception:
            return (p, None)

    if len(paths) <= 64:
        return dict(one(p) for p in paths)
    sc = spark.sparkContext
    n_slices = max(1, min(len(paths) // 16, sc.defaultParallelism * 2))
    return dict(sc.parallelize(paths, n_slices).map(one).collect())


def check_table(
    spark: SparkSession,
    table: Table,
    snapshot_id: int | None = None,
    verify_footers: bool = True,
) -> dict:
    """Check one snapshot's manifests against the physical files.

    Returns ``{"ok": bool, "files": n, "violations": [{file, kind,
    detail}, ...], "warnings": [...]}``.  Violation kinds: ``missing``
    (path not on disk), ``rows`` / ``bytes`` (footer/size disagree with
    the manifest), ``duplicate`` (path referenced twice in the
    snapshot), ``partition`` (recorded partition value contradicts the
    file's own min/max stats), ``pos-delete-schema`` (a position-delete
    file not readable as (file_path, pos) rows), ``manifest`` (a
    manifest file referenced by table metadata is itself missing or
    unreadable — reported as the single violation since the entry list
    is unknowable).  Warnings never fail
    the check: ``dangling-pos-delete`` (pos-delete rows referencing
    rewritten-away files — normal debt, consolidate via
    ``rewrite_pos_deletes``).
    """
    # ALL manifest entries: pending equality-delete files get the same
    # missing/bytes/rows/footer validation as data files (a corrupt
    # delete file silently un-deletes rows — worse than a corrupt data
    # file, which at least fails loudly at scan)
    try:
        entries = table.all_entries(snapshot_id)
    except RuntimeError as e:
        # a manifest itself is missing/unreadable (_read_manifest's
        # corrupted-table guard): the doctor must DIAGNOSE that, not
        # re-raise it — it is the tool the error message sends the
        # operator to
        return {"ok": False, "files": 0,
                "violations": [{"file": None, "kind": "manifest",
                                "detail": str(e)}],
                "warnings": []}
    violations: list[dict] = []
    warnings: list[dict] = []

    seen: set[str] = set()
    for e in entries:
        if e.path in seen:
            violations.append(
                {"file": e.path, "kind": "duplicate",
                 "detail": "path referenced by more than one manifest entry"}
            )
        seen.add(e.path)

    existing = []
    checked: set[str] = set()
    for e in entries:
        # a duplicated path is already reported above — checking both
        # entries would double every footer/rows/partition violation on
        # that file and skew len(violations) for monitoring
        if e.path in checked:
            continue
        checked.add(e.path)
        p = os.path.join(table.root, e.path)
        if not os.path.exists(p):
            violations.append(
                {"file": e.path, "kind": "missing", "detail": p}
            )
            continue
        size = os.path.getsize(p)
        if size != e.bytes:
            violations.append(
                {"file": e.path, "kind": "bytes",
                 "detail": f"manifest {e.bytes} != on-disk {size}"}
            )
            # a size-mismatched (e.g. truncated) file would also blow up
            # the footer read — it's already reported, skip it there
            continue
        existing.append(e)

    if verify_footers and existing:
        footer_rows = _safe_footer_rows(
            spark, [os.path.join(table.root, e.path) for e in existing]
        )
        for e in existing:
            rows = footer_rows.get(os.path.join(table.root, e.path))
            if rows is None:
                # footer unreadable: corruption the size check missed
                violations.append(
                    {"file": e.path, "kind": "footer",
                     "detail": "parquet footer unreadable"}
                )
            elif rows != e.rows:
                violations.append(
                    {"file": e.path, "kind": "rows",
                     "detail": f"manifest {e.rows} != footer {rows}"}
                )

    # partition values must agree with the file's own stats (the value
    # was inferred from min==max at write time; a mismatch means the
    # manifest was hand-edited or the file swapped underneath it)
    for e in existing:
        for col, val in e.partition.items():
            st = e.stats.get(table.era_stat_name(e, col))
            if st is None or st.get("min") is None:
                continue
            try:
                inside = st["min"] <= val <= st["max"]
            except TypeError:
                # hand-edited value of the WRONG TYPE: unorderable
                # against the stats — that is itself the corruption,
                # report it instead of crashing mid-diagnosis
                inside = False
            if not inside:
                violations.append(
                    {"file": e.path, "kind": "partition",
                     "detail": f"{col}={val!r} outside stats "
                               f"[{st['min']!r}, {st['max']!r}]"}
                )

    # pos-delete hygiene.  Rows referencing non-live data files are
    # NORMAL debt, not corruption: every rewrite (compact, cluster, COW
    # merge) strands the references into its victims by design, and
    # rewrite_pos_deletes / materialize_deletes GC them — so danglers
    # are a WARNING (run the consolidation job), never a failed check.
    # What IS corruption is a pos-delete file that cannot be read as
    # (file_path, pos) rows at all — a wrong-schema swap the footer
    # check above cannot see (the footer is readable, just not ours).
    # O(pos-delete rows) driver-side read; pos-delete files are
    # batch-sized by the maintenance contract.
    import pyarrow.parquet as pq

    footer_bad = {v["file"] for v in violations if v["kind"] == "footer"}
    data_paths = {e.path for e in entries if e.content == "data"}
    for d in existing:
        if d.content != "pos-deletes" or d.path in footer_bad:
            continue
        try:
            refs = set(
                pq.read_table(
                    os.path.join(table.root, d.path), columns=["file_path"]
                )["file_path"].to_pylist()
            )
        except Exception:
            violations.append(
                {"file": d.path, "kind": "pos-delete-schema",
                 "detail": "not readable as (file_path, pos) rows"}
            )
            continue
        gone = sorted(refs - data_paths)
        if gone:
            warnings.append(
                {"file": d.path, "kind": "dangling-pos-delete",
                 "detail": f"{len(gone)} referenced data files no longer "
                           "live (normal after rewrites — consolidate via "
                           f"rewrite_pos_deletes): {gone[:3]}"}
            )

    # metadata hygiene (current metadata, not per-snapshot): dangling
    # refs would make scan(tag=...) raise; forgotten WAP stages pin
    # files forever (staged snapshots are expire-proof by design, so
    # the only GC path is a human noticing — this is the notice)
    snap_ids = {s.snapshot_id for s in table.snapshots}
    for name, ref in table.refs.items():
        if ref["snapshot_id"] not in snap_ids:
            violations.append(
                {"file": name, "kind": "dangling-ref",
                 "detail": f"tag {name!r} -> missing snapshot "
                           f"{ref['snapshot_id']}"}
            )
    now_ms = int(time.time() * 1000)
    for s in table.staged_snapshots():
        age_h = (now_ms - s.timestamp_ms) / 3_600_000
        if age_h > STALE_STAGE_HOURS:
            violations.append(
                {"file": str(s.snapshot_id), "kind": "stale-stage",
                 "detail": f"WAP stage {s.snapshot_id} unpublished for "
                           f"{age_h:.1f} h — publish or abort_staged"}
            )
    # branches share the stage lifecycle problem at chain granularity: a
    # forgotten branch pins its whole chain (expiry-proof by design) AND
    # holds merge batches below the mainline checkpoint forever
    for name, ref in table.refs.items():
        if ref.get("type") != "branch" or ref["snapshot_id"] not in snap_ids:
            continue
        chain = table.branch_chain(name)
        if not chain:
            continue
        age_h = (now_ms - chain[0].timestamp_ms) / 3_600_000
        if age_h > STALE_STAGE_HOURS:
            violations.append(
                {"file": name, "kind": "stale-branch",
                 "detail": f"branch {name!r} ({len(chain)} commits) idle "
                           f"for {age_h:.1f} h — fast_forward or "
                           "delete_branch"}
            )

    # pinned artifacts outside the manifests: an IVF index whose
    # codebook parquet is missing or unreadable fails every
    # ann_search/semantic_prune with an obscure read error — surface it
    # as a table-health violation here instead (artifact GC races,
    # partial copies)
    from canal_spark.ann_index import CODEBOOK_PATH_PROP, CODEBOOK_SCHEMA

    cb = table.properties.get(CODEBOOK_PATH_PROP)
    if cb:
        p = os.path.join(table.root, cb)
        if not os.path.exists(p):
            violations.append(
                {"file": cb, "kind": "codebook-missing", "detail": p}
            )
        else:
            try:
                rows = spark.read.schema(CODEBOOK_SCHEMA).parquet(p).limit(1).collect()
            except Exception as ex:  # unreadable/partial artifact
                violations.append(
                    {"file": cb, "kind": "codebook-unreadable",
                     "detail": str(ex)[:200]}
                )
            else:
                if not rows:
                    # dir survives but the part files are gone (GC race,
                    # partial copy): an explicit schema makes the empty
                    # read succeed, so zero rows IS the violation
                    violations.append(
                        {"file": cb, "kind": "codebook-unreadable",
                         "detail": "artifact directory reads zero rows"}
                    )

    return {"ok": not violations, "files": len(entries),
            "violations": violations, "warnings": warnings}


def check_dedup_index(
    spark: SparkSession, token_table: Table, index_table: Table
) -> dict:
    """Consistency of a maintained dedup signature index vs its token
    table — the read-only diagnosis counterpart of the self-heal that
    `corpus_dedup_pass` applies (a crashed sync between the data merge
    and the index refresh leaves drift; the pass folds it back in, the
    doctor reports it without touching anything).

    Violations (structural — the index cannot be trusted):
      * ``signature-unknown`` — the pinned `dedup.signature` property
        names no known family; every refresh would raise.
      * ``band-domain`` — band values outside the family's domain
        ([0, N_MINHASH) for minhash, exactly 0 for winnow): rows from
        a DIFFERENT family were written into this index, so bucket
        equality no longer means signature agreement.

    Warnings (sync debt — normal between a crash and the next pass):
      * ``phantom-docs`` — index doc_ids absent from the table (the
        crashed-sync residue the next pass self-heals).
      * ``missing-docs`` — table docs long enough to produce signature
        rows for this family but absent from the index (an un-synced
        batch; short docs are legitimately absent and not counted).

    One aggregation + two anti-join counts; never corpus x corpus.
    """
    from pyspark.sql import functions as F

    from canal_spark.dedup_index import (
        N_MINHASH,
        SHINGLE_K,
        SIGNATURE_PROP,
        SIGNATURES,
        WINNOW_W,
    )

    violations: list[dict] = []
    warnings: list[dict] = []
    sig = index_table.properties.get(SIGNATURE_PROP, "minhash")
    if sig not in SIGNATURES:
        violations.append(
            {"file": index_table.root, "kind": "signature-unknown",
             "detail": f"{SIGNATURE_PROP}={sig!r}"}
        )
        return {"ok": False, "signature": sig, "violations": violations,
                "warnings": warnings, "docs_indexed": None,
                "phantom_docs": None, "missing_docs": None}

    idx = index_table.scan(spark).persist()
    try:
        agg = idx.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("doc_id").alias("docs"),
            F.min("band").alias("bmin"),
            F.max("band").alias("bmax"),
        ).collect()[0]
        n_docs = int(agg["docs"] or 0)
        if int(agg["rows"] or 0) > 0:
            lo, hi = (0, 0) if sig == "winnow" else (0, N_MINHASH - 1)
            if int(agg["bmin"]) < lo or int(agg["bmax"]) > hi:
                violations.append(
                    {"file": index_table.root, "kind": "band-domain",
                     "detail": f"{sig} bands must lie in [{lo}, {hi}], "
                               f"found [{agg['bmin']}, {agg['bmax']}]"}
                )

        idx_ids = idx.select("doc_id").distinct()
        tbl = token_table.scan(spark).select("doc_id", "tokens")
        phantom = idx_ids.join(
            tbl.select("doc_id"), "doc_id", "left_anti"
        ).count()
        if phantom:
            warnings.append(
                {"file": index_table.root, "kind": "phantom-docs",
                 "detail": f"{phantom} indexed doc_ids not in the table "
                           "(crashed sync debt; the next pass self-heals)"}
            )
        min_len = (
            SHINGLE_K + WINNOW_W - 1 if sig == "winnow" else SHINGLE_K
        )
        missing = (
            tbl.where(F.size("tokens") >= min_len)
            .select("doc_id")
            .join(idx_ids, "doc_id", "left_anti")
            .count()
        )
        if missing:
            warnings.append(
                {"file": index_table.root, "kind": "missing-docs",
                 "detail": f"{missing} eligible table docs have no index "
                           "rows (un-synced batch)"}
            )
    finally:
        idx.unpersist()
    return {"ok": not violations, "signature": sig,
            "violations": violations, "warnings": warnings,
            "docs_indexed": n_docs, "phantom_docs": phantom,
            "missing_docs": missing}


def check_archive(archive_dir: str) -> dict:
    """Cold-archive consistency: ``manifest.json`` vs the segment
    files (archive.py).  A broken archive is silent data loss for any
    consumer whose cursor predates staging retention, so it gets the
    same doctor treatment as the table.

    Violations: ``segment-missing`` (cataloged file gone — cold
    resumes from its range are unservable), ``segment-range`` /
    ``segment-rows`` (footer disagrees with the catalog — the range
    prune would skip or misdeliver rows), ``segment-name`` (entry name
    does not parse as ``segment-<min>-<max>-<basename>``).  Warnings:
    ``uncataloged-segment`` (file present but not in the manifest —
    the copy-then-commit crash window; the source staging file still
    exists, the next archive run re-catalogs it).  Driver-side and
    footer-only: O(segments), never a data scan.
    """
    from canal_spark.archive import (
        SEGMENT_DIR, _load_manifest, _ordinal_range, _segment_basename,
    )

    violations: list[dict] = []
    warnings: list[dict] = []
    seg_root = os.path.join(archive_dir, SEGMENT_DIR)
    manifest = _load_manifest(archive_dir)
    if manifest and not os.path.isdir(seg_root):
        violations.append(
            {"file": SEGMENT_DIR, "kind": "segment-missing",
             "detail": f"{len(manifest)} cataloged segments but no "
                       f"segment dir at {seg_root}"}
        )
        return {"ok": False, "segments": len(manifest),
                "violations": violations, "warnings": warnings}
    cataloged: set[str] = set()
    for e in manifest:
        name = e.get("name")
        missing = [k for k in ("name", "min_ordinal", "max_ordinal", "rows")
                   if e.get(k) is None]
        if name is not None:
            # even a broken entry CATALOGS its name — otherwise the
            # on-disk sweep below double-reports the same entry's file
            # as an uncataloged crash-window copy
            cataloged.add(name)
        if missing:
            # a truncated/hand-edited entry is the corruption class this
            # check exists for — report it, never crash on it
            violations.append(
                {"file": name or repr(e)[:80], "kind": "segment-entry",
                 "detail": f"manifest entry missing {missing}"}
            )
            continue
        if _segment_basename(name) is None:
            violations.append(
                {"file": name, "kind": "segment-name",
                 "detail": "does not parse as segment-<min>-<max>-<basename>"}
            )
            continue
        p = os.path.join(seg_root, name)
        if not os.path.exists(p):
            violations.append(
                {"file": name, "kind": "segment-missing", "detail": p}
            )
            continue
        try:
            rng = _ordinal_range(p)
        except Exception as exc:  # noqa: BLE001 — truncated/garbled file
            # an unreadable footer is the diagnosis, not a crash: the
            # same containment check_table's _safe_footer_rows applies
            violations.append(
                {"file": name, "kind": "segment-corrupt",
                 "detail": f"footer unreadable: {type(exc).__name__}: {exc}"}
            )
            continue
        if rng is None:
            violations.append(
                {"file": name, "kind": "segment-range",
                 "detail": "footer lacks ordinal stats (corrupt or "
                           "wrong-schema swap)"}
            )
            continue
        lo, hi, rows = rng
        if (lo, hi) != (e["min_ordinal"], e["max_ordinal"]):
            violations.append(
                {"file": name, "kind": "segment-range",
                 "detail": f"catalog [{e['min_ordinal']}, {e['max_ordinal']}]"
                           f" != footer [{lo}, {hi}] — range prune would "
                           "skip or misdeliver"}
            )
        if rows != e["rows"]:
            violations.append(
                {"file": name, "kind": "segment-rows",
                 "detail": f"catalog {e['rows']} != footer {rows}"}
            )
    if os.path.isdir(seg_root):
        for n in sorted(os.listdir(seg_root)):
            if n.startswith(("_", ".")) or n in cataloged:
                continue
            warnings.append(
                {"file": n, "kind": "uncataloged-segment",
                 "detail": "present but not in manifest.json (crash "
                           "between copy and catalog commit — the next "
                           "archive run re-catalogs it)"}
            )
    return {"ok": not violations, "segments": len(manifest),
            "violations": violations, "warnings": warnings}
