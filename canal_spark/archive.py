"""Cold-archive changelog store (S3): the RDS OSS archived-binlog
fetch restated as an ordinal-ranged parquet segment archive.

Reference behavior (parse/.../inbound/mysql/rds/):

* the live server PURGES whole binlog *files* past retention; RDS
  uploads them to OSS first (the archive is per-file, never per-row);
* on a dump failure at an expired position the proxy parser queries
  the archive catalog BY RANGE (RdsBinlogOpenApi.listBinlogFiles:28-49
  — start/end time window), sorts the hits
  (BinlogDownloadQueue.prepareBinlogList:76-104), fetches a bounded
  batch at a time (BinlogDownloadQueue.prepare:141-165,
  ``batchFileSize``), and parses the cold files locally
  (RdsLocalBinlogEventParser);
* when the last cold file is consumed it switches back to the live
  stream at the boundary position with no gap and no replay
  (RdsLocalBinlogEventParser:196-217 ``switch to mysql parser!`` +
  ``finishListener.onFinish``; RdsBinlogEventParserProxy.start:45-109).

Spark-native restatement: the "binlog file" is a staged-changelog
parquet file, whose footer already carries the min/max ``ordinal``
(the position range a binlog filename+offset encodes).  Archiving is
therefore a pure FILE MOVE — no row rewrite:

* :func:`archive_segments` moves every staging file wholly below the
  retention ordinal into ``<archive>/segments/`` and records
  (path, min, max, rows) in an atomically-replaced ``manifest.json``
  — the OSS upload + catalog entry;
* :func:`resolve_changelog` is the proxy parser: given a resume
  ordinal it prunes the manifest to segments whose range reaches past
  it (the listBinlogFiles window), unions the surviving cold segments
  with the live staging dir, and filters ``ordinal > from``.  A crash
  BETWEEN the manifest commit and the staging delete (the one overlap
  window) leaves the same file in both stores; exactly-once holds BY
  FILE-SET CONSTRUCTION — segment names embed the original staging
  basename, so any live file already cataloged is read from the
  archive only — never by a row-level shuffle.

Scale: the catalog scan is manifest-only (driver-side, O(segments));
cold-segment reads are footer-range pruned before any Spark job, and
the ordinal predicate pushes into every parquet scan — a resume from
yesterday reads yesterday's segments, not the archive.  The resolved
frame is scan+filter+union ONLY (zero shuffles, zero wide stages):
every consumer fetch pays a pruned columnar read, which is what makes
`ConsumerServer` fetches O(batch) at any archive size.  Bounded
prefetch (``batchFileSize``) needs no analogue: Spark's scheduler
already reads the pruned file set in task-sized chunks.

Single-stream contract: per-stream ordinals overlap across streams
(GTID/Kafka ingests), so whole-file ranges are meaningless there —
:func:`archive_segments` refuses a staging dir with a ``stream_id``
column, same as the consumer protocol.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"
SEGMENT_DIR = "segments"


def _staging_files(staging_dir: str) -> list[str]:
    if not os.path.isdir(staging_dir):
        return []
    return sorted(
        os.path.join(staging_dir, n)
        for n in os.listdir(staging_dir)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


def _footer(path: str):
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata


def _ordinal_range(path: str, md=None) -> tuple[int, int, int] | None:
    """(min, max, rows) from the parquet footer — the position range a
    binlog filename encodes.  None when any row group lacks ordinal
    stats (conservative: the file is then never archived).  Pass ``md``
    to reuse an already-opened footer."""
    if md is None:
        md = _footer(path)
    try:
        idx = md.schema.names.index("ordinal")
    except ValueError:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return int(lo), int(hi), md.num_rows


def _load_manifest(archive_dir: str) -> list[dict]:
    try:
        with open(os.path.join(archive_dir, MANIFEST)) as f:
            return json.load(f)["segments"]
    except FileNotFoundError:
        return []


def _save_manifest(archive_dir: str, segments: list[dict]) -> None:
    path = os.path.join(archive_dir, MANIFEST)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump({"segments": segments}, f, indent=1)
    os.replace(tmp, path)


def archive_segments(
    spark: SparkSession, staging_dir: str, archive_dir: str, retain_from_ordinal: int
) -> dict:
    """Move every staging file wholly below ``retain_from_ordinal``
    into the archive — the binlog purge + OSS upload, as file moves.

    Order is crash-safe without a transaction: copy the segment, commit
    the manifest, THEN delete from staging.  A crash in the overlap
    window leaves the file in both places; :func:`resolve_changelog`
    reads it from the archive only (cataloged basenames are excluded
    from its live read set), and the next archive run skips
    already-cataloged ranges idempotently.
    """
    seg_root = os.path.join(archive_dir, SEGMENT_DIR)
    os.makedirs(seg_root, exist_ok=True)
    manifest = _load_manifest(archive_dir)
    known = {e["name"]: e for e in manifest}
    archived_files = archived_rows = kept = 0
    for path in _staging_files(staging_dir):
        md = _footer(path)
        # config error checked on EVERY staging file, retention or not —
        # a misconfigured multi-stream dir must fail on the first run,
        # not days later when retention first passes a file
        if "stream_id" in md.schema.names:
            raise ValueError(
                "multi-stream changelog (stream_id column): per-stream "
                "ordinals overlap, whole-file ordinal ranges are not "
                "positions — archive per-stream staging dirs instead"
            )
        rng = _ordinal_range(path, md=md)
        if rng is None:
            kept += 1
            continue
        lo, hi, rows = rng
        if hi >= retain_from_ordinal:
            kept += 1
            continue
        name = f"segment-{lo:020d}-{hi:020d}-{os.path.basename(path)}"
        entry = known.get(name)
        if entry is None:
            shutil.copy2(path, os.path.join(seg_root, name))
            entry = {"name": name, "min_ordinal": lo, "max_ordinal": hi,
                     "rows": rows}
            manifest.append(entry)
            known[name] = entry
            _save_manifest(archive_dir, manifest)
        elif rows != entry["rows"]:
            # same name (same range + basename) but NOT the same file:
            # deleting it would silently lose rows — the same loud-fail
            # contract resolve_changelog enforces for this collision
            raise ValueError(
                f"staging file {path} collides with cataloged segment "
                f"{name} but is not the same file ({rows} rows vs "
                f"{entry['rows']} cataloged) — re-stage it under a "
                "fresh basename"
            )
        os.remove(path)
        archived_files += 1
        archived_rows += rows
    return {
        "archived_files": archived_files,
        "archived_rows": archived_rows,
        "kept_files": kept,
        "segments_total": len(manifest),
    }


def _segment_basename(name: str) -> str | None:
    """The original staging basename a segment name embeds
    (``segment-<min>-<max>-<basename>``), or None when the name does
    not parse — the ONE place the name format is decoded (archive
    writer, resolver, and doctor all route through it)."""
    parts = name.split("-", 3)
    if len(parts) != 4 or parts[0] != "segment":
        return None
    return parts[3]


def resolve_changelog(
    spark: SparkSession,
    staging_dir: str,
    archive_dir: str | None,
    from_ordinal: int = 0,
) -> tuple[DataFrame | None, dict]:
    """The proxy-parser read: cold segments past ``from_ordinal`` plus
    the live staging dir, exactly once per ordinal.

    Returns ``(frame, report)``; frame is None when neither side has
    data.  ``report`` carries the catalog decision — how many segments
    the range query fetched vs pruned (the listBinlogFiles window
    evidence) — so callers can assert a resume from a recent position
    reads zero cold files.

    Exactly-once across the crash-overlap window is structural, not a
    shuffle: a staging file whose basename is already cataloged (the
    segment name embeds it) is OWNED by the archive and skipped from
    the live read, so the returned plan is scan+filter+union with zero
    wide stages — cheap enough to run on every consumer fetch.
    """
    cataloged: dict[str, dict] = {}  # staging basename -> catalog entry
    needed: list[str] = []
    pruned = 0
    if archive_dir is not None:
        for e in _load_manifest(archive_dir):
            base = _segment_basename(e["name"])
            if base is not None:
                cataloged[base] = e
            if e["max_ordinal"] > from_ordinal:
                needed.append(os.path.join(archive_dir, SEGMENT_DIR, e["name"]))
            else:
                pruned += 1
    parts: list[DataFrame] = []
    if needed:
        parts.append(spark.read.parquet(*needed))
    all_live = _staging_files(staging_dir)
    live_files = []
    for p in all_live:
        e = cataloged.get(os.path.basename(p))
        if e is None:
            live_files.append(p)
            continue
        # cataloged basename: skip ONLY when the live file really is the
        # archive's copy (footer range+rows agree) — a DIFFERENT file
        # reusing an archived basename must fail loudly, never silently
        # lose its rows (skip) or replay the segment (read both)
        rng = _ordinal_range(p)
        if rng != (e["min_ordinal"], e["max_ordinal"], e["rows"]):
            raise ValueError(
                f"staging file {p} collides with cataloged segment "
                f"{e['name']} but is not the same file (footer {rng} vs "
                f"catalog ({e['min_ordinal']}, {e['max_ordinal']}, "
                f"{e['rows']})) — re-stage it under a fresh basename"
            )
    if live_files:
        parts.append(spark.read.parquet(*live_files))
    report = {
        "segments_fetched": len(needed),
        "segments_pruned": pruned,
        "live_files": len(live_files),
        # crash-window residue: staging copies the catalog already owns
        # (the next archive run deletes them; reading them would replay)
        "live_files_skipped": len(all_live) - len(live_files),
    }
    if not parts:
        return None, report
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return df.where(F.col("ordinal") > F.lit(int(from_ordinal))), report
