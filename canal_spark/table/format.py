"""Mini-lakehouse table format: Parquet data + JSON metadata/manifests.

A self-contained stand-in for Apache Iceberg (the sandbox ships no
Iceberg runtime jar), implementing the subset of the spec this engine
needs — modeled on the public Iceberg table-spec concepts:

* **Snapshots**: every commit produces an immutable snapshot; readers
  pin one, so maintenance never disturbs in-flight scans (snapshot
  isolation).  Time travel by snapshot id / version / timestamp.
* **Manifests**: a snapshot references a *list* of manifest JSON files,
  each listing immutable Parquet data files with per-file row counts,
  byte sizes, partition values, and column min/max/null stats.
  Appends reuse parent manifests and add one; overwrites rewrite only
  the manifests that reference removed files.  ``rewrite_manifests``
  consolidates small manifests (the metadata analogue of compaction).
* **Atomic commits**: optimistic concurrency via ``open(path, "x")``
  (O_EXCL) on the next ``v{N}.metadata.json`` — first writer wins,
  losers re-read and retry.  On a real deployment this becomes the
  catalog's compare-and-swap; the protocol is otherwise identical.
* **Snapshot expiry**: drop old snapshots, then garbage-collect data
  files and manifests referenced only by dropped snapshots — the
  analogue of the reference's schema-TSDB "snapshot every 24h, expire
  at 360h" policy (parse/.../tsdb/DatabaseTableMeta.java:76-77), where
  ``rollback(position)`` = rebuild state at a past point — here:
  ``table.scan(spark, snapshot_id=...)``.

Scale notes (100 TB / 10^12 rows): metadata operations are
O(#files) driver-side JSON, never O(rows).  A 100 TB table at 512 MB
target files is ~200k files ≈ tens of MB of manifest JSON, split
across per-commit manifests so a commit touches only its delta.  All
data-plane work (stat collection, file writes) runs as Spark jobs.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
import time
import uuid
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

FORMAT_VERSION = 1

# process-wide manifest parse cache (see Table._read_manifest):
# manifests are immutable once written, keyed (table root, manifest
# name), LRU-bounded so driver memory stays O(hot set)
_MANIFEST_CACHE: OrderedDict = OrderedDict()
_MANIFEST_CACHE_MAX = 256
_MANIFEST_CACHE_LOCK = threading.Lock()


# --------------------------------------------------------------------------
# metadata model
# --------------------------------------------------------------------------


@dataclass
class DataFile:
    """One immutable Parquet data file tracked by a manifest."""

    path: str  # relative to table root
    rows: int
    bytes: int
    partition: dict[str, Any] = field(default_factory=dict)
    # col -> {"min": v, "max": v, "nulls": n}; values JSON-native,
    # keyed by the column names AS WRITTEN (the file's schema era)
    stats: dict[str, dict[str, Any]] = field(default_factory=dict)
    # curve tag ("zorder-v1"/"hilbert-v1") when the file was written in
    # cluster order — lets clustering run incrementally (only untagged
    # files rewrite) instead of rewriting the table every pass
    sort_order: str | None = None
    # schema-id the file was written under — reads resolve renames and
    # type widenings by field-id between this era and the target schema
    # (None on pre-tracking manifests -> current-name read)
    schema_id: int | None = None
    # partition-spec id the file was written under (Iceberg partition
    # evolution: old files keep their old spec's partition values; new
    # files carry the new spec's — scans prune each file by ITS spec)
    spec_id: int | None = None
    # entry kind — "data" (default), "eq-deletes" (Iceberg v2
    # equality-delete file: parquet of key columns whose rows mark
    # earlier-sequence data rows with those keys as deleted) or
    # "pos-deletes" (Iceberg v2 position-delete file: parquet of
    # (file_path, pos) rows, each killing exactly one physical row of
    # one data file — file identity, no sequence residual needed since
    # rewrites change the path)
    content: str = "data"
    # commit sequence (= committing snapshot id, stamped by commit()):
    # an eq-delete file applies to data files with a STRICTLY SMALLER
    # seq, so a key re-inserted after its delete survives.  None on
    # pre-MoR data files -> reads treat it as 0 (every delete applies).
    seq: int | None = None

    def to_json(self) -> dict:
        d = {
            "path": self.path,
            "rows": self.rows,
            "bytes": self.bytes,
            "partition": self.partition,
            "stats": self.stats,
        }
        if self.sort_order:
            d["sort_order"] = self.sort_order
        if self.schema_id is not None:
            d["schema_id"] = self.schema_id
        if self.spec_id is not None:
            d["spec_id"] = self.spec_id
        if self.content != "data":
            d["content"] = self.content
        if self.seq is not None:
            d["seq"] = self.seq
        return d

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(
            path=d["path"],
            rows=d["rows"],
            bytes=d["bytes"],
            partition=d.get("partition", {}),
            stats=d.get("stats", {}),
            sort_order=d.get("sort_order"),
            schema_id=d.get("schema_id"),
            spec_id=d.get("spec_id"),
            content=d.get("content", "data"),
            seq=d.get("seq"),
        )


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    timestamp_ms: int
    operation: str  # append | overwrite | replace | expire | schema
    manifests: list[str]  # metadata-relative manifest file names
    summary: dict[str, Any] = field(default_factory=dict)
    # index into metadata["schemas"] — the schema the table had when this
    # snapshot committed.  Iceberg pins a schema-id per snapshot for the
    # same reason: time-travel reads must project with the schema *as of*
    # the snapshot, not the current one (the TSDB rollback analogue,
    # parse/.../tsdb/DatabaseTableMeta.java:168-188).  None on metadata
    # written before this field existed -> falls back to current schema.
    schema_id: int | None = None

    def to_json(self) -> dict:
        d = {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "timestamp_ms": self.timestamp_ms,
            "operation": self.operation,
            "manifests": self.manifests,
            "summary": self.summary,
        }
        if self.schema_id is not None:
            d["schema_id"] = self.schema_id
        return d

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d.get("parent_id"),
            timestamp_ms=d["timestamp_ms"],
            operation=d["operation"],
            manifests=d["manifests"],
            summary=d.get("summary", {}),
            schema_id=d.get("schema_id"),
        )


class CommitConflict(Exception):
    """Another writer committed the same metadata version first."""


# write-audit-publish (WAP) summary keys: a staged snapshot is in the
# snapshot list (addressable by id for auditing) but current never
# points at it until publish; its property updates are deferred in the
# summary so an aborted stage leaves checkpoints (merge hwm, GTID set)
# untouched and the batch re-applies cleanly.
WAP_STAGED_KEY = "wap-staged"
WAP_PROPS_KEY = "wap-staged-properties"
# checkpoint property keys (merge.py aliases these): owned here so the
# format layer can reset them on rollback without importing merge
CKPT_PROP = "merge-hwm-ordinal"
GTID_PROP = "merge-gtid-set"
# summary marker a position-resetting rollback writes: resume marks
# from snapshots OLDER than this one no longer count (merge.py's
# hwm/GTID scans stop at the boundary)
POSITION_RESET_KEY = "position-reset"
# summary key marking a commit that landed on a named branch (value =
# branch name).  Branch commits are the multi-commit generalization of
# WAP staging: invisible to mainline readers and checkpoint accounting
# until fast_forward publishes the whole chain atomically.
BRANCH_KEY = "wap-branch"


def _remove_data_file(full_path: str) -> bool:
    """Delete a data file AND its bloom sidecar (table/bloom.py) in one
    place — every GC path (expire, branch delete, WAP abort, orphan
    sweep) must keep the pair's lifecycle atomic or stale sidecars
    accumulate next to recycled file names.  Returns True when the data
    file existed."""
    existed = True
    try:
        os.remove(full_path)
    except FileNotFoundError:
        existed = False
    try:
        os.remove(full_path + ".bloom")
    except FileNotFoundError:
        pass
    return existed


# --------------------------------------------------------------------------
# table
# --------------------------------------------------------------------------


class Table:
    """Handle to a mini-lakehouse table rooted at a local/shared path."""

    def __init__(self, root: str, metadata: dict):
        self.root = root
        self.metadata = metadata

    # ---- properties -----------------------------------------------------

    @property
    def version(self) -> int:
        return self.metadata["version"]

    @property
    def schema_json(self) -> dict:
        return self.metadata["schema"]

    @property
    def schemas(self) -> list[dict]:
        """Full schema history (index = schema_id); metadata written
        before schema tracking has only the current schema."""
        return self.metadata.get("schemas") or [self.metadata["schema"]]

    @property
    def current_schema_id(self) -> int:
        return self.metadata.get("current_schema_id", len(self.schemas) - 1)

    @property
    def field_id_history(self) -> list[dict[str, int]]:
        """Per schema version: {column name -> stable field id} — the
        Iceberg mechanism that makes renames/retypes safe: a rename
        keeps the id under a new name; add after drop of the same name
        mints a NEW id, so old data never resurrects under it."""
        hist = self.metadata.get("field_ids")
        if hist:
            return [{k: int(v) for k, v in h.items()} for h in hist]
        # legacy metadata: name-based identity — same name = same id
        names: dict[str, int] = {}
        out = []
        for s in self.schemas:
            for f in s["fields"]:
                names.setdefault(f["name"], len(names))
            out.append({f["name"]: names[f["name"]] for f in s["fields"]})
        return out

    def field_ids_for(self, schema_id: int) -> dict[str, int]:
        return self.field_id_history[schema_id]

    @property
    def partition_specs(self) -> list[list[str]]:
        """Partition-spec history (index = spec_id) — Iceberg partition
        evolution: the spec is metadata, re-speccing never rewrites
        data.  Legacy metadata has one spec, the create-time one."""
        specs = self.metadata.get("partition_specs")
        if specs is not None:
            return [list(s) for s in specs]
        return [list(self.metadata.get("partition_by", []))]

    @property
    def default_spec_id(self) -> int:
        return int(self.metadata.get("default_spec_id", 0))

    @property
    def partition_by(self) -> list[str]:
        """The CURRENT (default) partition spec — what new writes use."""
        return self.partition_specs[self.default_spec_id]

    @property
    def key_cols(self) -> list[str]:
        """Primary-key columns for MERGE/dedupe/clustering — the
        analogue of Canal's per-table pk config (adapter mapping
        configs / HbaseSyncService composite rowkey :72-82).  Stored as
        the ``key-cols`` table property; default matches the token
        table's contract."""
        return [
            c.strip()
            for c in self.properties.get("key-cols", "doc_id").split(",")
            if c.strip()
        ]

    @property
    def properties(self) -> dict:
        return self.metadata.get("properties", {})

    @property
    def snapshots(self) -> list[Snapshot]:
        return [Snapshot.from_json(s) for s in self.metadata["snapshots"]]

    @property
    def current_snapshot_id(self) -> int | None:
        return self.metadata.get("current_snapshot_id")

    def current_snapshot(self) -> Snapshot | None:
        sid = self.current_snapshot_id
        for s in self.snapshots:
            if s.snapshot_id == sid:
                return s
        return None

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise KeyError(f"snapshot {snapshot_id} not found (expired?)")

    def spark_schema(self):
        from pyspark.sql.types import StructType

        return StructType.fromJson(self.schema_json)

    def schema_for_snapshot(self, snap: "Snapshot | None"):
        """Schema pinned at snapshot-commit time (current schema when the
        snapshot predates schema tracking)."""
        from pyspark.sql.types import StructType

        if snap is None or snap.schema_id is None:
            return self.spark_schema()
        return StructType.fromJson(self.schemas[snap.schema_id])

    # ---- paths ----------------------------------------------------------

    def _meta_dir(self) -> str:
        return os.path.join(self.root, "metadata")

    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    # ---- snapshot GC (shared by expire / delete_branch / abort_staged) --

    def _dead_set(
        self, retained: list["Snapshot"], dropped: list["Snapshot"]
    ) -> tuple[set[str], set[str]]:
        """(dead_manifests, dead_files): referenced by the dropped
        snapshots and by NO retained snapshot.  The ONE computation of
        reference liveness — expire, branch abandon and stage abort all
        answer the same question, and a divergent copy in any of them
        is either a leak or a deletion of live data."""
        live_manifests: set[str] = set()
        for s in retained:
            live_manifests.update(s.manifests)
        live_files: set[str] = set()
        for m in live_manifests:
            live_files.update(e.path for e in self._read_manifest(m))
        dead_manifests: set[str] = set()
        dead_files: set[str] = set()
        for s in dropped:
            for m in s.manifests:
                if m not in live_manifests:
                    dead_manifests.add(m)
                    dead_files.update(
                        e.path
                        for e in self._read_manifest(m)
                        if e.path not in live_files
                    )
        return dead_manifests, dead_files

    def _gc_dead(
        self, dead_manifests: set[str], dead_files: set[str]
    ) -> tuple[int, int]:
        """Physically remove a dead set: data files (with their bloom
        sidecars, via _remove_data_file), the write-marker debris of
        any directory left holding only markers (Spark's _SUCCESS /
        .crc — meaningless once the data is gone), then the dead
        manifests.  Returns (data_files_deleted, manifests_deleted).
        Runs strictly AFTER the metadata commit that dropped the
        references — a crash between the two leaves reclaimable
        orphans, never a metadata entry pointing at deleted files."""
        deleted = 0
        dirs: set[str] = set()
        for p in dead_files:
            full = os.path.join(self.root, p)
            dirs.add(os.path.dirname(full))
            if _remove_data_file(full):
                deleted += 1
        for d in sorted(dirs, reverse=True):
            try:
                for side in os.listdir(d):
                    if side.startswith(("_", ".")):
                        os.remove(os.path.join(d, side))
                os.rmdir(d)
            except OSError:
                pass  # shared with a retained commit — leave it
        manifests_deleted = 0
        for m in dead_manifests:
            try:
                os.remove(os.path.join(self._meta_dir(), m))
                manifests_deleted += 1
            except FileNotFoundError:
                pass
        return deleted, manifests_deleted

    def new_data_prefix(self) -> str:
        """A fresh, collision-free directory for one write job's files."""
        return os.path.join(self._data_dir(), uuid.uuid4().hex[:12])

    # ---- manifest I/O ----------------------------------------------------

    def _read_manifest(self, name: str) -> list[DataFile]:
        """Parse one manifest, memoized process-wide.

        Manifests are immutable once written (uuid names, only ever
        created whole + atomically), so the parse is cacheable; the
        LRU bound keeps driver memory O(hot set).  One merge_into
        walks the manifest list five-plus times (planning, delete debt,
        no-op refine, per-commit-attempt reuse) — at the 200k-file
        design point that is several full JSON parses of the whole
        manifest set per batch without this.  The cache key includes
        the file's (mtime_ns, size): one stat per read — noise next to
        a JSON parse — turns the immutability ASSUMPTION into a checked
        one, so out-of-band tampering (exactly what `doctor.check_table`
        exists to detect) and same-name rewrites are never served
        stale.  CONTRACT: returned lists and their DataFile entries are
        SHARED — callers must never mutate them (annotate_entry_stats
        replaces entries for this reason; commit only stamps seq on its
        own added entries)."""
        path = os.path.join(self._meta_dir(), name)
        try:
            st = os.stat(path)
        except OSError as e:
            # A manifest referenced by a live snapshot is gone (or
            # unreadable) out-of-band — surface it as table corruption
            # naming the manifest, not a bare FileNotFoundError, even
            # when an LRU-cached parse of an earlier (mtime, size)
            # version exists: serving the cache would mask exactly the
            # tampering the stat guard is there to detect.
            raise RuntimeError(
                f"corrupted table {self.root}: manifest {name} referenced"
                f" by table metadata is missing or unreadable ({e});"
                " run doctor.check_table / restore the metadata dir"
            ) from e
        key = (self.root, name, st.st_mtime_ns, st.st_size)
        with _MANIFEST_CACHE_LOCK:
            hit = _MANIFEST_CACHE.get(key)
            if hit is not None:
                _MANIFEST_CACHE.move_to_end(key)
                return hit
        with open(path) as f:
            entries = [DataFile.from_json(d) for d in json.load(f)]
        with _MANIFEST_CACHE_LOCK:
            _MANIFEST_CACHE[key] = entries
            _MANIFEST_CACHE.move_to_end(key)
            while len(_MANIFEST_CACHE) > _MANIFEST_CACHE_MAX:
                _MANIFEST_CACHE.popitem(last=False)
        return entries

    def _write_manifest(self, files: list[DataFile], tag: str) -> str:
        name = f"manifest-{tag}-{uuid.uuid4().hex[:8]}.json"
        path = os.path.join(self._meta_dir(), name)
        with open(path + ".tmp", "w") as f:
            json.dump([df.to_json() for df in files], f)
        os.replace(path + ".tmp", path)
        return name

    def all_entries(self, snapshot_id: int | None = None) -> list[DataFile]:
        """All live manifest entries at a snapshot — data files AND
        delete files (equality + position; default: current)."""
        if snapshot_id is None:
            snap = self.current_snapshot()
            if snap is None:
                return []
        else:
            snap = self.snapshot_by_id(snapshot_id)
        out: list[DataFile] = []
        for m in snap.manifests:
            out.extend(self._read_manifest(m))
        return out

    def files(self, snapshot_id: int | None = None) -> list[DataFile]:
        """Live DATA files at a snapshot (default: current) — the
        contract every maintenance planner (merge prune, compaction
        bin-pack, clustering scope) operates over.  Equality-delete
        entries live alongside them in the same manifests; use
        ``delete_files()`` for those."""
        return [e for e in self.all_entries(snapshot_id) if e.content == "data"]

    def delete_files(self, snapshot_id: int | None = None) -> list[DataFile]:
        """ALL live merge-on-read delete files at a snapshot — equality
        deletes (key parquet) AND position deletes ((file_path, pos)
        parquet, Iceberg v2's second delete form).  Empty on a pure
        copy-on-write table.  Every rewrite path feeds this whole list
        to ``read_files_live`` (which splits by content), so adding a
        delete form can never silently skip a fold-in site."""
        return [
            e
            for e in self.all_entries(snapshot_id)
            if e.content in ("eq-deletes", "pos-deletes")
        ]

    def eq_delete_files(self, snapshot_id: int | None = None) -> list[DataFile]:
        """Live equality-delete files only (key-matching deletes)."""
        return [
            e for e in self.all_entries(snapshot_id) if e.content == "eq-deletes"
        ]

    def pos_delete_files(self, snapshot_id: int | None = None) -> list[DataFile]:
        """Live position-delete files only ((file_path, pos) rows that
        kill exactly one physical row of one data file — the O(matched
        rows) write shape of a selective predicate DELETE)."""
        return [
            e for e in self.all_entries(snapshot_id) if e.content == "pos-deletes"
        ]

    # ---- snapshot resolution ---------------------------------------------

    def resolve_snapshot(
        self,
        snapshot_id: int | None = None,
        as_of_version: int | None = None,
        as_of_timestamp_ms: int | None = None,
        tag: str | None = None,
    ) -> Snapshot | None:
        if tag is not None:
            # resolves ANY named ref: a tag pin or a branch head (so
            # scan(tag=<branch>) is the audit read of an unpublished
            # branch chain)
            refs = self.refs
            if tag not in refs:
                raise KeyError(f"unknown tag {tag!r}")
            return self.snapshot_by_id(refs[tag]["snapshot_id"])
        if snapshot_id is not None:
            return self.snapshot_by_id(snapshot_id)
        if as_of_version is not None:
            # TRUE metadata versions: read v{N}.metadata.json (version
            # files are never deleted) and resolve ITS current snapshot.
            # Indexing the snapshot list would drift: snapshot-less
            # commits (set_properties, tags, retry bumps) advance the
            # version without adding a snapshot, and expiry removes
            # list entries — the index then names an arbitrary snapshot
            try:
                with open(_metadata_path(self.root, as_of_version)) as f:
                    meta = json.load(f)
            except FileNotFoundError:
                raise KeyError(
                    f"metadata version {as_of_version} does not exist"
                ) from None
            sid = meta.get("current_snapshot_id")
            if sid is None:
                raise KeyError(
                    f"metadata version {as_of_version} has no current "
                    "snapshot (pre-first-commit)"
                )
            try:
                return self.snapshot_by_id(sid)
            except KeyError:
                raise KeyError(
                    f"metadata version {as_of_version}'s snapshot {sid} "
                    "was expired — time travel to it is gone"
                ) from None
        if as_of_timestamp_ms is not None:
            cands = [s for s in self.snapshots if s.timestamp_ms <= as_of_timestamp_ms]
            if not cands:
                raise KeyError("no snapshot at or before timestamp")
            return max(cands, key=lambda s: s.timestamp_ms)
        return self.current_snapshot()

    # ---- named refs (Iceberg-style tags) -----------------------------------

    @property
    def refs(self) -> dict:
        """Named snapshot refs: {name: {"snapshot_id": N, "type":
        "tag" | "branch"}}.  Tags are the training-set pinning
        primitive — tag the snapshot a run trained on ("train-v1") and
        every re-read of that tag is the byte-identical corpus, immune
        to later merges, compaction, clustering AND snapshot expiry
        (referenced snapshots never expire).  Branches are writable
        refs: commit chains land on them without moving ``current``
        until :meth:`fast_forward` publishes the chain."""
        return self.metadata.get("refs", {})

    def set_properties(
        self, props: dict | None = None, remove: list[str] | None = None
    ) -> dict:
        """ALTER TABLE SET/UNSET TBLPROPERTIES — a metadata-only CAS
        commit (optimistic retry like every writer).  This is how an
        existing table opts into write-time features (e.g.
        ``write.bloom.col``) without touching data.

        ``key-cols`` is protected once the table has snapshots: the
        merge contract (manifests, sort orders, eq-delete files, bloom
        sidecars) is keyed by it, and silently repointing the key on a
        populated table would corrupt every one of those structures.
        The engine's own checkpoint properties (merge hwm / GTID set)
        are rejected too — positions move through commits, never DDL."""
        props = dict(props or {})
        remove = list(remove or [])
        reserved = {CKPT_PROP, GTID_PROP}
        touched = set(props) | set(remove)
        if touched & reserved:
            raise ValueError(
                f"properties {sorted(touched & reserved)} are checkpoint "
                "state — they only move through commits"
            )
        for _ in range(5):
            self.refresh()
            if "key-cols" in touched and self.snapshots:
                cur = self.properties.get("key-cols", "doc_id")
                if props.get("key-cols", None) != cur:
                    raise ValueError(
                        "cannot change key-cols on a table with snapshots"
                    )
            new_props = {
                k: v for k, v in self.properties.items() if k not in remove
            }
            new_props.update(props)
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["properties"] = new_props
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return new_props
            except FileExistsError:
                continue
        raise CommitConflict("set_properties gave up after 5 retries")

    def set_tag(self, name: str, snapshot_id: int | None = None) -> dict:
        """Create or move a tag (optimistic CAS like every commit).
        Defaults to the current snapshot.  Staged (WAP) snapshots are
        not taggable: their lifecycle ends in publish-or-abort and a
        tag would dangle on abort."""
        for _ in range(5):
            self.refresh()
            sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id
            if sid is None:
                raise ValueError("cannot tag an empty table")
            snap = self.snapshot_by_id(sid)  # raises on unknown id
            if snap.summary.get(WAP_STAGED_KEY):
                raise ValueError(f"snapshot {sid} is staged — publish first")
            if snap.summary.get(BRANCH_KEY):
                # a tag into a branch chain would dangle on delete_branch
                raise ValueError(
                    f"snapshot {sid} belongs to branch "
                    f"{snap.summary[BRANCH_KEY]!r} — fast_forward, then tag"
                )
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["refs"] = {**self.refs, name: {"snapshot_id": sid, "type": "tag"}}
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return meta["refs"][name]
            except FileExistsError:
                continue
        raise CommitConflict("set_tag gave up after 5 retries")

    def delete_tag(self, name: str) -> None:
        for _ in range(5):
            self.refresh()
            if name not in self.refs:
                raise KeyError(f"unknown tag {name!r}")
            if self.refs[name].get("type") == "branch":
                # dropping just the ref would orphan the chain's
                # unpublished snapshots without GC'ing their files
                raise ValueError(
                    f"{name!r} is a branch — use delete_branch (GC) or "
                    "fast_forward (publish)"
                )
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["refs"] = {k: v for k, v in self.refs.items() if k != name}
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return
            except FileExistsError:
                continue
        raise CommitConflict("delete_tag gave up after 5 retries")

    # ---- writable branches (Iceberg branch refs / audit-branch WAP) -------

    def create_branch(self, name: str, snapshot_id: int | None = None) -> dict:
        """Create a writable branch ref at a mainline snapshot (default:
        current).  Branches are the multi-commit form of write-audit-
        publish: ``commit(..., branch=name)`` chains snapshots off the
        ref without moving ``current``; readers audit via
        ``scan(tag=name)``; :meth:`fast_forward` publishes the whole
        chain atomically (deferred properties applied in commit order)
        and :meth:`delete_branch` discards it with full file GC.

        Sources must be ON the main line: branching from a WAP-staged or
        branch-marked snapshot would entangle two pending lifecycles
        (aborting one would orphan the other's parent chain)."""
        for _ in range(5):
            self.refresh()
            sid = (
                snapshot_id
                if snapshot_id is not None
                else self.current_snapshot_id
            )
            if sid is None:
                raise ValueError("cannot branch an empty table")
            snap = self.snapshot_by_id(sid)  # raises on unknown id
            if snap.summary.get(WAP_STAGED_KEY):
                raise ValueError(f"snapshot {sid} is staged — publish first")
            if snap.summary.get(BRANCH_KEY):
                raise ValueError(
                    f"snapshot {sid} belongs to branch "
                    f"{snap.summary[BRANCH_KEY]!r} — fast_forward it first"
                )
            if name in self.refs:
                raise ValueError(f"ref {name!r} already exists")
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["refs"] = {
                **self.refs,
                name: {"snapshot_id": sid, "type": "branch"},
            }
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return meta["refs"][name]
            except FileExistsError:
                continue
        raise CommitConflict("create_branch gave up after 5 retries")

    def branch_chain(self, name: str) -> list["Snapshot"]:
        """The branch-exclusive snapshots of ``name``, newest first
        (empty if the branch has no commits yet).  The chain walks
        parent ids from the ref head while the snapshots carry this
        branch's marker; the first unmarked ancestor is the fork base
        (a mainline snapshot, not part of the chain)."""
        ref = self.refs.get(name)
        if ref is None or ref.get("type") != "branch":
            raise KeyError(f"unknown branch {name!r}")
        by_id = {s.snapshot_id: s for s in self.snapshots}
        chain: list[Snapshot] = []
        cur = by_id.get(ref["snapshot_id"])
        while cur is not None and cur.summary.get(BRANCH_KEY) == name:
            chain.append(cur)
            cur = (
                by_id.get(cur.parent_id) if cur.parent_id is not None else None
            )
        return chain

    def fast_forward(self, name: str) -> Snapshot:
        """Publish a branch: atomically point ``current`` at the branch
        head, strip the branch markers from every chain snapshot (their
        summaries start counting for checkpoint accounting), apply the
        chain's deferred property updates oldest-first, and drop the
        ref.  Fails with :class:`CommitConflict` when the main line
        advanced past the branch's fork base — the chain was computed
        against a base that no longer exists, so re-branch and re-run
        (the same lost-update protection as :meth:`publish`)."""
        for _ in range(5):
            self.refresh()
            chain = self.branch_chain(name)  # raises on unknown branch
            if not chain:
                raise ValueError(
                    f"branch {name!r} has no commits to publish — "
                    "delete_branch instead"
                )
            if chain[-1].parent_id != self.current_snapshot_id:
                raise CommitConflict(
                    f"cannot fast-forward {name!r}: table advanced past "
                    f"its fork base {chain[-1].parent_id} "
                    f"(current {self.current_snapshot_id}) — re-branch"
                )
            now_ms = int(time.time() * 1000)
            props = dict(self.properties)
            published: dict[int, Snapshot] = {}
            for s in reversed(chain):  # oldest first: later wins
                props.update(s.summary.get(WAP_PROPS_KEY) or {})
                ns = {
                    k: v
                    for k, v in s.summary.items()
                    if k not in (BRANCH_KEY, WAP_PROPS_KEY)
                }
                ns["branch-published-at-ms"] = now_ms
                published[s.snapshot_id] = Snapshot(
                    snapshot_id=s.snapshot_id,
                    parent_id=s.parent_id,
                    timestamp_ms=s.timestamp_ms,
                    operation=s.operation,
                    manifests=s.manifests,
                    summary=ns,
                    schema_id=s.schema_id,
                )
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = [
                published.get(s.snapshot_id, s).to_json()
                for s in self.snapshots
            ]
            meta["current_snapshot_id"] = chain[0].snapshot_id
            meta["properties"] = props
            meta["refs"] = {k: v for k, v in self.refs.items() if k != name}
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return published[chain[0].snapshot_id]
            except FileExistsError:
                continue
        raise CommitConflict("fast_forward gave up after 5 retries")

    def delete_branch(self, name: str) -> dict:
        """Abandon a branch: atomically drop the ref AND the chain's
        snapshots, then GC the data files and manifests only the chain
        referenced (anything shared with a retained snapshot survives —
        the multi-commit form of :meth:`abort_staged`).  Deferred
        properties die with the chain, so an abandoned merge batch
        stays below the checkpoint and re-applies on the next pass."""
        for _ in range(5):
            self.refresh()
            chain = self.branch_chain(name)  # raises on unknown branch
            chain_ids = {s.snapshot_id for s in chain}
            retained = [
                s for s in self.snapshots if s.snapshot_id not in chain_ids
            ]
            dead_manifests, dead_files = self._dead_set(retained, chain)
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = [s.to_json() for s in retained]
            meta["refs"] = {k: v for k, v in self.refs.items() if k != name}
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
            except FileExistsError:
                continue
            deleted, manifests_deleted = self._gc_dead(dead_manifests, dead_files)
            return {
                "deleted": True,
                "snapshots_dropped": len(chain),
                "data_files_deleted": deleted,
                "manifests_deleted": manifests_deleted,
            }
        raise CommitConflict("delete_branch gave up after 5 retries")

    # ---- era-aware reads --------------------------------------------------

    def read_files(
        self,
        spark: SparkSession,
        entries: list["DataFile"],
        target_schema_id: int | None = None,
        with_file_path: str | None = None,
        with_pos: str | None = None,
    ) -> DataFrame:
        """Read data files projected to a target schema, resolving each
        file's write-time schema era by FIELD ID.

        Files written before a rename keep their old column name on
        disk; the era read selects the old name and aliases it to the
        target name (same field id).  Type widenings cast; columns added
        after the file was written project as null; columns dropped and
        re-added under the same name get a NEW field id, so old data
        does not resurrect.  Files are grouped by era — one scan branch
        per era (almost always 1-2), each with full pushdown, unioned by
        name.  ``with_file_path`` adds a normalized file-path column
        (for per-file joins like compaction's bin map); ``with_pos``
        adds the physical row index within the file
        (``_metadata.row_index`` — stable under predicate pushdown and
        row-group skipping, the identity position-deletes target).
        """
        from pyspark.sql import functions as FF
        from pyspark.sql.types import StructType

        tid = self.current_schema_id if target_schema_id is None else target_schema_id
        target = StructType.fromJson(self.schemas[tid])
        if not entries:
            df = spark.createDataFrame([], target)
            if with_file_path:
                df = df.withColumn(with_file_path, FF.lit(None).cast("string"))
            if with_pos:
                df = df.withColumn(with_pos, FF.lit(None).cast("long"))
            return df

        groups: dict[int, list[str]] = {}
        for e in entries:
            sid = e.schema_id if e.schema_id is not None else tid
            groups.setdefault(sid, []).append(os.path.join(self.root, e.path))

        tgt_fids = self.field_ids_for(tid)
        parts = []
        for sid, paths in sorted(groups.items()):
            era = StructType.fromJson(self.schemas[sid])
            df = spark.read.schema(era).parquet(*paths)
            if sid == tid:
                cols = [FF.col(f.name) for f in target.fields]
            else:
                inv = {fid: name for name, fid in self.field_ids_for(sid).items()}
                era_types = {f.name: f.dataType for f in era.fields}
                cols = []
                for f in target.fields:
                    src = inv.get(tgt_fids[f.name])
                    if src is not None:
                        c = FF.col(src)
                        # cast only on a real widening: Spark rejects
                        # no-op casts between complex types (array->array)
                        if era_types[src] != f.dataType:
                            c = c.cast(f.dataType)
                        cols.append(c.alias(f.name))
                    else:
                        cols.append(FF.lit(None).cast(f.dataType).alias(f.name))
            if with_file_path:
                from canal_spark.table.writer import norm_file_path

                cols.append(
                    norm_file_path(FF.col("_metadata.file_path")).alias(with_file_path)
                )
            if with_pos:
                cols.append(FF.col("_metadata.row_index").alias(with_pos))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def planning_snapshot_id(self, base_sid: int | None = None) -> int:
        """The snapshot id a rewrite was planned against — the value
        ``commit(validate_no_new_deletes_since=...)`` wants: the given
        branch head when operating on a branch, else the current
        snapshot; 0 means planned on an empty table."""
        if base_sid is not None:
            return base_sid
        cur = self.current_snapshot()
        return cur.snapshot_id if cur else 0

    def prune_deletes_for(
        self,
        entries: list["DataFile"],
        dels: list["DataFile"],
    ) -> tuple[list["DataFile"], list["DataFile"]]:
        """``(eq_dels, pos_dels)`` that can possibly affect rows of
        ``entries`` — the driver-side pruning every MoR read applies
        before building any join, O(#entries + #deletes), no Spark job.

        Three sound filters, each conservative on missing stats:
        min-seq window (a delete only kills STRICTLY older rows, and a
        pos delete always postdates every file it references); pos
        path-range (the delete file's file_path footer min/max vs the
        sorted entry paths); eq key-range (the delete file's key footer
        min/max vs the union key range of the entries — keys are
        rename/retype-protected so one stat name reads every era; any
        entry without key stats makes the union unbounded, no pruning).
        Callers that only need to know whether a scan WOULD pay a
        delete join (e.g. the metadata-delete live-count decision) use
        this directly."""
        if entries:
            min_seq = min(int(e.seq or 0) for e in entries)
            dels = [d for d in dels if int(d.seq or 0) > min_seq]
        eq_dels = [d for d in dels if d.content == "eq-deletes"]
        pos_dels = [d for d in dels if d.content == "pos-deletes"]
        if pos_dels and entries:
            import bisect

            epaths = sorted(e.path for e in entries)
            kept = []
            for d in pos_dels:
                st = d.stats.get("file_path") or {}
                mn, mx = st.get("min"), st.get("max")
                if mn is None or mx is None:
                    kept.append(d)  # no stats: conservatively relevant
                    continue
                i = bisect.bisect_left(epaths, mn)
                if i < len(epaths) and epaths[i] <= mx:
                    kept.append(d)
            pos_dels = kept
        if eq_dels and entries:
            kc = self.key_cols[0]
            lo = hi = None
            unknown = False
            for e in entries:
                st = e.stats.get(self.era_stat_name(e, kc)) or {}
                mn, mx = st.get("min"), st.get("max")
                if mn is None or mx is None:
                    unknown = True
                    break
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if not unknown and lo is not None:
                kept = []
                for d in eq_dels:
                    st = d.stats.get(kc) or {}
                    dmn, dmx = st.get("min"), st.get("max")
                    if dmn is None or dmx is None or (dmx >= lo and dmn <= hi):
                        kept.append(d)
                eq_dels = kept
        return eq_dels, pos_dels

    def read_files_live(
        self,
        spark: SparkSession,
        entries: list["DataFile"],
        delete_entries: list["DataFile"] | None = None,
        target_schema_id: int | None = None,
        with_file_path: str | None = None,
        max_broadcast_delete_rows: int = 5_000_000,
        with_pos: str | None = None,
    ) -> DataFrame:
        """Read data files with pending deletes APPLIED — the
        merge-on-read scan (Iceberg v2 semantics, both delete forms).

        An EQUALITY-delete file (parquet of key columns, commit sequence
        ``d.seq``) kills rows of data files with a STRICTLY SMALLER
        sequence whose keys match; rows written at or after ``d.seq``
        survive, so insert-after-delete works.  A POSITION-delete file
        (parquet of (file_path, pos)) kills exactly the physical row
        ``pos`` of the referenced data file — identity is the immutable
        file path, so no sequence residual is needed (a rewrite emits a
        NEW path, and commit-time ``validate_no_new_deletes_since``
        keeps a racing rewrite from stranding a delete against the old
        one).  Plan shape: one broadcast hash anti-join per pending
        delete form — pos deletes equi-join on (path, pos); eq deletes
        join on keys with the sequence comparison as a residual
        condition, per-row sequences attached via a broadcast
        (path -> seq) map join (O(#files), manifest scale).  Delete sets
        are batch-sized by the maintenance contract (materialize_deletes
        repays the debt), so the broadcast sides stay small; a
        mass-delete backfill above ``max_broadcast_delete_rows`` falls
        back to a shuffled anti-join under AQE.  Pos-delete files are
        additionally pruned driver-side by their (file_path) footer
        min/max against the entry paths being read, so a scan of files
        no delete references pays nothing.

        Every REWRITE path (merge keep-side, compaction, clustering)
        must read through this — a rewrite bumps surviving rows to a new
        sequence and a new path, which stops pending deletes from
        applying to them, so the deletes have to be folded in during the
        read or deleted rows would resurrect.
        """
        from pyspark.sql import functions as FF

        dels = list(delete_entries) if delete_entries is not None else self.delete_files()
        eq_dels, pos_dels = self.prune_deletes_for(entries, dels)
        if (not eq_dels and not pos_dels) or not entries:
            return self.read_files(
                spark, entries, target_schema_id=target_schema_id,
                with_file_path=with_file_path, with_pos=with_pos,
            )

        fp = with_file_path or "_sg_fp"
        pos = with_pos or "_sg_pos"
        need_pos = bool(pos_dels) or with_pos is not None
        df = self.read_files(
            spark, entries, target_schema_id=target_schema_id,
            with_file_path=fp, with_pos=pos if need_pos else None,
        )
        abs_root = os.path.abspath(self.root)

        if pos_dels:
            # (path, pos) anti-join: the delete rows store table-root-
            # relative paths (stable across relocation); prefixing the
            # absolute root JVM-side reproduces exactly the normalized
            # `_metadata.file_path` form the data side carries
            p_paths = [os.path.join(self.root, d.path) for d in pos_dels]
            p_df = (
                spark.read.schema("file_path string, pos long")
                .parquet(*p_paths)
                .select(
                    FF.concat(FF.lit(abs_root + "/"), FF.col("file_path")).alias(
                        "_sg_pdfp"
                    ),
                    FF.col("pos").alias("_sg_ppos"),
                )
            )
            n_pos_rows = sum(d.rows for d in pos_dels)
            p_side = (
                FF.broadcast(p_df)
                if n_pos_rows <= max_broadcast_delete_rows
                else p_df
            )
            df = df.join(
                p_side,
                (FF.col(fp) == FF.col("_sg_pdfp"))
                & (FF.col(pos) == FF.col("_sg_ppos")),
                "left_anti",
            )

        if eq_dels:
            df = self.eq_delete_join(
                spark, df, entries, eq_dels, fp, "left_anti",
                max_broadcast_delete_rows=max_broadcast_delete_rows,
            )

        out = df
        if with_file_path is None:
            out = out.drop(fp)
        if with_pos is None and need_pos:
            out = out.drop(pos)
        return out

    def eq_delete_join(
        self,
        spark: SparkSession,
        df: DataFrame,
        entries: list[DataFile],
        eq_dels: list[DataFile],
        fp: str,
        how: str,
        max_broadcast_delete_rows: int = 5_000_000,
    ) -> DataFrame:
        """The ONE implementation of the equality-delete sequence rules:
        attach each row's data-file sequence (via the absolute-path
        column ``fp``), read the pending delete keys with their
        delete-file sequences, and join on key-equality AND
        ``delete_seq > data_seq``.  ``how='left_anti'`` keeps the rows
        the deletes DON'T kill (the live read, :meth:`read_files_live`);
        ``how='left_semi'`` keeps exactly the rows they DO (the eq→pos
        conversion, merge.convert_eq_deletes) — shared so scan and
        conversion can never drift on path normalization, sequence
        defaulting, or the residual condition."""
        from pyspark.sql import functions as FF
        from pyspark.sql.types import StructType

        from canal_spark.table.writer import norm_file_path

        seq_df = spark.createDataFrame(
            [
                (os.path.abspath(f"{self.root}/{e.path}"), int(e.seq or 0))
                for e in entries
            ],
            f"`{fp}` string, _sg_seq long",
        )
        df = df.join(FF.broadcast(seq_df), fp, "left").withColumn(
            "_sg_seq", FF.coalesce(FF.col("_sg_seq"), FF.lit(0))
        )
        # delete keys: key columns are protected from rename/retype, so
        # the current schema's key fields read every delete era
        key_cols = self.key_cols
        cur = {f.name: f for f in self.spark_schema().fields}
        key_schema = StructType([cur[k] for k in key_cols])
        d_paths = [os.path.join(self.root, d.path) for d in eq_dels]
        d_df = (
            spark.read.schema(key_schema)
            .parquet(*d_paths)
            .select(
                *[FF.col(k).alias(f"_sg_d_{k}") for k in key_cols],
                norm_file_path(FF.col("_metadata.file_path")).alias("_sg_dfp"),
            )
        )
        dseq_df = spark.createDataFrame(
            [
                (os.path.abspath(f"{self.root}/{d.path}"), int(d.seq or 0))
                for d in eq_dels
            ],
            "_sg_dfp string, _sg_dseq long",
        )
        d_df = d_df.join(FF.broadcast(dseq_df), "_sg_dfp", "left").drop("_sg_dfp")
        n_del_rows = sum(d.rows for d in eq_dels)
        d_side = (
            FF.broadcast(d_df) if n_del_rows <= max_broadcast_delete_rows else d_df
        )
        cond = FF.lit(True)
        for k in key_cols:
            cond = cond & (FF.col(k) == FF.col(f"_sg_d_{k}"))
        cond = cond & (FF.col("_sg_dseq") > FF.col("_sg_seq"))
        return df.join(d_side, cond, how).drop("_sg_seq")

    def era_stat_name(self, entry: "DataFile", col: str, target_schema_id: int | None = None) -> str:
        """The name ``col`` had when ``entry`` was written (file stats
        are keyed by write-time names)."""
        tid = self.current_schema_id if target_schema_id is None else target_schema_id
        sid = entry.schema_id if entry.schema_id is not None else tid
        if sid == tid:
            return col
        fid = self.field_ids_for(tid).get(col)
        if fid is None:
            return col
        for name, f in self.field_ids_for(sid).items():
            if f == fid:
                return name
        return col

    # ---- scan (with manifest-level pruning) -------------------------------

    def scan(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        as_of_version: int | None = None,
        as_of_timestamp_ms: int | None = None,
        partition_filter: dict[str, Any] | None = None,
        range_filter: dict[str, tuple] | None = None,
        tag: str | None = None,
        with_file_path: str | None = None,
        with_pos: str | None = None,
    ) -> DataFrame:
        """Snapshot-isolated read of the table as a DataFrame.
        ``with_file_path`` / ``with_pos`` expose each row's physical
        identity (normalized file path, row index) — what a
        position-delete writer records.

        ``partition_filter`` prunes files by partition-value equality;
        ``range_filter`` ({col: (lo, hi)}) prunes by manifest min/max
        overlap — the Iceberg-style *metadata* pruning that makes point
        lookups on a 100 TB table touch only a handful of files.  Spark
        then applies row-group pushdown inside surviving files.
        """
        snap = self.resolve_snapshot(
            snapshot_id, as_of_version, as_of_timestamp_ms, tag=tag
        )
        all_entries = self.all_entries(snap.snapshot_id) if snap is not None else []
        entries = [e for e in all_entries if e.content == "data"]
        dels = [e for e in all_entries if e.content != "data"]
        # project with the schema AS OF the snapshot being read: after a
        # drop, a time-travel read of a pre-drop snapshot still returns
        # the dropped column's data
        tid = (
            snap.schema_id
            if snap is not None and snap.schema_id is not None
            else self.current_schema_id
        )
        entries = prune_files(
            entries,
            partition_filter,
            range_filter,
            stat_name=lambda e, c: self.era_stat_name(e, c, tid),
        )
        # point lookups (range_filter with lo == hi) additionally probe
        # bloom sidecars where files carry markers: a point SELECT on an
        # interleaved layout — where every file's [min, max] straddles
        # the key — opens only the files that actually contain it (the
        # read-side twin of merge._affected_files' membership pruning).
        # Missing/foreign sidecars keep the range verdict; Spark still
        # row-group-prunes inside surviving files.
        if range_filter:
            points = {
                c: lo
                for c, (lo, hi) in range_filter.items()
                if lo is not None and lo == hi
            }
            if points:
                from canal_spark.table import bloom as _bloom

                hashes = {c: _bloom.key_hashes([v]) for c, v in points.items()}
                kept = []
                for e in entries:
                    drop = False
                    for c, h in hashes.items():
                        marker = (
                            e.stats.get(self.era_stat_name(e, c, tid)) or {}
                        ).get("bloom")
                        if not marker:
                            continue
                        side = _bloom.load_sidecar(os.path.join(self.root, e.path))
                        if side is None or side[0] != marker.get("m"):
                            continue
                        if not _bloom.probe_any(side[1], side[0], h):
                            drop = True
                            break
                    if not drop:
                        kept.append(e)
                entries = kept
        # merge-on-read: pending deletes (equality + position, at THIS
        # snapshot) apply as broadcast anti-joins; a pure-COW table has
        # none and takes the plain scan path with zero overhead
        return self.read_files_live(
            spark, entries, delete_entries=dels, target_schema_id=tid,
            with_file_path=with_file_path, with_pos=with_pos,
        )

    def row_count(self, snapshot_id: int | None = None) -> int:
        """Manifest row count of live DATA files.  With pending
        equality-deletes this is an upper bound on the scan row count
        (exact again once materialize_deletes repays the debt)."""
        return sum(e.rows for e in self.files(snapshot_id))

    # ---- commits ----------------------------------------------------------

    def refresh(self) -> "Table":
        self.metadata = _read_latest_metadata(self.root)
        return self

    def commit(
        self,
        added: list[DataFile],
        removed_paths: Iterable[str] = (),
        operation: str = "append",
        summary: dict[str, Any] | None = None,
        new_schema_json: dict | None = None,
        new_field_ids: dict[str, int] | None = None,
        new_properties: dict | None = None,
        new_partition_spec: list[str] | None = None,
        max_retries: int = 5,
        stage_only: bool = False,
        branch: str | None = None,
        validate_no_new_deletes_since: int | None = None,
        validate_files_exist: Iterable[str] | None = None,
        validate_properties: dict | None = None,
        validate_branch_base: int | None = None,
    ) -> Snapshot:
        """Atomically commit a new snapshot (optimistic concurrency).

        Manifest handling mirrors Iceberg: parent manifests that contain
        no removed file are *reused* by reference; manifests that do are
        rewritten minus the removed entries; added files land in one new
        manifest.  So commit cost is O(delta), not O(table).

        ``stage_only=True`` is the write half of write-audit-publish
        (Iceberg's ``spark.wap.id`` flow): the snapshot lands in the
        snapshot list — auditable via ``scan(snapshot_id=...)`` — but
        ``current_snapshot_id`` does NOT advance and ``new_properties``
        are deferred inside the snapshot summary; readers keep seeing
        the pre-stage table until :meth:`publish`, and
        :meth:`abort_staged` discards the stage without a trace in the
        checkpoint properties.  DDL (schema / partition-spec changes)
        cannot be staged — those stay isolation barriers (B3).
        """
        if stage_only and (
            new_schema_json is not None or new_partition_spec is not None
        ):
            raise ValueError("stage_only commits cannot carry DDL changes")
        if branch is not None:
            # branch commits share WAP's restrictions: no DDL (schema /
            # spec changes stay isolation barriers on the main line) and
            # no double-deferral with stage_only
            if stage_only:
                raise ValueError("stage_only and branch are mutually exclusive")
            if new_schema_json is not None or new_partition_spec is not None:
                raise ValueError("branch commits cannot carry DDL changes")
        removed = set(removed_paths)
        # entries arriving without a commit sequence get stamped with the
        # committing snapshot id (re-stamped per attempt: a lost race
        # changes the id).  The sequence orders equality-deletes against
        # data files: a delete applies only to strictly-older sequences.
        unstamped = [e for e in added if e.seq is None]
        for _ in range(max_retries):
            self.refresh()
            # checkpoint CAS (Iceberg's validate-committed-state family):
            # the caller pins the property values its plan was computed
            # against; a concurrent writer having advanced them means the
            # plan is stale — a PURE-ADD merge (all-new keys) would
            # otherwise double-apply, since it removes no files and the
            # manifest checks have nothing to conflict on.  Re-checked
            # per attempt against freshly-refreshed metadata.
            if validate_properties is not None:
                cur_props = self.properties
                for k, v in validate_properties.items():
                    if cur_props.get(k) != v:
                        raise CommitConflict(
                            f"table property {k!r} advanced since planning "
                            f"({v!r} -> {cur_props.get(k)!r}): a concurrent "
                            "writer moved the checkpoint — replan the batch"
                        )
            if branch is not None:
                ref = self.refs.get(branch)
                if ref is None or ref.get("type") != "branch":
                    raise CommitConflict(
                        f"branch {branch!r} no longer exists "
                        "(deleted or fast-forwarded concurrently)"
                    )
                # branch twin of the property CAS: the ref arbitrates
                # WRITE order but not PLAN staleness — a pure-add merge
                # planned at a stale head removes no files and would
                # sail through the manifest checks, double-applying its
                # changelog on top of the concurrent winner
                if (
                    validate_branch_base is not None
                    and ref["snapshot_id"] != validate_branch_base
                ):
                    raise CommitConflict(
                        f"branch {branch!r} advanced since planning "
                        f"({validate_branch_base} -> {ref['snapshot_id']}): "
                        "a concurrent writer committed to it — replan the "
                        "batch"
                    )
                parent = self.snapshot_by_id(ref["snapshot_id"])
            else:
                parent = self.current_snapshot()
            # max over ALL snapshots, not parent+1: a staged (WAP)
            # snapshot holds an id off the current line, and the next
            # mainline commit must not collide with it — ids are the
            # address auditors/publish use, so they stay globally unique
            next_id = max(
                (s.snapshot_id for s in self.snapshots), default=0
            ) + 1
            for e in unstamped:
                e.seq = next_id
            manifests: list[str] = []
            removed_found: set[str] = set()
            if parent is not None:
                for m in parent.manifests:
                    entries = self._read_manifest(m)
                    hit = [e for e in entries if e.path in removed]
                    if not hit:
                        manifests.append(m)  # reuse untouched manifest
                    else:
                        removed_found.update(e.path for e in hit)
                        keep = [e for e in entries if e.path not in removed]
                        if keep:
                            manifests.append(self._write_manifest(keep, "rw"))
            missing = removed - removed_found
            if missing:
                raise CommitConflict(
                    f"files to remove not in current snapshot (concurrent "
                    f"rewrite?): {sorted(missing)[:3]}..."
                )
            # Iceberg's validateNoNewDeleteFiles: a REWRITE planned at a
            # base snapshot read through the deletes pending THERE; if a
            # concurrent MoR delete commit landed since, the rewritten
            # rows (new seq, new path) would escape it — deleted rows
            # resurrecting.  Rewriters pass their planning snapshot id;
            # any delete file live now but not then conflicts (the
            # caller replans against the new snapshot).  0 = planned on
            # an empty table.
            if (
                validate_no_new_deletes_since is not None
                and parent is not None
                and parent.snapshot_id != validate_no_new_deletes_since
            ):
                base_id = validate_no_new_deletes_since
                if base_id == 0:
                    base_dels: set[str] = set()
                else:
                    try:
                        base_dels = {
                            e.path
                            for e in self.all_entries(base_id)
                            if e.content != "data"
                        }
                    except KeyError:
                        raise CommitConflict(
                            f"planning snapshot {base_id} expired during the "
                            "rewrite — replan against the current snapshot"
                        ) from None
                new_dels = [
                    e.path
                    for e in self.all_entries(parent.snapshot_id)
                    if e.content != "data" and e.path not in base_dels
                ]
                if new_dels:
                    raise CommitConflict(
                        "delete files committed since the rewrite was planned "
                        f"(snapshot {base_id}): {new_dels[:3]} — replan so the "
                        "rewrite folds them in"
                    )
            # Iceberg's validateDataFilesExist — the other direction of
            # the same race: a position-delete commit references data
            # files by path; if a concurrent rewrite removed one, the
            # delete would dangle and silently miss its rows.  Conflict
            # instead; the caller re-scans (the rows now live in the
            # rewritten files under new positions).
            if validate_files_exist is not None:
                live_data = {
                    e.path
                    for e in (
                        self.all_entries(parent.snapshot_id) if parent else []
                    )
                    if e.content == "data"
                }
                gone = sorted(set(validate_files_exist) - live_data)
                if gone:
                    raise CommitConflict(
                        "data files referenced by this commit were rewritten "
                        f"concurrently: {gone[:3]}... — re-scan and retry"
                    )
            if added:
                manifests.append(self._write_manifest(list(added), "add"))

            now_ms = int(time.time() * 1000)
            # schema evolution appends to the schema list; every snapshot
            # pins the schema-id it was committed under
            schemas = list(self.schemas)
            fid_hist = [dict(h) for h in self.field_id_history]
            schema_id = self.current_schema_id
            if new_schema_json is not None:
                schemas.append(new_schema_json)
                schema_id = len(schemas) - 1
                if new_field_ids is not None:
                    fid_hist.append(dict(new_field_ids))
                else:
                    # name-based fallback: reuse ids of still-present
                    # names, mint fresh ids for new ones.  NOT named
                    # next_id — that is the pending SNAPSHOT id; reusing
                    # it here would commit a snapshot under a recycled
                    # field-id number, colliding with an existing one.
                    prev = fid_hist[-1]
                    next_fid = max(
                        [i for h in fid_hist for i in h.values()], default=-1
                    ) + 1
                    cur = {}
                    for f in new_schema_json["fields"]:
                        if f["name"] in prev:
                            cur[f["name"]] = prev[f["name"]]
                        else:
                            cur[f["name"]] = next_fid
                            next_fid += 1
                    fid_hist.append(cur)
            wap_summary = {}
            if stage_only:
                wap_summary[WAP_STAGED_KEY] = True
                if new_properties is not None:
                    wap_summary[WAP_PROPS_KEY] = dict(new_properties)
            elif branch is not None:
                wap_summary[BRANCH_KEY] = branch
                if new_properties is not None:
                    # deferred like WAP: applied in chain order at
                    # fast_forward, dying with the chain on delete_branch
                    wap_summary[WAP_PROPS_KEY] = dict(new_properties)
            snap = Snapshot(
                snapshot_id=next_id,
                parent_id=parent.snapshot_id if parent else None,
                timestamp_ms=now_ms,
                operation=operation,
                manifests=manifests,
                summary={
                    "added-files": len(added),
                    "removed-files": len(removed),
                    "added-rows": sum(f.rows for f in added),
                    "added-bytes": sum(f.bytes for f in added),
                    **(summary or {}),
                    **wap_summary,
                },
                schema_id=schema_id,
            )
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = self.metadata["snapshots"] + [snap.to_json()]
            if branch is not None:
                # advance the branch ref, never current
                meta["refs"] = {
                    **self.refs,
                    branch: {"snapshot_id": snap.snapshot_id, "type": "branch"},
                }
            elif not stage_only:
                meta["current_snapshot_id"] = snap.snapshot_id
            meta["schemas"] = schemas
            meta["current_schema_id"] = schema_id
            meta["field_ids"] = fid_hist
            if new_schema_json is not None:
                meta["schema"] = new_schema_json
            if new_properties is not None and not stage_only and branch is None:
                meta["properties"] = {**self.properties, **new_properties}
            if new_partition_spec is not None:
                specs = [list(s) for s in self.partition_specs]
                spec = list(new_partition_spec)
                if spec in specs:
                    spec_id = specs.index(spec)
                else:
                    specs.append(spec)
                    spec_id = len(specs) - 1
                meta["partition_specs"] = specs
                meta["default_spec_id"] = spec_id
                meta["partition_by"] = spec  # legacy readers
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return snap
            except FileExistsError:
                continue  # lost the race; re-read and retry
        raise CommitConflict(f"gave up after {max_retries} retries")

    # ---- schema evolution (A6 DDL apply / B3 DDL-isolation analogue) -------

    # widenings that are safe for era-read casts AND stat comparisons
    _WIDENINGS = {
        ("short", "integer"), ("short", "long"), ("short", "double"),
        ("integer", "long"), ("integer", "double"),
        ("long", "double"), ("float", "double"),
    }

    def evolve_schema(
        self,
        add: list[tuple[str, str]] | None = None,
        drop: list[str] | None = None,
        rename: list[tuple[str, str]] | None = None,
        retype: list[tuple[str, str]] | None = None,
    ) -> Snapshot:
        """Apply a schema change as its own metadata-only commit — the
        engine's DDL barrier (the reference returns a DDL event alone in
        its own batch, store/.../MemoryEventStoreWithBuffer.java:294-327,
        and mirrors it to the target, RdbMirrorDbSyncService.executeDdl).

        Supported evolution (all metadata-only, per-field-id based, the
        Iceberg mechanism):
        * ``add``: new nullable columns (old files read as null) — a
          re-added name mints a NEW field id, so data of a previously
          dropped column never resurrects;
        * ``drop``: leaves dead bytes in old files until rewrite; time
          travel to pre-drop snapshots still returns the column;
        * ``rename``: keeps the field id — era reads alias the old
          on-disk name to the new one;
        * ``retype``: widening casts only (int->long, float->double, …)
          — era reads cast old files up.
        Partition and key columns cannot be dropped, renamed, or
        retyped (their names AND types key manifest partition values,
        pruning stats, and equality-delete file reads).
        """
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        schema = StructType.fromJson(self.schema_json)
        fids = dict(self.field_ids_for(self.current_schema_id))
        next_id = max(
            [i for h in self.field_id_history for i in h.values()], default=-1
        ) + 1
        names = {f.name for f in schema.fields}
        # every spec in the history is protected: old files' manifest
        # partition values are keyed by their spec's column names
        protected = {c for spec in self.partition_specs for c in spec} | set(
            self.key_cols
        )

        for name, ddl_type in add or []:
            if name in names:
                raise ValueError(f"column {name!r} already exists")
            schema = StructType(
                schema.fields + [StructField(name, _parse_datatype_string(ddl_type), True)]
            )
            fids[name] = next_id  # fresh id even if the name existed before
            next_id += 1
            names.add(name)
        for name in drop or []:
            if name not in names:
                raise ValueError(f"column {name!r} does not exist")
            if name in protected:
                raise ValueError(f"cannot drop partition/key column {name!r}")
            schema = StructType([f for f in schema.fields if f.name != name])
            fids.pop(name, None)
            names.discard(name)
        for old, new in rename or []:
            if old not in names:
                raise ValueError(f"column {old!r} does not exist")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            if old in protected:
                raise ValueError(f"cannot rename partition/key column {old!r}")
            schema = StructType(
                [
                    StructField(new, f.dataType, f.nullable) if f.name == old else f
                    for f in schema.fields
                ]
            )
            fids[new] = fids.pop(old)  # same id, new name
            names.discard(old)
            names.add(new)
        for name, ddl_type in retype or []:
            if name not in names:
                raise ValueError(f"column {name!r} does not exist")
            if name in protected:
                # key columns: equality-delete files and manifest min/max
                # pruning stats are read/compared with the CURRENT key
                # schema (read_files_live, _affected_files) — a widened
                # key would make pending MoR delete files unreadable and
                # stats incomparable.  Partition columns: manifest
                # partition values are keyed by the spec's column type.
                raise ValueError(f"cannot retype partition/key column {name!r}")
            new_t = _parse_datatype_string(ddl_type)
            old_t = next(f.dataType for f in schema.fields if f.name == name)
            if (old_t.typeName(), new_t.typeName()) not in self._WIDENINGS:
                raise ValueError(
                    f"retype {name!r}: {old_t.typeName()} -> {new_t.typeName()} "
                    "is not a supported widening"
                )
            schema = StructType(
                [
                    StructField(name, new_t, f.nullable) if f.name == name else f
                    for f in schema.fields
                ]
            )
        return self.commit(
            added=[],
            operation="schema",
            summary={
                "added-columns": ",".join(n for n, _ in (add or [])),
                "dropped-columns": ",".join(drop or []),
                "renamed-columns": ",".join(f"{o}->{n}" for o, n in (rename or [])),
                "retyped-columns": ",".join(f"{n}:{t}" for n, t in (retype or [])),
            },
            new_schema_json=schema.jsonValue(),
            new_field_ids=fids,
        )

    # ---- partition-spec evolution (Iceberg partition evolution) ------------

    def evolve_partition_spec(self, partition_by: list[str]) -> Snapshot:
        """Change the table's partition spec as a metadata-only commit.

        Old data files keep their old spec's partition values and are
        pruned by those (or by column stats when the filtered column
        isn't in their spec — never silently dropped); files written
        after this commit carry the new spec.  This is Iceberg partition
        evolution: re-speccing a 100 TB table is a metadata operation,
        and the layout migrates incrementally as maintenance rewrites
        files (compaction/clustering write under the new spec).
        """
        names = {f["name"] for f in self.schema_json["fields"]}
        for c in partition_by:
            if c not in names:
                raise ValueError(f"partition column {c!r} not in schema")
        if list(partition_by) == self.partition_by:
            raise ValueError("new partition spec equals the current spec")
        return self.commit(
            added=[],
            operation="partition-spec",
            summary={"new-partition-spec": ",".join(partition_by) or "<unpartitioned>"},
            new_partition_spec=list(partition_by),
        )

    # ---- maintenance: snapshot expiry & manifest rewrite -------------------

    def expire_snapshots(
        self,
        keep_last: int | None = None,
        older_than_ms: int | None = None,
        delete_orphans: bool = True,
    ) -> dict:
        """Expire old snapshots and garbage-collect unreferenced files.

        The current snapshot is always retained.  Time travel keeps
        working for every retained snapshot — the live set is the union
        of their manifests; only files referenced *exclusively* by
        expired snapshots are deleted.
        """
        for _attempt in range(5):
            self.refresh()
            snaps = self.snapshots
            if not snaps:
                return {"expired": 0, "data_files_deleted": 0, "manifests_deleted": 0}
            current = self.current_snapshot_id
            keep: set[int] = {current}
            if keep_last is not None and keep_last > 0:
                # guard: snaps[-0:] would be the WHOLE list, silently
                # keeping everything when 'keep only current' was meant
                keep.update(s.snapshot_id for s in snaps[-keep_last:])
            if older_than_ms is not None:
                keep.update(
                    s.snapshot_id for s in snaps if s.timestamp_ms >= older_than_ms
                )
            if keep_last is None and older_than_ms is None:
                keep.update(s.snapshot_id for s in snaps)  # nothing to expire
            # staged (WAP) snapshots are never expired implicitly: they
            # are off the current line by design, so position/age rules
            # would sweep an audit-in-flight stage; their lifecycle ends
            # only via publish or abort_staged
            keep.update(
                s.snapshot_id for s in snaps if s.summary.get(WAP_STAGED_KEY)
            )
            # tagged snapshots are pinned by name (training-set refs):
            # a tag's whole purpose is surviving retention policy, so
            # only delete_tag releases them to expiry
            keep.update(r["snapshot_id"] for r in self.refs.values())
            # the LATEST position-reset boundary is pinned: resume-mark
            # scans skip summaries older than it, and a tag can pin a
            # PRE-rollback snapshot indefinitely — expiring the reset
            # while that tag survives would resurrect the rolled-back
            # marks and silently swallow the redelivery.  Earlier
            # resets are superseded by the newest one and expire
            # normally, so this pins at most ONE extra snapshot
            resets = [
                s.snapshot_id
                for s in snaps
                if s.summary.get(POSITION_RESET_KEY)
            ]
            if resets:
                keep.add(max(resets))
            # branch chains are pinned whole (head AND intermediates):
            # fast_forward needs every chain snapshot's manifests and
            # deferred properties; only fast_forward/delete_branch ends
            # their lifecycle
            for nm, r in self.refs.items():
                if r.get("type") == "branch":
                    keep.update(s.snapshot_id for s in self.branch_chain(nm))

            retained = [s for s in snaps if s.snapshot_id in keep]
            expired = [s for s in snaps if s.snapshot_id not in keep]
            if not expired:
                return {"expired": 0, "data_files_deleted": 0, "manifests_deleted": 0}

            dead_manifests, dead_files = self._dead_set(retained, expired)

            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = [s.to_json() for s in retained]
            try:
                # optimistic retry like every other commit path: a
                # concurrent writer's version bump means re-reading and
                # re-planning the expiry, not a raw FileExistsError
                _write_metadata_exclusive(self.root, meta)
            except FileExistsError:
                continue
            self.metadata = meta
            break
        else:
            raise CommitConflict("expire gave up after 5 retries")

        deleted_data = deleted_manifests = 0
        if delete_orphans:
            # shared GC: also marker-sweeps dirs emptied by the expiry
            # (delete_branch/abort_staged always did; expiry previously
            # left _SUCCESS/.crc debris to remove_orphan_files)
            deleted_data, deleted_manifests = self._gc_dead(
                dead_manifests, dead_files
            )
        return {
            "expired": len(expired),
            "data_files_deleted": deleted_data,
            "manifests_deleted": deleted_manifests,
        }

    def remove_orphan_files(self, older_than_s: float = 3 * 24 * 3600) -> dict:
        """Delete data files under the table root referenced by NO
        retained snapshot — the debris a writer crash leaves between
        ``write_datafiles`` and ``commit`` (Iceberg's
        remove_orphan_files).  Only files older than ``older_than_s``
        are touched, so an in-flight write's staging files (written,
        not yet committed) are never swept.  O(#files) driver-side:
        one directory walk + the manifest union, no data scan."""
        from canal_spark.table.writer import _list_parquet

        # a long-held Table handle must not classify files committed since
        # it was loaded as orphans: the live set has to come from CURRENT
        # metadata, not the in-memory snapshot list (the mtime cutoff only
        # protects when older_than_s exceeds the handle's staleness)
        self.refresh()
        live: set[str] = set()
        live_manifests: set[str] = set()
        for s in self.snapshots:
            live_manifests.update(s.manifests)
            for m in s.manifests:
                live.update(e.path for e in self._read_manifest(m))
        cutoff = time.time() - older_than_s
        removed = scanned = manifests_removed = 0

        # manifests referenced by NO retained snapshot: commit-retry
        # losers and conflicted rewrite_manifests leave them behind, and
        # neither snapshot expiry (which only follows expired snapshots'
        # references) nor the data sweep below would ever collect them
        for n in os.listdir(self._meta_dir()):
            # *.tmp / *.tmp<suffix>: atomic-write staging a crashed
            # driver left between open(tmp) and os.replace — matched by
            # neither the manifest sweep nor the data sweep, so without
            # this they accumulate forever in a long-lived table
            is_tmp_debris = ".tmp" in n
            if not is_tmp_debris and not (
                n.startswith("manifest-") and n.endswith(".json")
            ):
                continue
            if n in live_manifests:
                continue
            p = os.path.join(self._meta_dir(), n)
            try:
                if os.path.getmtime(p) < cutoff:
                    os.remove(p)
                    manifests_removed += 1
            except FileNotFoundError:
                pass
        for p in _list_parquet(self._data_dir()):
            rel = os.path.relpath(p, self.root)
            scanned += 1
            if rel in live:
                continue
            try:
                if os.path.getmtime(p) < cutoff:
                    if _remove_data_file(p):
                        removed += 1
            except FileNotFoundError:
                pass
        # bloom sidecars whose data file is gone: the pair-removal helper
        # keeps normal GC atomic, so strays only come from crashes between
        # the two removals or from pre-bloom GC code — sweep them here
        # (age-guarded like everything else) so the dir sweep below can
        # reclaim their directories
        for dirpath, _dirs, names in os.walk(self._data_dir()):
            for n in names:
                if n.endswith(".bloom"):
                    p = os.path.join(dirpath, n)
                    if os.path.exists(p[: -len(".bloom")]):
                        continue
                elif n.endswith(".bloom.tmp"):
                    # crashed sidecar build between write and os.replace
                    p = os.path.join(dirpath, n)
                else:
                    continue
                try:
                    if os.path.getmtime(p) < cutoff:
                        os.remove(p)
                except FileNotFoundError:
                    pass
        # Sweep staging dirs that hold no data anymore.  Spark leaves
        # _SUCCESS / .crc markers in every write directory, so "empty"
        # means "only marker files left" — delete the markers (they are
        # write-job metadata, meaningless once the data files are gone
        # or committed elsewhere) and then the dir.
        for dirpath, dirs, names in os.walk(self._data_dir(), topdown=False):
            if dirpath == self._data_dir() or dirs:
                continue
            if all(n.startswith((".", "_")) for n in names):
                try:
                    # Age guards: never race an in-flight writer.  For
                    # marker files the guard is THEIR mtime (deleting
                    # the orphan parquet above bumped the dir mtime);
                    # an entirely EMPTY dir (a write attempt that has
                    # not produced its first file yet, or one this run
                    # just emptied) is guarded by the dir mtime itself.
                    if names:
                        if any(
                            os.path.getmtime(os.path.join(dirpath, n)) >= cutoff
                            for n in names
                        ):
                            continue
                    elif os.path.getmtime(dirpath) >= cutoff:
                        continue
                    for n in names:
                        os.remove(os.path.join(dirpath, n))
                    os.rmdir(dirpath)
                except OSError:
                    pass
        return {
            "scanned": scanned,
            "orphans_deleted": removed,
            "orphan_manifests_deleted": manifests_removed,
        }

    def _ancestry_position_marks(self, target: Snapshot) -> tuple[int, dict]:
        """Resume marks AS OF ``target``: max hwm / per-stream GTID over
        the target's published parent chain, stopping at (and including)
        any earlier position reset.  Expired ancestors reconstruct LOW,
        which is the safe direction — a too-low mark redelivers events
        the idempotent merge replays to no-ops; a too-high one silently
        swallows them."""
        by_id = {s.snapshot_id: s for s in self.snapshots}
        ck, gs = 0, {}
        cur: Snapshot | None = target
        while cur is not None:
            v = cur.summary.get(CKPT_PROP)
            if v is not None:
                ck = max(ck, int(v))
            for k, m in (cur.summary.get(GTID_PROP) or {}).items():
                gs[k] = max(int(gs.get(k, 0)), int(m))
            if cur.summary.get(POSITION_RESET_KEY):
                break  # marks older than a reset were already superseded
            cur = by_id.get(cur.parent_id) if cur.parent_id is not None else None
        return ck, gs

    def rollback_to(
        self, snapshot_id: int, reset_position: bool = True
    ) -> Snapshot:
        """Roll the table back to a past snapshot AS A NEW COMMIT — the
        table-format analogue of the reference's ``rollback(position)``
        redelivery (C4, store/.../MemoryEventStoreWithBuffer.java:416-470;
        TSDB rollback, parse/.../tsdb/DatabaseTableMeta.java:168-188).
        The new snapshot reuses the target's manifests by reference
        (metadata-only) and pins the target's schema-id, so history is
        preserved (no snapshots are deleted) and the rollback itself can
        be rolled back.

        ``reset_position`` (default) makes the rollback a REDELIVERY
        point, completing the C4 contract: the checkpoint properties and
        the effective resume marks rewind to the target's ancestry
        values (reconstructed from its parent-chain summaries), and the
        rollback snapshot carries a ``position-reset`` boundary so the
        rolled-back batches' summaries — still retained as history —
        stop counting toward the hwm/GTID scans.  Without it the data
        would roll back while the checkpoint still claimed the bad
        batches applied, making their ordinals permanently
        undeliverable (set_properties rejects lowering the marks, by
        design — THIS is the sanctioned regression path)."""
        self.snapshot_by_id(snapshot_id)  # fail fast on a bad id
        for _ in range(5):
            self.refresh()
            # re-resolve AFTER refresh: a concurrent
            # expire_snapshots(delete_orphans=True) may have expired the
            # target between attempts — committing from the stale Snapshot
            # object would reference already-deleted manifests
            try:
                target = self.snapshot_by_id(snapshot_id)
            except KeyError:
                raise CommitConflict(
                    f"rollback target snapshot {snapshot_id} was expired "
                    "by a concurrent expire_snapshots"
                ) from None
            parent = self.current_snapshot()
            summary: dict = {"rolled-back-to": snapshot_id}
            new_props = None
            if reset_position:
                ck, gs = self._ancestry_position_marks(target)
                summary[POSITION_RESET_KEY] = True
                summary[CKPT_PROP] = ck
                if gs:
                    summary[GTID_PROP] = gs
                new_props = dict(self.properties)
                new_props[CKPT_PROP] = ck
                if gs:
                    new_props[GTID_PROP] = gs
                else:
                    # a stale post-rollback GTID property would override
                    # the reset through merge_gtid_set's property union
                    new_props.pop(GTID_PROP, None)
            snap = Snapshot(
                # max over all snapshots: staged (WAP) ids must not collide
                snapshot_id=max(
                    (s.snapshot_id for s in self.snapshots), default=0
                ) + 1,
                parent_id=parent.snapshot_id if parent else None,
                timestamp_ms=int(time.time() * 1000),
                operation="rollback",
                manifests=list(target.manifests),
                summary=summary,
                schema_id=target.schema_id,
            )
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = self.metadata["snapshots"] + [snap.to_json()]
            meta["current_snapshot_id"] = snap.snapshot_id
            if new_props is not None:
                meta["properties"] = new_props
            if target.schema_id is not None:
                meta["current_schema_id"] = target.schema_id
                meta["schema"] = self.schemas[target.schema_id]
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return snap
            except FileExistsError:
                continue
        raise CommitConflict("rollback gave up after 5 retries")

    # ---- write-audit-publish (WAP) ------------------------------------

    def staged_snapshots(self) -> list[Snapshot]:
        """Snapshots committed with ``stage_only=True`` and not yet
        published or aborted."""
        return [s for s in self.snapshots if s.summary.get(WAP_STAGED_KEY)]

    def publish(self, snapshot_id: int) -> Snapshot:
        """Publish half of write-audit-publish: atomically point
        ``current`` at a previously staged snapshot and apply its
        deferred property updates (merge hwm, GTID set).  Fails with
        :class:`CommitConflict` if the mainline advanced past the
        stage's parent — the stage was computed against a base that no
        longer exists, so the caller must re-run it (auditing caught a
        would-be lost update, which is the point of the flow)."""
        for _ in range(5):
            self.refresh()
            try:
                snap = self.snapshot_by_id(snapshot_id)
            except KeyError:
                raise CommitConflict(
                    f"staged snapshot {snapshot_id} no longer exists "
                    "(aborted or expired concurrently)"
                ) from None
            if not snap.summary.get(WAP_STAGED_KEY):
                raise ValueError(f"snapshot {snapshot_id} is not staged")
            if snap.parent_id != self.current_snapshot_id:
                raise CommitConflict(
                    f"cannot publish snapshot {snapshot_id}: table "
                    f"advanced past its parent {snap.parent_id} "
                    f"(current {self.current_snapshot_id}) — re-stage"
                )
            staged_props = snap.summary.get(WAP_PROPS_KEY) or {}
            new_summary = {
                k: v
                for k, v in snap.summary.items()
                if k not in (WAP_STAGED_KEY, WAP_PROPS_KEY)
            }
            new_summary["wap-published-at-ms"] = int(time.time() * 1000)
            published = Snapshot(
                snapshot_id=snap.snapshot_id,
                parent_id=snap.parent_id,
                timestamp_ms=snap.timestamp_ms,
                operation=snap.operation,
                manifests=snap.manifests,
                summary=new_summary,
                schema_id=snap.schema_id,
            )
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = [
                published.to_json() if s.snapshot_id == snapshot_id else s.to_json()
                for s in self.snapshots
            ]
            meta["current_snapshot_id"] = snapshot_id
            if staged_props:
                meta["properties"] = {**self.properties, **staged_props}
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return published
            except FileExistsError:
                continue
        raise CommitConflict("publish gave up after 5 retries")

    def abort_staged(self, snapshot_id: int) -> dict:
        """Discard a staged snapshot: remove it from the snapshot list
        and delete the files only it references (its own added data
        files and rewritten manifests — anything shared with a retained
        snapshot survives).  Deferred properties die with it, so an
        aborted merge batch stays below the hwm and re-applies on the
        next pass."""
        for _ in range(5):
            self.refresh()
            try:
                snap = self.snapshot_by_id(snapshot_id)
            except KeyError:
                return {"aborted": False, "data_files_deleted": 0}
            if not snap.summary.get(WAP_STAGED_KEY):
                raise ValueError(f"snapshot {snapshot_id} is not staged")
            retained = [s for s in self.snapshots if s.snapshot_id != snapshot_id]
            dead_manifests, dead_files = self._dead_set(retained, [snap])
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = [s.to_json() for s in retained]
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
            except FileExistsError:
                continue
            deleted, manifests_deleted = self._gc_dead(dead_manifests, dead_files)
            return {
                "aborted": True,
                "data_files_deleted": deleted,
                "manifests_deleted": manifests_deleted,
            }
        raise CommitConflict("abort_staged gave up after 5 retries")

    def rewrite_manifests(self, target_entries_per_manifest: int = 10_000) -> dict:
        """Consolidate the current snapshot's manifests.

        Groups live entries by partition value (so partition-filtered
        scans open fewer manifests) and packs them into manifests of
        ~``target_entries_per_manifest``.  Commits a ``replace``
        snapshot with identical data — scan output is unchanged.
        """
        snap = self.current_snapshot()
        if snap is None:
            return {"manifests_before": 0, "manifests_after": 0}
        # ALL entries: consolidating must carry equality-delete entries
        # forward, or pending deletes would silently stop applying
        entries = self.all_entries()
        before = len(snap.manifests)
        entries.sort(key=lambda e: (json.dumps(e.partition, sort_keys=True), e.path))
        new_manifests = []
        for i in range(0, len(entries), target_entries_per_manifest):
            chunk = entries[i : i + target_entries_per_manifest]
            new_manifests.append(self._write_manifest(chunk, "cons"))
        if not new_manifests:
            new_manifests = []

        for _ in range(5):
            self.refresh()
            parent = self.current_snapshot()
            if parent is None or parent.snapshot_id != snap.snapshot_id:
                raise CommitConflict("table changed during manifest rewrite")
            new_snap = Snapshot(
                # max over all snapshots: staged (WAP) ids must not collide
                snapshot_id=max(
                    (s.snapshot_id for s in self.snapshots), default=0
                ) + 1,
                parent_id=parent.snapshot_id,
                timestamp_ms=int(time.time() * 1000),
                operation="replace",
                manifests=new_manifests,
                summary={"rewritten-manifests": before},
                schema_id=self.current_schema_id,
            )
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = self.metadata["snapshots"] + [new_snap.to_json()]
            meta["current_snapshot_id"] = new_snap.snapshot_id
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                break
            except FileExistsError:
                continue
        else:
            # all retries lost the version race: failing silently here
            # would report a consolidation that never committed
            raise CommitConflict("manifest rewrite gave up after 5 retries")
        return {"manifests_before": before, "manifests_after": len(new_manifests)}

    def annotate_entry_stats(
        self, updates: dict[str, dict], summary: dict | None = None
    ) -> "Snapshot":
        """Merge per-file stat ANNOTATIONS (e.g. bloom sidecar markers)
        into the current snapshot's manifest entries and commit a
        metadata-only ``replace`` snapshot over identical data files.

        ``updates`` maps entry path -> {col: {annotation: value}}; the
        annotation dict is merged INTO the column's existing stats
        (min/max/nulls are never replaced — annotations extend, they do
        not restate).  Same conflict rule as ``rewrite_manifests``: if
        another writer commits between planning and the CAS, raise
        ``CommitConflict`` — the caller re-plans against the new
        snapshot (annotations are derived state, always rebuildable)."""
        snap = self.current_snapshot()
        if snap is None:
            raise ValueError("cannot annotate an empty table")
        # REPLACE, never mutate: manifest entries are shared through the
        # parse cache (_read_manifest) — in-place stats edits would leak
        # into every other reader of the old manifest name
        annotated: list[DataFile] = []
        changed = 0
        for e in self.all_entries():
            upd = updates.get(e.path)
            if not upd:
                annotated.append(e)
                continue
            stats = {k: dict(v) for k, v in e.stats.items()}
            for col, ann in upd.items():
                cur = dict(stats.get(col) or {})
                cur.update(ann)
                stats[col] = cur
            annotated.append(dataclasses.replace(e, stats=stats))
            changed += 1
        entries = annotated
        new_manifests = []
        for i in range(0, len(entries), 10_000):
            new_manifests.append(
                self._write_manifest(entries[i : i + 10_000], "anno")
            )
        for _ in range(5):
            self.refresh()
            parent = self.current_snapshot()
            if parent is None or parent.snapshot_id != snap.snapshot_id:
                raise CommitConflict("table changed during stat annotation")
            new_snap = Snapshot(
                snapshot_id=max(
                    (s.snapshot_id for s in self.snapshots), default=0
                ) + 1,
                parent_id=parent.snapshot_id,
                timestamp_ms=int(time.time() * 1000),
                operation="replace",
                manifests=new_manifests,
                summary={**(summary or {}), "files-annotated": changed},
                schema_id=self.current_schema_id,
            )
            meta = dict(self.metadata)
            meta["version"] = self.version + 1
            meta["snapshots"] = self.metadata["snapshots"] + [new_snap.to_json()]
            meta["current_snapshot_id"] = new_snap.snapshot_id
            try:
                _write_metadata_exclusive(self.root, meta)
                self.metadata = meta
                return new_snap
            except FileExistsError:
                continue
        raise CommitConflict("stat annotation gave up after 5 retries")

    def history(self) -> list[dict]:
        return [s.to_json() for s in self.snapshots]


# --------------------------------------------------------------------------
# pruning
# --------------------------------------------------------------------------


def prune_files(
    entries: list[DataFile],
    partition_filter: dict[str, Any] | None = None,
    range_filter: dict[str, tuple] | None = None,
    stat_name=None,
) -> list[DataFile]:
    """Manifest-level file pruning by partition equality and stat overlap.

    ``stat_name(entry, col)`` resolves the column's write-time name for
    stat lookup (file stats are keyed by the names of the file's schema
    era; partition columns cannot be renamed, so partition values need
    no translation).

    Partition pruning is per-file-spec safe: a file whose spec (or
    min==max inference) does not carry the filtered column is pruned by
    that column's STATS range instead, and KEPT when it has neither —
    dropping it would silently lose matching rows (files written under
    an older partition spec, or stratum-mixed files)."""
    out = entries
    if partition_filter:

        def part_match(e: DataFile) -> bool:
            for k, v in partition_filter.items():
                if k in e.partition:
                    if e.partition[k] != v:
                        return False
                else:
                    st = e.stats.get(stat_name(e, k) if stat_name else k)
                    if st and st.get("min") is not None:
                        if not (st["min"] <= v <= st["max"]):
                            return False
                    # no partition value, no stats -> cannot prune
            return True

        out = [e for e in out if part_match(e)]
    if range_filter:

        def overlaps(e: DataFile) -> bool:
            for col, (lo, hi) in range_filter.items():
                st = e.stats.get(stat_name(e, col) if stat_name else col)
                if st is None or st.get("min") is None:
                    continue  # no stats -> cannot prune
                if (hi is not None and st["min"] > hi) or (
                    lo is not None and st["max"] < lo
                ):
                    return False
            return True

        out = [e for e in out if overlaps(e)]
    return out


# --------------------------------------------------------------------------
# metadata I/O + catalog functions
# --------------------------------------------------------------------------


def _metadata_path(root: str, version: int) -> str:
    return os.path.join(root, "metadata", f"v{version}.metadata.json")


def _write_metadata_exclusive(root: str, meta: dict) -> None:
    """Create v{N}.metadata.json atomically — the CAS of commits.

    The content is written to a temp file first and LINKED into place:
    ``os.link`` fails with FileExistsError when the version already
    exists (first-writer-wins, same as O_EXCL) but the winning file is
    always COMPLETE — a bare ``open(path, 'x')`` + ``json.dump`` would
    expose an empty/partial v{N} to concurrent readers (max-version
    listing would pick it and json.load would crash), and a writer
    crash mid-dump would brick the table behind a permanently
    truncated version file.
    """
    path = _metadata_path(root, meta["version"])
    tmp = path + f".tmp{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    try:
        os.link(tmp, path)
    finally:
        os.unlink(tmp)
    # advisory pointer for humans; listing is the source of truth
    hint = os.path.join(root, "metadata", "VERSION")
    tmp = hint + f".tmp{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        f.write(str(meta["version"]))
    os.replace(tmp, hint)


def _read_latest_metadata(root: str) -> dict:
    mdir = os.path.join(root, "metadata")
    versions = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".metadata.json"):
            try:
                versions.append(int(name[1:].split(".")[0]))
            except ValueError:
                pass
    if not versions:
        raise FileNotFoundError(f"no metadata in {mdir}")
    with open(_metadata_path(root, max(versions))) as f:
        return json.load(f)


def create_table(
    root: str,
    spark_schema,
    partition_by: list[str] | None = None,
    properties: dict | None = None,
) -> Table:
    """Create an empty table (version 0, no snapshot)."""
    os.makedirs(os.path.join(root, "metadata"), exist_ok=False)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    meta = {
        "format_version": FORMAT_VERSION,
        "table_uuid": uuid.uuid4().hex,
        "version": 0,
        "schema": spark_schema.jsonValue(),
        "schemas": [spark_schema.jsonValue()],
        "current_schema_id": 0,
        "field_ids": [{f.name: i for i, f in enumerate(spark_schema.fields)}],
        "partition_by": partition_by or [],
        "partition_specs": [partition_by or []],
        "default_spec_id": 0,
        "properties": properties or {},
        "snapshots": [],
        "current_snapshot_id": None,
    }
    _write_metadata_exclusive(root, meta)
    return Table(root, meta)


def load_table(root: str) -> Table:
    return Table(root, _read_latest_metadata(root))
