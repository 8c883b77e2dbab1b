"""Table-format semantics: the cursor/commit algebra of the storage layer.

Mirrors the reference's store/meta test strategy (SURVEY.md §5 —
MemoryEventStorePutAndGetTest / RollbackAndAckTest: put/get/ack/rollback
cursor algebra) restated for snapshots: commit/read/expire/time-travel.
"""

import pytest

from canal_spark import create_table, load_table
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.format import CommitConflict, prune_files
from canal_spark.table.writer import append
from canal_spark.changelog import base_table_df, synth_token_rows


def test_create_and_append(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    assert t.version == 0 and t.current_snapshot() is None
    snap, entries = append(spark, t, base_table_df(spark, 100).repartition(4))
    assert snap.snapshot_id == 1
    assert t.row_count() == 100
    assert sum(e.rows for e in entries) == 100
    assert all(e.stats.get("doc_id", {}).get("min") for e in entries)


def test_append_accumulates_and_time_travel(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 50).repartition(2))
    append(spark, t, base_table_df(spark, 30, seed=9).repartition(1))
    assert t.row_count() == 80
    assert t.scan(spark, snapshot_id=1).count() == 50
    assert t.scan(spark).count() == 80
    # timestamp travel: latest snapshot wins at now
    import time

    now_ms = int(time.time() * 1000) + 1000
    assert t.scan(spark, as_of_timestamp_ms=now_ms).count() == 80


def test_commit_conflict_on_double_remove(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 40).repartition(2))
    victim = t.files()[0].path
    t.commit([], removed_paths=[victim], operation="overwrite")
    stale = load_table(tmp_table_root)
    with pytest.raises(CommitConflict):
        stale.commit([], removed_paths=[victim], operation="overwrite")


def test_stale_handle_retries_and_succeeds(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 40).repartition(2))
    stale = load_table(tmp_table_root)
    append(spark, t, base_table_df(spark, 10, seed=5).repartition(1))  # moves version
    # stale handle appends; optimistic retry must land it on the new tip
    snap, _ = append(spark, stale, base_table_df(spark, 5, seed=6).repartition(1))
    assert snap.parent_id is not None
    assert load_table(tmp_table_root).row_count() == 55


def test_partition_and_range_pruning(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    df = base_table_df(spark, 400)
    # partition-aligned layout: repartition by source so files are pure
    append(spark, t, df.repartition(4, "source"))
    entries = t.files()
    pure = [e for e in entries if "source" in e.partition]
    assert pure, "expected at least one single-source file to carry a partition value"
    only_web = prune_files(entries, partition_filter={"source": "web"})
    # every file with a partition value != web is pruned; every file
    # that could contain web rows (value == web, or no value but stats
    # range covering "web") is kept — pruning is safe, never lossy
    assert all(
        e.partition.get("source") == "web" or "source" not in e.partition
        for e in only_web
    )
    dropped = [e for e in entries if e not in only_web]
    for e in dropped:
        st = e.stats.get("source") or {}
        excludes = e.partition.get("source") not in (None, "web") or (
            st.get("min") is not None and not (st["min"] <= "web" <= st["max"])
        )
        assert excludes, f"lossy prune: {e.path}"
    # range pruning on doc_id
    some = prune_files(entries, range_filter={"doc_id": ("books:", "books:~")})
    assert len(some) <= len(entries)


def test_expire_keeps_time_travel_for_retained(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    for seed in (1, 2, 3, 4):
        append(spark, t, base_table_df(spark, 10, seed=seed).repartition(1))
    res = t.expire_snapshots(keep_last=2)
    assert res["expired"] == 2
    ids = [s.snapshot_id for s in t.snapshots]
    assert ids == [3, 4]
    # retained snapshot still scans (all its files live)
    assert t.scan(spark, snapshot_id=3).count() == 30
    with pytest.raises(KeyError):
        t.scan(spark, snapshot_id=1).count()


def test_expire_gc_deletes_only_dead_files(spark, tmp_table_root):
    import os

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 40).repartition(2))
    old_paths = [e.path for e in t.files()]
    # overwrite everything -> old files dead once snapshot 1 expires
    df = base_table_df(spark, 40, seed=8).repartition(1)
    from canal_spark.table.writer import write_datafiles

    new_entries = write_datafiles(spark, t, df)
    t.commit(new_entries, removed_paths=old_paths, operation="replace")
    res = t.expire_snapshots(keep_last=1)
    assert res["data_files_deleted"] == len(old_paths)
    for p in old_paths:
        assert not os.path.exists(os.path.join(t.root, p))
    assert t.row_count() == 40


def test_rewrite_manifests_preserves_scan(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    for seed in (1, 2, 3):
        append(spark, t, base_table_df(spark, 20, seed=seed).repartition(2))
    before = t.scan(spark).count()
    n_manifests_before = len(t.current_snapshot().manifests)
    info = t.rewrite_manifests()
    assert info["manifests_before"] == n_manifests_before
    assert len(t.current_snapshot().manifests) <= n_manifests_before
    assert t.scan(spark).count() == before


def test_schema_evolution_add_column(spark, tmp_table_root):
    from pyspark.sql.types import StringType, StructField, StructType

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 20).repartition(1))
    # copy first: StructType.add mutates in place, and TOKEN_TABLE_SCHEMA
    # is a shared module global
    new_schema = StructType(
        TOKEN_TABLE_SCHEMA.fields + [StructField("lang", StringType(), True)]
    )
    # DDL-isolation analogue (B3): schema change is its own commit
    t.commit([], operation="schema", new_schema_json=new_schema.jsonValue())
    df = t.scan(spark)
    assert "lang" in df.columns
    assert df.where("lang is null").count() == 20  # old files read as null


def test_partition_spec_evolution(spark, tmp_table_root):
    """Iceberg partition evolution: re-spec is metadata-only; old files
    read via their old spec, new writes carry the new spec, scans stay
    equal and partition-filtered scans never lose rows."""
    import pytest

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.merge import merge_into
    from tests.conftest import scan_dict

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)  # unpartitioned
    base = synth_token_rows(600)
    append(spark, t, base_table_df(spark, 600).repartition(4))
    before = scan_dict(spark, t)
    old_files = {e.path for e in t.files()}
    assert all(e.spec_id == 0 and e.partition == {} for e in t.files())

    snap = t.evolve_partition_spec(["source"])
    assert snap.operation == "partition-spec"
    assert t.partition_by == ["source"]
    assert t.partition_specs == [[], ["source"]]
    # metadata-only: no data files touched
    assert {e.path for e in t.files()} == old_files
    assert scan_dict(spark, t) == before

    # new writes under the new spec
    rows = synth_changelog_rows(base, 150, seed=91)
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    new_entries = [e for e in t.refresh().files() if e.path not in old_files]
    assert new_entries and all(e.spec_id == 1 for e in new_entries)

    # partition-filtered scan: old-spec files (no partition value) must
    # not be silently dropped — all 'web' rows present
    web = t.scan(spark, partition_filter={"source": "web"})
    full = t.scan(spark)
    assert (
        web.where("source = 'web'").count()
        == full.where("source = 'web'").count()
    )

    # re-speccing to the same spec is an error; evolving back reuses the
    # original spec id
    with pytest.raises(ValueError):
        t.evolve_partition_spec(["source"])
    t.evolve_partition_spec([])
    assert t.default_spec_id == 0 and t.partition_specs == [[], ["source"]]

    # partition columns of ANY historical spec stay protected
    with pytest.raises(ValueError):
        t.evolve_schema(rename=[("source", "src")])


def test_remove_orphan_files(spark, tmp_table_root):
    """Crash debris (files written but never committed) is swept once
    old enough; live files and fresh staging files survive."""
    import os
    import time as _time

    from canal_spark.table.writer import write_datafiles

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 100).repartition(2))
    before = t.scan(spark).count()

    # simulate a crashed write: files on disk, no commit
    orphans = write_datafiles(spark, t, base_table_df(spark, 50, seed=9).repartition(1))
    orphan_paths = [os.path.join(t.root, e.path) for e in orphans]
    assert all(os.path.exists(p) for p in orphan_paths)

    # too fresh -> kept (an in-flight write must never be swept)
    res = t.remove_orphan_files(older_than_s=3600)
    assert res["orphans_deleted"] == 0
    # age them past the cutoff -> swept; live files intact
    old = _time.time() - 7200
    orphan_dirs = {os.path.dirname(p) for p in orphan_paths}
    for d in orphan_dirs:  # age everything incl. _SUCCESS markers
        for n in os.listdir(d):
            os.utime(os.path.join(d, n), (old, old))
    res = t.remove_orphan_files(older_than_s=3600)
    assert res["orphans_deleted"] == len(orphan_paths)
    assert not any(os.path.exists(p) for p in orphan_paths)
    # the staging dirs (incl. their _SUCCESS markers) are gone too
    assert not any(os.path.exists(d) for d in orphan_dirs)
    assert t.scan(spark).count() == before


def test_rollback_to_snapshot(spark, tmp_table_root):
    """Rollback is a new metadata-only commit: state returns to the
    target snapshot, history is preserved, and the rollback itself can
    be rolled back (C4 redelivery fidelity)."""
    from tests.conftest import scan_dict

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 50).repartition(1))
    s1 = t.current_snapshot_id
    state1 = scan_dict(spark, t)
    append(spark, t, base_table_df(spark, 30, seed=8).repartition(1))
    s2 = t.current_snapshot_id
    state2 = scan_dict(spark, t)
    assert len(state2) > len(state1)

    rb = t.rollback_to(s1)
    assert rb.operation == "rollback" and rb.parent_id == s2
    assert scan_dict(spark, t) == state1
    # history intact: s2 still time-travelable
    assert scan_dict(spark, t, snapshot_id=s2) == state2
    # roll forward again
    t.rollback_to(s2)
    assert scan_dict(spark, t) == state2


def test_expire_keep_last_zero_keeps_only_current(spark, tmp_table_root):
    """keep_last=0 means 'only the current snapshot' — the snaps[-0:]
    whole-list trap must not silently keep everything."""
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    for seed in (1, 2, 3):
        append(spark, t, base_table_df(spark, 10, seed=seed).repartition(1))
    res = t.expire_snapshots(keep_last=0)
    assert res["expired"] == 2
    assert [s.snapshot_id for s in t.snapshots] == [3]


def test_partial_metadata_tmp_files_are_ignored(spark, tmp_table_root):
    """A crashed writer's truncated metadata temp file must neither be
    picked up as the latest version nor block future commits."""
    import os

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 20).repartition(1))
    v = t.version
    # crash debris: partial content under the tmp naming scheme
    debris = os.path.join(t.root, "metadata", f"v{v + 1}.metadata.json.tmpdead")
    with open(debris, "w") as f:
        f.write('{"version": ')  # truncated JSON
    t2 = load_table(t.root)
    assert t2.version == v  # tmp file not mistaken for a version
    append(spark, t2, base_table_df(spark, 5, seed=3).repartition(1))
    assert t2.version == v + 1  # commit landed despite the debris


def test_remove_orphan_manifests(spark, tmp_table_root):
    """Manifest JSON referenced by no retained snapshot (commit-retry
    losers) is swept by remove_orphan_files; live manifests survive."""
    import os
    import time as _time

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 30).repartition(1))
    mdir = os.path.join(t.root, "metadata")
    # simulate a commit-retry loser's manifest
    orphan = os.path.join(mdir, "manifest-add-deadbeef.json")
    with open(orphan, "w") as f:
        f.write("[]")
    old = _time.time() - 7200
    os.utime(orphan, (old, old))
    res = t.remove_orphan_files(older_than_s=3600)
    assert res["orphan_manifests_deleted"] == 1
    assert not os.path.exists(orphan)
    assert t.scan(spark).count() == 30  # live manifests untouched


def test_missing_manifest_raises_corruption_error(spark, tmp_table_root):
    """A manifest referenced by a live snapshot but deleted out-of-band
    raises a corrupted-table error NAMING the manifest — never a bare
    FileNotFoundError, and never a silently-served stale cache entry
    from a previous parse of the same name."""
    import glob
    import os

    import pytest

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 30).repartition(1))
    t.scan(spark).count()  # warm the manifest parse cache
    victim = glob.glob(os.path.join(t.root, "metadata", "manifest-*.json"))[0]
    os.remove(victim)
    with pytest.raises(RuntimeError, match="corrupted table.*manifest"):
        t.all_entries()

    # the error message sends the operator to the doctor — it must
    # DIAGNOSE this corruption class, not re-raise it
    from canal_spark.doctor import check_table

    rep = check_table(spark, t)
    assert rep["ok"] is False
    assert rep["violations"][0]["kind"] == "manifest"
    assert os.path.basename(victim) in rep["violations"][0]["detail"]


def test_remove_orphan_files_refreshes_stale_handle(spark, tmp_table_root):
    """Files committed through ANOTHER handle since this handle was
    loaded are live, not orphans — remove_orphan_files must refresh its
    metadata first, even when the files are older than the cutoff."""
    import os
    import time as _time

    from canal_spark.table.format import load_table

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 50).repartition(1))
    stale = load_table(tmp_table_root)  # handle loaded NOW, held stale

    t2 = load_table(tmp_table_root)
    append(spark, t2, base_table_df(spark, 30, seed=5).repartition(1))
    new_paths = [
        os.path.join(t2.root, e.path)
        for e in t2.refresh().files()
    ]
    # age everything far past any cutoff — only liveness can protect it
    old = _time.time() - 7200
    for p in new_paths:
        os.utime(p, (old, old))

    res = stale.remove_orphan_files(older_than_s=3600)
    assert res["orphans_deleted"] == 0
    assert all(os.path.exists(p) for p in new_paths)
    assert t2.refresh() and t2.scan(spark).count() == 80


def test_rollback_to_expired_target_raises(spark, tmp_table_root):
    """rollback_to must fail cleanly when the target snapshot has been
    expired (its manifests may already be deleted) — never commit a
    current snapshot referencing dead manifests."""
    import pytest

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 20).repartition(1))
    s1 = t.current_snapshot_id
    append(spark, t, base_table_df(spark, 20, seed=3).repartition(1))
    t.expire_snapshots(keep_last=0, delete_orphans=True)
    with pytest.raises(KeyError, match="expired"):
        t.rollback_to(s1)
    assert t.scan(spark).count() == 40  # table unharmed


def test_time_travel_by_metadata_version(spark, tmp_table_root):
    """as_of_version reads the ACTUAL v{N}.metadata.json (version files
    are never deleted), so snapshot-less commits (set_properties, tags)
    and snapshot expiry cannot shift which snapshot a version names."""
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 20).repartition(1))
    v_first = t.metadata["version"]
    n_first = t.scan(spark).count()
    # snapshot-less version bumps between the two appends
    t.set_properties({"owner": "a"})
    t.set_tag("x")
    append(spark, t, base_table_df(spark, 10, seed=7).repartition(1))
    # travel to the FIRST append's metadata version: exactly its rows
    assert t.scan(spark, as_of_version=v_first).count() == n_first
    # a version bumped by set_properties resolves to the same snapshot
    assert t.scan(spark, as_of_version=v_first + 1).count() == n_first
    with pytest.raises(KeyError, match="does not exist"):
        t.resolve_snapshot(as_of_version=999)
    # expire the first snapshot: travel to it reports expiry, not a
    # silently wrong snapshot
    t.delete_tag("x")
    t.expire_snapshots(keep_last=1, delete_orphans=True)
    t.refresh()
    with pytest.raises(KeyError, match="expired"):
        t.resolve_snapshot(as_of_version=v_first)


def test_orphan_sweep_collects_tmp_debris(spark, tmp_table_root):
    """Atomic-write staging a crashed driver leaves behind —
    manifest-*.json.tmp, v{N}.metadata.json.tmp*, *.bloom.tmp — is
    reclaimed by remove_orphan_files (age-guarded like everything)."""
    import os

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 20).repartition(1))
    mdir = os.path.join(t.root, "metadata")
    debris = [
        os.path.join(mdir, "manifest-rw-deadbeef.json.tmp"),
        os.path.join(mdir, "v99.metadata.json.tmpabc123"),
    ]
    ddir = os.path.join(t.root, "data")
    first = next(
        os.path.join(d, n)
        for d, _s, ns in os.walk(ddir) for n in ns if n.endswith(".parquet")
    )
    debris.append(first + ".bloom.tmp")
    for p in debris:
        with open(p, "w") as f:
            f.write("junk")
        old = os.path.getmtime(p) - 10 * 24 * 3600
        os.utime(p, (old, old))
    # a FRESH tmp file must survive (in-flight write protection)
    fresh = os.path.join(mdir, "manifest-rw-feedface.json.tmp")
    with open(fresh, "w") as f:
        f.write("junk")
    t.remove_orphan_files(older_than_s=24 * 3600)
    assert all(not os.path.exists(p) for p in debris)
    assert os.path.exists(fresh)
    assert t.scan(spark).count() == 20  # live table untouched


def test_annotate_does_not_mutate_shared_manifest_entries(spark, tmp_table_root):
    """Manifest entries are shared through the parse cache: annotating
    stats must REPLACE entries, not mutate them — an in-place edit
    would leak the annotation into every reader of the old manifest."""
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 20).repartition(1))
    before = t.all_entries()
    e0 = before[0]
    assert "fake" not in (e0.stats.get("doc_id") or {})
    t.annotate_entry_stats({e0.path: {"doc_id": {"fake": 1}}})
    # the previously-read objects are untouched...
    assert "fake" not in (e0.stats.get("doc_id") or {})
    # ...while a fresh read sees the annotation
    t.refresh()
    new0 = next(e for e in t.all_entries() if e.path == e0.path)
    assert new0.stats["doc_id"]["fake"] == 1
