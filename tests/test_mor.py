"""Merge-on-read (equality-delete) golden-scan tests.

Same event-replication correctness pattern as test_merge.py (reference:
client-adapter/rdb/src/test/.../sync/Common.java — DMLs in, target rows
out, Python oracle as ground truth), but the apply path is Iceberg-v2
style: the batch commits as upsert files + an equality-delete file, and
scans fold the delete in.  The invariants under test:

* scan output identical to COW for any changelog (oracle equality);
* sequencing: a key re-inserted after its delete survives (the delete
  applies only to strictly-older file sequences);
* no resurrection: COW/compact/cluster rewrites of files carrying
  pending delete debt fold the deletes in;
* materialize_deletes repays the debt without changing scan output and
  drops every pending delete file atomically;
* time travel to a pre-materialize snapshot still applies that
  snapshot's deletes.
"""

import pytest

from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.merge import materialize_deletes, merge_into
from tests.conftest import oracle_dict, scan_dict


def _mor(spark, t, rows):
    res = merge_into(spark, t, changelog_df(spark, rows), mode="mor")
    assert res.applied
    return res


def test_mor_scan_matches_oracle(spark, token_table):
    t, base = token_table
    files_before = {e.path for e in t.files()}
    rows = synth_changelog_rows(base, 300, zipf_a=1.5)
    res = _mor(spark, t, rows)
    # zero base-table rewrites: every pre-existing data file survives
    assert res.files_rewritten == 0
    assert files_before <= {e.path for e in t.refresh().files()}
    assert len(t.delete_files()) == 1
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_mor_insert_after_delete(spark, token_table):
    t, base = token_table
    victim = base[0][0]
    # batch 1: delete the key (MoR)
    _mor(spark, t, [(1, "D", victim, None, None, None, None, 1)])
    assert victim not in scan_dict(spark, t)
    # batch 2: re-insert the same key (MoR) — the pending delete has a
    # smaller sequence than the new data file, so the row must survive
    _mor(spark, t, [(2, "I", victim, [9, 9, 9], 3, "web", None, 1)])
    got = scan_dict(spark, t)
    assert got[victim] == ([9, 9, 9], 3, "web")
    # both delete files still pending; the scan ordered them correctly
    assert len(t.delete_files()) >= 1


def test_mor_then_cow_no_resurrection(spark, token_table):
    t, base = token_table
    rows1 = synth_changelog_rows(base, 200, seed=11, zipf_a=1.5)
    _mor(spark, t, rows1)
    # a COW batch over OTHER keys rewrites files that still carry MoR
    # debt — the keep-write must fold the pending deletes in
    rows2 = synth_changelog_rows(
        base, 200, seed=12, start_ordinal=10_001, zipf_a=1.5
    )
    res = merge_into(spark, t, changelog_df(spark, rows2), mode="cow")
    assert res.applied and res.files_rewritten > 0
    assert scan_dict(spark, t) == oracle_dict(base, rows1 + rows2)


def test_materialize_deletes_roundtrip(spark, token_table):
    t, base = token_table
    rows1 = synth_changelog_rows(base, 200, seed=21, zipf_a=1.5)
    rows2 = synth_changelog_rows(base, 200, seed=22, start_ordinal=10_001)
    _mor(spark, t, rows1)
    _mor(spark, t, rows2)
    assert len(t.delete_files()) == 2
    want = oracle_dict(base, rows1 + rows2)
    assert scan_dict(spark, t) == want

    res = materialize_deletes(spark, t)
    assert res.applied and res.delete_files_removed == 2
    assert t.delete_files() == []
    assert scan_dict(spark, t) == want
    # debt repaid: manifest row count is exact again
    assert t.row_count() == len(want)
    # pruning really pruned: the fragmented base (12 files) is not
    # rewritten wholesale unless every file overlapped a pending key
    assert res.files_rewritten + res.files_pruned >= 12

    again = materialize_deletes(spark, t)
    assert not again.applied


def test_materialize_preserves_time_travel(spark, token_table):
    t, base = token_table
    rows1 = synth_changelog_rows(base, 150, seed=31, zipf_a=1.5)
    res1 = _mor(spark, t, rows1)
    want_mid = oracle_dict(base, rows1)
    rows2 = synth_changelog_rows(base, 150, seed=32, start_ordinal=10_001)
    _mor(spark, t, rows2)
    materialize_deletes(spark, t)
    # the pre-materialize snapshot still scans with ITS pending deletes
    assert scan_dict(spark, t, snapshot_id=res1.snapshot_id) == want_mid
    assert scan_dict(spark, t) == oracle_dict(base, rows1 + rows2)


def test_mor_replay_is_noop(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 100, seed=41)
    _mor(spark, t, rows)
    n_dels = len(t.delete_files())
    res = merge_into(spark, t, changelog_df(spark, rows), mode="mor")
    assert not res.applied
    assert len(t.refresh().delete_files()) == n_dels


def test_run_pass_mor_with_cluster_and_compact(spark, token_table):
    """Cluster + compact rewrite files while delete debt is pending —
    their live reads must fold the deletes in (no resurrection), and
    scan output must match the oracle end to end."""
    from canal_spark.maintenance import run_pass

    t, base = token_table
    rows = synth_changelog_rows(base, 300, seed=51, zipf_a=1.5)
    rep = run_pass(
        spark, t, changelog_df(spark, rows),
        target_file_rows=400, merge_mode="mor",
        max_pending_delete_files=100,  # keep the debt pending
    )
    assert rep.merge["extra"]["mode"] == "mor"
    assert rep.merge["files_rewritten"] == 0
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_run_pass_materializes_past_threshold(spark, token_table):
    from canal_spark.maintenance import run_pass

    t, base = token_table
    all_rows = []
    for i in range(3):
        rows = synth_changelog_rows(
            base, 120, seed=60 + i, start_ordinal=1 + 10_000 * i, zipf_a=1.5
        )
        all_rows += rows
        rep = run_pass(
            spark, t, changelog_df(spark, rows),
            target_file_rows=400, merge_mode="mor",
            max_pending_delete_files=3, do_cluster=False,
        )
    # the third pass crossed the threshold and repaid the debt
    assert rep.materialize.get("applied")
    assert t.refresh().delete_files() == []
    assert scan_dict(spark, t) == oracle_dict(base, all_rows)


def test_cluster_skips_fully_deleted_victims(spark, token_table):
    """Victims whose live rows are ALL covered by pending equality
    deletes must be skipped gracefully (left for materialize_deletes),
    not crash the pass on an empty bin frame."""
    from canal_spark.cluster import cluster

    t, base = token_table
    # MoR-delete every base row: the untagged base files stay live in
    # the manifest but their live read is empty
    dels = [
        (i + 1, "D", doc_id, None, None, None, None, None)
        for i, (doc_id, _tok, _n, _src) in enumerate(base)
    ]
    _mor(spark, t, dels)
    n_files = len(t.files())
    res = cluster(spark, t, curve="zorder", target_file_rows=400)
    assert res.files_after == res.files_before  # nothing rewritten
    assert len(t.refresh().files()) == n_files
    assert scan_dict(spark, t) == {}  # everything really is deleted
    # the debt is still repayable afterwards
    m = materialize_deletes(spark, t)
    assert m.applied and t.refresh().delete_files() == []
    assert scan_dict(spark, t) == {}


def test_compact_guard_stays_exact_under_irrelevant_delete_debt(
    spark, token_table, monkeypatch
):
    """A pending delete file whose sequence is BELOW every member
    file's cannot touch the chunk — it must NOT disable the compaction
    row-count guard.  Proven by monkeypatching the writer to drop one
    row: with only irrelevant debt the guard must still RAISE."""
    import canal_spark.compact as compact_mod
    from canal_spark.compact import compact

    t, base = token_table
    # MoR batch -> pending delete file at seq S
    rows = synth_changelog_rows(base, 60, seed=73, zipf_a=1.5)
    _mor(spark, t, rows)
    assert t.delete_files()
    del_seq = max(int(d.seq or 0) for d in t.delete_files())
    # COW batch updating EVERY live key rewrites every data file at
    # seq > S (folding the pending deletes into the survivors), so the
    # delete file is still pending but can no longer touch any file
    live = scan_dict(spark, t)
    upd = [
        (20_000 + i, "U", doc_id, list(tok) + [1], len(tok) + 1, src, None, None)
        for i, (doc_id, (tok, _n, src)) in enumerate(sorted(live.items()))
    ]
    assert merge_into(
        spark, t, changelog_df(spark, upd), target_file_rows=100
    ).applied
    assert t.delete_files(), "debt should remain pending after COW"
    assert all(int(e.seq or 0) > del_seq for e in t.files())
    assert len(t.files()) > 1, "need a compactable multi-file chunk"

    real_write = compact_mod.write_datafiles
    a_doc = next(iter(scan_dict(spark, t)))

    def lossy_write(spark_, table_, df, **kw):
        from pyspark.sql import functions as F
        return real_write(spark_, table_, df.where(F.col("doc_id") != a_doc), **kw)

    monkeypatch.setattr(compact_mod, "write_datafiles", lossy_write)
    with pytest.raises(RuntimeError, match="row mismatch"):
        compact(spark, t, target_bytes=1 << 20, pack_by="bytes")

    # guard released the plan un-committed: the honest writer succeeds
    # and the scan is unchanged
    monkeypatch.setattr(compact_mod, "write_datafiles", real_write)
    before = scan_dict(spark, t.refresh())
    compact(spark, t, target_bytes=1 << 20, pack_by="bytes")
    assert scan_dict(spark, t) == before


def test_eq_delete_files_prune_by_key_range(spark, tmp_table_root):
    """A scan restricted to files whose key range an eq-delete file
    cannot touch pays NO delete anti-join at all — the point-lookup
    companion to bloom file skipping (the delete file's key footer
    min/max misses the scanned entries' union key range)."""
    from canal_spark import create_table
    from canal_spark.changelog import base_table_df
    from canal_spark.merge import delete_where
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append
    from pyspark.sql import functions as F

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    lowa = base_table_df(spark, 200).withColumn(
        "doc_id", F.concat(F.lit("a:"), F.col("doc_id"))
    )
    highz = base_table_df(spark, 200).withColumn(
        "doc_id", F.concat(F.lit("z:"), F.col("doc_id"))
    )
    append(spark, t, lowa.coalesce(1))
    append(spark, t, highz.coalesce(1))
    delete_where(spark, t, "doc_id LIKE 'a:%'", mode="mor")
    t.refresh()
    assert t.eq_delete_files()

    z_entries = [
        e for e in t.files()
        if (e.stats.get("doc_id") or {}).get("min", "").startswith("z:")
    ]
    assert z_entries
    df = t.read_files_live(spark, z_entries)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan  # delete files pruned driver-side
    assert df.count() == 200

    # the full live scan still applies the deletes
    assert t.scan(spark).count() == 200
