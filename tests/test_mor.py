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
