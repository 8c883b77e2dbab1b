"""Predicate DELETE (`merge.delete_where`) — DELETE FROM t WHERE cond:
MoR and COW shapes, out-of-band checkpoint contract, seq semantics
(re-insert after delete), branch composition, idempotence."""

import pytest

from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.merge import delete_where, merge_high_water_mark, merge_into
from tests.conftest import oracle_dict, scan_dict


def _expected_after(spark, t, cond):
    return {
        r["doc_id"]
        for r in t.scan(spark).where(f"NOT ({cond})").select("doc_id").collect()
    }


def test_delete_where_mor_is_o_batch(spark, token_table):
    t, base = token_table
    cond = "source = 'web' AND n_tok % 3 = 0"
    keep = _expected_after(spark, t, cond)
    n_before = len(scan_dict(spark, t))
    files_before = {e.path for e in t.files()}

    m = delete_where(spark, t, cond, mode="mor")
    # MoR defers the kill to scan time, so rows_deleted is not counted
    # here (a D for an absent key kills nothing) — the row effect is
    # asserted on the scan below; the batch itself was non-empty
    assert m.applied and n_before - len(keep) > 0
    t.refresh()
    # MoR: zero base rewrites — every pre-delete data file is still live
    assert files_before <= {e.path for e in t.files()}
    assert len(t.delete_files()) == 1
    assert {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()} == keep

    # idempotent: the post-delete scan matches nothing
    assert delete_where(spark, t, cond, mode="mor").applied is False


def test_delete_where_cow_rewrites_only_affected(spark, token_table):
    t, base = token_table
    cond = "n_tok < 8"
    keep = _expected_after(spark, t, cond)
    m = delete_where(spark, t, cond, mode="cow")
    assert m.applied
    t.refresh()
    assert t.delete_files() == []  # COW leaves no debt
    assert {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()} == keep


def test_delete_where_is_out_of_band(spark, token_table):
    """The predicate delete must not move the changelog cursor, and a
    later upstream batch (including a re-insert of a deleted key)
    applies exactly as if the delete had been an ordinary event."""
    t, base = token_table
    rows = synth_changelog_rows(base, 60)
    merge_into(spark, t, changelog_df(spark, rows))
    hwm = merge_high_water_mark(t)

    victim = sorted(scan_dict(spark, t))[0]
    m = delete_where(spark, t, f"doc_id = '{victim}'", mode="cow")
    assert m.applied and m.rows_deleted == 1  # COW counts exactly
    assert merge_high_water_mark(t) == hwm  # cursor untouched

    # upstream re-inserts the deleted key with a HIGHER ordinal: the
    # new row must survive the pending equality delete (seq semantics)
    reins = [(hwm + 1, "I", victim, [7, 7, 7], 3, "web")]
    merge_into(spark, t, changelog_df(spark, reins))
    got = scan_dict(spark, t)
    assert got[victim] == ([7, 7, 7], 3, "web")


def test_delete_where_zero_matches_noops(spark, token_table):
    t, _ = token_table
    before = scan_dict(spark, t)
    sid = t.current_snapshot_id
    m = delete_where(spark, t, "n_tok < 0")
    assert m.applied is False
    t.refresh()
    assert t.current_snapshot_id == sid
    assert scan_dict(spark, t) == before


def test_delete_where_on_branch_publishes_via_fast_forward(spark, token_table):
    t, _ = token_table
    t.create_branch("cut")
    before = scan_dict(spark, t)
    cond = "source = 'web'"
    keep = _expected_after(spark, t, cond)

    m = delete_where(spark, t, cond, branch="cut")
    assert m.applied
    t.refresh()
    assert scan_dict(spark, t) == before  # mainline untouched
    branch_ids = {
        r["doc_id"]
        for r in t.scan(spark, tag="cut").select("doc_id").collect()
    }
    assert branch_ids == keep
    t.fast_forward("cut")
    assert {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()} == keep


def test_delete_where_then_materialize(spark, token_table):
    """The debt a predicate delete leaves folds through the ordinary
    materialization path."""
    from canal_spark.merge import materialize_deletes

    t, _ = token_table
    cond = "n_tok % 5 = 1"
    keep = _expected_after(spark, t, cond)
    delete_where(spark, t, cond, mode="mor")
    r = materialize_deletes(spark, t)
    assert r.applied
    t.refresh()
    assert t.delete_files() == []
    assert {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()} == keep
