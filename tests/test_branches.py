"""Writable-branch tests: the multi-commit generalization of WAP.
Chained merges land on a branch invisible to mainline readers and
checkpoint accounting; fast_forward publishes the whole chain (deferred
properties applied in commit order); delete_branch discards it with
full file GC; expiry pins the chain; guards keep tag/branch/stage
lifecycles from entangling."""

import os

import pytest

from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.merge import merge_gtid_set, merge_high_water_mark, merge_into
from canal_spark.table.format import CommitConflict
from tests.conftest import oracle_dict, scan_dict


def _parquet_set(root):
    return {
        os.path.join(d, f)
        for d, _, fs in os.walk(os.path.join(root, "data"))
        for f in fs
        if f.endswith(".parquet")
    }


def _chained_batches(base, n1=120, n2=90):
    """Two changelog batches where batch 2's before-images chain off
    the batch-1-applied state (the CDC contract between batches)."""
    from canal_spark.changelog import python_oracle_apply

    rows1 = synth_changelog_rows(base, n1)
    state1 = python_oracle_apply(
        {r[0]: (r[1], r[2], r[3]) for r in base}, rows1
    )
    mid = [(k, list(v[0]), v[1], v[2]) for k, v in sorted(state1.items())]
    next_ord = max(r[0] for r in rows1) + 1
    rows2 = synth_changelog_rows(mid, n2, seed=13, start_ordinal=next_ord)
    return rows1, rows2


def test_branch_chain_invisible_until_fast_forward(spark, token_table):
    t, base = token_table
    before = scan_dict(spark, t)
    cur_before = t.current_snapshot_id
    rows1, rows2 = _chained_batches(base)

    t.create_branch("audit")
    r1 = merge_into(spark, t, changelog_df(spark, rows1), branch="audit")
    assert r1.applied
    # the second merge RESUMES from the branch's own marks: without the
    # branch-aware hwm it would re-filter against 0 and re-apply rows1
    r2 = merge_into(spark, t, changelog_df(spark, rows2), branch="audit")
    assert r2.applied

    t.refresh()
    # mainline: untouched — current, content, and resume marks
    assert t.current_snapshot_id == cur_before
    assert scan_dict(spark, t) == before
    assert merge_high_water_mark(t) == 0
    # branch view: both batches applied, marks advanced
    assert scan_dict(spark, t, tag="audit") == oracle_dict(base, rows1 + rows2)
    assert merge_high_water_mark(t, branch="audit") == r2.high_water_mark
    assert [s.snapshot_id for s in t.branch_chain("audit")] == [
        r2.snapshot_id, r1.snapshot_id,
    ]

    pub = t.fast_forward("audit")
    assert pub.snapshot_id == r2.snapshot_id
    assert t.current_snapshot_id == r2.snapshot_id
    assert scan_dict(spark, t) == oracle_dict(base, rows1 + rows2)
    # deferred properties applied in chain order: the LAST batch's mark
    assert merge_high_water_mark(t) == r2.high_water_mark
    assert "audit" not in t.refs

    # replay of both batches after publish is a no-op (idempotence)
    assert not merge_into(spark, t, changelog_df(spark, rows1 + rows2)).applied


def test_delete_branch_gc_and_batch_reapplies(spark, token_table):
    t, base = token_table
    before = scan_dict(spark, t)
    files_before = _parquet_set(t.root)
    rows1, rows2 = _chained_batches(base)

    t.create_branch("exp")
    merge_into(spark, t, changelog_df(spark, rows1), branch="exp")
    merge_into(spark, t, changelog_df(spark, rows2), branch="exp")
    assert _parquet_set(t.root) != files_before

    out = t.delete_branch("exp")
    assert out["deleted"] and out["snapshots_dropped"] == 2
    assert out["data_files_deleted"] > 0

    # zero residue: same files, same content, marks never moved
    assert _parquet_set(t.root) == files_before
    assert scan_dict(spark, t) == before
    assert merge_high_water_mark(t) == 0
    assert "exp" not in t.refs

    # the abandoned batches re-apply cleanly on the main line
    res = merge_into(spark, t, changelog_df(spark, rows1 + rows2))
    assert res.applied
    assert scan_dict(spark, t) == oracle_dict(base, rows1 + rows2)


def test_fast_forward_conflicts_when_mainline_advances(spark, token_table):
    t, base = token_table
    rows1, _ = _chained_batches(base)

    t.create_branch("audit")
    merge_into(spark, t, changelog_df(spark, rows1), branch="audit")

    # mainline advances past the fork base (out-of-band compaction,
    # another writer's merge, ...) — the chain's base is gone
    mainline = synth_changelog_rows(base, 40, seed=99)
    merge_into(spark, t, changelog_df(spark, mainline))

    with pytest.raises(CommitConflict):
        t.fast_forward("audit")
    # the branch is still intact for inspection / deletion
    assert len(t.branch_chain("audit")) == 1
    t.delete_branch("audit")


def test_branch_mor_merge_reads_and_publishes(spark, token_table):
    t, base = token_table
    rows1, rows2 = _chained_batches(base)

    t.create_branch("mor")
    merge_into(spark, t, changelog_df(spark, rows1), branch="mor", mode="mor")
    # the second (COW) merge must fold the branch's PENDING equality
    # deletes from its base read — a deleted key must not resurrect
    merge_into(spark, t, changelog_df(spark, rows2), branch="mor")
    t.refresh()
    assert scan_dict(spark, t, tag="mor") == oracle_dict(base, rows1 + rows2)

    t.fast_forward("mor")
    assert scan_dict(spark, t) == oracle_dict(base, rows1 + rows2)


def test_branch_guards_and_expiry_pinning(spark, token_table):
    t, base = token_table
    rows1, _ = _chained_batches(base)

    t.create_branch("b1")
    with pytest.raises(ValueError):
        t.create_branch("b1")  # duplicate ref name
    r1 = merge_into(spark, t, changelog_df(spark, rows1), branch="b1")

    # tag into a chain / branch-from-branch / stage+branch all refuse
    with pytest.raises(ValueError):
        t.set_tag("pin", snapshot_id=r1.snapshot_id)
    with pytest.raises(ValueError):
        t.create_branch("b2", snapshot_id=r1.snapshot_id)
    with pytest.raises(ValueError):
        merge_into(
            spark, t, changelog_df(spark, rows1), branch="b1", stage_only=True
        )
    with pytest.raises(ValueError):
        t.commit(
            added=[], operation="ddl",
            new_schema_json=t.schema_json, branch="b1",
        )
    # fast-forwarding a commit-less branch is a usage error
    t.create_branch("empty")
    with pytest.raises(ValueError):
        t.fast_forward("empty")
    t.delete_branch("empty")
    # delete_tag on a branch ref would orphan the chain without GC
    with pytest.raises(ValueError):
        t.delete_tag("b1")

    # mainline churn + aggressive expiry: the chain survives because
    # branch refs pin every chain snapshot, not just the head
    merge_into(spark, t, changelog_df(spark, synth_changelog_rows(base, 30, seed=5)))
    merge_into(
        spark, t,
        changelog_df(
            spark, synth_changelog_rows(base, 30, seed=6, start_ordinal=1000)
        ),
    )
    t.expire_snapshots(keep_last=1)
    assert scan_dict(spark, t, tag="b1") == oracle_dict(base, rows1)
    t.delete_branch("b1")


def test_two_branches_loser_conflicts_and_cleans_up(spark, token_table):
    """Two concurrent audit branches off the same base: the first
    publish wins; the loser's fast-forward conflicts (its fork base is
    gone), and deleting it leaves exactly the winner's state."""
    t, base = token_table
    rows1, _ = _chained_batches(base)

    t.create_branch("x")
    t.create_branch("y")
    rx = merge_into(spark, t, changelog_df(spark, rows1), branch="x")
    ry = merge_into(spark, t, changelog_df(spark, rows1), branch="y")
    assert rx.applied and ry.applied
    assert rx.snapshot_id != ry.snapshot_id  # ids unique across branches

    t.fast_forward("x")
    with pytest.raises(CommitConflict):
        t.fast_forward("y")
    out = t.delete_branch("y")
    assert out["snapshots_dropped"] == 1
    assert scan_dict(spark, t) == oracle_dict(base, rows1)
    # y's marks died with it; replay on the main line no-ops (x's won)
    assert not merge_into(spark, t, changelog_df(spark, rows1)).applied


def test_branch_gtid_marks_stay_on_branch(spark, token_table):
    t, base = token_table
    from pyspark.sql import functions as F

    rows1, _ = _chained_batches(base)
    # two interleaved streams: per-stream marks must defer like the
    # scalar mark
    cl = changelog_df(spark, rows1).withColumn(
        "stream_id",
        F.when(F.col("ordinal") % 2 == 0, F.lit("s-a")).otherwise(F.lit("s-b")),
    )

    t.create_branch("g")
    merge_into(spark, t, cl, branch="g")
    t.refresh()
    assert merge_gtid_set(t) == {}
    branch_marks = merge_gtid_set(t, branch="g")
    assert set(branch_marks) == {"s-a", "s-b"}

    t.fast_forward("g")
    assert merge_gtid_set(t) == branch_marks
    assert scan_dict(spark, t) == oracle_dict(base, rows1)


def test_branch_pure_add_plan_staleness_conflicts(spark, token_table):
    """The branch twin of the mainline checkpoint CAS: a commit whose
    plan was computed at a stale branch head (validate_branch_base)
    conflicts instead of double-applying — a pure-add merge removes no
    files, so the manifest checks alone cannot catch it."""
    from canal_spark.table.format import DataFile

    t, base = token_table
    t.create_branch("b")
    rows1, _ = _chained_batches(base)
    base_head = t.refs["b"]["snapshot_id"]
    merge_into(spark, t, changelog_df(spark, rows1), branch="b")
    t.refresh()
    assert t.refs["b"]["snapshot_id"] != base_head
    # a second writer whose plan pinned the OLD head must conflict
    with pytest.raises(CommitConflict, match="advanced since planning"):
        t.commit(
            added=[DataFile(path="data/phantom.parquet", rows=1, bytes=1)],
            removed_paths=[],
            operation="overwrite",
            summary={},
            branch="b",
            validate_branch_base=base_head,
        )
    # a plan pinned at the CURRENT head commits fine (sequential chain)
    cur = t.refs["b"]["snapshot_id"]
    rows2 = [(10_000, "D", base[0][0], None, None, None, None, 1, None, None)]
    r = merge_into(spark, t, changelog_df(spark, rows2), branch="b")
    assert r.applied
    t.refresh()
    assert t.refs["b"]["snapshot_id"] != cur
