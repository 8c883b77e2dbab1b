"""Whole-pass-on-a-branch tests (Iceberg's spark.wap.branch flow):
merge + MoR materialization + clustering + compaction all commit to a
branch, mainline stays at the pre-pass table throughout, and the chain
publishes atomically — or conflicts cleanly against concurrent mainline
writers, or stays unpublished for out-of-band audit."""

import pytest

from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.maintenance import run_pass
from canal_spark.merge import merge_into
from tests.conftest import oracle_dict, scan_dict


def test_full_pass_on_branch_publishes_atomically(spark, token_table):
    t, base = token_table
    cur_before = t.current_snapshot_id
    rows = synth_changelog_rows(base, 150)

    rep = run_pass(
        spark, t, changelog_df(spark, rows),
        target_file_rows=200, measure=False, branch="pass-audit",
    )
    assert rep.branch["published"] is True
    assert rep.branch["commits"] >= 2  # at least merge + cluster
    assert rep.merge["applied"] and rep.cluster["files_after"] >= 1
    assert rep.expire  # expiry ran post-publish

    t.refresh()
    assert "pass-audit" not in t.refs
    assert t.current_snapshot_id != cur_before
    assert scan_dict(spark, t) == oracle_dict(base, rows)
    # the branch pass really clustered: live files carry the curve tag
    assert all(e.sort_order == "zorder-v1" for e in t.files())
    # replay of the published batch no-ops
    assert not merge_into(spark, t, changelog_df(spark, rows)).applied


def test_branch_pass_no_publish_stays_invisible(spark, token_table):
    t, base = token_table
    before = scan_dict(spark, t)
    cur_before = t.current_snapshot_id
    rows = synth_changelog_rows(base, 100)

    rep = run_pass(
        spark, t, changelog_df(spark, rows),
        target_file_rows=200, measure=False,
        branch="hold", publish_branch=False,
    )
    assert rep.branch == {
        "name": "hold", "published": False, "kept": True,
        "commits": rep.branch["commits"],
    }
    assert rep.expire == {}  # expiry deferred with the unpublished chain

    t.refresh()
    assert t.current_snapshot_id == cur_before
    assert scan_dict(spark, t) == before  # mainline untouched
    # the audit read sees the fully maintained state
    assert scan_dict(spark, t, tag="hold") == oracle_dict(base, rows)
    # manual publish completes the flow
    t.fast_forward("hold")
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_branch_pass_mor_materializes_on_branch(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 120)

    rep = run_pass(
        spark, t, changelog_df(spark, rows),
        target_file_rows=200, measure=False,
        merge_mode="mor", max_pending_delete_files=1, branch="m",
    )
    assert rep.branch["published"] is True
    assert rep.materialize.get("applied") is True  # debt repaid ON the branch
    t.refresh()
    assert t.delete_files() == []  # published mainline carries no debt
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_branch_pass_publish_conflict_keeps_chain(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 80, start_ordinal=5000)
    mainline = synth_changelog_rows(base, 40, seed=99)

    # fork first, then a concurrent mainline writer advances the table
    t.create_branch("c")
    merge_into(spark, t, changelog_df(spark, mainline))
    main_state = scan_dict(spark, t)

    rep = run_pass(
        spark, t, changelog_df(spark, rows),
        target_file_rows=200, measure=False, branch="c",
    )
    assert rep.branch["published"] is False and "conflict" in rep.branch
    assert rep.expire == {}  # no expiry on a failed publish
    t.refresh()
    assert scan_dict(spark, t) == main_state  # the writer's work survived
    assert len(t.branch_chain("c")) == rep.branch["commits"]  # inspectable
    t.delete_branch("c")
    # the abandoned batch re-applies cleanly on the main line
    assert merge_into(spark, t, changelog_df(spark, rows)).applied


def test_branch_pass_guards(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 10)
    with pytest.raises(ValueError):
        run_pass(spark, t, changelog_df(spark, rows), branch="b", wap=True)
    t.set_tag("not-a-branch")
    with pytest.raises(ValueError):
        run_pass(spark, t, changelog_df(spark, rows), branch="not-a-branch")
    t.delete_tag("not-a-branch")
    # an all-no-op pass leaves no empty branch behind (replay below the
    # hwm, rewrite phases disabled so nothing commits on the branch)
    run_pass(spark, t, changelog_df(spark, rows), measure=False)
    rep = run_pass(spark, t, changelog_df(spark, rows), measure=False,
                   branch="empty-pass", do_cluster=False, do_compact=False)
    assert rep.branch.get("empty") is True
    t.refresh()
    assert "empty-pass" not in t.refs
