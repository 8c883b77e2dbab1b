"""Write-audit-publish (WAP) tests: staged commits are invisible to
readers and checkpoints until published; a failed audit aborts without
a trace; the pass-level flow publishes clean batches and quarantines
corrupt ones for retry (Iceberg's spark.wap.id flow, run by the pass).
"""

import datetime as dt

import pytest

from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.merge import merge_high_water_mark, merge_into
from canal_spark.table.format import CommitConflict
from tests.conftest import oracle_dict, scan_dict

E = dt.datetime(2026, 1, 1)


def test_staged_merge_invisible_until_publish(spark, token_table):
    t, base = token_table
    before = scan_dict(spark, t)
    rows = synth_changelog_rows(base, 150)

    res = merge_into(spark, t, changelog_df(spark, rows), stage_only=True)
    assert res.applied

    # readers see the pre-stage table; the hwm has NOT advanced, so the
    # same batch is still pending (an aborted audit must retry it)
    t.refresh()
    assert scan_dict(spark, t) == before
    assert merge_high_water_mark(t) == 0
    assert [s.snapshot_id for s in t.staged_snapshots()] == [res.snapshot_id]

    # ...but the staged snapshot is addressable for auditing
    staged = scan_dict(spark, t, snapshot_id=res.snapshot_id)
    assert staged == oracle_dict(base, rows)

    t.publish(res.snapshot_id)
    assert t.current_snapshot_id == res.snapshot_id
    assert scan_dict(spark, t) == oracle_dict(base, rows)
    assert merge_high_water_mark(t) == res.high_water_mark
    assert t.staged_snapshots() == []

    # replay after publish is a no-op (hwm came through with the publish)
    res2 = merge_into(spark, t, changelog_df(spark, rows))
    assert not res2.applied


def test_abort_staged_removes_files_and_batch_reapplies(spark, token_table):
    import os

    def parquet_set(root):
        return {
            os.path.join(d, f)
            for d, _, fs in os.walk(os.path.join(root, "data"))
            for f in fs
            if f.endswith(".parquet")
        }

    t, base = token_table
    before = scan_dict(spark, t)
    files_before = parquet_set(t.root)
    rows = synth_changelog_rows(base, 150)

    res = merge_into(spark, t, changelog_df(spark, rows), stage_only=True)
    out = t.abort_staged(res.snapshot_id)
    assert out["aborted"] and out["data_files_deleted"] > 0

    # no trace: same table, same files, hwm still 0
    assert scan_dict(spark, t) == before
    assert merge_high_water_mark(t) == 0
    assert t.staged_snapshots() == []
    assert parquet_set(t.root) == files_before

    # the batch re-applies cleanly afterwards
    res2 = merge_into(spark, t, changelog_df(spark, rows))
    assert res2.applied
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_publish_conflicts_when_mainline_advances(spark, token_table):
    t, base = token_table
    rows_a = synth_changelog_rows(base, 80, seed=1)
    rows_b = synth_changelog_rows(base, 80, seed=2, start_ordinal=10_000)

    staged = merge_into(spark, t, changelog_df(spark, rows_a), stage_only=True)
    mainline = merge_into(spark, t, changelog_df(spark, rows_b))
    assert mainline.applied
    # snapshot ids stay globally unique even across the staged branch
    assert mainline.snapshot_id != staged.snapshot_id

    with pytest.raises(CommitConflict, match="advanced past"):
        t.publish(staged.snapshot_id)

    # the conflicted stage is still abortable; mainline state unaffected
    t.abort_staged(staged.snapshot_id)
    assert scan_dict(spark, t) == oracle_dict(base, rows_b)


def test_expire_never_sweeps_staged_snapshots(spark, token_table):
    t, base = token_table
    staged = merge_into(
        spark, t, changelog_df(spark, synth_changelog_rows(base, 50)),
        stage_only=True,
    )
    # churn mainline so position-based retention would drop the stage
    for seed in (11, 12, 13):
        merge_into(
            spark, t,
            changelog_df(
                spark,
                synth_changelog_rows(base, 30, seed=seed,
                                     start_ordinal=seed * 100_000),
            ),
        )
    t.expire_snapshots(keep_last=1)
    assert [s.snapshot_id for s in t.staged_snapshots()] == [staged.snapshot_id]
    # still auditable after the expiry
    assert len(scan_dict(spark, t, snapshot_id=staged.snapshot_id)) > 0
    t.abort_staged(staged.snapshot_id)


def test_ddl_cannot_be_staged(token_table):
    t, _ = token_table
    with pytest.raises(ValueError, match="DDL"):
        t.commit(added=[], new_schema_json={"fields": []}, stage_only=True)


def test_run_pass_wap_publishes_clean_batch(spark, token_table, tmp_path):
    from canal_spark.maintenance import run_pass

    t, base = token_table
    rows = synth_changelog_rows(base, 200)
    rep = run_pass(
        spark, t, changelog_df(spark, rows),
        lineage_root=str(tmp_path / "lineage"),
        wap=True, wap_max_delete_fraction=0.5,
    )
    assert rep.wap["ok"] and rep.wap["published"]
    assert rep.merge["applied"]
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_run_pass_wap_aborts_corrupt_token_arrays(spark, token_table, tmp_path):
    """An upstream bug ships n_tok values that disagree with the token
    arrays: the audit's north-rule invariant catches it, the stage
    aborts, readers never see a corrupt row, and the batch re-applies
    once fixed."""
    from canal_spark.maintenance import run_pass

    t, base = token_table
    before = scan_dict(spark, t)
    bad = [
        (1, "I", "web:9999999001", [1, 2, 3], 99, "web", E, 1),
        (2, "I", "web:9999999002", [4, 5], 2, "web", E, 1),
    ]
    rep = run_pass(spark, t, changelog_df(spark, bad), wap=True)
    assert not rep.wap["ok"] and not rep.wap["published"]
    assert rep.wap["checks"]["bad_token_arrays"] == 1
    assert not rep.merge["applied"]
    assert scan_dict(spark, t) == before
    assert t.staged_snapshots() == []

    # fixed upstream -> the SAME ordinals now apply (hwm never advanced)
    fixed = [
        (1, "I", "web:9999999001", [1, 2, 3], 3, "web", E, 1),
        (2, "I", "web:9999999002", [4, 5], 2, "web", E, 1),
    ]
    rep2 = run_pass(spark, t, changelog_df(spark, fixed), wap=True)
    assert rep2.wap["published"]
    assert "web:9999999001" in scan_dict(spark, t)


def test_run_pass_wap_delete_bound_guards_runaway_delete(spark, token_table):
    from canal_spark.maintenance import run_pass

    t, base = token_table
    before = scan_dict(spark, t)
    # delete 40% of the table in one batch
    victims = [r[0] for r in base[: int(len(base) * 0.4)]]
    rows = [
        (i + 1, "D", d, None, None, None, E, 1) for i, d in enumerate(victims)
    ]
    rep = run_pass(
        spark, t, changelog_df(spark, rows), wap=True,
        wap_max_delete_fraction=0.1, do_cluster=False, do_compact=False,
    )
    assert not rep.wap["published"]
    assert rep.wap["checks"]["delete_bound"] > 0
    assert scan_dict(spark, t) == before

    # the operator raises the bound after review -> same batch publishes
    rep2 = run_pass(
        spark, t, changelog_df(spark, rows), wap=True,
        wap_max_delete_fraction=0.5, do_cluster=False, do_compact=False,
    )
    assert rep2.wap["published"]
    assert len(scan_dict(spark, t)) == len(before) - len(victims)


def test_wap_with_merge_on_read_mode(spark, token_table, tmp_path):
    """WAP composes with MoR: the staged snapshot carries equality-
    delete files, the audit scan folds them (sequence-aware anti-join),
    publish exposes them atomically; an aborted MoR stage leaves ZERO
    pending delete files behind."""
    from canal_spark.maintenance import run_pass

    t, base = token_table
    rows = synth_changelog_rows(base, 150)
    rep = run_pass(
        spark, t, changelog_df(spark, rows), wap=True, merge_mode="mor",
        do_cluster=False, do_compact=False,
        max_pending_delete_files=10_000,  # keep the debt pending
    )
    assert rep.wap["published"]
    t.refresh()
    assert len(t.delete_files()) == 1  # the staged delete file went live
    assert scan_dict(spark, t) == oracle_dict(base, rows)

    # corrupt MoR batch: aborted stage leaves no delete-file residue
    before = scan_dict(spark, t)
    n_dels = len(t.delete_files())
    bad = [(900_001, "I", "web:9999999009", [1, 2], 77, "web", E, 1)]
    rep2 = run_pass(
        spark, t, changelog_df(spark, bad), wap=True, merge_mode="mor",
        do_cluster=False, do_compact=False,
        max_pending_delete_files=10_000,
    )
    assert not rep2.wap["published"]
    t.refresh()
    assert len(t.delete_files()) == n_dels
    assert scan_dict(spark, t) == before


def test_wap_finalize_aborts_stage_on_publish_conflict(spark, token_table):
    """The shared gate never leaks a staged snapshot: when the mainline
    advances past the stage's parent, publish raises CommitConflict and
    wap_finalize aborts the stage before re-raising (staged snapshots
    are expire-proof, so a leak here would pin files forever)."""
    from canal_spark.maintenance import wap_finalize

    t, base = token_table
    staged = merge_into(
        spark, t, changelog_df(spark, synth_changelog_rows(base, 60, seed=3)),
        stage_only=True,
    )
    mainline = merge_into(
        spark, t,
        changelog_df(spark, synth_changelog_rows(base, 60, seed=4,
                                                 start_ordinal=50_000)),
    )
    assert mainline.applied
    with pytest.raises(CommitConflict):
        wap_finalize(spark, t, staged)
    t.refresh()
    assert t.staged_snapshots() == []  # aborted, not leaked


def test_wap_delete_bound_uses_live_rows_under_mor_debt(spark, token_table):
    """On a table carrying pending equality-delete debt, the audit's
    parent row count is the LIVE count, not the manifest upper bound —
    a healthy small batch must publish even when debt makes the
    manifest overcount by more than the delete bound."""
    from canal_spark.maintenance import run_pass

    t, base = token_table
    # build up MoR debt: delete 30% of the table as pending deletes
    victims = [r[0] for r in base[: int(len(base) * 0.3)]]
    dels = [(i + 1, "D", d, None, None, None, E, 1)
            for i, d in enumerate(victims)]
    m = merge_into(spark, t, changelog_df(spark, dels), mode="mor")
    assert m.applied and len(t.delete_files()) == 1

    # healthy tiny batch under a tight bound: manifest rows overcount
    # live rows by 30%, so a manifest-based floor would quarantine it
    good = [(10_001, "I", "web:9999999021", [1, 2], 2, "web", E, 1)]
    rep = run_pass(
        spark, t, changelog_df(spark, good), wap=True,
        wap_max_delete_fraction=0.05, merge_mode="mor",
        do_cluster=False, do_compact=False,
        max_pending_delete_files=10_000,
    )
    assert rep.wap["published"], rep.wap
    assert "web:9999999021" in scan_dict(spark, t)


def test_schema_commit_without_field_ids_keeps_snapshot_ids_unique(spark, token_table):
    """commit(new_schema_json=..., new_field_ids=None) must not recycle
    a field-id counter as the snapshot id (variable-shadowing
    regression): ids stay unique and current advances monotonically."""
    t, base = token_table
    # several snapshots so a recycled small counter would collide
    for seed in (21, 22, 23):
        merge_into(
            spark, t,
            changelog_df(spark, synth_changelog_rows(
                base, 20, seed=seed, start_ordinal=seed * 10_000)),
        )
    ids_before = [s.snapshot_id for s in t.snapshots]
    schema = dict(t.schema_json)
    schema["fields"] = schema["fields"] + [
        {"name": "extra_col", "type": "string", "nullable": True}
    ]
    snap = t.commit(added=[], new_schema_json=schema)
    assert snap.snapshot_id == max(ids_before) + 1
    all_ids = [s.snapshot_id for s in t.snapshots]
    assert len(all_ids) == len(set(all_ids))
    assert t.current_snapshot_id == snap.snapshot_id


def test_audit_flags_null_n_tok(spark, token_table):
    """A NULL n_tok with non-null tokens must count as bad_token_arrays:
    a plain != comparison is NULL for those rows and they'd publish
    cleanly — the exact class the audit exists to quarantine."""
    from pyspark.sql import functions as F

    from canal_spark.maintenance import audit_snapshot
    from canal_spark.table.writer import append

    t, base = token_table
    bad = (
        spark.createDataFrame(
            [("bad-null-ntok", [1, 2, 3], "web")],
            "doc_id string, tokens array<int>, source string",
        )
        .withColumn("n_tok", F.lit(None).cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
    append(spark, t, bad.coalesce(1))
    rep = audit_snapshot(spark, t, t.current_snapshot_id)
    assert rep["checks"]["bad_token_arrays"] == 1
    assert not rep["ok"]
