"""Crash-resume: kill between phases, re-run, assert idempotence —
the MemoryEventStoreRollbackAndAckTest analogue (SURVEY.md §5c)."""

from canal_spark import load_table
from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.maintenance import run_pass
from canal_spark.merge import merge_into, merge_high_water_mark
from canal_spark.table.writer import write_datafiles
from canal_spark.changelog import base_table_df
from tests.conftest import oracle_dict, scan_dict


def test_resume_after_merge_before_compact(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 200)
    merge_into(spark, t, changelog_df(spark, rows))
    # driver "dies"; a new process loads the table fresh and re-runs ALL
    t2 = load_table(t.root)
    rep = run_pass(spark, t2, changelog_df(spark, rows), target_file_bytes=1 << 20,
                   target_file_rows=500, keep_snapshots=10, measure=False)
    assert rep.merge["applied"] is False  # hwm blocked the replay
    assert scan_dict(spark, t2) == oracle_dict(base, rows)


def test_orphaned_staging_files_are_invisible(spark, token_table):
    t, base = token_table
    # crash mid-write: files staged under data/ but never committed
    write_datafiles(spark, t, base_table_df(spark, 50, seed=77).repartition(1))
    assert t.row_count() == 1200
    assert len(scan_dict(spark, t)) == 1200


def test_hwm_survives_maintenance_phases(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 150)
    merge_into(spark, t, changelog_df(spark, rows))
    hwm = merge_high_water_mark(t)
    run_pass(spark, t, None, target_file_bytes=1 << 20, target_file_rows=500,
             keep_snapshots=1, measure=False)  # compact+cluster+expire
    # the merge snapshot is expired, but the checkpoint (a table
    # property) must survive — otherwise a replay would double-apply
    assert merge_high_water_mark(t) == hwm
    rows2 = synth_changelog_rows(base, 150)  # same ordinals as before
    res = merge_into(spark, t, changelog_df(spark, rows2))
    assert not res.applied


def test_double_full_pass_is_noop_on_data(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 250, zipf_a=1.3)
    run_pass(spark, t, changelog_df(spark, rows), target_file_bytes=1 << 20,
             target_file_rows=500, keep_snapshots=10, measure=False)
    state = scan_dict(spark, t)
    run_pass(spark, t, changelog_df(spark, rows), target_file_bytes=1 << 20,
             target_file_rows=500, keep_snapshots=10, measure=False)
    assert scan_dict(spark, t) == state == oracle_dict(base, rows)
