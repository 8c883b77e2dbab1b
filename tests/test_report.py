"""Metadata tables (`report.metadata_df`) and the zero-Spark table-health
rollup (`report.table_report`) — the canal-admin instance-status
analogue: every number must agree with the manifests it summarizes."""

import pytest
from pyspark.sql import functions as F

from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.maintenance import run_pass
from canal_spark.report import METADATA_KINDS, metadata_df, table_report


@pytest.fixture(scope="module")
def maintained(spark, tmp_path_factory):
    """A table that has been through one full pass (merge + cluster +
    compact) plus a tag and a branch, so every metadata kind is
    populated."""
    from canal_spark import create_table
    from canal_spark.changelog import base_table_df, synth_token_rows
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    root = str(tmp_path_factory.mktemp("report") / "tbl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(1200)
    append(spark, t, base_table_df(spark, 1200).repartition(12))
    rows = synth_changelog_rows(base, 120)
    run_pass(spark, t, changelog_df(spark, rows),
             target_file_rows=200, measure=False)
    t.set_tag("pinned")
    t.create_branch("wip")
    t.refresh()
    return t


def test_files_df_matches_manifests(spark, maintained):
    t = maintained
    f = metadata_df(spark, t, "files")
    entries = t.files()
    assert f.count() == len(entries)
    agg = f.selectExpr("sum(rows) r", "sum(bytes) b").collect()[0]
    assert agg["r"] == sum(e.rows for e in entries)
    assert agg["b"] == sum(e.bytes for e in entries)
    # every live file is clustered after a pass and content is 'data'
    assert f.where("content <> 'data'").count() == 0
    assert f.where("sort_order IS NULL").count() == 0
    # partition string matches the partition_values map
    row = f.where("partition <> ''").first()
    k, v = row["partition"].split("=", 1)
    assert row["partition_values"][k] == v


def test_partitions_rollup_consistent_with_files(spark, maintained):
    t = maintained
    f = metadata_df(spark, t, "files")
    p = metadata_df(spark, t, "partitions")
    got = {r["partition"]: r for r in p.collect()}
    per = {
        r["partition"]: (r["n"], r["rows"])
        for r in f.groupBy("partition")
        .agg(F.count("*").alias("n"), F.sum("rows").alias("rows"))
        .collect()
    }
    assert set(got) == set(per)
    for part, (n, rows) in per.items():
        assert got[part]["n_files"] == n
        assert got[part]["rows"] == rows
        assert got[part]["n_unclustered"] == 0


def test_snapshots_refs_history(spark, maintained):
    t = maintained
    snaps = metadata_df(spark, t, "snapshots")
    assert snaps.count() == len(t.snapshots)
    ops = {r["operation"] for r in snaps.select("operation").collect()}
    assert "append" in ops  # the base load
    refs = {r["name"]: r for r in metadata_df(spark, t, "refs").collect()}
    assert refs["pinned"]["type"] == "tag"
    assert refs["wip"]["type"] == "branch"
    hist = metadata_df(spark, t, "history")
    cur = [r for r in hist.collect() if r["snapshot_id"] == t.current_snapshot_id]
    assert cur and cur[0]["is_current_ancestor"] is True
    # the chain reaches back past the pass (append is an ancestor too)
    assert hist.where("is_current_ancestor").count() >= 2


def test_unknown_kind_raises(spark, maintained):
    with pytest.raises(ValueError):
        metadata_df(spark, maintained, "nope")
    assert "files" in METADATA_KINDS


def test_table_report_agrees_with_manifests(maintained):
    t = maintained
    rep = table_report(t)
    entries = t.files()
    assert rep["files"]["n"] == len(entries)
    assert rep["files"]["rows"] == sum(e.rows for e in entries)
    assert rep["files"]["clustered_fraction"] == 1.0
    assert rep["delete_debt"] == {"files": 0, "keys": 0, "eq_files": 0, "pos_files": 0}
    assert rep["branches"] == ["wip"] and rep["tags"] == ["pinned"]
    assert rep["current_snapshot_id"] == t.current_snapshot_id
    assert rep["partitions"]["n"] >= 1
    assert rep["partitions"]["skew"] >= 1.0
    assert rep["key_cols"] == t.key_cols


def test_report_sees_mor_debt(spark, token_table):
    """Merge-on-read leaves equality-delete files; the report must count
    them (files + pending keys) so a scheduler can trigger an early
    materialization pass."""
    from canal_spark.merge import merge_into

    t, base = token_table
    rows = synth_changelog_rows(base, 80)
    merge_into(spark, t, changelog_df(spark, rows), mode="mor")
    rep = table_report(t)
    assert rep["delete_debt"]["files"] >= 1
    assert rep["delete_debt"]["keys"] > 0
    dels = metadata_df(spark, t, "delete_files")
    assert dels.count() == rep["delete_debt"]["files"]
    assert dels.where("content <> 'eq-deletes'").count() == 0
