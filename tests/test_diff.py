"""Snapshot-diff incremental read: diff(s1, s2) applied to the s1 state
must reproduce the s2 state exactly (token arrays included)."""


def test_diff_reconstructs_target_snapshot(spark, token_table):
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.diff import apply_diff_oracle, snapshot_diff
    from canal_spark.merge import merge_into

    table, base = token_table
    s1 = table.current_snapshot_id
    state1 = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in table.scan(spark, snapshot_id=s1).collect()
    }

    rows = synth_changelog_rows(base, 400, seed=51)
    merge_into(spark, table, changelog_df(spark, rows), target_file_rows=500)
    table = table.refresh()
    s2 = table.current_snapshot_id

    diff = snapshot_diff(spark, table, s1, s2).collect()
    ops = {r["op"] for r in diff}
    assert ops <= {"I", "U", "D"}
    assert {"I", "D"} <= ops  # the synth changelog inserts and deletes

    got = apply_diff_oracle(state1, diff)
    want = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in table.scan(spark, snapshot_id=s2).collect()
    }
    assert got == want

    # no-op updates must NOT appear in the diff
    unchanged = set(state1) & set(want)
    noop = [r for r in diff if r["op"] == "U"
            and r["doc_id"] in unchanged
            and want[r["doc_id"]] == state1[r["doc_id"]]]
    assert noop == []


def test_diff_of_identical_snapshots_is_empty(spark, token_table):
    from canal_spark.diff import snapshot_diff

    table, _ = token_table
    s = table.current_snapshot_id
    assert snapshot_diff(spark, table, s, s).count() == 0


def test_diff_survives_compaction_rewrite(spark, token_table):
    """Compaction/cluster rewrites change files, not rows: the diff
    across a maintenance-only window must be empty."""
    from canal_spark.cluster import cluster
    from canal_spark.compact import compact
    from canal_spark.diff import snapshot_diff

    table, _ = token_table
    s1 = table.current_snapshot_id
    compact(spark, table, target_bytes=1 << 20)
    cluster(spark, table, target_file_rows=500, measure=False)
    table = table.refresh()
    s2 = table.current_snapshot_id
    assert s2 > s1
    assert snapshot_diff(spark, table, s1, s2).count() == 0
