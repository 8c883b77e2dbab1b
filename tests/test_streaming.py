"""Structured Streaming apply: drains a changelog directory through
foreachBatch MERGE and matches the Python oracle; replays are no-ops
(exactly-once table state — SURVEY.md §2.9 delivery semantics)."""

import shutil

from tests.conftest import oracle_dict, scan_dict


def _write_slice(spark, rows, out_dir):
    from canal_spark.changelog import changelog_df

    changelog_df(spark, rows).coalesce(1).write.mode("append").parquet(out_dir)


def test_stream_apply_matches_oracle(spark, token_table, tmp_path):
    from canal_spark.changelog import synth_changelog_rows
    from canal_spark.streaming import stream_apply

    table, base = token_table
    cl_dir = str(tmp_path / "changelog")
    ck_dir = str(tmp_path / "stream_ckpt")

    rows1 = synth_changelog_rows(base, 300, seed=1, start_ordinal=1)
    rows2 = synth_changelog_rows(base, 300, seed=2, start_ordinal=1001)
    _write_slice(spark, rows1, cl_dir)
    _write_slice(spark, rows2, cl_dir)

    res = stream_apply(spark, table, cl_dir, ck_dir, max_files_per_trigger=1)
    assert res.batches_seen >= 2
    assert res.batches_applied >= 1

    table = table.refresh()
    assert scan_dict(spark, table) == oracle_dict(base, rows1 + rows2)

    # late-arriving third slice: stream picks up only the new file
    rows3 = synth_changelog_rows(base, 100, seed=3, start_ordinal=2001)
    _write_slice(spark, rows3, cl_dir)
    stream_apply(spark, table, cl_dir, ck_dir, max_files_per_trigger=1)
    table = table.refresh()
    assert scan_dict(spark, table) == oracle_dict(base, rows1 + rows2 + rows3)


def test_stream_replay_is_noop(spark, token_table, tmp_path):
    """Lost stream checkpoint (fresh checkpointLocation) replays every
    file; the table's merge high-water mark makes it a no-op."""
    from canal_spark.changelog import synth_changelog_rows
    from canal_spark.streaming import stream_apply

    table, base = token_table
    cl_dir = str(tmp_path / "changelog")
    rows = synth_changelog_rows(base, 200, seed=4)
    _write_slice(spark, rows, cl_dir)

    stream_apply(spark, table, cl_dir, str(tmp_path / "ck1"))
    table = table.refresh()
    snap_before = table.current_snapshot_id
    state_before = scan_dict(spark, table)

    shutil.rmtree(str(tmp_path / "ck1"))
    res = stream_apply(spark, table, cl_dir, str(tmp_path / "ck2"))
    table = table.refresh()
    assert res.batches_applied == 0  # replay filtered to empty by hwm
    assert table.current_snapshot_id == snap_before  # no new snapshot
    assert scan_dict(spark, table) == state_before


def test_stream_traffic_metrics_batch_parity(spark, token_table):
    """The windowed-metrics plan runs identically in batch mode; check
    totals against a plain aggregation."""
    from pyspark.sql import functions as F

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.streaming import stream_traffic_metrics

    _, base = token_table
    changes = changelog_df(spark, synth_changelog_rows(base, 500, seed=5))
    m = stream_traffic_metrics(changes, window="10 seconds").collect()
    assert sum(r["n_changes"] for r in m) == 500
    expected_deletes = changes.where(F.col("op") == "D").count()
    assert sum(r["n_deletes"] for r in m) == expected_deletes
    # windows are 10s-aligned and non-overlapping per source
    for r in m:
        assert (r["win_end"] - r["win_start"]).total_seconds() == 10.0


def test_stream_metrics_run_as_stream(spark, token_table, tmp_path):
    """stream_traffic_metrics over a real streaming source with
    availableNow + memory sink: watermarked windowed agg executes."""
    from canal_spark.changelog import synth_changelog_rows
    from canal_spark.streaming import stream_changelog_reader, stream_traffic_metrics

    _, base = token_table
    cl_dir = str(tmp_path / "cl")
    _write_slice(spark, synth_changelog_rows(base, 400, seed=6), cl_dir)

    stream = stream_changelog_reader(spark, cl_dir)
    agg = stream_traffic_metrics(stream, window="10 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("traffic_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT sum(n_changes) AS n FROM traffic_test").collect()
    # append mode emits only windows closed by the watermark; the final
    # window may be held back, so bound instead of exact-match
    n = rows[0]["n"] or 0
    assert 0 <= n <= 400
    spark.catalog.dropTempView("traffic_test")


def test_stream_delay_metrics_windowed_counts(spark, token_table):
    """Delay metric is per event-time window (not cumulative all-time
    state): window counts sum to the input count and delay is
    non-negative for past events."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.streaming import stream_delay_metrics

    _, base = token_table
    changes = changelog_df(spark, synth_changelog_rows(base, 200, seed=31))
    m = stream_delay_metrics(changes, window="10 seconds").collect()
    assert sum(r["n_changes"] for r in m) == 200
    assert {f for r in m for f in r.asDict()} == {
        "win_start", "source", "n_changes", "latest_event_time", "delay_ms"
    }
    assert all(r["delay_ms"] >= 0 for r in m)


def test_stream_apply_mor_mode(spark, token_table, tmp_path):
    """Low-latency streaming shape: each micro-batch commits O(batch)
    MoR files with ZERO base rewrites; inline materialization folds the
    debt once the threshold hits; the drained table matches the oracle."""
    from canal_spark.changelog import synth_changelog_rows
    from canal_spark.streaming import stream_apply

    table, base = token_table
    cl_dir = str(tmp_path / "changelog")
    rows1 = synth_changelog_rows(base, 150, seed=71)
    rows2 = synth_changelog_rows(base, 150, seed=72, start_ordinal=10_001)
    _write_slice(spark, rows1, cl_dir)
    _write_slice(spark, rows2, cl_dir)

    res = stream_apply(
        spark, table, cl_dir, str(tmp_path / "ck"),
        max_files_per_trigger=1, merge_mode="mor",
        max_pending_delete_files=2,
    )
    table = table.refresh()
    assert res.batches_applied == 2
    # every micro-batch was rewrite-free
    for s in table.snapshots:
        if s.summary.get("phase") == "merge":
            assert s.summary.get("merge-mode") == "mor"
    # threshold 2 hit after the second batch -> debt repaid inline
    assert table.delete_files() == []
    assert scan_dict(spark, table) == oracle_dict(base, rows1 + rows2)


def test_stream_apply_mor_convert_policy(spark, token_table, tmp_path):
    """convert_eq_debt_files below the materialize threshold: after the
    trigger count of eq files accumulates, the stream flips the debt to
    position deletes inline (zero data rewrites), and the drained table
    still matches the oracle."""
    from canal_spark.changelog import synth_changelog_rows
    from canal_spark.streaming import stream_apply

    table, base = token_table
    cl_dir = str(tmp_path / "changelog")
    rows1 = synth_changelog_rows(base, 150, seed=75)
    rows2 = synth_changelog_rows(base, 150, seed=76, start_ordinal=10_001)
    _write_slice(spark, rows1, cl_dir)
    _write_slice(spark, rows2, cl_dir)

    res = stream_apply(
        spark, table, cl_dir, str(tmp_path / "ck"),
        max_files_per_trigger=1, merge_mode="mor",
        max_pending_delete_files=10,   # never materializes in this run
        convert_eq_debt_files=2,       # converts after the 2nd batch
    )
    table = table.refresh()
    assert res.batches_applied == 2
    assert table.eq_delete_files() == []       # converted away
    conv = [s for s in table.snapshots
            if s.summary.get("phase") == "convert-deletes"]
    assert conv, "convert policy never fired"
    assert scan_dict(spark, table) == oracle_dict(base, rows1 + rows2)


def test_stream_apply_wap_quarantines_corrupt_batch(spark, token_table, tmp_path):
    """WAP streaming: every micro-batch is staged + audited before
    readers see it.  A corrupt batch (n_tok disagreeing with the token
    array) is quarantined — aborted, hwm unmoved, stream continues —
    while clean batches publish; the fixed replay then applies the
    quarantined ordinals and already-published ones are no-ops."""
    import datetime as dt

    from canal_spark.changelog import synth_changelog_rows
    from canal_spark.streaming import stream_apply

    table, base = token_table
    cl_dir = str(tmp_path / "changelog")
    ck_dir = str(tmp_path / "ck")
    E = dt.datetime(2026, 1, 1)

    good = synth_changelog_rows(base, 120, seed=81)
    bad = [(10_001, "I", "web:9999999001", [1, 2, 3], 99, "web", E, 1)]
    _write_slice(spark, good, cl_dir)
    _write_slice(spark, bad, cl_dir)

    q_dir = str(tmp_path / "quarantine")
    res = stream_apply(
        spark, table, cl_dir, ck_dir, max_files_per_trigger=1, wap=True,
        quarantine_dir=q_dir,
    )
    table = table.refresh()
    assert res.batches_seen == 2
    assert res.batches_applied == 1
    assert len(res.quarantined) == 1
    assert res.quarantined[0]["checks"]["bad_token_arrays"] == 1
    # the dead-lettered batch is on disk for triage, byte-exact
    q = spark.read.parquet(res.quarantined[0]["quarantine_path"]).collect()
    assert [(r["ordinal"], r["doc_id"], r["n_tok"]) for r in q] == [
        (10_001, "web:9999999001", 99)
    ]
    assert table.staged_snapshots() == []
    ids = {r["doc_id"] for r in table.scan(spark).select("doc_id").collect()}
    assert "web:9999999001" not in ids
    assert scan_dict(spark, table) == oracle_dict(base, good)

    # upstream fixed: replay BOTH slices into a fresh stream dir — the
    # published batch replays to a no-op, the fixed batch applies
    cl2 = str(tmp_path / "changelog2")
    fixed = [(10_001, "I", "web:9999999001", [1, 2, 3], 3, "web", E, 1)]
    _write_slice(spark, good, cl2)
    _write_slice(spark, fixed, cl2)
    res2 = stream_apply(
        spark, table, cl2, str(tmp_path / "ck2"),
        max_files_per_trigger=1, wap=True,
    )
    table = table.refresh()
    assert res2.batches_applied == 1 and not res2.quarantined
    assert scan_dict(spark, table) == oracle_dict(base, good + fixed)


def test_stream_apply_syncs_band_index_per_batch(spark, token_table, tmp_path):
    """stream_apply(band_index=...) keeps the derived store in sync per
    micro-batch: after draining, the index holds band rows for exactly
    the live shingle-able docs (deleted keys fell out, inserts/updates
    are in; docs under SHINGLE_K tokens are absent by design),
    identical to a from-scratch rebuild of the final table state."""
    from canal_spark.changelog import synth_changelog_rows
    from canal_spark.dedup_index import (
        SHINGLE_K,
        create_band_index,
        refresh_band_index,
    )
    from canal_spark.streaming import stream_apply

    table, base = token_table
    index = create_band_index(str(tmp_path / "bands"))
    refresh_band_index(spark, table, index)  # initial full build

    cl_dir = str(tmp_path / "changelog")
    rows1 = synth_changelog_rows(base, 200, seed=5, start_ordinal=1)
    rows2 = synth_changelog_rows(base, 200, seed=6, start_ordinal=1001)
    _write_slice(spark, rows1, cl_dir)
    _write_slice(spark, rows2, cl_dir)

    res = stream_apply(
        spark, table, cl_dir, str(tmp_path / "ck"),
        max_files_per_trigger=1, band_index=index,
    )
    assert res.batches_applied >= 1
    assert any(r["kind"] == "band" and r["applied"]
               for r in res.index_refreshes)

    table = table.refresh()
    live = {r["doc_id"] for r in
            table.scan(spark)
            .where(f"size(tokens) >= {SHINGLE_K}")
            .select("doc_id").collect()}
    got = {r["doc_id"] for r in
           index.refresh().scan(spark).select("doc_id").distinct().collect()}
    assert got == live

    # equivalence with a from-scratch rebuild on the final state
    rebuilt = create_band_index(str(tmp_path / "bands2"))
    refresh_band_index(spark, table, rebuilt)
    def band_set(ix):
        return {(r["doc_id"], r["band"], r["bucket"])
                for r in ix.refresh().scan(spark).collect()}
    assert band_set(index) == band_set(rebuilt)


def test_stream_apply_forever_block_misconfig_raises(spark, tmp_path):
    """available_now=False + await_seconds=None + no return_query would
    block in awaitTermination forever — an immediate ValueError, not a
    silent hang."""
    import pytest as _pytest

    from canal_spark import create_table
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.streaming.apply import stream_apply

    t = create_table(
        str(tmp_path / "tbl"), TOKEN_TABLE_SCHEMA, partition_by=["source"]
    )
    with _pytest.raises(ValueError, match="block in awaitTermination"):
        stream_apply(
            spark, t, str(tmp_path / "cl"), str(tmp_path / "ckpt"),
            available_now=False,
        )
