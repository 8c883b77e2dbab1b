"""Snapshot isolation: a reader pinned to a pre-maintenance snapshot
sees byte-identical data while (and after) a full maintenance pass
rewrites every file — the reference's rebuild-at-position property
(parse/.../tsdb/DatabaseTableMeta.java:168-188)."""


def test_pinned_reader_unaffected_by_full_pass(spark, token_table):
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.maintenance import run_pass

    table, base = token_table
    pinned_id = table.current_snapshot_id
    before = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in table.scan(spark, snapshot_id=pinned_id).collect()
    }

    changes = changelog_df(spark, synth_changelog_rows(base, 400, seed=31))
    run_pass(spark, table, changes, target_file_bytes=1 << 20,
             target_file_rows=300, keep_snapshots=10, measure=False)
    table = table.refresh()
    assert table.current_snapshot_id > pinned_id

    # pinned read reproduces the old state exactly, token arrays included
    after_pinned = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in table.scan(spark, snapshot_id=pinned_id).collect()
    }
    assert after_pinned == before

    # and the current snapshot differs (the pass did apply changes)
    current = {r["doc_id"] for r in table.scan(spark).select("doc_id").collect()}
    assert current != set(before.keys()) or any(
        after_pinned[d] != v for d, v in (
            (r["doc_id"], (list(r["tokens"]), r["n_tok"], r["source"]))
            for r in table.scan(spark).collect()
        ) if d in after_pinned
    )


def test_expire_honours_pinned_window(spark, token_table):
    """Expiry keeps the last K snapshots readable; the expired ones
    raise cleanly rather than returning wrong data."""
    import pytest

    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.merge import merge_into

    table, base = token_table
    first_id = table.current_snapshot_id
    for i in range(3):
        rows = synth_changelog_rows(base, 50, seed=40 + i,
                                    start_ordinal=1 + i * 1000)
        merge_into(spark, table, changelog_df(spark, rows), target_file_rows=500)
    table = table.refresh()
    table.expire_snapshots(keep_last=2)
    with pytest.raises(KeyError):
        table.snapshot_by_id(first_id)
    kept = [s.snapshot_id for s in table.snapshots]
    assert len(kept) == 2
    assert table.scan(spark, snapshot_id=kept[0]).count() > 0


def test_concurrent_appenders_all_land(spark, tmp_path):
    """Optimistic concurrency under REAL thread races: four writers with
    independent table handles append concurrently; every commit must
    land via the O_EXCL CAS + retry loop, the snapshot chain stays
    linear, and no rows are lost (the first-writer-wins protocol the
    format documents, exercised rather than simulated)."""
    import threading

    from canal_spark import create_table, load_table
    from canal_spark.changelog import base_table_df
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    root = str(tmp_path / "race_tbl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 100).repartition(2))

    N_THREADS, N_APPENDS, ROWS = 4, 3, 50
    errors = []

    def writer(tid: int) -> None:
        try:
            handle = load_table(root)
            for i in range(N_APPENDS):
                # distinct seeds -> distinct doc_ids per batch
                append(
                    spark, handle,
                    base_table_df(spark, ROWS, seed=1000 + tid * 10 + i)
                    .repartition(1),
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(N_THREADS)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    final = load_table(root)
    assert final.row_count() == 100 + N_THREADS * N_APPENDS * ROWS
    snaps = final.snapshots
    assert len(snaps) == 1 + N_THREADS * N_APPENDS
    # linear history: ids strictly increasing, each parent = predecessor
    ids = [s.snapshot_id for s in snaps]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur.parent_id == prev.snapshot_id
