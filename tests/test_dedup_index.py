"""Maintained MinHash band index: incremental refresh equals a full
rebuild, deletes fall out, untouched files survive, candidates and
hot-bucket caps report, and the CLI drives it end-to-end."""

import os

import pytest


def _index_state(spark, index):
    return {
        (r["doc_id"], r["band"], r["bucket"])
        for r in index.scan(spark).collect()
    }


@pytest.fixture()
def indexed_table(spark, token_table, tmp_path):
    from canal_spark.dedup_index import create_band_index, refresh_band_index

    t, base = token_table
    index = create_band_index(str(tmp_path / "bands"))
    res = refresh_band_index(spark, t, index)
    assert res.applied and res.full_rebuild and res.bands_written > 0
    return t, base, index


def test_incremental_refresh_equals_full_rebuild(spark, indexed_table, tmp_path):
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.dedup_index import create_band_index, refresh_band_index
    from canal_spark.merge import merge_into

    t, base, index = indexed_table

    rows = synth_changelog_rows(base, 300, seed=41)
    changes = changelog_df(spark, rows)
    m = merge_into(spark, t, changes)
    assert m.applied

    res = refresh_band_index(spark, t, index, keys=changes.select("doc_id"))
    assert res.applied and not res.full_rebuild
    assert res.docs_changed > 0

    # ground truth: a full rebuild into a fresh index table
    fresh = create_band_index(str(tmp_path / "bands_full"))
    refresh_band_index(spark, t, fresh)
    assert _index_state(spark, index) == _index_state(spark, fresh)

    # incremental means incremental: keys from ONE narrow sorted range
    # must leave the other range-partitioned index files untouched
    # (300 uniform keys above rightly touch every file — that's not a
    # pruning failure, it's key dispersion)
    files_before = {e.path for e in index.files()}
    narrow = sorted(r[0] for r in base)[:5]
    res2 = refresh_band_index(
        spark, t, index,
        keys=spark.createDataFrame([(k,) for k in narrow], "doc_id string"),
    )
    assert res2.applied and res2.files_pruned > 0
    files_after = {e.path for e in index.files()}
    assert files_before & files_after, "narrow refresh rewrote the whole index"
    assert _index_state(spark, index) == _index_state(spark, fresh)

    # deleted docs are gone from the index
    deleted = {r[2] for r in rows if r[1] == "D"} - {
        r[2] for r in rows if r[1] != "D"
    }
    live = {d for d, _b, _k in _index_state(spark, index)}
    gone = deleted - live
    assert gone == deleted - {d for d, *_ in _index_state(spark, fresh)} or not (
        deleted & live
    )


def test_refresh_is_idempotent_and_empty_noop(spark, indexed_table):
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.dedup_index import refresh_band_index
    from canal_spark.merge import merge_into

    t, base, index = indexed_table
    rows = synth_changelog_rows(base, 120, seed=43)
    changes = changelog_df(spark, rows)
    merge_into(spark, t, changes)
    refresh_band_index(spark, t, index, keys=changes.select("doc_id"))
    state1 = _index_state(spark, index)
    # replaying the SAME keys after the data already merged: same state
    res = refresh_band_index(spark, t, index, keys=changes.select("doc_id"))
    assert res.applied and _index_state(spark, index) == state1
    # empty key frame: no commit at all
    snap = index.current_snapshot_id
    res = refresh_band_index(spark, t, index, keys=changes.select("doc_id").limit(0))
    assert not res.applied and index.current_snapshot_id == snap


def test_delta_candidates_and_hot_bucket_metrics(spark, tmp_path):
    """A delta doc nearly identical to an indexed doc reports as a dup
    candidate; a mega-bucket (many identical docs) is capped and
    counted, not exploded into pairs."""
    from pyspark.sql import functions as F

    from canal_spark import create_table
    from canal_spark.dedup_index import (
        create_band_index,
        refresh_band_index,
        token_band_frame,
    )
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    toks = list(range(100, 140))
    rows = [("web:0", toks, len(toks), "web")]
    # mega-group: 30 identical docs -> every band bucket has 30+ members
    rows += [(f"web:m{i}", list(range(7)), 7, "web") for i in range(30)]
    t = create_table(str(tmp_path / "tbl"), TOKEN_TABLE_SCHEMA,
                     partition_by=["source"])
    df = spark.createDataFrame(rows, TOKEN_TABLE_SCHEMA)
    append(spark, t, df.repartition(2))

    index = create_band_index(str(tmp_path / "bands"))
    refresh_band_index(spark, t, index)

    # delta: near-dup of web:0 (shares 37 of 40 token shingles) and one
    # more copy of the mega-template
    delta_rows = [("web:new", toks[:-1] + [999], 40, "web"),
                  ("web:mnew", list(range(7)), 7, "web")]
    append(spark, t, spark.createDataFrame(delta_rows, TOKEN_TABLE_SCHEMA))
    keys = spark.createDataFrame([("web:new",), ("web:mnew",)], "doc_id string")
    res = refresh_band_index(spark, t, index, keys=keys, max_bucket=10)

    assert res.dup_docs >= 1  # web:new matched web:0
    assert res.hot_buckets_capped > 0  # the mega-template buckets hit the cap
    # the index itself still carries ALL rows (cap is query-side only)
    bands = token_band_frame(t.scan(spark).select("doc_id", "tokens"))
    assert _index_state(spark, index) == {
        (r["doc_id"], r["band"], r["bucket"]) for r in bands.collect()
    }


def test_run_pass_band_index_and_lineage(spark, token_table, tmp_path):
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.checkpoint import ensure_lineage
    from canal_spark.dedup_index import create_band_index, refresh_band_index
    from canal_spark.maintenance import run_pass

    t, base = token_table
    index = create_band_index(str(tmp_path / "bands"))
    refresh_band_index(spark, t, index)
    lineage_root = str(tmp_path / "lineage")

    changes = changelog_df(spark, synth_changelog_rows(base, 200, seed=47))
    rep = run_pass(spark, t, changes, lineage_root=lineage_root,
                   target_file_bytes=1 << 20, target_file_rows=100_000,
                   band_index=index)
    assert rep.band_index.get("applied")
    assert rep.band_index["docs_changed"] > 0

    lineage = ensure_lineage(lineage_root)
    rows = lineage.scan(spark).where("phase = 'band_index'").collect()
    assert rows and rows[0]["metrics"] is not None
    assert "dup_candidates" in rows[0]["metrics"]

    # the pass's prometheus scrape surface: reference-named counters
    # where semantics align, canal_spark_* phase gauges elsewhere
    from canal_spark.maintenance import prometheus_metrics

    pm = prometheus_metrics(rep, destination="tokens")
    lbl = '{destination="tokens"}'
    assert pm[f"canal_instance_transactions{lbl}"] == 1
    put = rep.merge["rows_upserted"] + rep.merge["rows_deleted"]
    assert pm[f"canal_instance_put_rows{lbl}"] == put > 0
    assert pm[f"canal_instance_ack_rows{lbl}"] == put
    assert pm[f"canal_instance_store_produce_seq{lbl}"] == rep.merge["high_water_mark"]
    assert pm[f"canal_spark_band_index_dup_candidates{lbl}"] == rep.band_index["dup_candidates"]
    assert f"canal_spark_cluster_files_after{lbl}" in pm


def test_jobs_cli_dedup_index(tmp_path):
    from tests.test_jobs_cli import run_job

    from canal_spark import get_spark
    from canal_spark.changelog import (
        base_table_df,
        changelog_df,
        synth_changelog_rows,
        synth_token_rows,
    )
    from canal_spark import create_table, load_table
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("dedup-cli-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    idx_root = str(tmp_path / "bands")
    cl_dir = str(tmp_path / "cl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(600)
    append(spark, t, base_table_df(spark, 600).repartition(4))
    changelog_df(spark, synth_changelog_rows(base, 150, seed=51)).write.parquet(cl_dir)

    full = run_job("canal_spark.jobs.dedup", root, "--index", idx_root, "--full")
    assert full["applied"] and full["full_rebuild"]

    # apply the changelog to the data table, then incremental refresh
    run_job("canal_spark.jobs.apply_changelog", root, "--changelog", cl_dir)
    inc = run_job("canal_spark.jobs.dedup", root, "--index", idx_root,
                  "--changelog", cl_dir,
                  "--lineage", str(tmp_path / "lineage"))
    assert inc["applied"] and not inc["full_rebuild"]
    assert inc["docs_changed"] > 0 and inc["files_pruned"] >= 0

    # index matches a from-scratch rebuild after the CLI round trip
    from canal_spark.dedup_index import create_band_index, refresh_band_index

    t = load_table(root)
    fresh = create_band_index(str(tmp_path / "bands_full"))
    refresh_band_index(spark, t, fresh)
    index = load_table(idx_root)
    assert _index_state(spark, index) == _index_state(spark, fresh)


def test_lineage_metrics_column_evolves_in_place(spark, tmp_path):
    """A round-3 lineage table (no `metrics` column) is evolved by
    ensure_lineage on first load, and old rows read metrics as null
    while new rows carry the counter map."""
    from pyspark.sql.types import StructType

    from canal_spark.checkpoint import ensure_lineage, record
    from canal_spark.schema import LINEAGE_SCHEMA
    from canal_spark.table.format import create_table

    root = str(tmp_path / "lineage")
    old_schema = StructType([f for f in LINEAGE_SCHEMA.fields
                             if f.name != "metrics"])
    old = create_table(root, old_schema)
    import datetime as dt
    old_row = [("j0", "merge", None, None, 1, None, None, None,
                dt.datetime.now(dt.timezone.utc))]
    from canal_spark.table.writer import append
    append(spark, old, spark.createDataFrame(old_row, old_schema))

    lineage = ensure_lineage(root)
    assert "metrics" in lineage.spark_schema().fieldNames()
    record(spark, lineage, "j1", "band_index", metrics={"dup_candidates": 7})
    rows = {r["job_id"]: r["metrics"] for r in lineage.scan(spark).collect()}
    assert rows["j0"] is None
    assert rows["j1"] == {"dup_candidates": 7}
    # explicit metrics dict, not a **kwargs catch-all: a misspelled
    # named parameter must raise, not silently become a metrics entry
    import pytest as _pytest
    with _pytest.raises(TypeError):
        record(spark, lineage, "j1", "band_index", files_rewriten=1)


def test_refresh_unhinted_join_path(spark, indexed_table, tmp_path):
    """With max_broadcast_keys=0 every keys_df join runs unhinted (the
    huge-backfill path); the resulting index state must equal a fresh
    full rebuild, same as the broadcast path."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.dedup_index import create_band_index, refresh_band_index
    from canal_spark.merge import merge_into

    t, base, index = indexed_table
    rows = synth_changelog_rows(base, 150, seed=47)
    changes = changelog_df(spark, rows)
    assert merge_into(spark, t, changes).applied

    res = refresh_band_index(
        spark, t, index, keys=changes.select("doc_id"), max_broadcast_keys=0
    )
    assert res.applied and not res.full_rebuild

    fresh = create_band_index(str(tmp_path / "bands_unhinted"))
    refresh_band_index(spark, t, fresh)
    assert _index_state(spark, index) == _index_state(spark, fresh)


def _mk_dup_table(spark, tmp_path, name="seldedup"):
    """A token table with controlled near-dup clusters: two exact-copy
    clusters (sizes 3 and 2, one with unequal lengths so the longest
    survives), plus unique docs."""
    from canal_spark import create_table
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    long_toks = list(range(1000, 1040))
    rows = [
        # cluster A: a0/a1 identical, a2 a longer superset -> a2 survives
        ("web:a0", long_toks, len(long_toks), "web"),
        ("web:a1", long_toks, len(long_toks), "web"),
        ("web:a2", long_toks + [7, 8, 9], len(long_toks) + 3, "web"),
        # cluster B: equal lengths -> smallest doc_id survives
        ("web:b0", list(range(2000, 2030)), 30, "web"),
        ("web:b1", list(range(2000, 2030)), 30, "web"),
    ] + [
        (f"web:u{i:03d}", [10_000 + 97 * i + j for j in range(25)], 25, "web")
        for i in range(40)
    ]
    t = create_table(str(tmp_path / name), TOKEN_TABLE_SCHEMA,
                     partition_by=["source"])
    append(spark, t,
           spark.createDataFrame(rows, TOKEN_TABLE_SCHEMA).repartition(4))
    return t


def test_corpus_self_dedup_removes_losers_and_index_rows(spark, tmp_path):
    from canal_spark.dedup_index import (
        corpus_dedup_pass,
        create_band_index,
        refresh_band_index,
    )

    t = _mk_dup_table(spark, tmp_path)
    index = create_band_index(str(tmp_path / "sd_bands"))
    refresh_band_index(spark, t, index)
    rows_before = t.row_count()

    dry = corpus_dedup_pass(spark, t, index, dry_run=True)
    assert dry.dry_run and not dry.applied
    assert dry.losers_removed == 3  # a0, a1, b1
    assert t.row_count() == rows_before  # untouched

    res = corpus_dedup_pass(spark, t, index)
    assert res.applied
    assert res.groups == 2 and res.docs_in_groups == 5
    assert res.losers_removed == 3
    assert res.index_refresh["applied"]

    ids = {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()}
    assert {"web:a2", "web:b0"} <= ids  # survivors: longest / smallest id
    assert not {"web:a0", "web:a1", "web:b1"} & ids
    assert t.row_count() == rows_before - 3
    # losers' band rows fell out of the index
    idx_ids = {r["doc_id"] for r in index.scan(spark).select("doc_id").collect()}
    assert not {"web:a0", "web:a1", "web:b1"} & idx_ids
    assert "web:a2" in idx_ids

    # idempotent: nothing left to remove
    again = corpus_dedup_pass(spark, t, index)
    assert not again.applied and again.losers_removed == 0


def test_corpus_self_dedup_wap_guards_runaway_delete(spark, tmp_path):
    from canal_spark import create_table
    from canal_spark.dedup_index import (
        corpus_dedup_pass,
        create_band_index,
        refresh_band_index,
    )
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    # degenerate corpus: 10 of 12 docs are the same document
    toks = list(range(5000, 5035))
    rows = [(f"web:c{i}", toks, len(toks), "web") for i in range(10)] + [
        ("web:x0", list(range(6000, 6025)), 25, "web"),
        ("web:x1", list(range(7000, 7025)), 25, "web"),
    ]
    t = create_table(str(tmp_path / "runaway"), TOKEN_TABLE_SCHEMA,
                     partition_by=["source"])
    append(spark, t, spark.createDataFrame(rows, TOKEN_TABLE_SCHEMA))
    index = create_band_index(str(tmp_path / "runaway_bands"))
    refresh_band_index(spark, t, index)
    rows_before = t.row_count()

    res = corpus_dedup_pass(spark, t, index, wap=True, max_delete_fraction=0.2)
    assert not res.applied
    assert res.wap["published"] is False
    assert res.wap["checks"]["delete_bound"] > 0
    assert t.row_count() == rows_before
    assert t.staged_snapshots() == []

    # the operator reviews and allows it -> same pass publishes
    res2 = corpus_dedup_pass(spark, t, index, wap=True, max_delete_fraction=0.9)
    assert res2.applied and res2.wap["published"]
    assert t.row_count() == rows_before - 9


def test_run_pass_compacts_derived_index_files(spark, indexed_table, tmp_path):
    """Per-batch index refreshes leave O(batch) small files; the pass
    bin-packs the index like any other table — file count drops, scan
    state is unchanged (equals a fresh full rebuild)."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.dedup_index import create_band_index, refresh_band_index
    from canal_spark.maintenance import run_pass
    from canal_spark.merge import merge_into

    t, base, index = indexed_table
    # fragment the index: several small incremental refreshes
    for seed in (61, 62, 63):
        rows = synth_changelog_rows(base, 120, seed=seed,
                                    start_ordinal=seed * 10_000)
        changes = changelog_df(spark, rows)
        merge_into(spark, t, changes)
        refresh_band_index(spark, t, index, keys=changes.select("doc_id"))
    files_before = len(index.files())

    rows = synth_changelog_rows(base, 60, seed=64, start_ordinal=900_000)
    rep = run_pass(spark, t, changelog_df(spark, rows), band_index=index)
    assert rep.band_index["compact"]["files_removed"] > 0
    index = index.refresh()
    assert len(index.files()) < files_before

    fresh = create_band_index(str(tmp_path / "bands_verify"))
    refresh_band_index(spark, t, fresh)
    assert _index_state(spark, index) == _index_state(spark, fresh)


def test_self_dedup_is_out_of_band_and_self_heals(spark, tmp_path):
    """The dedup delete merge must not advance the hwm (an upstream
    event with a small ordinal still applies afterwards), and a crash
    between the delete merge and the index refresh self-heals on the
    next pass (stale index rows for deleted docs are repaired)."""
    from canal_spark.changelog import changelog_df
    from canal_spark.dedup_index import (
        corpus_dedup_pass,
        create_band_index,
        refresh_band_index,
    )
    from canal_spark.merge import merge_high_water_mark, merge_into

    t = _mk_dup_table(spark, tmp_path, name="oob")
    index = create_band_index(str(tmp_path / "oob_bands"))
    refresh_band_index(spark, t, index)

    res = corpus_dedup_pass(spark, t, index)
    assert res.applied and res.losers_removed == 3
    # OUT-OF-BAND: position marks untouched by the engine's own deletes
    assert merge_high_water_mark(t) == 0

    # an upstream event with ordinal 1 (would be shadowed if the dedup
    # batch had consumed hwm+1) still applies
    import datetime as dt

    E = dt.datetime(2026, 1, 1)
    m = merge_into(spark, t, changelog_df(
        spark, [(1, "I", "web:new01", [5, 6, 7], 3, "web", E, 1)]))
    assert m.applied
    ids = {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()}
    assert "web:new01" in ids

    # simulate a crash between delete-merge and index refresh: delete a
    # doc through the normal path WITHOUT updating the index
    m2 = merge_into(spark, t, changelog_df(
        spark, [(2, "D", "web:u000", None, None, None, E, 1)]))
    assert m2.applied
    stale = {r["doc_id"] for r in index.scan(spark).select("doc_id").collect()}
    assert "web:u000" in stale  # index is now stale

    again = corpus_dedup_pass(spark, t, index)  # nothing to dedup...
    idx_ids = {r["doc_id"] for r in index.scan(spark).select("doc_id").collect()}
    assert "web:u000" not in idx_ids  # ...but the drift was repaired
    assert again.index_refresh.get("applied")


def test_replay_pass_heals_crashed_index_sync(spark, token_table, tmp_path):
    """Crash BETWEEN the merge commit and the index refresh: the hwm
    already covers the batch, so the re-run's merge replays to
    applied=False — the index sync must still run (idempotent per key)
    or the batch's keys stay stale in the index forever."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.dedup_index import create_band_index, refresh_band_index
    from canal_spark.maintenance import run_pass
    from canal_spark.merge import merge_into

    t, base = token_table
    index = create_band_index(str(tmp_path / "bands"))
    refresh_band_index(spark, t, index)
    idx_before = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in index.scan(spark).collect()
    }

    changes = changelog_df(spark, synth_changelog_rows(base, 150, seed=13))
    # "crashed" first pass: the data merge commits, the index sync never
    # happens (simulated by merging outside run_pass)
    m = merge_into(spark, t, changes)
    assert m.applied

    # recovery re-run: merge replays to a no-op, index must still sync
    rep = run_pass(spark, t, changes, target_file_bytes=1 << 20,
                   target_file_rows=100_000, band_index=index)
    assert rep.merge["applied"] is False  # pure replay
    assert rep.band_index is not None and rep.band_index["applied"]

    # the index now equals a from-scratch rebuild of the merged table
    fresh = create_band_index(str(tmp_path / "bands_fresh"))
    refresh_band_index(spark, t, fresh)
    got = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in index.scan(spark).collect()
    }
    want = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in fresh.scan(spark).collect()
    }
    assert got == want and got != idx_before


def test_token_band_frame_short_docs_never_crash(spark):
    """Docs shorter than SHINGLE_K must be filtered BEFORE the window
    generator (sequence(1, size-2) descends for them and slice(tokens,
    0, 3) is a runtime error) — including when the frame is cached, so
    the guard cannot rely on predicate pushdown through the explode."""
    from canal_spark.dedup_index import token_band_frame

    df = spark.createDataFrame(
        [("a", [1]), ("b", [1, 2]), ("c", [1, 2, 3, 4])],
        "doc_id string, tokens array<int>",
    )
    out = token_band_frame(df)
    assert {r["doc_id"] for r in out.collect()} == {"c"}
    cached = df.cache()
    try:
        assert {r["doc_id"] for r in token_band_frame(cached).collect()} == {"c"}
    finally:
        cached.unpersist()


# --------------------------------------------------------------------------
# winnow signature family
# --------------------------------------------------------------------------


def test_token_winnow_frame_matches_python_reference(spark):
    """Engine fingerprints == a pure-Python winnower over the same
    3-token shingle hash stream (window-of-w minima, distinct)."""
    import hashlib

    from canal_spark.dedup_index import SHINGLE_K, WINNOW_W, token_winnow_frame

    toks = [5, 17, 5, 99, 42, 17, 5, 3, 8, 12, 99]
    df = spark.createDataFrame(
        [("d0", toks)], "doc_id string, tokens array<int>"
    )
    hs = [
        int(
            hashlib.md5(
                " ".join(str(t) for t in toks[i : i + SHINGLE_K]).encode()
            ).hexdigest()[:15],
            16,
        )
        for i in range(len(toks) - SHINGLE_K + 1)
    ]
    expect = {
        min(hs[i : i + WINNOW_W]) for i in range(len(hs) - WINNOW_W + 1)
    }
    got = {
        (r["band"], r["bucket"]) for r in token_winnow_frame(df).collect()
    }
    assert got == {(0, fp) for fp in expect}


def test_token_winnow_frame_short_docs_never_crash(spark):
    """Docs shorter than one full winnowing window contribute no rows
    (filter BEFORE the generator, same rule as token_band_frame)."""
    from canal_spark.dedup_index import SHINGLE_K, WINNOW_W, token_winnow_frame

    min_len = SHINGLE_K + WINNOW_W - 1
    df = spark.createDataFrame(
        [("a", [1]), ("b", list(range(min_len - 1))),
         ("c", list(range(min_len)))],
        "doc_id string, tokens array<int>",
    )
    assert {r["doc_id"] for r in token_winnow_frame(df).collect()} == {"c"}


def test_winnow_index_signature_pinned(spark, tmp_path):
    """The signature family is a table property: creation pins it,
    reopening validates it, a mismatch errors at config time."""
    import pytest as _pytest

    from canal_spark.dedup_index import (
        SIGNATURE_PROP,
        create_band_index,
        index_signature,
        load_or_create_band_index,
    )

    root = str(tmp_path / "widx")
    idx = create_band_index(root, signature="winnow")
    assert idx.properties[SIGNATURE_PROP] == "winnow"
    assert index_signature(idx) == "winnow"
    # reopen without a signature: keeps the pinned family
    assert index_signature(load_or_create_band_index(root)) == "winnow"
    # explicit match is fine, mismatch errors
    load_or_create_band_index(root, signature="winnow")
    with _pytest.raises(ValueError, match="pinned"):
        load_or_create_band_index(root, signature="minhash")
    with _pytest.raises(ValueError, match="unknown signature"):
        create_band_index(str(tmp_path / "bad"), signature="simhash")


def test_winnow_index_incremental_equals_full_rebuild(spark, token_table, tmp_path):
    """The refresh machinery is family-agnostic: a winnow index kept in
    sync incrementally equals a from-scratch winnow rebuild, and the
    frame builder comes from the pinned property (not a caller arg)."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.dedup_index import create_band_index, refresh_band_index
    from canal_spark.merge import merge_into

    t, base = token_table
    index = create_band_index(str(tmp_path / "wbands"), signature="winnow")
    res = refresh_band_index(spark, t, index)
    assert res.applied and res.full_rebuild and res.bands_written > 0
    assert {r["band"] for r in index.scan(spark).select("band").distinct().collect()} == {0}

    changes = changelog_df(spark, synth_changelog_rows(base, 300, seed=43))
    assert merge_into(spark, t, changes).applied
    res2 = refresh_band_index(spark, t, index, keys=changes.select("doc_id"))
    assert res2.applied and not res2.full_rebuild

    fresh = create_band_index(str(tmp_path / "wbands_full"), signature="winnow")
    refresh_band_index(spark, t, fresh)
    assert _index_state(spark, index) == _index_state(spark, fresh)


def test_corpus_self_dedup_with_winnow_index(spark, tmp_path):
    """Self-dedup over a WINNOW index removes the same losers as the
    minhash path on the exact-copy clusters (shared full-token runs —
    the case the winnowing guarantee covers deterministically)."""
    from canal_spark.dedup_index import (
        corpus_dedup_pass,
        create_band_index,
        refresh_band_index,
    )

    t = _mk_dup_table(spark, tmp_path, name="wseldedup")
    index = create_band_index(str(tmp_path / "wsd_bands"), signature="winnow")
    refresh_band_index(spark, t, index)
    rows_before = t.row_count()

    res = corpus_dedup_pass(spark, t, index)
    assert res.applied
    assert res.losers_removed == 3  # a0, a1, b1 — same as minhash
    ids = {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()}
    assert {"web:a2", "web:b0"} <= ids
    assert not {"web:a0", "web:a1", "web:b1"} & ids
    assert t.row_count() == rows_before - 3
    idx_ids = {r["doc_id"] for r in index.scan(spark).select("doc_id").collect()}
    assert not {"web:a0", "web:a1", "web:b1"} & idx_ids

    again = corpus_dedup_pass(spark, t, index)
    assert not again.applied and again.losers_removed == 0


def test_doctor_check_dedup_index(spark, token_table, tmp_path):
    """check_dedup_index: clean sync is ok with zero drift; phantom and
    missing docs WARN (self-healable debt); cross-family band rows and
    an unknown signature are VIOLATIONS."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.dedup_index import (
        SIGNATURE_PROP,
        create_band_index,
        refresh_band_index,
        token_band_frame,
    )
    from canal_spark.doctor import check_dedup_index
    from canal_spark.merge import merge_into
    from canal_spark.table.writer import write_datafiles

    t, base = token_table
    index = create_band_index(str(tmp_path / "doc_bands"))
    refresh_band_index(spark, t, index)
    rep = check_dedup_index(spark, t, index)
    assert rep["ok"] and not rep["warnings"]
    assert rep["signature"] == "minhash"
    assert rep["docs_indexed"] > 0
    assert rep["phantom_docs"] == 0 and rep["missing_docs"] == 0

    # un-synced batch -> missing-docs warning (and deletes -> phantom)
    changes = changelog_df(spark, synth_changelog_rows(base, 200, seed=47))
    assert merge_into(spark, t, changes).applied
    rep2 = check_dedup_index(spark, t, index)
    assert rep2["ok"]  # drift is debt, not corruption
    kinds = {w["kind"] for w in rep2["warnings"]}
    assert rep2["phantom_docs"] > 0 or rep2["missing_docs"] > 0
    assert kinds <= {"phantom-docs", "missing-docs"} and kinds

    # resync clears the warnings
    refresh_band_index(spark, t, index, keys=changes.select("doc_id"))
    rep3 = check_dedup_index(spark, t, index)
    assert rep3["ok"] and not rep3["warnings"]

    # cross-family rows: minhash bands committed into a WINNOW index
    widx = create_band_index(str(tmp_path / "doc_wbands"), signature="winnow")
    bands = token_band_frame(t.scan(spark).select("doc_id", "tokens"))
    entries = write_datafiles(spark, widx, bands)
    widx.commit(added=entries, removed_paths=[], operation="append",
                summary={"phase": "test-corrupt"})
    rep4 = check_dedup_index(spark, t, widx)
    assert not rep4["ok"]
    assert {v["kind"] for v in rep4["violations"]} == {"band-domain"}

    # unknown signature property
    index.set_properties({SIGNATURE_PROP: "simhash"})
    rep5 = check_dedup_index(spark, t, index)
    assert not rep5["ok"]
    assert rep5["violations"][0]["kind"] == "signature-unknown"


def test_winnow_self_dedup_requires_min_shared_evidence(spark, tmp_path):
    """Two docs sharing only a SHORT token run (>= the winnowing
    guarantee threshold, so they DO share a fingerprint) must NOT be
    merged-and-deleted by the winnow self-dedup — one shared
    fingerprint is one shared phrase, below WINNOW_MIN_SHARED.  Exact
    copies (many shared fps) still dedupe in the same pass."""
    from canal_spark import create_table
    from canal_spark.dedup_index import (
        SHINGLE_K,
        WINNOW_W,
        corpus_dedup_pass,
        create_band_index,
        refresh_band_index,
        token_winnow_frame,
    )
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    run = list(range(500, 500 + SHINGLE_K + WINNOW_W - 1))  # 6 tokens
    rows = [
        # p0/p1: distinct bodies + the short shared run -> 1-ish shared fp
        ("web:p0", list(range(100, 130)) + run, 30 + len(run), "web"),
        ("web:p1", run + list(range(200, 230)), len(run) + 30, "web"),
        # exact copies -> many shared fps, must still dedupe
        ("web:c0", list(range(3000, 3040)), 40, "web"),
        ("web:c1", list(range(3000, 3040)), 40, "web"),
    ]
    t = create_table(str(tmp_path / "wmin_t"), TOKEN_TABLE_SCHEMA,
                     partition_by=["source"])
    append(spark, t, spark.createDataFrame(rows, TOKEN_TABLE_SCHEMA))
    index = create_band_index(str(tmp_path / "wmin_i"), signature="winnow")
    refresh_band_index(spark, t, index)

    # sanity: p0/p1 DO share at least one fingerprint (the guarantee),
    # so without the evidence threshold they would have paired
    fps = token_winnow_frame(t.scan(spark).select("doc_id", "tokens"))
    shared = (
        fps.where(fps.doc_id == "web:p0").select("bucket")
        .intersect(fps.where(fps.doc_id == "web:p1").select("bucket"))
        .count()
    )
    assert shared >= 1

    res = corpus_dedup_pass(spark, t, index)
    assert res.applied
    ids = {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()}
    assert {"web:p0", "web:p1"} <= ids  # weak-evidence pair survived
    assert "web:c0" in ids and "web:c1" not in ids  # copies deduped
    assert res.losers_removed == 1
