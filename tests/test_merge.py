"""MERGE INTO golden-scan tests — the event-replication correctness
pattern of the reference (client-adapter/rdb/src/test/.../sync/Common.java:
hand-built DMLs in -> target rows out), with the single-threaded Python
oracle as ground truth and per-row token-array equality as the invariant.
"""

import datetime as dt

import pytest

from canal_spark.changelog import (
    changelog_df,
    dedupe_last_wins,
    synth_changelog_rows,
)
from canal_spark.merge import dedupe_max_by, dedupe_two_phase_salted, merge_into
from tests.conftest import oracle_dict, scan_dict

E = dt.datetime(2026, 1, 1)


def _apply_and_check(spark, token_table, rows):
    t, base = token_table
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    assert scan_dict(spark, t) == oracle_dict(base, rows)
    return res


def test_insert_only(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 100, p_insert=1.0, p_update=0.0, p_delete=0.0)
    _apply_and_check(spark, token_table, rows)
    assert t.row_count() == 1200 + 100


def test_update_only(spark, token_table):
    rows = synth_changelog_rows(token_table[1], 150, p_insert=0.0, p_update=1.0, p_delete=0.0)
    _apply_and_check(spark, token_table, rows)


def test_delete_only_including_ghosts(spark, token_table):
    rows = synth_changelog_rows(token_table[1], 80, p_insert=0.0, p_update=0.0, p_delete=1.0)
    _apply_and_check(spark, token_table, rows)


def test_mixed_ops(spark, token_table):
    rows = synth_changelog_rows(token_table[1], 300)
    _apply_and_check(spark, token_table, rows)


def test_multi_op_same_key_last_wins(spark, token_table):
    t, base = token_table
    k = base[0][0]
    src = base[0][3]
    rows = [
        (1, "U", k, [1, 2, 3], 3, src, E, 1),
        (2, "D", k, None, None, None, E, 1),
        (3, "I", k, [9, 9], 2, src, E, 1),  # delete then re-insert: insert wins
        (4, "U", k, [7], 1, src, E, 1),
    ]
    _apply_and_check(spark, token_table, rows)
    got = scan_dict(spark, t)
    assert got[k] == ([7], 1, src)


def test_delete_last_wins(spark, token_table):
    t, base = token_table
    k = base[1][0]
    rows = [
        (1, "U", k, [5, 5], 2, base[1][3], E, 1),
        (2, "D", k, None, None, None, E, 1),
    ]
    _apply_and_check(spark, token_table, rows)
    assert k not in scan_dict(spark, t)


def test_pk_change_as_delete_plus_insert(spark, token_table):
    """PK update modeled as D(old)+I(new) — the reference applies a
    PK-change UPDATE by hashing on the OLD pk (RdbSyncService.java:441-455);
    set-based CDC expresses it as two ops (SURVEY.md §2.6 A2)."""
    t, base = token_table
    old = base[2][0]
    new = "moved:0000000001"
    toks = [4, 4, 4]
    rows = [
        (1, "D", old, None, None, None, E, 1),
        (2, "I", new, toks, 3, "web", E, 1),
    ]
    _apply_and_check(spark, token_table, rows)
    got = scan_dict(spark, t)
    assert old not in got and got[new] == (toks, 3, "web")


def test_upsert_on_existing_key(spark, token_table):
    t, base = token_table
    k, _, _, src = base[3]
    rows = [(1, "I", k, [8, 8, 8], 3, src, E, 1)]  # insert of existing key
    _apply_and_check(spark, token_table, rows)
    assert scan_dict(spark, t)[k] == ([8, 8, 8], 3, src)


def test_noop_update_preserved(spark, token_table):
    t, base = token_table
    k, toks, n, src = base[4]
    rows = [(1, "U", k, list(toks), n, src, E, 1)]
    _apply_and_check(spark, token_table, rows)
    assert scan_dict(spark, t)[k] == (list(toks), n, src)


def test_zipf_skewed_changelog(spark, token_table):
    rows = synth_changelog_rows(token_table[1], 500, zipf_a=1.2)
    _apply_and_check(spark, token_table, rows)


def test_idempotent_replay(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 200)
    merge_into(spark, t, changelog_df(spark, rows))
    v = t.version
    state = scan_dict(spark, t)
    res2 = merge_into(spark, t, changelog_df(spark, rows))
    assert not res2.applied and t.version == v
    assert scan_dict(spark, t) == state


def test_incremental_batches_match_one_shot(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 400)
    cut = 200
    merge_into(spark, t, changelog_df(spark, rows[:cut]))
    # second batch delivered with overlap (at-least-once): replayed rows ignored
    merge_into(spark, t, changelog_df(spark, rows[100:]))
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_snapshot_isolation_during_merge(spark, token_table):
    t, base = token_table
    pre_snap = t.current_snapshot_id
    pre_state = scan_dict(spark, t, snapshot_id=pre_snap)
    rows = synth_changelog_rows(base, 200)
    merge_into(spark, t, changelog_df(spark, rows))
    # reader pinned to the pre-merge snapshot sees unchanged data
    assert scan_dict(spark, t, snapshot_id=pre_snap) == pre_state


def test_dedupe_variants_agree(spark, token_table):
    rows = synth_changelog_rows(token_table[1], 300, zipf_a=1.2)
    cdf = changelog_df(spark, rows)
    a = {r["doc_id"]: r["ordinal"] for r in dedupe_max_by(cdf).collect()}
    b = {r["doc_id"]: r["ordinal"] for r in dedupe_two_phase_salted(cdf).collect()}
    c = {r["doc_id"]: r["ordinal"] for r in dedupe_last_wins(cdf).collect()}
    assert a == b == c


def test_merge_prunes_untouched_files(spark, tmp_table_root):
    """After a clustered (range) layout, a point-y batch must rewrite
    only overlapping files — manifest pruning at work."""
    from canal_spark import create_table
    from canal_spark.changelog import base_table_df, synth_token_rows
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import write_datafiles

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(2000)
    df = base_table_df(spark, 2000).repartitionByRange(10, "doc_id")
    entries = write_datafiles(spark, t, df, sort_within_by=["doc_id"])
    t.commit(entries, operation="append")
    # touch keys from one narrow range only
    ks = sorted(r[0] for r in base)[:5]
    rows = [(i + 1, "U", k, [1], 1, k.split(":")[0], E, 1) for i, k in enumerate(ks)]
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.files_pruned > 0, "expected manifest pruning to skip files"
    assert res.files_rewritten < 10
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_all_noop_update_batch_rewrites_nothing(spark, token_table):
    """Column-change pruning (LogEventConvert.isUpdate:905-929): a batch
    of 100% no-op updates (before-image == after-image) must rewrite and
    add ZERO files — but the high-water mark still advances atomically,
    so the batch never re-applies."""
    t, base = token_table
    rows = [
        (i + 1, "U", k, list(toks), n, src, E, 1, list(toks), n)
        for i, (k, toks, n, src) in enumerate(base[:50])
    ]
    state_before = scan_dict(spark, t)
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied  # cursor moved...
    assert res.high_water_mark == 50
    assert res.files_rewritten == 0 and res.files_added == 0  # ...data didn't
    assert res.extra["noop_updates_suppressed"] == 50
    assert scan_dict(spark, t) == state_before
    # replay is a no-op too
    assert not merge_into(spark, t, changelog_df(spark, rows)).applied


def test_noop_suppression_requires_every_event_noop(spark, token_table):
    """A key whose slice mixes a real update with a trailing no-op U
    must STILL apply (the trailing event's before-image reflects the
    in-slice intermediate state, not the table)."""
    t, base = token_table
    k, toks, n, src = base[6]
    rows = [
        (1, "U", k, [42, 43], 2, src, E, 1, list(toks), n),  # real change
        (2, "U", k, [42, 43], 2, src, E, 1, [42, 43], 2),  # no-op vs event 1
    ]
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.extra["noop_updates_suppressed"] == 0
    assert scan_dict(spark, t)[k] == ([42, 43], 2, src)


def test_noop_update_on_absent_key_reinserts(spark, token_table):
    """No-op suppression is only sound for keys PRESENT in the table:
    the before-image chain must anchor to a live row.  A no-op U on a
    key deleted in an earlier (already applied) batch must re-insert
    the after-image — exactly what the replay oracle does."""
    t, base = token_table
    k, toks, n, src = base[3]
    all_rows = [(1, "D", k, None, None, None, E, 1)]
    merge_into(spark, t, changelog_df(spark, all_rows))
    assert k not in scan_dict(spark, t)
    # batch 2: a single U whose before-image equals its after-image
    rows2 = [(2, "U", k, list(toks), n, src, E, 1, list(toks), n)]
    all_rows += rows2
    res = merge_into(spark, t, changelog_df(spark, rows2))
    assert res.applied
    assert res.extra["noop_updates_suppressed"] == 0  # reclassified
    assert scan_dict(spark, t) == oracle_dict(base, all_rows)
    # same invariant on the merge-on-read path
    rows3 = [(3, "D", k, None, None, None, E, 1)]
    rows4 = [(4, "U", k, list(toks), n, src, E, 1, list(toks), n)]
    merge_into(spark, t, changelog_df(spark, rows3), mode="mor")
    merge_into(spark, t, changelog_df(spark, rows4), mode="mor")
    all_rows += rows3 + rows4
    assert scan_dict(spark, t) == oracle_dict(base, all_rows)


def test_second_table_shape_composite_key(spark, tmp_table_root):
    """The key/schema contract is table config, not code (multi-table
    generality — TableMetaCache.java discovers shapes at runtime; here
    the `key-cols` property + table schema drive the same merge path):
    a (tenant, seq) composite-key table with different data columns
    merges correctly through the identical engine."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from canal_spark import create_table

    schema = StructType(
        [
            StructField("tenant", StringType(), False),
            StructField("seq", LongType(), False),
            StructField("payload", StringType(), True),
        ]
    )
    t = create_table(
        tmp_table_root, schema, properties={"key-cols": "tenant,seq"}
    )
    base = [(f"t{i % 3}", i, f"v{i}") for i in range(60)]
    from canal_spark.table.writer import append

    append(spark, t, spark.createDataFrame(base, schema).repartition(4))

    cl_schema = StructType(
        [
            StructField("ordinal", LongType(), False),
            StructField("op", StringType(), False),
            StructField("tenant", StringType(), False),
            StructField("seq", LongType(), False),
            StructField("payload", StringType(), True),
        ]
    )
    changes = [
        (1, "U", "t0", 0, "updated"),
        (2, "D", "t1", 1, None),
        (3, "I", "t0", 999, "new"),
        (4, "U", "t0", 999, "new2"),  # multi-op same composite key
    ]
    res = merge_into(spark, t, spark.createDataFrame(changes, cl_schema))
    assert res.applied
    got = {(r["tenant"], r["seq"]): r["payload"] for r in t.scan(spark).collect()}
    oracle = {(r[0], r[1]): r[2] for r in base}
    oracle[("t0", 0)] = "updated"
    del oracle[("t1", 1)]
    oracle[("t0", 999)] = "new2"
    assert got == oracle
    # replay idempotence holds for the second shape too
    assert not merge_into(spark, t, spark.createDataFrame(changes, cl_schema)).applied


def test_skew_stats_reported(spark, token_table):
    """Key-frequency stats (the salting decision input) surface in the
    MergeResult: a zipf changelog shows a hot key, and the join strategy
    is broadcast for a CDC-sized batch."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.merge import merge_into

    table, base = token_table
    rows = synth_changelog_rows(base, 600, seed=77, zipf_a=1.2)
    res = merge_into(spark, table, changelog_df(spark, rows))
    assert res.applied
    st = res.extra
    assert st["join_strategy"] == "broadcast"
    assert st["slice_rows"] == 600
    assert st["hot_key_freq"] >= st["mean_key_freq"]
    assert st["hot_key_freq"] > 1  # zipf produced a genuinely hot key


def test_rows_deleted_metric_exact(spark, token_table):
    """rows_deleted counts rows removed by final-D keys only — an
    update-only batch reports ZERO (the old rows_in+n_up-rows_out
    arithmetic counted every replaced row of an updated key)."""
    import datetime as dt

    t, base = token_table
    E = dt.datetime(2026, 1, 1)

    def mk(ordinal, op, key, toks):
        n = len(toks) if toks else None
        src = key.split(":")[0] if op != "D" else None
        return (ordinal, op, key, toks, n, src, E, 1, None, None)

    ks = [r[0] for r in base[:6]]
    # update-only batch
    b1 = [mk(i + 1, "U", ks[i], [7, 7]) for i in range(3)]
    r1 = merge_into(spark, t, changelog_df(spark, b1))
    assert r1.applied and r1.rows_upserted == 3
    assert r1.rows_deleted == 0
    # mixed batch: 2 real deletes + 1 delete of a nonexistent key
    b2 = [mk(10, "D", ks[3], None), mk(11, "D", ks[4], None),
          mk(12, "D", "ghost:0000000001", None), mk(13, "U", ks[5], [1])]
    r2 = merge_into(spark, t, changelog_df(spark, b2))
    assert r2.applied
    assert r2.rows_deleted == 2  # ghost delete removes nothing


def test_gtid_quiet_stream_does_not_regress_scalar_hwm(spark, token_table):
    """A GTID batch whose ordinals are far below the stored scalar mark
    must not regress the checkpoint property (stale scalar-mode
    redeliveries would re-apply after snapshot expiry)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from canal_spark.merge import merge_high_water_mark

    t, base = token_table
    E = dt.datetime(2026, 1, 1)
    ks = [r[0] for r in base[:4]]

    # scalar-mode batch establishes a high mark
    big = [(1_000_000, "U", ks[0], [1], 1, ks[0].split(":")[0], E, 1, None, None)]
    merge_into(spark, t, changelog_df(spark, big))
    assert merge_high_water_mark(t) == 1_000_000

    # GTID batch with small per-stream ordinals
    schema = changelog_df(spark, []).withColumn("stream_id", F.lit("x")).schema
    small = [(5, "U", ks[1], [2], 1, ks[1].split(":")[0], E, 1, None, None, "A")]
    merge_into(spark, t, spark.createDataFrame(small, schema))

    # property survives even after expiry drops the old summaries
    t.expire_snapshots(keep_last=1)
    assert merge_high_water_mark(t) == 1_000_000


def test_merge_on_clustered_table_preserves_tag_bounds_recluster(spark, token_table):
    """Steady state on a clustered table: the COW keep-side writes stay
    tagged (scan-order-preserving broadcast anti-join), so the next
    incremental cluster pass rewrites ONLY the batch's upsert files —
    the write-amplification contract at the 10^12-row design point."""
    from canal_spark.cluster import cluster, with_cluster_key

    t, base = token_table
    cluster(spark, t, target_file_rows=200, measure=False)
    assert all(e.sort_order == "zorder-v1" for e in t.files())

    rows = synth_changelog_rows(base, 200)
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    assert scan_dict(spark, t) == oracle_dict(base, rows)

    tagged = [e for e in t.files() if e.sort_order == "zorder-v1"]
    untagged = [e for e in t.files() if e.sort_order != "zorder-v1"]
    # keep-side rewrites kept the tag; only the upsert files are untagged
    assert len(tagged) > 0 and len(untagged) > 0
    assert sum(e.rows for e in untagged) <= 200  # batch-sized, not table-sized
    # per-source-file keep grouping keeps outputs stratum-pure: every
    # tagged file still pins its partition value (min == max on source)
    assert all(e.partition.get("source") for e in tagged)

    # tagged keep files remain curve-sorted runs per file
    df = with_cluster_key(
        t.read_files(spark, tagged, with_file_path="fp"),
        doc_col=t.key_cols, source_col="source",
    )
    by_fp = {}
    for r in df.select("fp", "_ckey").collect():
        by_fp.setdefault(r["fp"], []).append(r["_ckey"])
    for fp, keys in by_fp.items():
        assert keys == sorted(keys), f"keep file {fp} lost curve order"

    # the incremental cluster pass now touches only the upsert files
    z = cluster(spark, t, target_file_rows=200, measure=False)
    assert z.files_before == len(untagged)
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_merge_mixed_tags_does_not_claim_order(spark, token_table):
    """If the affected files don't all share one sort order, the keep
    side must fall back to the legacy doc_id sort, untagged."""
    from canal_spark.cluster import cluster

    t, base = token_table
    cluster(spark, t, target_file_rows=200, measure=False)
    # append an UNTAGGED file so affected files mix tags (doc_ids made
    # disjoint from the base set — same seed indexes would collide)
    from canal_spark.changelog import synth_token_rows
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    extra_rows = [
        (d.replace(":", ":x", 1), toks, n, src)
        for d, toks, n, src in synth_token_rows(100, seed=123)
    ]
    append(spark, t,
           spark.createDataFrame(extra_rows, TOKEN_TABLE_SCHEMA).repartition(1))
    base_plus = base + extra_rows

    rows = synth_changelog_rows(base_plus, 150)
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    # every affected file was rewritten; since tags were mixed the keep
    # writes are untagged (no file may lie about its internal order)
    # — the only possibly-tagged survivors are PRUNED (untouched) files
    pruned = res.files_pruned
    tagged = [e for e in t.files() if e.sort_order == "zorder-v1"]
    assert len(tagged) <= pruned
    assert scan_dict(spark, t) == oracle_dict(base_plus, rows)
