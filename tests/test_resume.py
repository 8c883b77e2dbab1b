"""Crash-resume: kill between phases, re-run, assert idempotence —
the MemoryEventStoreRollbackAndAckTest analogue (SURVEY.md §5c)."""

from canal_spark import load_table
from canal_spark.changelog import changelog_df, synth_changelog_rows


def test_gtid_two_stream_resume(spark, token_table):
    """GTID-mode positions (MysqlEventParser.java:422-521): two
    interleaved streams with independent, overlapping ordinal sequences
    checkpoint per-stream; a redelivery mixing replayed stream-A rows
    with new stream-B rows applies ONLY the new B rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from canal_spark.merge import merge_gtid_set, merge_into

    t, base = token_table
    E = dt.datetime(2026, 1, 1)

    def mk(stream, ordinal, key, toks):
        return (ordinal, "U", key, toks, len(toks), key.split(":")[0], E, 1,
                None, None, stream)

    ks = [r[0] for r in base[:6]]
    schema = changelog_df(spark, []).withColumn(
        "stream_id", F.lit("x")
    ).schema

    # batch 1: A ords 1..3 touch ks[0..2]; B ords 1..2 touch ks[3..4]
    b1 = [mk("A", i + 1, ks[i], [10 + i]) for i in range(3)] + [
        mk("B", i + 1, ks[3 + i], [20 + i]) for i in range(2)
    ]
    res1 = merge_into(spark, t, spark.createDataFrame(b1, schema))
    assert res1.applied
    assert merge_gtid_set(t) == {"A": 3, "B": 2}

    # batch 2: replay of A:2..3 (stale) + new B:3 and A:4
    b2 = [
        mk("A", 2, ks[1], [99]),       # stale -> filtered by A's mark
        mk("A", 3, ks[2], [99]),       # stale
        mk("A", 4, ks[0], [40]),       # new
        mk("B", 3, ks[5], [30]),       # new (B's mark is 2)
    ]
    res2 = merge_into(spark, t, spark.createDataFrame(b2, schema))
    assert res2.applied
    assert merge_gtid_set(t) == {"A": 4, "B": 3}
    got = {r["doc_id"]: list(r["tokens"]) for r in t.scan(spark)
           .where(F.col("doc_id").isin(ks)).collect()}
    assert got[ks[0]] == [40]       # A:4 applied
    assert got[ks[1]] == [11]       # stale replay did NOT overwrite
    assert got[ks[2]] == [12]
    assert got[ks[5]] == [30]       # new B row applied

    # full replay of both batches: per-stream marks filter everything
    res3 = merge_into(spark, t, spark.createDataFrame(b1 + b2, schema))
    assert not res3.applied


def test_gtid_null_stream_id_checkpoints_and_filters(spark, token_table):
    """A null stream_id must checkpoint under a sentinel stream and be
    filtered by it on replay — not silently re-applied.  (JSON turns a
    None key into the string \"null\" while gmap[null] -> null -> 0 on
    the filter side, so without normalization a stale redelivery of
    null-stream rows overwrites newer state.)"""
    import datetime as dt

    from pyspark.sql import functions as F

    from canal_spark.merge import NULL_STREAM, merge_gtid_set, merge_into

    t, base = token_table
    E = dt.datetime(2026, 1, 1)

    def mk(stream, ordinal, key, toks):
        return (ordinal, "U", key, toks, len(toks), key.split(":")[0], E, 1,
                None, None, stream)

    ks = [r[0] for r in base[:3]]
    schema = changelog_df(spark, []).withColumn(
        "stream_id", F.lit(None).cast("string")  # nullable stream_id
    ).schema

    # batch 1: named stream A + a NULL stream
    b1 = [mk("A", 1, ks[0], [1]), mk(None, 1, ks[1], [2]),
          mk(None, 2, ks[2], [3])]
    assert merge_into(spark, t, spark.createDataFrame(b1, schema)).applied
    assert merge_gtid_set(t) == {"A": 1, NULL_STREAM: 2}

    # newer null-stream write...
    b2 = [mk(None, 3, ks[1], [22])]
    assert merge_into(spark, t, spark.createDataFrame(b2, schema)).applied

    # ...then a stale redelivery of the ORIGINAL null-stream rows: must
    # be a no-op (filtered by the sentinel stream's mark), never an
    # overwrite of the newer value
    res = merge_into(spark, t, spark.createDataFrame(b1, schema))
    assert not res.applied
    got = {r["doc_id"]: list(r["tokens"]) for r in t.scan(spark)
           .where(F.col("doc_id").isin(ks)).collect()}
    assert got[ks[1]] == [22]
    assert merge_gtid_set(t) == {"A": 1, NULL_STREAM: 3}
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


def test_legacy_null_gtid_key_migrates_to_sentinel(spark, token_table):
    """Marks written before the NULL_STREAM sentinel stored the null
    stream under JSON key \"null\"; merge_gtid_set must read them as the
    sentinel so upgraded tables keep filtering stale null-stream
    redeliveries."""
    import datetime as dt

    from pyspark.sql import functions as F

    from canal_spark.merge import GTID_KEY, NULL_STREAM, merge_gtid_set, merge_into

    t, base = token_table
    # simulate a pre-upgrade checkpoint: the property as old code wrote it
    t.commit(added=[], operation="properties",
             new_properties={GTID_KEY: {"null": 7}})
    assert merge_gtid_set(t) == {NULL_STREAM: 7}

    E = dt.datetime(2026, 1, 1)
    schema = changelog_df(spark, []).withColumn(
        "stream_id", F.lit(None).cast("string")
    ).schema
    k = base[0][0]
    stale = [(5, "U", k, [99], 1, k.split(":")[0], E, 1, None, None, None)]
    # ordinal 5 <= legacy mark 7 -> filtered, no overwrite
    assert not merge_into(spark, t, spark.createDataFrame(stale, schema)).applied
    fresh = [(9, "U", k, [42], 1, k.split(":")[0], E, 1, None, None, None)]
    assert merge_into(spark, t, spark.createDataFrame(fresh, schema)).applied
    assert merge_gtid_set(t) == {NULL_STREAM: 9}


def _u(ordinal, key, toks, source, es=None):
    import datetime as dt

    return (ordinal, "U", key, toks, len(toks), source,
            es or dt.datetime(2026, 1, 1), 1, None, None)


def test_rollback_resets_position_for_redelivery(spark, token_table):
    """The C4 contract end-to-end: apply a good batch, apply a BAD
    batch, rollback_to the good snapshot — the resume marks rewind with
    the data (position-reset boundary), so redelivering the fixed batch
    APPLIES instead of filtering to an eternal no-op."""
    from canal_spark.merge import merge_high_water_mark, merge_into

    t, base = token_table
    k1, k2 = base[0][0], base[1][0]
    src1, src2 = base[0][3], base[1][3]

    r1 = merge_into(spark, t, changelog_df(spark, [_u(10, k1, [1, 2], src1)]))
    assert r1.applied and merge_high_water_mark(t) == 10
    good = t.current_snapshot_id

    # the bad batch: wrong tokens, hwm advances to 20
    r2 = merge_into(spark, t, changelog_df(spark, [_u(20, k2, [666], src2)]))
    assert r2.applied and merge_high_water_mark(t) == 20

    t.rollback_to(good)
    # marks rewound WITH the data; the bad summary no longer counts
    assert merge_high_water_mark(t) == 10
    got = {r["doc_id"]: list(r["tokens"]) for r in
           t.scan(spark).where(f"doc_id = '{k2}'").collect()}
    assert got[k2] != [666]

    # redelivery of the FIXED batch at the same ordinal applies
    r3 = merge_into(spark, t, changelog_df(spark, [_u(20, k2, [7, 8], src2)]))
    assert r3.applied and merge_high_water_mark(t) == 20
    got = {r["doc_id"]: list(r["tokens"]) for r in
           t.scan(spark).where(f"doc_id = '{k2}'").collect()}
    assert got[k2] == [7, 8]


def test_rollback_reset_survives_expiry_with_pinned_old_tag(spark, token_table):
    """A tag pinning a PRE-rollback snapshot must not resurrect its
    marks after snapshot expiry: the reset boundary is pinned by
    expire_snapshots and the reset lookup tolerates chain holes —
    otherwise hwm would jump back to the rolled-back value and the
    redelivered ordinals would be swallowed forever."""
    from canal_spark.merge import merge_high_water_mark, merge_into

    t, base = token_table
    k1, k2, k3 = base[0][0], base[1][0], base[2][0]
    s1, s2, s3 = base[0][3], base[1][3], base[2][3]

    merge_into(spark, t, changelog_df(spark, [_u(10, k1, [1], s1)]))
    good = t.current_snapshot_id
    merge_into(spark, t, changelog_df(spark, [_u(500, k2, [666], s2)]))
    # the bad (hwm=500) snapshot is pinned by a training-set tag
    t.set_tag("train-v1", t.current_snapshot_id)
    t.rollback_to(good)
    assert merge_high_water_mark(t) == 10
    # post-rollback life continues, then aggressive expiry
    merge_into(spark, t, changelog_df(spark, [_u(120, k3, [3], s3)]))
    assert merge_high_water_mark(t) == 120
    t.expire_snapshots(keep_last=1)
    t.refresh()
    # the tagged hwm=500 summary is retained — but the pinned reset
    # keeps it out of the mark scan: 120, never 500
    assert merge_high_water_mark(t) == 120
    # ordinals in (120, 500] remain deliverable
    r = merge_into(spark, t, changelog_df(spark, [_u(300, k2, [7], s2)]))
    assert r.applied and merge_high_water_mark(t) == 300


def test_stale_handle_pure_insert_merge_conflicts(spark, token_table):
    """Exactly-once for PURE-ADD merges: a second driver holding a
    stale handle replays the same all-new-keys changelog — the
    checkpoint CAS conflicts the commit instead of silently
    double-applying (no files are removed, so the manifest checks alone
    cannot catch it)."""
    import pytest as _pytest

    from canal_spark import load_table
    from canal_spark.merge import merge_into
    from canal_spark.table.format import CommitConflict

    t, base = token_table
    stale = load_table(t.root)  # second driver's handle, planned early
    cl = [_u(100, "brand-new-key-%d" % i, [i], "src0") for i in range(5)]

    assert merge_into(spark, t, changelog_df(spark, cl)).applied
    with _pytest.raises(CommitConflict, match="advanced since planning"):
        merge_into(spark, stale, changelog_df(spark, cl))
    # the winning apply is intact, exactly once
    n = t.scan(spark).where("doc_id like 'brand-new-key-%'").count()
    assert n == 5


def test_null_key_changelog_rejected_loudly(spark, token_table):
    """A NULL-key event is poison (unmatchable forever, crashes the
    driver key paths) — the merge rejects the batch with a diagnosable
    error instead of a TypeError deep in np.sort."""
    import pytest as _pytest

    from canal_spark.merge import merge_into

    from pyspark.sql import functions as F

    t, base = token_table
    k, src = base[0][0], base[0][3]
    good = changelog_df(spark, [_u(70, k, [1], src)])
    # CHANGELOG_SCHEMA itself forbids null doc_id at construction — the
    # poison arrives through external frames (nullable parquet), modeled
    # here by relaxing the column
    bad = changelog_df(spark, [_u(71, k, [2], src)]).withColumn(
        "doc_id", F.lit(None).cast("string")
    )
    with _pytest.raises(ValueError, match="NULL key"):
        merge_into(spark, t, good.unionByName(bad))
