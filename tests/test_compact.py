"""Compaction: scan equality, sizing, partition separation, resume."""

from canal_spark import create_table
from canal_spark.changelog import base_table_df, synth_token_rows
from canal_spark.compact import compact, plan_bins
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.format import DataFile
from canal_spark.table.writer import append
from tests.conftest import scan_dict


def _fragmented(spark, root, n=1500, nfiles=25):
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, n).repartition(nfiles))
    return t


def test_plan_bins_respects_budget_and_partitions():
    def f(path, b, src):
        return DataFile(path=path, rows=10, bytes=b, partition={"source": src})

    entries = [f(f"a{i}", 100, "web") for i in range(6)] + [
        f(f"b{i}", 100, "code") for i in range(3)
    ]
    bins = plan_bins(entries, target_bytes=250, small_file_bytes=200)
    for members in bins:
        assert sum(e.bytes for e in members) <= 250
        assert len({str(e.partition) for e in members}) == 1  # no cross-partition mix
        assert len(members) >= 2


def test_plan_bins_skips_large_files():
    big = DataFile(path="big", rows=1, bytes=10_000, partition={})
    small = [DataFile(path=f"s{i}", rows=1, bytes=10, partition={}) for i in range(4)]
    bins = plan_bins([big] + small, target_bytes=100, small_file_bytes=50)
    packed = {e.path for m in bins for e in m}
    assert "big" not in packed and packed == {"s0", "s1", "s2", "s3"}


def test_compact_scan_equal_and_fewer_files(spark, tmp_table_root):
    t = _fragmented(spark, tmp_table_root)
    before = scan_dict(spark, t)
    n_before = len(t.files())
    res = compact(spark, t, target_bytes=1 << 20)
    assert res.files_removed > 0
    assert len(t.files()) < n_before
    assert scan_dict(spark, t) == before


def test_compact_idempotent_second_run(spark, tmp_table_root):
    t = _fragmented(spark, tmp_table_root)
    compact(spark, t, target_bytes=1 << 20)
    v = t.version
    res2 = compact(spark, t, target_bytes=1 << 20)
    # already-compacted files exceed the small-file threshold -> nothing to do
    assert res2.commits == 0 or res2.files_removed < 3
    assert t.version in (v, v + res2.commits)


def test_compact_chunked_commits_resume(spark, tmp_table_root):
    t = _fragmented(spark, tmp_table_root, n=2000, nfiles=30)
    before = scan_dict(spark, t)
    res = compact(spark, t, target_bytes=200 * 1024, max_bins_per_commit=1)
    assert res.commits == res.bins_written >= 2  # several atomic chunks
    assert scan_dict(spark, t) == before
    # time-travel: mid-compaction snapshot is still a consistent full table
    mid = res.snapshot_ids[0]
    assert len(scan_dict(spark, t, snapshot_id=mid)) == len(before)


def test_compact_by_token_budget(spark, tmp_table_root):
    t = _fragmented(spark, tmp_table_root)
    before = scan_dict(spark, t)
    res = compact(spark, t, target_bytes=1 << 20, pack_by="n_tok", tokens_per_target=40_000)
    assert scan_dict(spark, t) == before
    if res.bins_written:
        # every output file's token sum respects the budget (approximately:
        # bins were planned on exact sums)
        import pyspark.sql.functions as F

        sums = (
            t.scan(spark)
            .groupBy(F.col("source"))
            .agg(F.sum("n_tok"))
            .collect()
        )
        assert sums  # smoke: table intact per partition


def test_compact_pack_by_after_rename_validates_and_works(spark, tmp_table_root):
    """pack_by resolves against the CURRENT schema: the old name fails
    loudly after a rename; the new name packs fine (era-aware read)."""
    import pytest

    t = _fragmented(spark, tmp_table_root)
    before = scan_dict(spark, t)
    t.evolve_schema(rename=[("n_tok", "tok_len")])
    with pytest.raises(ValueError, match="n_tok"):
        compact(spark, t, target_bytes=1 << 20, pack_by="n_tok",
                tokens_per_target=40_000)
    res = compact(spark, t, target_bytes=1 << 20, pack_by="tok_len",
                  tokens_per_target=40_000)
    assert res.bins_written >= 1
    # scan intact modulo the rename (scan_dict expects the old name)
    rows = t.scan(spark).collect()
    assert len(rows) == len(before)
    assert "tok_len" in rows[0].asDict()


def test_compact_pack_by_all_null_weight_column(spark, tmp_table_root):
    """A weight column added AFTER files were written reads as NULL for
    those files (era projection) — packing by it must treat them as
    weight 0, not crash on int(None)."""
    t = _fragmented(spark, tmp_table_root)
    before = scan_dict(spark, t)
    t.evolve_schema(add=[("w", "long")])
    res = compact(spark, t, target_bytes=1 << 20, pack_by="w",
                  tokens_per_target=10)
    assert res.bins_written >= 1
    assert scan_dict(spark, t) == before


def test_plan_bins_zero_row_victim_missing_from_weights():
    """A zero-row (or fully-filtered) victim file produces no groupBy row
    in token_weights, so it is absent from the weights dict — plan_bins
    must pack it at weight 0, not crash with KeyError."""
    files = [DataFile(path=f"f{i}", rows=10, bytes=10, partition={})
             for i in range(3)]
    empty = DataFile(path="empty", rows=0, bytes=10, partition={})
    weights = {f.path: 100 for f in files}  # "empty" intentionally missing
    bins = plan_bins(files + [empty], target_bytes=1000, small_file_bytes=50,
                     weights=weights, target_weight=250)
    packed = {e.path for m in bins for e in m}
    assert "empty" in packed  # weight 0 -> packs for free
    for members in bins:
        assert sum(weights.get(e.path, 0) for e in members) <= 250


def test_compact_preserves_cluster_tag_and_curve_order(spark, tmp_table_root):
    """Bins whose members all carry the cluster tag are re-sorted by the
    CURVE key and stay tagged — the next incremental cluster pass must
    find nothing to rewrite (no cluster<->compact rewrite ping-pong)."""
    from canal_spark.cluster import cluster

    t = _fragmented(spark, tmp_table_root, n=1500, nfiles=25)
    before = scan_dict(spark, t)
    # many small TAGGED files
    cluster(spark, t, target_file_rows=100, measure=False)
    assert all(e.sort_order == "zorder-v1" for e in t.files())
    res = compact(spark, t, target_bytes=1 << 20)
    assert res.files_removed > 0
    assert scan_dict(spark, t) == before
    # tag survived compaction...
    assert all(e.sort_order == "zorder-v1" for e in t.files())
    # ...so a follow-up incremental cluster is a no-op
    z = cluster(spark, t, target_file_rows=100_000, measure=False)
    assert z.files_before == 0
    # and the compacted files are internally curve-sorted (the parquet
    # scan yields each file's rows in file order)
    from canal_spark.cluster import with_cluster_key

    df = with_cluster_key(
        t.read_files(spark, t.files(), with_file_path="fp"),
        doc_col=t.key_cols, source_col="source",
    )
    by_fp = {}
    for r in df.select("fp", "_ckey").collect():
        by_fp.setdefault(r["fp"], []).append(r["_ckey"])
    for fp, keys in by_fp.items():
        assert keys == sorted(keys), f"file {fp} not curve-sorted"


def test_compact_mixed_tags_falls_back_untagged(spark, tmp_table_root):
    """A bin mixing tagged and untagged files cannot claim a sort order:
    output is doc_id-sorted and untagged (legacy path)."""
    from canal_spark.changelog import synth_token_rows
    from canal_spark.cluster import cluster
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    t = _fragmented(spark, tmp_table_root, n=800, nfiles=10)
    before = scan_dict(spark, t)
    cluster(spark, t, target_file_rows=100, measure=False)
    # append fresh UNTAGGED rows into the same partitions (ids disjoint
    # from the base set — same seed indexes would collide)
    extra_rows = [
        (d.replace(":", ":x", 1), toks, n, src)
        for d, toks, n, src in synth_token_rows(200, seed=99)
    ]
    append(spark, t,
           spark.createDataFrame(extra_rows, TOKEN_TABLE_SCHEMA).repartition(4))
    n_extra = len(extra_rows)
    res = compact(spark, t, target_bytes=1 << 20)
    assert res.files_removed > 0
    after = scan_dict(spark, t)
    assert len(after) == len(before) + n_extra
    # bins that coalesced tagged+untagged members are untagged; bins of
    # only tagged members stay tagged — no file may LIE about its order
    # (we can't easily identify which is which post-hoc, so assert the
    # invariant the other way: every tagged file is curve-sorted)
    from canal_spark.cluster import with_cluster_key

    tagged = [e for e in t.files() if e.sort_order == "zorder-v1"]
    if tagged:
        df = with_cluster_key(
            t.read_files(spark, tagged, with_file_path="fp"),
            doc_col=t.key_cols, source_col="source",
        )
        by_fp = {}
        for r in df.select("fp", "_ckey").collect():
            by_fp.setdefault(r["fp"], []).append(r["_ckey"])
        for fp, keys in by_fp.items():
            assert keys == sorted(keys), f"tagged file {fp} not curve-sorted"
