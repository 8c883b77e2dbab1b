"""Clustering: curve-kernel properties + clustered-rewrite invariants."""

import numpy as np
import pytest

from canal_spark.cluster import (
    cluster,
    hilbert_index_2d,
    morton_interleave,
    measure_tightness,
    with_cluster_key,
)
from tests.conftest import scan_dict


# ---- kernel property tests (pure numpy, no Spark) -------------------------


def test_morton_known_values():
    a = np.array([0, 1, 2, 3], dtype=np.uint64)
    z = morton_interleave(a, np.zeros(4, dtype=np.uint64), bits=2)
    assert z.tolist() == [0, 2, 8, 10]  # a-bits land on odd positions
    z2 = morton_interleave(np.zeros(4, dtype=np.uint64), a, bits=2)
    assert z2.tolist() == [0, 1, 4, 5]


def test_morton_locality_monotone_blocks():
    """Within one source cell, morton order == hash order (monotone)."""
    h = np.arange(1024, dtype=np.uint64)
    z = morton_interleave(np.zeros(1024, dtype=np.uint64), h, bits=31)
    assert (np.diff(z.astype(np.int64)) > 0).all()


def test_hilbert_bijective_and_adjacent():
    n = 64
    x, y = np.meshgrid(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64))
    d = hilbert_index_2d(x.ravel(), y.ravel(), bits=6)
    assert len(np.unique(d)) == n * n  # bijection
    # the defining property: consecutive curve positions are grid-adjacent
    order = np.argsort(d)
    xs, ys = x.ravel()[order].astype(int), y.ravel()[order].astype(int)
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (step == 1).all()


def test_curve_keys_fit_signed_int64():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 31, size=1000, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, size=1000, dtype=np.uint64)
    for arr in (morton_interleave(a, b), hilbert_index_2d(a, b)):
        assert (arr.view(np.int64) >= 0).all()


# ---- Spark-side -----------------------------------------------------------


def test_cluster_key_column_deterministic(spark, token_table):
    t, _ = token_table
    df = with_cluster_key(t.scan(spark), curve="zorder")
    a = {r["doc_id"]: r["_ckey"] for r in df.select("doc_id", "_ckey").collect()}
    b = {r["doc_id"]: r["_ckey"] for r in df.select("doc_id", "_ckey").collect()}
    assert a == b and all(v >= 0 for v in a.values())


@pytest.mark.parametrize("curve", ["zorder", "hilbert"])
def test_cluster_rewrite_scan_equal_and_tighter(spark, token_table, curve):
    t, _ = token_table
    before_state = scan_dict(spark, t)
    res = cluster(spark, t, curve=curve, target_file_rows=200)
    assert scan_dict(spark, t) == before_state
    assert res.files_after >= 1
    # tightness must improve vs the hash-random base layout
    assert (
        res.tightness_after["hash_range"] < res.tightness_before["hash_range"]
    ), (res.tightness_before, res.tightness_after)
    # quantitative bound: bins are equal-width slices of the SAME
    # top-31-bit domain the curve sorts by, so per-file hash range is
    # ~1/bins-per-stratum (1200 rows / 4 sources / 200 target = 2 bins
    # per stratum -> ~0.5), never the ~0.77 a wrong-domain bin yields
    assert res.tightness_after["hash_range"] <= 0.6, res.tightness_after
    # analytic equal-width bins on a hash-uniform key must yield
    # balanced files without any sampling pass (binomial spread only)
    sizes = [e.rows for e in t.files()]
    if len(sizes) >= 3:
        assert max(sizes) <= 3 * min(sizes), sizes


def test_cluster_bins_are_disjoint_and_tight(spark, token_table):
    """Files within a stratum cover disjoint, contiguous slices of the
    hash dimension; per-file normalized range ~ 1/bins-per-stratum."""
    t, _ = token_table
    res = cluster(spark, t, curve="zorder", target_file_rows=40)
    # 1200 rows / 4 sources = ~300 rows/stratum -> ~8 bins/stratum;
    # expected per-file hash range ~1/8 = 0.125 (+binomial edge noise)
    assert res.tightness_after["hash_range"] < 0.2, res.tightness_after
    # disjointness: per-file (source, hash) intervals must not overlap
    from pyspark.sql import functions as F

    per_file = (
        t.read_files(spark, t.files(), with_file_path="fp")
        .select(
            "fp",
            "source",
            F.shiftrightunsigned(F.xxhash64("doc_id"), 33).alias("bh"),
        )
        .groupBy("fp", "source")
        .agg(F.min("bh").alias("mn"), F.max("bh").alias("mx"))
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in per_file:
        by_src.setdefault(r["source"], []).append((r["mn"], r["mx"]))
    for src, spans in by_src.items():
        spans.sort()
        for (m1, x1), (m2, _x2) in zip(spans, spans[1:]):
            assert x1 < m2, (src, spans)


def test_cluster_improves_source_locality(spark, token_table):
    t, _ = token_table
    res = cluster(spark, t, curve="zorder", target_file_rows=150)
    assert (
        res.tightness_after["sources_per_file"]
        <= res.tightness_before["sources_per_file"]
    )


def test_measure_tightness_shape(spark, token_table):
    t, _ = token_table
    m = measure_tightness(spark, t)
    assert set(m) == {"hash_range", "sources_per_file", "files"}
    assert 0.0 <= m["hash_range"] <= 1.0


def test_incremental_cluster_skips_tagged_files(spark, token_table):
    """Second incremental pass with no new data is a no-op; after a
    merge adds files, only the untagged files rewrite (O(new data),
    never a full-table re-sort)."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows
    from canal_spark.cluster import cluster
    from canal_spark.merge import merge_into
    from tests.conftest import oracle_dict, scan_dict

    table, base = token_table
    r1 = cluster(spark, table, target_file_rows=300, measure=False)
    assert r1.files_before > 0
    snap_after_first = table.current_snapshot_id

    # no new data -> incremental pass does nothing, no new snapshot
    r2 = cluster(spark, table, target_file_rows=300, measure=False)
    assert r2.files_before == 0
    assert table.current_snapshot_id == snap_after_first

    # merge writes new (untagged) files; only those re-cluster
    rows = synth_changelog_rows(base, 200, seed=71)
    m = merge_into(spark, table, changelog_df(spark, rows), target_file_rows=300)
    table_files = {e.path: e.sort_order for e in table.refresh().files()}
    untagged = [p for p, s in table_files.items() if s != "zorder-v1"]
    assert m.applied and untagged

    r3 = cluster(spark, table, target_file_rows=300, measure=False)
    assert r3.files_before == len(untagged)

    # every file tagged now, scan still equals the oracle
    assert all(e.sort_order == "zorder-v1" for e in table.refresh().files())
    assert scan_dict(spark, table) == oracle_dict(base, rows)

    # full scope still rewrites everything
    r4 = cluster(spark, table, target_file_rows=300, measure=False, scope="full")
    assert r4.files_before == len(table.refresh().files()) or r4.files_before > 0
