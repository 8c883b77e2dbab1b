"""Bloom-sidecar file skipping: filter math, merge membership pruning
on an interleaved layout (where range pruning is useless), sidecar GC
atomicity, and conservative degradation without sidecars."""

import glob
import os

import numpy as np
import pytest

from canal_spark import create_table
from canal_spark.changelog import base_table_df, changelog_df, synth_token_rows
from canal_spark.merge import merge_into
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table import bloom
from canal_spark.table.writer import append
from tests.conftest import oracle_dict, scan_dict

import datetime as dt

E = dt.datetime(2026, 1, 1)


# --- filter math --------------------------------------------------------------


def test_bloom_no_false_negatives_and_low_fpp():
    keys = [f"src:{i:010d}" for i in range(1000)]
    m = bloom.size_bits(len(keys))
    bits = bloom.build_bits(bloom.key_hashes(keys), m)
    for k in keys[::37]:  # every inserted key must be maybe-present
        assert bloom.probe_any(bits, m, bloom.key_hashes([k]))
    absent = [f"other:{i:010d}" for i in range(10_000)]
    h = bloom.key_hashes(absent)
    fp = sum(bloom.probe_any(bits, m, h[i : i + 1]) for i in range(len(absent)))
    assert fp / len(absent) < 0.03  # ~0.8% design point, 3% ceiling


def test_bloom_sidecar_roundtrip(tmp_path):
    p = str(tmp_path / "f.parquet")
    marker = bloom.write_sidecar(p, ["a", "b", "c"])
    m, bits = bloom.load_sidecar(p)
    assert m == marker["m"]
    assert bloom.probe_any(bits, m, bloom.key_hashes(["b"]))
    assert not bloom.probe_any(bits, m, np.empty((0, 2), dtype=np.uint64))


def test_load_sidecar_missing_or_corrupt(tmp_path):
    p = str(tmp_path / "g.parquet")
    assert bloom.load_sidecar(p) is None
    with open(bloom.sidecar_path(p), "wb") as f:
        f.write(b"junkjunkjunk")
    assert bloom.load_sidecar(p) is None  # conservative, never an error


def test_load_sidecar_rejects_payload_corruption(tmp_path):
    """A flipped bit INSIDE a correctly-sized payload is the dangerous
    case: without the crc it reads as a valid filter that can false-
    negative (file wrongly pruned => silently lost delete).  v2 must
    reject it entirely, degrading to range-only pruning."""
    p = str(tmp_path / "h.parquet")
    bloom.write_sidecar(p, ["a", "b", "c"])
    side = bloom.sidecar_path(p)
    raw = bytearray(open(side, "rb").read())
    raw[-1] ^= 0xFF  # corrupt payload, keep length + header intact
    open(side, "wb").write(bytes(raw))
    assert bloom.load_sidecar(p) is None
    # truncation (header intact, payload short) also rejected
    bloom.write_sidecar(p, ["a", "b", "c"])
    raw = open(side, "rb").read()
    open(side, "wb").write(raw[:-8])
    assert bloom.load_sidecar(p) is None


def test_load_sidecar_rejects_v1_format(tmp_path):
    """Pre-crc sidecars (magic CSBF1, 5-byte header) read as None —
    safe degradation; bloom.backfill() is the documented upgrade."""
    import struct

    p = str(tmp_path / "i.parquet")
    m = bloom.size_bits(3)
    bits = bloom.build_bits(bloom.key_hashes(["a", "b", "c"]), m)
    with open(bloom.sidecar_path(p), "wb") as f:
        f.write(b"CSBF1")
        f.write(struct.pack("<IB", m, bloom.K_PROBES))
        f.write(bits.tobytes())
    assert bloom.load_sidecar(p) is None


# --- merge integration ---------------------------------------------------------


@pytest.fixture()
def bloom_table(spark, tmp_table_root):
    """Interleaved layout: 12 files, each a hash-random subset of keys,
    so every file's doc_id [min, max] straddles nearly every key —
    range pruning alone keeps ALL files affected."""
    t = create_table(
        tmp_table_root,
        TOKEN_TABLE_SCHEMA,
        partition_by=["source"],
        properties={"write.bloom.col": "doc_id"},
    )
    base = synth_token_rows(1200)
    append(spark, t, base_table_df(spark, 1200).repartition(12))
    return t, base


def test_point_delete_prunes_by_membership(spark, bloom_table):
    t, base = bloom_table
    n_files = len(t.files())
    assert n_files >= 10
    # every data file carries a sidecar + manifest marker
    for e in t.files():
        assert os.path.exists(bloom.sidecar_path(os.path.join(t.root, e.path)))
        assert "bloom" in e.stats["doc_id"]
    victims = [base[7][0], base[500][0], base[1100][0]]
    rows = [(i + 1, "D", k, None, None, None, E, 1) for i, k in enumerate(victims)]
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    assert scan_dict(spark, t) == oracle_dict(base, rows)
    # 3 point keys live in at most 3 files; range pruning would rewrite
    # all 12 (interleaved layout).  Allow +2 slack for bloom fps.
    assert res.files_rewritten <= 5
    assert res.files_pruned >= n_files - 5
    assert res.rows_deleted == 3
    # observability: the bloom-specific prune count is surfaced (ranges
    # prune nothing on this layout, so every prune is membership)
    assert res.extra.get("files_pruned_bloom", 0) == res.files_pruned


def test_update_then_scan_golden(spark, bloom_table):
    t, base = bloom_table
    k, src = base[3][0], base[3][3]
    rows = [
        (1, "U", k, [1, 2, 3], 3, src, E, 1),
        (2, "I", "zzz:new", [5], 1, src, E, 1),
    ]
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    assert scan_dict(spark, t) == oracle_dict(base, rows)
    assert res.files_rewritten <= 3  # the one true file + fp slack
    # files written by the merge itself got fresh sidecars
    for e in t.files():
        assert os.path.exists(bloom.sidecar_path(os.path.join(t.root, e.path)))


def test_without_property_no_sidecars_and_conservative(spark, token_table):
    t, base = token_table  # plain fixture: bloom property unset
    assert not glob.glob(os.path.join(t.root, "data", "**", "*.bloom"),
                         recursive=True)
    rows = [(1, "D", base[0][0], None, None, None, E, 1)]
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    assert scan_dict(spark, t) == oracle_dict(base, rows)


# --- GC atomicity ---------------------------------------------------------------


def _stray_blooms(root):
    return [
        p
        for p in glob.glob(os.path.join(root, "data", "**", "*.bloom"), recursive=True)
        if not os.path.exists(p[: -len(".bloom")])
    ]


def test_expire_removes_sidecars_with_data(spark, bloom_table):
    t, base = bloom_table
    rows = [(1, "U", base[0][0], [9], 1, base[0][3], E, 1)]
    merge_into(spark, t, changelog_df(spark, rows))
    t.expire_snapshots(keep_last=1, delete_orphans=True)
    assert _stray_blooms(t.root) == []
    # live files keep their sidecars
    for e in t.files():
        assert os.path.exists(bloom.sidecar_path(os.path.join(t.root, e.path)))


def test_orphan_sweep_collects_stray_blooms(spark, bloom_table):
    t, _ = bloom_table
    stray = os.path.join(t.root, "data", "stray.parquet.bloom")
    with open(stray, "wb") as f:
        f.write(b"x")
    old = os.path.getmtime(stray) - 10 * 24 * 3600
    os.utime(stray, (old, old))
    t.remove_orphan_files(older_than_s=24 * 3600)
    assert not os.path.exists(stray)


# --- property DDL: opt in on an existing table -----------------------------------


def test_set_properties_enables_bloom_on_existing_table(spark, token_table):
    t, base = token_table  # built WITHOUT the bloom property
    # pre-DDL files have no sidecars (range-only pruning for them)
    assert not glob.glob(os.path.join(t.root, "data", "**", "*.bloom"),
                         recursive=True)
    t.set_properties({"write.bloom.col": "doc_id"})
    assert t.properties["write.bloom.col"] == "doc_id"
    rows = [(1, "U", base[0][0], [4, 2], 2, base[0][3], E, 1)]
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    # every file the merge wrote carries a sidecar (on the interleaved
    # fixture the 1-key range straddles all files, so all rewrite —
    # exactly the case the NEXT point batch now prunes by membership)
    new_files = {e.path for e in t.files()}
    assert new_files and all(
        os.path.exists(bloom.sidecar_path(os.path.join(t.root, p)))
        for p in new_files
    )
    t.set_properties(remove=["write.bloom.col"])
    assert "write.bloom.col" not in t.properties


def test_set_properties_guards(spark, token_table):
    t, _ = token_table
    with pytest.raises(ValueError, match="checkpoint state"):
        t.set_properties({"merge-hwm-ordinal": 99})
    with pytest.raises(ValueError, match="key-cols"):
        t.set_properties({"key-cols": "other"})
    # a no-op key-cols "change" to the current value is allowed
    t.set_properties({"key-cols": "doc_id"})


# --- backfill: sidecars for pre-property files -----------------------------------


def test_backfill_annotates_history_and_enables_pruning(spark, token_table):
    t, base = token_table  # 12 interleaved files, NO bloom property
    t.set_properties({"write.bloom.col": "doc_id"})
    before_rows = scan_dict(spark, t)
    out = bloom.backfill(spark, t)
    assert out["annotated"] == len(t.files())
    assert out["already"] == 0
    # replace snapshot: identical data, markers registered
    assert scan_dict(spark, t) == before_rows
    for e in t.files():
        assert "bloom" in e.stats["doc_id"]
        assert os.path.exists(bloom.sidecar_path(os.path.join(t.root, e.path)))
    # idempotent
    again = bloom.backfill(spark, t)
    assert again["annotated"] == 0 and again["already"] == len(t.files())
    # format upgrade path: a stale-version marker is re-annotated
    e0 = t.files()[0]
    t.annotate_entry_stats(
        {e0.path: {"doc_id": {"bloom": {"m": 2048, "k": 7}}}}  # no "v"
    )
    up = bloom.backfill(spark, t)
    assert up["annotated"] == 1
    assert all(
        e.stats["doc_id"]["bloom"].get("v") == bloom.MARKER_VERSION
        for e in t.files()
    )
    # and the NEXT point delete prunes by membership on old files
    victims = [base[3][0], base[800][0]]
    rows = [(i + 1, "D", k, None, None, None, E, 1) for i, k in enumerate(victims)]
    res = merge_into(spark, t, changelog_df(spark, rows))
    assert res.applied
    assert scan_dict(spark, t) == oracle_dict(base, rows)
    assert res.extra.get("files_pruned_bloom", 0) >= 8
    assert res.files_rewritten <= 4


def test_backfill_requires_property(spark, token_table):
    t, _ = token_table
    with pytest.raises(ValueError, match="write.bloom.col"):
        bloom.backfill(spark, t)


def test_backfill_conflict_on_concurrent_commit(spark, token_table):
    from canal_spark.table.format import CommitConflict
    from canal_spark import load_table

    t, base = token_table
    t.set_properties({"write.bloom.col": "doc_id"})
    # simulate a racing writer between plan and commit: annotate against
    # a stale handle after another commit moved the snapshot
    stale = load_table(t.root)
    entries = stale.all_entries()
    rows = [(1, "U", base[0][0], [7], 1, base[0][3], E, 1)]
    merge_into(spark, t, changelog_df(spark, rows))
    with pytest.raises(CommitConflict):
        # bypass backfill's refresh to exercise the commit-time guard
        stale.annotate_entry_stats({entries[0].path: {"doc_id": {"bloom": {"m": 2048, "k": 7}}}})


def test_full_pass_preserves_sidecar_invariant(spark, bloom_table):
    """merge -> cluster -> compact -> expire on a bloom table: every
    phase writes through write_datafiles, so every surviving file keeps
    a sidecar + marker and no stray sidecars accumulate."""
    from canal_spark.maintenance import run_pass
    from canal_spark.changelog import synth_changelog_rows

    t, base = bloom_table
    rows = synth_changelog_rows(base, 200)
    run_pass(spark, t, changelog_df(spark, rows),
             target_file_bytes=1 << 20, target_file_rows=400,
             keep_snapshots=2, measure=False)
    assert scan_dict(spark, t) == oracle_dict(base, rows)
    for e in t.files():
        assert "bloom" in e.stats["doc_id"]
        assert os.path.exists(bloom.sidecar_path(os.path.join(t.root, e.path)))
    assert _stray_blooms(t.root) == []


def test_point_lookup_scan_prunes_by_membership(spark, bloom_table):
    """Read-side twin: scan(range_filter={key: (v, v)}) opens only the
    files whose bloom says maybe-present — on the interleaved layout
    ranges alone keep all 12 files."""
    t, base = bloom_table
    k = base[42][0]
    df = t.scan(spark, range_filter={"doc_id": (k, k)}).where(
        f"doc_id = '{k}'"
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == k
    # count files the pruned scan actually reads: re-run the pruning
    from canal_spark.table.format import prune_files

    range_only = prune_files(t.files(), None, {"doc_id": (k, k)})
    assert len(range_only) >= 10  # ranges alone can't prune this layout
    assert len(t.scan(spark, range_filter={"doc_id": (k, k)}).inputFiles()) <= 3


def test_point_lookup_scan_never_misses(spark, bloom_table):
    """No false negatives: every key is found through the bloom-pruned
    point scan (spot check across the key space)."""
    t, base = bloom_table
    for i in (0, 311, 599, 887, 1199):
        k = base[i][0]
        got = t.scan(spark, range_filter={"doc_id": (k, k)}).where(
            f"doc_id = '{k}'"
        ).count()
        assert got == 1, k
