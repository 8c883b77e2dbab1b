"""Duplicated-span excision as a maintenance phase (canal_spark/dupspan.py)."""

import pytest
from pyspark.sql import functions as F

from canal_spark import create_table
from canal_spark.dupspan import dup_span_cut_pass
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.writer import append

RUN = [9001, 9002, 9003, 9004, 9005, 9006]  # the shared boilerplate run
W = 4


def _uniq(doc_n, length):
    # per-doc unique filler tokens, no cross-doc w-gram can collide
    return [doc_n * 1000 + i for i in range(length)]


def _mk_table(spark, root, with_pure_dup_doc=True):
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    rows = []
    for n in (1, 3, 11, 13):
        rows.append((f"s:{n:03d}", _uniq(n, 8) + RUN, 8 + len(RUN), "s"))
    for n in (2, 4, 5):
        rows.append((f"s:{n:03d}", _uniq(n, 10), 10, "s"))
    if with_pure_dup_doc:
        rows.append(("s:100", list(RUN), len(RUN), "s"))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    append(spark, t, df)
    return t, {r[0]: r[1] for r in rows}


def _scan(spark, t):
    return {
        r["doc_id"]: list(r["tokens"]) for r in t.scan(spark).collect()
    }


def test_keep_one_keeps_first_copy_and_cuts_rest(spark, tmp_table_root):
    t, orig = _mk_table(spark, tmp_table_root)
    res = dup_span_cut_pass(spark, t, w=W, max_cut_fraction=0.99)
    assert res.applied and not res.dry_run
    got = _scan(spark, t)
    # smallest doc_id containing the run keeps it ("s:001" < "s:003" < "s:100")
    assert got["s:001"] == orig["s:001"]
    for d in ("s:003", "s:011", "s:013"):
        assert got[d] == orig[d][:8], d  # run excised, filler intact
    # the pure-duplicate doc is fully excised -> DELETEd
    assert "s:100" not in got
    assert res.docs_deleted == 1
    assert res.docs_affected == 4
    assert res.tokens_removed == 3 * len(RUN) + len(RUN)
    # untouched docs intact
    for d in ("s:002", "s:004", "s:005"):
        assert got[d] == orig[d]
    # n_tok stays consistent with the rewritten arrays
    bad = t.scan(spark).where(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0

    # idempotent: the survivor's copy is single now -> second pass no-op
    snap = t.current_snapshot_id
    res2 = dup_span_cut_pass(spark, t, w=W, max_cut_fraction=0.99)
    assert res2.docs_affected == 0 and not res2.applied
    assert t.current_snapshot_id == snap


def test_keep_all_excises_every_copy(spark, tmp_table_root):
    t, orig = _mk_table(spark, tmp_table_root)
    res = dup_span_cut_pass(
        spark, t, w=W, keep_one=False, max_cut_fraction=0.99
    )
    assert res.applied
    got = _scan(spark, t)
    for d in ("s:001", "s:003", "s:011", "s:013"):
        assert got[d] == orig[d][:8], d
    assert "s:100" not in got
    assert res.docs_affected == 5 and res.docs_deleted == 1


def test_dry_run_and_cut_fraction_abort_touch_nothing(spark, tmp_table_root):
    t, orig = _mk_table(spark, tmp_table_root)
    snap = t.current_snapshot_id
    res = dup_span_cut_pass(spark, t, w=W, dry_run=True, max_cut_fraction=0.99)
    assert res.dry_run and not res.applied
    assert res.docs_affected == 4 and res.tokens_removed == 4 * len(RUN)
    assert t.current_snapshot_id == snap
    # 4/8 docs touched > 0.3 -> abort before any write
    res2 = dup_span_cut_pass(spark, t, w=W, max_cut_fraction=0.3)
    assert res2.aborted and not res2.applied
    assert t.current_snapshot_id == snap
    assert _scan(spark, t) == orig


def test_sampled_cut_is_estimation_only(spark, tmp_table_root):
    """sample_mod > 1 keeps 1-in-k windows — sound for sizing the
    problem (dry_run) but an APPLIED cut would excise Swiss-cheese
    patches and leave most of every duplicated run: refused loudly,
    nothing written."""
    t, orig = _mk_table(spark, tmp_table_root)
    snap = t.current_snapshot_id
    with pytest.raises(ValueError, match="estimation-only"):
        dup_span_cut_pass(spark, t, w=W, sample_mod=4, max_cut_fraction=0.99)
    assert t.current_snapshot_id == snap
    assert _scan(spark, t) == orig
    # the dry-run estimate path stays available at any sample_mod
    res = dup_span_cut_pass(
        spark, t, w=W, sample_mod=4, dry_run=True, max_cut_fraction=0.99
    )
    assert res.dry_run and not res.applied


def test_out_of_band_leaves_checkpoint_alone(spark, tmp_table_root):
    t, _ = _mk_table(spark, tmp_table_root)
    before = t.properties.get("hwm")
    res = dup_span_cut_pass(spark, t, w=W, max_cut_fraction=0.99)
    assert res.applied
    t.refresh()
    assert t.properties.get("hwm") == before


def test_wap_stages_and_publishes(spark, tmp_table_root):
    t, orig = _mk_table(spark, tmp_table_root)
    res = dup_span_cut_pass(spark, t, w=W, wap=True, max_cut_fraction=0.99)
    assert res.applied and res.wap and res.wap["published"]
    got = _scan(spark, t)
    assert got["s:003"] == orig["s:003"][:8]


def test_band_index_refresh_for_touched_keys(spark, tmp_table_root, tmp_path):
    from canal_spark.dedup_index import create_band_index, refresh_band_index

    t, _ = _mk_table(spark, tmp_table_root)
    idx = create_band_index(str(tmp_path / "bands"))
    refresh_band_index(spark, t, idx)  # full build
    pre = idx.scan(spark).where(F.col("doc_id") == "s:100").count()
    assert pre > 0
    res = dup_span_cut_pass(
        spark, t, w=W, index=idx, max_cut_fraction=0.99
    )
    assert res.applied and res.index_refresh and res.index_refresh["applied"]
    idx.refresh()
    # deleted doc's band rows fell out of the index
    assert idx.scan(spark).where(F.col("doc_id") == "s:100").count() == 0


def test_run_pass_span_cut_phase(spark, tmp_table_root):
    """span_cut=True runs the excision between the DML phases and the
    cluster/compact layout phases; the final table is both cut AND
    maintenance-consistent (n_tok matches, snapshots advance once per
    writing phase)."""
    from canal_spark.maintenance import run_pass

    t, orig = _mk_table(spark, tmp_table_root)
    rep = run_pass(
        spark, t, changes=None, span_cut=True, span_cut_w=W,
        span_cut_max_fraction=0.99,
    )
    assert rep.span_cut["applied"]
    assert rep.span_cut["docs_affected"] == 4
    assert "span_cut" in rep.timings
    got = _scan(spark, t)
    assert got["s:001"] == orig["s:001"]
    assert got["s:003"] == orig["s:003"][:8]
    assert "s:100" not in got
    bad = t.scan(spark).where(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


def test_run_pass_span_cut_rejects_branch(spark, tmp_table_root):
    from canal_spark.maintenance import run_pass

    t, _ = _mk_table(spark, tmp_table_root)
    with pytest.raises(ValueError, match="mainline"):
        run_pass(spark, t, changes=None, span_cut=True, branch="audit")


def test_no_duplicates_is_a_noop(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    df = spark.createDataFrame(
        [(f"s:{n}", _uniq(n, 9), 9, "s") for n in range(6)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    append(spark, t, df)
    snap = t.current_snapshot_id
    res = dup_span_cut_pass(spark, t, w=W)
    assert res.docs_affected == 0 and not res.applied
    assert t.current_snapshot_id == snap
