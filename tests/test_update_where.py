"""Predicate UPDATE (`merge.update_where`) — UPDATE t SET ... WHERE:
assignment semantics, key-column guard, out-of-band cursor contract,
MoR shape, idempotent row effect."""

import pytest

from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.merge import merge_high_water_mark, merge_into, update_where
from tests.conftest import scan_dict


def test_update_where_cow_applies_assignments(spark, token_table):
    t, _ = token_table
    before = scan_dict(spark, t)
    cond = "source = 'web' AND n_tok >= 10"
    affected = {k for k, v in before.items() if v[2] == "web" and v[1] >= 10}
    assert affected

    m = update_where(
        spark, t, cond,
        {"tokens": "slice(tokens, 1, 4)", "n_tok": "least(n_tok, 4)"},
        mode="cow",
    )
    assert m.applied and m.rows_upserted == len(affected)
    t.refresh()
    assert t.delete_files() == []  # COW leaves no debt
    got = scan_dict(spark, t)
    for k, v in before.items():
        if k in affected:
            assert got[k] == (v[0][:4], min(v[1], 4), "web")
        else:
            assert got[k] == v

    # row-effect idempotence: re-running re-derives the same images
    update_where(
        spark, t, cond,
        {"tokens": "slice(tokens, 1, 4)", "n_tok": "least(n_tok, 4)"},
    )
    assert scan_dict(spark, t) == got


def test_update_where_mor_defers_rewrite(spark, token_table):
    t, _ = token_table
    before = scan_dict(spark, t)
    files_before = {e.path for e in t.files()}
    m = update_where(
        spark, t, "n_tok % 4 = 0", {"source": "'requeued'"}, mode="mor"
    )
    assert m.applied
    t.refresh()
    assert files_before <= {e.path for e in t.files()}  # no base rewrite
    assert len(t.delete_files()) == 1
    got = scan_dict(spark, t)
    for k, v in before.items():
        exp = ("requeued" if v[1] % 4 == 0 else v[2])
        assert got[k] == (v[0], v[1], exp)


def test_update_where_guards(spark, token_table):
    t, _ = token_table
    with pytest.raises(ValueError, match="key column"):
        update_where(spark, t, "true", {"doc_id": "'x'"})
    with pytest.raises(ValueError, match="unknown column"):
        update_where(spark, t, "true", {"nope": "1"})


def test_update_where_is_out_of_band(spark, token_table):
    t, base = token_table
    rows = synth_changelog_rows(base, 40)
    merge_into(spark, t, changelog_df(spark, rows))
    hwm = merge_high_water_mark(t)
    m = update_where(spark, t, "n_tok = 3", {"source": "'tiny'"})
    assert merge_high_water_mark(t) == hwm
    # a later upstream batch applies exactly as usual
    victim = sorted(scan_dict(spark, t))[0]
    merge_into(
        spark, t,
        changelog_df(spark, [(hwm + 1, "U", victim, [9, 9], 2, "books")]),
    )
    assert scan_dict(spark, t)[victim] == ([9, 9], 2, "books")


def test_update_where_zero_matches_noops(spark, token_table):
    t, _ = token_table
    sid = t.current_snapshot_id
    m = update_where(spark, t, "n_tok < 0", {"source": "'never'"})
    assert m.applied is False
    t.refresh()
    assert t.current_snapshot_id == sid
