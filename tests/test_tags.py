"""Named snapshot tags (Iceberg-style refs): the training-set pinning
primitive — a tagged snapshot re-reads byte-identically forever, immune
to later merges AND to snapshot expiry, until the tag is deleted."""

import pytest

from canal_spark.changelog import changelog_df, synth_changelog_rows
from canal_spark.merge import merge_into
from tests.conftest import scan_dict


def test_tagged_scan_is_pinned_across_merges_and_expiry(spark, token_table):
    t, base = token_table
    pinned = scan_dict(spark, t)
    ref = t.set_tag("train-v1")
    assert t.refs["train-v1"] == ref

    # churn the table well past the retention window
    for seed in (1, 2, 3, 4, 5, 6):
        merge_into(
            spark, t,
            changelog_df(
                spark,
                synth_changelog_rows(base, 60, seed=seed,
                                     start_ordinal=seed * 100_000),
            ),
        )
    t.expire_snapshots(keep_last=2)

    # the tag still resolves and returns the exact pinned corpus
    assert scan_dict(spark, t, tag="train-v1") == pinned
    assert scan_dict(spark, t) != pinned

    # releasing the tag releases the snapshot to expiry
    t.delete_tag("train-v1")
    t.expire_snapshots(keep_last=2)
    with pytest.raises(KeyError):
        t.scan(spark, tag="train-v1")
    with pytest.raises(KeyError):
        t.resolve_snapshot(snapshot_id=ref["snapshot_id"])


def test_tag_guards(spark, token_table):
    t, base = token_table
    with pytest.raises(KeyError):
        t.scan(spark, tag="nope")
    with pytest.raises(KeyError):
        t.delete_tag("nope")
    with pytest.raises(KeyError):
        t.set_tag("x", snapshot_id=999_999)

    staged = merge_into(
        spark, t, changelog_df(spark, synth_changelog_rows(base, 30)),
        stage_only=True,
    )
    with pytest.raises(ValueError, match="staged"):
        t.set_tag("x", snapshot_id=staged.snapshot_id)
    t.abort_staged(staged.snapshot_id)

    # tags move: retagging the same name points at the new snapshot
    t.set_tag("v")
    first = t.refs["v"]["snapshot_id"]
    merge_into(
        spark, t,
        changelog_df(spark, synth_changelog_rows(base, 30, seed=9,
                                                 start_ordinal=500_000)),
    )
    t.set_tag("v")
    assert t.refs["v"]["snapshot_id"] != first
