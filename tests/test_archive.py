"""Cold-archive changelog store (archive.py, S3) — the RDS OSS
archived-binlog behavior: whole-file archiving below retention,
manifest range pruning on resolve (the listBinlogFiles window),
exactly-once across the crash overlap window, live/cold handoff with
no gap and no replay (``switch to mysql parser!``), and the consumer
resuming a cursor that predates staging retention."""

import json
import os
import shutil

import pytest

from canal_spark.archive import archive_segments, resolve_changelog
from canal_spark.changelog import changelog_df, synth_changelog_rows, synth_token_rows
from canal_spark.consumer import ConsumerServer


def _stage(spark, stage_dir, rows, cuts):
    """Write one parquet file per ordinal chunk — the per-file
    position ranges a binlog file sequence has."""
    bounds = list(zip([0] + cuts, cuts + [len(rows)]))
    for lo, hi in bounds:
        if lo == hi:
            continue
        changelog_df(spark, rows[lo:hi]).coalesce(1).write.mode("append").parquet(
            str(stage_dir)
        )


@pytest.fixture()
def staged(spark, tmp_path):
    """120 ops in 3 files: ordinals 1-40, 41-80, 81-120."""
    base = synth_token_rows(300)
    rows = sorted(synth_changelog_rows(base, 120, seed=17), key=lambda r: r[0])
    _stage(spark, tmp_path / "stage", rows, [40, 80])
    return str(tmp_path / "stage"), str(tmp_path / "cold"), rows


def _manifest(archive_dir):
    with open(os.path.join(archive_dir, "manifest.json")) as f:
        return json.load(f)["segments"]


def test_archive_moves_whole_cold_files(spark, staged):
    stage, cold, rows = staged
    rep = archive_segments(spark, stage, cold, retain_from_ordinal=81)
    # the two files wholly below 81 move; the 81-120 file stays hot
    assert rep["archived_files"] == 2 and rep["kept_files"] == 1
    assert rep["archived_rows"] == 80
    segs = _manifest(cold)
    assert len(segs) == 2
    assert sorted((s["min_ordinal"], s["max_ordinal"]) for s in segs) == [
        (rows[0][0], rows[39][0]),
        (rows[40][0], rows[79][0]),
    ]
    live = [n for n in os.listdir(stage) if n.endswith(".parquet")]
    assert len(live) == 1
    # idempotent: nothing left below retention
    rep2 = archive_segments(spark, stage, cold, retain_from_ordinal=81)
    assert rep2["archived_files"] == 0 and rep2["segments_total"] == 2
    # a file STRADDLING retention is never split — kept whole
    rep3 = archive_segments(spark, stage, cold, retain_from_ordinal=100)
    assert rep3["archived_files"] == 0 and rep3["kept_files"] == 1


def test_resolve_exactly_once_and_range_pruned(spark, staged):
    stage, cold, rows = staged
    archive_segments(spark, stage, cold, retain_from_ordinal=81)
    # full resume: cold + live, one row per ordinal, no gap at the seam
    df, rep = resolve_changelog(spark, stage, cold, from_ordinal=0)
    got = [r["ordinal"] for r in df.select("ordinal").orderBy("ordinal").collect()]
    assert got == [r[0] for r in rows]
    assert rep["segments_fetched"] == 2 and rep["live_files"] == 1
    # recent resume: the listBinlogFiles window prunes every cold file
    df2, rep2 = resolve_changelog(spark, stage, cold, from_ordinal=rows[99][0])
    assert rep2["segments_fetched"] == 0 and rep2["segments_pruned"] == 2
    assert df2.count() == 20
    # mid-archive resume: only the second segment is fetched
    _, rep3 = resolve_changelog(spark, stage, cold, from_ordinal=rows[59][0])
    assert rep3["segments_fetched"] == 1 and rep3["segments_pruned"] == 1


def test_crash_overlap_window_replays_nothing(spark, staged):
    stage, cold, rows = staged
    archive_segments(spark, stage, cold, retain_from_ordinal=81)
    # simulate the crash BETWEEN manifest commit and staging delete:
    # a cold segment also present in staging
    seg_dir = os.path.join(cold, "segments")
    seg = sorted(os.listdir(seg_dir))[0]
    orig_name = seg.split("-", 3)[3]  # segment-<min>-<max>-<basename>
    shutil.copy2(os.path.join(seg_dir, seg), os.path.join(stage, orig_name))
    df, rep = resolve_changelog(spark, stage, cold, from_ordinal=0)
    assert df.count() == 120  # exactly once per position
    # the cataloged staging copy is excluded from the live read set —
    # exactly-once is structural, not a shuffle: the resolved plan is
    # scan+filter+union with zero exchanges (cheap per consumer fetch)
    assert rep["live_files_skipped"] == 1 and rep["live_files"] == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the recovery archive run re-deletes the staging copy without
    # duplicating the catalog entry
    rep = archive_segments(spark, stage, cold, retain_from_ordinal=81)
    assert rep["archived_files"] == 1 and rep["segments_total"] == 2
    assert not os.path.exists(os.path.join(stage, orig_name))


def test_multi_stream_refused(spark, tmp_path):
    base = synth_token_rows(50)
    rows = sorted(synth_changelog_rows(base, 30, seed=5), key=lambda r: r[0])
    from pyspark.sql import functions as F

    df = changelog_df(spark, rows).withColumn(
        "stream_id", F.pmod(F.col("ordinal"), F.lit(2)).cast("string")
    )
    df.coalesce(1).write.parquet(str(tmp_path / "stage"))
    with pytest.raises(ValueError, match="per-stream ordinals overlap"):
        archive_segments(spark, str(tmp_path / "stage"), str(tmp_path / "cold"), 10**9)


def test_multi_stream_refused_even_when_retained(spark, tmp_path):
    """The config error fires on the FIRST run, not days later when
    retention first passes a file: even with retain_from_ordinal=0
    (nothing archivable yet) a stream_id staging dir is refused."""
    base = synth_token_rows(50)
    rows = sorted(synth_changelog_rows(base, 30, seed=5), key=lambda r: r[0])
    from pyspark.sql import functions as F

    df = changelog_df(spark, rows).withColumn(
        "stream_id", F.pmod(F.col("ordinal"), F.lit(2)).cast("string")
    )
    df.coalesce(1).write.parquet(str(tmp_path / "stage"))
    with pytest.raises(ValueError, match="per-stream ordinals overlap"):
        archive_segments(spark, str(tmp_path / "stage"), str(tmp_path / "cold"), 0)


def test_archive_refuses_to_delete_reused_basename(spark, staged, tmp_path):
    """The archive-side twin of the resolve collision guard: a staging
    file whose computed segment name is already cataloged but whose ROW
    COUNT differs is NOT silently deleted (that would lose the rows the
    archive copy lacks) — the run fails loudly and the file survives."""
    stage, cold, rows = staged
    archive_segments(spark, stage, cold, retain_from_ordinal=81)
    seg_dir = os.path.join(cold, "segments")
    seg = sorted(os.listdir(seg_dir))[0]
    orig_name = seg.split("-", 3)[3]
    # a corrected file with the SAME basename and the SAME min/max
    # ordinals (first + last of the archived chunk) but fewer rows
    subset = rows[0:10] + rows[30:40]
    changelog_df(spark, subset).coalesce(1).write.parquet(str(tmp_path / "one"))
    part = [n for n in os.listdir(tmp_path / "one") if n.endswith(".parquet")][0]
    victim = os.path.join(stage, orig_name)
    shutil.copy2(os.path.join(tmp_path / "one", part), victim)
    with pytest.raises(ValueError, match="collides with cataloged segment"):
        archive_segments(spark, stage, cold, retain_from_ordinal=81)
    assert os.path.exists(victim)  # never deleted on the failing path


def test_consumer_resumes_through_archive(spark, staged, tmp_path):
    """A client whose cursor predates staging retention resumes from
    cold segments and hands off to the live dir with no gap — the
    RdsBinlogEventParserProxy behavior."""
    stage, cold, rows = staged
    srv = ConsumerServer(
        spark, stage, str(tmp_path / "meta"), archive_dir=cold
    )
    srv.subscribe("c1")
    m1 = srv.get("c1", batch_size=30)  # consume a bit while all-hot
    assert len(m1.entries) == 30
    # binlog purge: everything applied (first 80 ops) goes cold
    archive_segments(spark, stage, cold, retain_from_ordinal=81)
    # the client's cursor (ordinal 30) now predates staging retention:
    # batches must keep arriving in ordinal order across cold -> live
    got = []
    while True:
        m = srv.get("c1", batch_size=25)
        if m.is_empty:
            break
        got.extend(json.loads(e)["data"][0]["doc_id"] for e in m.entries)
    assert got == [r[2] for r in rows[30:]]


def test_archive_cli(spark, staged, capsys, monkeypatch):
    stage, cold, _ = staged
    from canal_spark.jobs import archive as job

    monkeypatch.setattr(
        "sys.argv",
        ["archive.py", stage, cold, "--retain-from-ordinal", "81"],
    )
    job.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["job"] == "archive" and out["archived_files"] == 2
    assert out["retain_from_ordinal"] == 81


def test_basename_collision_with_different_content_raises(spark, staged):
    """A staging file REUSING an archived basename but holding different
    rows is neither silently skipped (data loss) nor read alongside the
    segment (replay) — the resolve fails loudly."""
    stage, cold, rows = staged
    archive_segments(spark, stage, cold, retain_from_ordinal=81)
    seg_dir = os.path.join(cold, "segments")
    seg = sorted(os.listdir(seg_dir))[0]
    orig_name = seg.split("-", 3)[3]
    # a DIFFERENT file lands under the archived basename
    live = [n for n in os.listdir(stage) if n.endswith(".parquet")][0]
    shutil.copy2(os.path.join(stage, live), os.path.join(stage, orig_name))
    with pytest.raises(ValueError, match="collides with cataloged segment"):
        resolve_changelog(spark, stage, cold, from_ordinal=0)


def test_malformed_manifest_name_does_not_crash_resolve(spark, staged):
    """A manifest entry whose name lacks the segment-<min>-<max>-<base>
    shape (the corruption check_archive reports) must not IndexError the
    consumer fetch path — resolve treats it as owning no basename."""
    stage, cold, rows = staged
    archive_segments(spark, stage, cold, retain_from_ordinal=81)
    mpath = os.path.join(cold, "manifest.json")
    m = json.load(open(mpath))
    bad = dict(m["segments"][0])
    bad["name"] = "seg1"  # unparseable; max_ordinal below every resume
    bad["max_ordinal"] = -1
    m["segments"].append(bad)
    json.dump(m, open(mpath, "w"))
    df, rep = resolve_changelog(spark, stage, cold, from_ordinal=0)
    assert df.count() == 120
