"""Table doctor: manifest-vs-files consistency checks catch real
corruption (missing file, row-count drift, bad partition value) and
pass on healthy tables."""

import json
import os

from canal_spark import create_table, load_table
from canal_spark.changelog import base_table_df
from canal_spark.doctor import check_table
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.writer import append


def test_healthy_table_passes(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 200).repartition(4))
    rep = check_table(spark, t)
    assert rep["ok"] and rep["files"] > 0 and rep["violations"] == []


def test_detects_missing_and_row_drift_and_bad_partition(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 200).repartition(4))
    entries = t.files()
    assert len(entries) >= 3

    # corruption 1: delete a data file out from under the manifest
    victim = entries[0]
    os.remove(os.path.join(t.root, victim.path))

    # corruption 2+3: hand-edit a manifest entry's rows and partition
    snap = t.current_snapshot()
    mpath = os.path.join(t.root, "metadata", snap.manifests[-1])
    m = json.load(open(mpath))
    m[0]["rows"] += 7
    edited_rows_path = m[0]["path"]
    if len(m) > 1:
        m[1]["partition"] = {"source": "zzz-not-here"}
        edited_part_path = m[1]["path"]
    else:
        edited_part_path = None
    json.dump(m, open(mpath, "w"))

    rep = check_table(spark, load_table(t.root))
    assert not rep["ok"]
    kinds = {(v["kind"], v["file"]) for v in rep["violations"]}
    assert ("missing", victim.path) in kinds
    if edited_rows_path != victim.path:
        assert any(k == "rows" and f == edited_rows_path for k, f in kinds) or any(
            k == "bytes" and f == edited_rows_path for k, f in kinds
        ) or ("rows", edited_rows_path) in kinds
    if edited_part_path and edited_part_path != victim.path:
        assert ("partition", edited_part_path) in kinds


def test_skip_footers_still_checks_presence(spark, tmp_table_root):
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA)
    append(spark, t, base_table_df(spark, 50).repartition(1))
    victim = t.files()[0]
    os.remove(os.path.join(t.root, victim.path))
    rep = check_table(spark, t, verify_footers=False)
    assert not rep["ok"]
    assert rep["violations"][0]["kind"] == "missing"


def test_truncated_and_garbled_files_reported_not_crashed(spark, tmp_table_root):
    """A truncated file (size mismatch) and a same-size garbled file
    (unreadable footer) must both come back as violations — the doctor
    must never crash on the corruption it exists to diagnose."""
    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 200).repartition(4))
    entries = t.files()
    assert len(entries) >= 2

    # truncate one file
    trunc = os.path.join(t.root, entries[0].path)
    with open(trunc, "r+b") as f:
        f.truncate(entries[0].bytes // 2)
    # garble another in place (same size, junk content)
    garbled = os.path.join(t.root, entries[1].path)
    with open(garbled, "r+b") as f:
        f.write(b"\x00" * entries[1].bytes)

    rep = check_table(spark, t)
    assert not rep["ok"]
    kinds = {(v["kind"], v["file"]) for v in rep["violations"]}
    assert ("bytes", entries[0].path) in kinds
    assert ("footer", entries[1].path) in kinds


def test_doctor_validates_pending_delete_files(spark, tmp_table_root):
    """Equality-delete files get the same physical validation as data
    files: a healthy MoR table passes; a truncated delete file (which
    would silently un-delete rows at scan) is flagged."""
    from canal_spark.changelog import changelog_df, synth_changelog_rows, synth_token_rows
    from canal_spark.merge import merge_into

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(200)
    append(spark, t, base_table_df(spark, 200).repartition(4))
    merge_into(spark, t, changelog_df(spark, synth_changelog_rows(base, 60)), mode="mor")
    dels = t.refresh().delete_files()
    assert len(dels) == 1
    rep = check_table(spark, t)
    assert rep["ok"] and rep["files"] > len(t.files())

    p = os.path.join(t.root, dels[0].path)
    with open(p, "r+b") as f:
        f.truncate(os.path.getsize(p) // 2)
    rep = check_table(spark, t)
    assert not rep["ok"]
    assert any(v["file"] == dels[0].path for v in rep["violations"])


def test_doctor_flags_dangling_ref_and_stale_stage(spark, tmp_table_root):
    from canal_spark import create_table
    from canal_spark.changelog import (
        base_table_df,
        changelog_df,
        synth_changelog_rows,
        synth_token_rows,
    )
    from canal_spark.doctor import check_table
    from canal_spark.merge import merge_into
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(200)
    append(spark, t, base_table_df(spark, 200).repartition(4))
    assert check_table(spark, t)["ok"]

    # a fresh staged snapshot is healthy (audit-in-flight is normal)...
    staged = merge_into(
        spark, t, changelog_df(spark, synth_changelog_rows(base, 40)),
        stage_only=True,
    )
    assert check_table(spark, t)["ok"]

    # ...but one forgotten past the threshold is flagged (age it by
    # rewinding its commit timestamp in the in-memory metadata, the
    # same view check_table reads)
    for s in t.metadata["snapshots"]:
        if s["snapshot_id"] == staged.snapshot_id:
            s["timestamp_ms"] -= 48 * 3_600_000
    rep = check_table(spark, t)
    assert not rep["ok"]
    assert any(v["kind"] == "stale-stage" for v in rep["violations"])
    t.refresh()
    t.abort_staged(staged.snapshot_id)

    # a forgotten branch chain is the multi-commit form of a stale stage
    t.create_branch("old")
    r = merge_into(
        spark, t, changelog_df(spark, synth_changelog_rows(base, 20)),
        branch="old",
    )
    assert check_table(spark, t)["ok"]  # fresh chain: audit in flight
    for s in t.metadata["snapshots"]:
        if s["snapshot_id"] == r.snapshot_id:
            s["timestamp_ms"] -= 48 * 3_600_000
    rep = check_table(spark, t)
    assert any(v["kind"] == "stale-branch" for v in rep["violations"])
    t.refresh()
    t.delete_branch("old")

    # a ref pointing at a snapshot that no longer exists is a violation
    t.metadata["refs"] = {"train-v0": {"snapshot_id": 999_999, "type": "tag"}}
    rep = check_table(spark, t)
    assert any(v["kind"] == "dangling-ref" for v in rep["violations"])


def test_doctor_dangling_pos_delete_is_warning_not_violation(spark, tmp_table_root):
    """Dangling pos-delete references are NORMAL debt (every rewrite
    strands its references by design) — doctor must report them as a
    warning pointing at rewrite_pos_deletes, with ok staying True.  A
    pos-delete file that is not readable as (file_path, pos) rows at
    all, though, is a real violation (wrong-schema swap)."""
    from canal_spark.compact import compact
    from canal_spark.merge import delete_where

    t = create_table(tmp_table_root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 200).repartition(4))
    delete_where(spark, t, "n_tok % 5 = 0", mode="mor-pos")
    t.refresh()
    assert t.pos_delete_files()
    rep = check_table(spark, t)
    assert rep["ok"] and rep["warnings"] == []

    # a rewrite strands the references — healthy table, warning only
    compact(spark, t, target_bytes=1 << 20)
    t.refresh()
    assert t.pos_delete_files()  # still live, now dangling
    rep = check_table(spark, t)
    assert rep["ok"], rep["violations"]
    warn = [w for w in rep["warnings"] if w["kind"] == "dangling-pos-delete"]
    assert warn and "rewrite_pos_deletes" in warn[0]["detail"]

    # wrong-schema swap: the delete file's parquet is readable but has
    # no file_path column -> violation, not a silent pass
    victim = t.pos_delete_files()[0]
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = os.path.join(t.root, victim.path)
    pq.write_table(pa.table({"wrong": [1, 2, 3]}), p)
    # keep the size/footer checks out of the way: align manifest bytes
    snap = t.current_snapshot()
    for mname in snap.manifests:
        mpath = os.path.join(t.root, "metadata", mname)
        m = json.load(open(mpath))
        hit = False
        for entry in m:
            if entry["path"] == victim.path:
                entry["bytes"] = os.path.getsize(p)
                entry["rows"] = 3
                hit = True
        if hit:
            json.dump(m, open(mpath, "w"))
            break
    rep = check_table(spark, load_table(t.root))
    assert not rep["ok"]
    assert any(v["kind"] == "pos-delete-schema" for v in rep["violations"])


def test_doctor_flags_missing_or_corrupt_codebook(spark, tmp_path):
    """An IVF index whose pinned codebook artifact vanished (GC race,
    partial copy) is a table-health violation, not an obscure read
    error at the next ann_search."""
    import shutil

    import numpy as np

    from canal_spark import create_table, load_table
    from canal_spark.ann_index import (
        CODEBOOK_PATH_PROP,
        create_ivf_index,
        refresh_ivf_index,
    )
    from canal_spark.doctor import check_table
    from canal_spark.operators.similarity import EMB_DIM
    from canal_spark.table.writer import append
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
        StructField("source", StringType(), True),
    ])
    t = create_table(str(tmp_path / "emb"), schema, partition_by=["source"],
                     properties={"key-cols": "vec_id"})
    rows = [
        (i,
         [float(x) for x in
          np.random.default_rng(i).standard_normal(EMB_DIM).astype("float32")],
         f"s{i % 2}")
        for i in range(64)
    ]
    append(spark, t, spark.createDataFrame(rows, schema).repartition(2))
    idx = create_ivf_index(str(tmp_path / "ivf"))
    refresh_ivf_index(spark, t, idx)

    assert check_table(spark, idx.refresh())["ok"]

    # corrupt: truncate the pinned artifact's parquet part file
    import os
    rel = idx.properties[CODEBOOK_PATH_PROP]
    cb_dir = os.path.join(idx.root, rel)
    part = next(p for p in os.listdir(cb_dir) if p.endswith(".parquet"))
    with open(os.path.join(cb_dir, part), "wb") as f:
        f.write(b"not a parquet file")
    rep = check_table(spark, load_table(idx.root))
    assert not rep["ok"]
    assert any(v["kind"] == "codebook-unreadable" for v in rep["violations"])

    # gutted: part files gone but the dir (and _SUCCESS) survives — the
    # explicit-schema read returns zero rows instead of raising, which
    # must still be a violation
    for name in os.listdir(cb_dir):
        if name.endswith(".parquet") or name.endswith(".crc"):
            os.remove(os.path.join(cb_dir, name))
    rep_gut = check_table(spark, load_table(idx.root))
    assert any(v["kind"] == "codebook-unreadable"
               for v in rep_gut["violations"])

    # missing: remove the artifact dir entirely
    shutil.rmtree(cb_dir)
    rep2 = check_table(spark, load_table(idx.root))
    assert any(v["kind"] == "codebook-missing" for v in rep2["violations"])


def test_doctor_archive_checks(spark, tmp_path):
    """check_archive: healthy catalog passes; missing segment, catalog
    range drift, and row drift are violations; an uncataloged segment
    (the copy-then-commit crash window) is only a warning."""
    import shutil

    from canal_spark.archive import archive_segments
    from canal_spark.changelog import changelog_df, synth_changelog_rows, synth_token_rows
    from canal_spark.doctor import check_archive

    stage, cold = str(tmp_path / "stage"), str(tmp_path / "cold")
    base = synth_token_rows(200)
    rows = sorted(synth_changelog_rows(base, 90, seed=3), key=lambda r: r[0])
    for lo, hi in [(0, 30), (30, 60), (60, 90)]:
        changelog_df(spark, rows[lo:hi]).coalesce(1).write.mode("append").parquet(stage)
    archive_segments(spark, stage, cold, retain_from_ordinal=rows[60][0])

    rep = check_archive(cold)
    assert rep["ok"] and rep["segments"] == 2 and rep["warnings"] == []

    # empty / absent archive is healthy (nothing cataloged yet)
    assert check_archive(str(tmp_path / "nowhere"))["ok"]

    seg_dir = os.path.join(cold, "segments")
    segs = sorted(os.listdir(seg_dir))

    # crash window: a stray copy not yet cataloged -> warning only
    shutil.copy2(
        os.path.join(seg_dir, segs[0]), os.path.join(seg_dir, "part-stray.parquet")
    )
    rep2 = check_archive(cold)
    assert rep2["ok"]
    assert [w["kind"] for w in rep2["warnings"]] == ["uncataloged-segment"]
    os.remove(os.path.join(seg_dir, "part-stray.parquet"))

    # catalog range drift -> segment-range + segment-rows violations
    mpath = os.path.join(cold, "manifest.json")
    m = json.load(open(mpath))
    m["segments"][0]["max_ordinal"] += 5
    m["segments"][0]["rows"] += 1
    json.dump(m, open(mpath, "w"))
    rep3 = check_archive(cold)
    kinds = sorted(v["kind"] for v in rep3["violations"])
    assert not rep3["ok"] and kinds == ["segment-range", "segment-rows"]
    m["segments"][0]["max_ordinal"] -= 5
    m["segments"][0]["rows"] -= 1
    json.dump(m, open(mpath, "w"))

    # truncated/garbled segment file -> reported, never a crash (the
    # module contract: corrupt artifacts are the diagnosis)
    with open(os.path.join(seg_dir, segs[0]), "r+b") as f:
        f.truncate(10)
    rep_corrupt = check_archive(cold)
    assert not rep_corrupt["ok"]
    assert [v["kind"] for v in rep_corrupt["violations"]] == ["segment-corrupt"]
    shutil.copy2(os.path.join(seg_dir, segs[1]), os.path.join(seg_dir, segs[0]))

    # a manifest entry missing fields is ONE diagnosis: segment-entry,
    # with no spurious uncataloged-segment warning for its on-disk file
    m = json.load(open(mpath))
    saved = dict(m["segments"][0])
    del m["segments"][0]["rows"]
    json.dump(m, open(mpath, "w"))
    rep_entry = check_archive(cold)
    kinds = [v["kind"] for v in rep_entry["violations"]]
    assert "segment-entry" in kinds
    assert [w["kind"] for w in rep_entry["warnings"]] == []
    m["segments"][0] = saved
    json.dump(m, open(mpath, "w"))
    # (segs[0] now holds segs[1]'s content: range drift is expected;
    # restore a clean copy for the final check)
    shutil.copy2(os.path.join(seg_dir, segs[1]), os.path.join(seg_dir, segs[0]))

    # cold data loss: cataloged segment file deleted -> violation
    os.remove(os.path.join(seg_dir, segs[1]))
    rep4 = check_archive(cold)
    assert not rep4["ok"]
    assert "segment-missing" in [v["kind"] for v in rep4["violations"]]
