"""spark-submit job entrypoints driven end-to-end as subprocesses
(python -m, which is what spark-submit executes after shipping
--py-files): apply -> compact -> cluster -> expire on a real table."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(mod, *args):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.fixture(scope="module")
def cli_table(tmp_path_factory):
    """A fragmented table + staged changelog, built once."""
    import shutil

    from canal_spark import create_table, get_spark
    from canal_spark.changelog import base_table_df, changelog_df, synth_changelog_rows, synth_token_rows
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    base_dir = tmp_path_factory.mktemp("cli")
    root = str(base_dir / "tbl")
    cl_dir = str(base_dir / "cl")
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark("cli-fixture", master="local[4]", shuffle_partitions=4)
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(1500)
    append(spark, t, base_table_df(spark, 1500).repartition(10))
    rows = synth_changelog_rows(base, 400, seed=21)
    changelog_df(spark, rows).write.parquet(cl_dir)
    return root, cl_dir, base, rows


def test_apply_then_maintenance_jobs(cli_table, tmp_path):
    from canal_spark import get_spark, load_table

    root, cl_dir, base, rows = cli_table
    lineage = str(tmp_path / "lineage")

    m = run_job("canal_spark.jobs.apply_changelog", root,
                "--changelog", cl_dir, "--lineage", lineage,
                "--target-file-rows", "200")
    assert m["applied"] is True
    assert m["high_water_mark"] == max(r[0] for r in rows)

    # replay through the CLI is a no-op
    m2 = run_job("canal_spark.jobs.apply_changelog", root,
                 "--changelog", cl_dir)
    assert m2["applied"] is False

    c = run_job("canal_spark.jobs.compact", root, "--target-mb", "1",
                "--pack-by", "n_tok", "--lineage", lineage)
    assert c["files_removed"] >= 0

    z = run_job("canal_spark.jobs.cluster", root, "--curve", "hilbert",
                "--target-file-rows", "400", "--lineage", lineage)
    assert z["files_after"] >= 1

    e = run_job("canal_spark.jobs.expire", root, "--keep-last", "2",
                "--rewrite-manifests")
    assert "expired" in e

    # end state must equal the python oracle despite 4 separate processes
    from tests.conftest import oracle_dict, scan_dict

    spark = get_spark("cli-verify", master="local[4]", shuffle_partitions=4)
    table = load_table(root)
    assert scan_dict(spark, table) == oracle_dict(base, rows)

    # lineage recorded all three phases
    from canal_spark.checkpoint import read_lineage
    from canal_spark.table.format import load_table as lt

    phases = {r["phase"] for r in read_lineage(spark, lt(lineage)).collect()}
    assert {"merge", "compact", "cluster"} <= phases


def test_spark_submit_honors_cluster_master(tmp_path):
    """Deployment contract: under spark-submit, jobs/common.session must
    NOT override the submit-supplied master with a local[*] fallback
    (spark.master is already in the gateway conf; PYSPARK_GATEWAY_PORT
    marks the managed JVM).  Submits a probe via the real spark-submit
    with --master local[3] and asserts the session sees exactly that."""
    import shutil

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not installed")

    probe = tmp_path / "probe.py"
    probe.write_text(
        "import argparse\n"
        "from canal_spark.jobs.common import session\n"
        "spark = session(argparse.Namespace(app_name=None), 'probe')\n"
        "print('MASTER=' + spark.conf.get('spark.master'))\n"
        "spark.stop()\n"
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("SPARK_GRAFT_MASTER", None)
    out = subprocess.run(
        [spark_submit, "--master", "local[3]", str(probe)],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    masters = [l for l in out.stdout.splitlines() if l.startswith("MASTER=")]
    assert masters == ["MASTER=local[3]"]


def test_rollback_and_orphan_jobs(cli_table, tmp_path):
    """CLI surface for the round-3 ops: rollback to a past snapshot and
    orphan-file GC through the expire job."""
    import os as _os
    import time as _time

    from canal_spark import get_spark, load_table
    from canal_spark.changelog import base_table_df
    from canal_spark.table.writer import write_datafiles

    root, cl_dir, base, rows = cli_table
    spark = get_spark("cli-extra", master="local[4]", shuffle_partitions=4)
    t = load_table(root)
    s_before = t.current_snapshot_id
    n_before = t.scan(spark).count()

    # move the table forward, then roll back via the CLI
    from canal_spark.table.writer import append

    append(spark, t, base_table_df(spark, 100, seed=77).repartition(1))
    assert t.scan(spark).count() != n_before
    rep = run_job("canal_spark.jobs.rollback", root, "--snapshot-id", str(s_before))
    assert rep["rolled_back_to"] == s_before and rep["operation"] == "rollback"
    assert load_table(root).row_count() == n_before

    # crash debris + aged -> expire job sweeps it
    orphans = write_datafiles(spark, t.refresh(),
                              base_table_df(spark, 30, seed=78).repartition(1))
    old = _time.time() - 7200
    for e in orphans:
        p = _os.path.join(root, e.path)
        _os.utime(p, (old, old))
    rep = run_job("canal_spark.jobs.expire", root, "--keep-last", "50",
                  "--remove-orphans-hours", "1")
    assert rep["remove_orphans"]["orphans_deleted"] == len(orphans)
    assert load_table(root).row_count() == n_before


def test_run_pass_cli_band_index_and_metrics(tmp_path):
    """One CLI invocation = full consume-loop pass: merge + band-index
    sync + cluster/compact/expire, emitting the prometheus scrape dump."""
    from canal_spark import create_table, get_spark
    from canal_spark.changelog import (
        base_table_df,
        changelog_df,
        synth_changelog_rows,
        synth_token_rows,
    )
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("run-pass-cli-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    cl_dir = str(tmp_path / "cl")
    idx_root = str(tmp_path / "bands")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(500)
    append(spark, t, base_table_df(spark, 500).repartition(4))
    changelog_df(spark, synth_changelog_rows(base, 120, seed=91)).write.parquet(cl_dir)

    rep = run_job("canal_spark.jobs.run_pass", root,
                  "--changelog", cl_dir,
                  "--lineage", str(tmp_path / "lineage"),
                  "--band-index", idx_root,
                  "--target-file-rows", "300")
    assert rep["merge"]["applied"] is True
    assert rep["band_index"]["applied"] is True
    lbl = f'{{destination="{root}"}}'
    assert rep["metrics"][f"canal_instance_transactions{lbl}"] == 1
    assert rep["metrics"][f"canal_instance_put_rows{lbl}"] > 0
    assert (rep["metrics"][f"canal_instance_put_rows{lbl}"]
            == rep["metrics"][f"canal_instance_ack_rows{lbl}"])
    assert f"canal_spark_band_index_dup_candidates{lbl}" in rep["metrics"]


def test_run_pass_cli_mor_and_materialize(tmp_path):
    """The merge-mode switch end to end through spark-submit-shaped CLI:
    a mor pass writes zero base rewrites + one pending delete file; a
    second pass with threshold 1 repays the debt; the final scan
    matches the replay oracle."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import (
        base_table_df,
        changelog_df,
        python_oracle_apply,
        synth_changelog_rows,
        synth_token_rows,
    )
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("run-pass-cli-mor", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(400)
    append(spark, t, base_table_df(spark, 400).repartition(4))

    rows1 = synth_changelog_rows(base, 80, seed=101)
    cl1 = str(tmp_path / "cl1")
    changelog_df(spark, rows1).write.parquet(cl1)
    rep = run_job("canal_spark.jobs.run_pass", root,
                  "--changelog", cl1, "--merge-mode", "mor",
                  "--target-file-rows", "300")
    assert rep["merge"]["applied"] is True
    assert rep["merge"]["files_rewritten"] == 0
    assert rep["merge"]["extra"]["mode"] == "mor"
    assert len(load_table(root).delete_files()) == 1

    rows2 = synth_changelog_rows(base, 80, seed=102, start_ordinal=10_001)
    cl2 = str(tmp_path / "cl2")
    changelog_df(spark, rows2).write.parquet(cl2)
    rep2 = run_job("canal_spark.jobs.run_pass", root,
                   "--changelog", cl2, "--merge-mode", "mor",
                   "--max-pending-delete-files", "1",
                   "--target-file-rows", "300")
    assert rep2["materialize"].get("applied") is True
    lbl = f'{{destination="{root}"}}'
    assert f"canal_spark_materialize_delete_files_removed{lbl}" in rep2["metrics"]

    t2 = load_table(root)
    assert t2.delete_files() == []
    want = python_oracle_apply(
        {r[0]: (list(r[1]), r[2], r[3]) for r in base}, rows1 + rows2
    )
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in t2.scan(spark).collect()
    }
    assert got == {k: (list(v[0]), v[1], v[2]) for k, v in want.items()}


def test_ann_index_cli_full_then_incremental(tmp_path):
    """jobs/ann.py: full build trains + pins the codebook; the
    incremental run refreshes only the changed keys under it."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StringType, StructField, StructType,
    )

    from canal_spark import create_table, get_spark, load_table
    from canal_spark.operators.similarity import EMB_DIM
    from canal_spark.table.writer import append

    emb_schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
        StructField("source", StringType(), True),
    ])
    cl_schema = StructType([
        StructField("ordinal", LongType(), False),
        StructField("op", StringType(), False),
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), True),
        StructField("source", StringType(), True),
    ])

    def vec(i):
        return [float(x) for x in
                np.random.default_rng(i).standard_normal(EMB_DIM).astype("float32")]

    spark = get_spark("ann-cli-fixture", master="local[4]", shuffle_partitions=4)
    root = str(tmp_path / "emb")
    idx_root = str(tmp_path / "ivf")
    t = create_table(root, emb_schema, partition_by=["source"],
                     properties={"key-cols": "vec_id"})
    append(spark, t, spark.createDataFrame(
        [(i, vec(i), f"s{i % 3}") for i in range(200)], emb_schema
    ).repartition(4))

    rep = run_job("canal_spark.jobs.ann", root, "--index", idx_root, "--full")
    assert rep["applied"] and rep["full_rebuild"]
    assert rep["codebook_version"] == 1
    assert load_table(idx_root).row_count() == 200

    # merge a small changelog, then refresh incrementally via the CLI
    from canal_spark.merge import merge_into

    cl = spark.createDataFrame(
        [(1, "D", 3, None, None), (2, "I", 999, vec(999), "s1")], cl_schema
    )
    merge_into(spark, t, cl)
    cl_dir = str(tmp_path / "cl")
    cl.write.parquet(cl_dir)
    rep2 = run_job("canal_spark.jobs.ann", root, "--index", idx_root,
                   "--changelog", cl_dir,
                   "--lineage", str(tmp_path / "lineage"))
    assert rep2["applied"] and not rep2["full_rebuild"]
    assert rep2["codebook_version"] == 1  # frozen
    assert rep2["vecs_changed"] == 2 and rep2["files_pruned"] > 0
    idx = load_table(idx_root)
    ids = {r["vec_id"] for r in idx.scan(spark).collect()}
    assert 3 not in ids and 999 in ids and len(ids) == 200

    # semantic prune through the same CLI: plant a near-duplicate of
    # vec 0 and prune at a high threshold — exactly one loser, the
    # table and index both shrink by one, lineage records the pass
    dup = [x + 1e-3 for x in vec(0)]
    merge_into(spark, t, spark.createDataFrame(
        [(3, "I", 777, dup, "s0")], cl_schema))
    run_job("canal_spark.jobs.ann", root, "--index", idx_root,
            "--changelog", cl_dir)  # keep index in sync pre-prune
    cl2_dir = str(tmp_path / "cl2")
    spark.createDataFrame([(777,)], "vec_id long").write.parquet(cl2_dir)
    run_job("canal_spark.jobs.ann", root, "--index", idx_root,
            "--changelog", cl2_dir)
    rep3 = run_job("canal_spark.jobs.ann", root, "--index", idx_root,
                   "--semantic-prune", "--eps", "0.9",
                   "--lineage", str(tmp_path / "lineage"))
    assert rep3["job"] == "semantic_prune" and rep3["applied"]
    assert rep3["losers_removed"] == 1
    t2 = load_table(root)
    live = {r["vec_id"] for r in t2.scan(spark).select("vec_id").collect()}
    assert len(live) == 200 and (777 not in live) != (0 not in live)
    assert {r["vec_id"] for r in load_table(idx_root).scan(spark).collect()} == live


def test_apply_changelog_cli_mor_mode(tmp_path):
    """--merge-mode mor through the CLI: the batch commits as
    equality-delete + upsert files with ZERO base rewrites, the live
    scan matches the replay oracle, and a replay is a no-op."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import (base_table_df, changelog_df,
                                       python_oracle_apply,
                                       synth_changelog_rows,
                                       synth_token_rows)
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("cli-mor", master="local[4]", shuffle_partitions=4)
    root = str(tmp_path / "tbl_mor")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(600)
    append(spark, t, base_table_df(spark, 600).repartition(4))
    rows = synth_changelog_rows(base, 150, seed=31)
    cl_dir = str(tmp_path / "cl_mor")
    changelog_df(spark, rows).write.parquet(cl_dir)

    m = run_job("canal_spark.jobs.apply_changelog", root,
                "--changelog", cl_dir, "--merge-mode", "mor")
    assert m["applied"] is True
    assert m["files_rewritten"] == 0  # zero base rewrites is the point
    t = load_table(root)
    assert len(t.delete_files()) == 1

    oracle = python_oracle_apply({r[0]: (r[1], r[2], r[3]) for r in base}, rows)
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
           for r in t.scan(spark).collect()}
    assert got == {k: (list(v[0]), v[1], v[2]) for k, v in oracle.items()}

    m2 = run_job("canal_spark.jobs.apply_changelog", root,
                 "--changelog", cl_dir, "--merge-mode", "mor")
    assert m2["applied"] is False
    assert len(load_table(root).delete_files()) == 1


def test_run_pass_cli_wap_abort_exits_nonzero(tmp_path):
    """--wap quarantines a corrupt batch: the subprocess exits 3, the
    emitted report shows the failed audit, readers never saw the rows,
    and a clean batch then publishes with exit 0."""
    import datetime as dt
    import shutil

    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import base_table_df, changelog_df, synth_token_rows
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("run-pass-wap-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(300)
    append(spark, t, base_table_df(spark, 300).repartition(4))
    rows_before = t.row_count()

    E = dt.datetime(2026, 1, 1)
    bad_dir = str(tmp_path / "cl_bad")
    changelog_df(spark, [
        (1, "I", "web:9999999001", [1, 2, 3], 99, "web", E, 1),
    ]).write.parquet(bad_dir)

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "canal_spark.jobs.run_pass", root,
         "--changelog", bad_dir, "--wap"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 3, out.stderr[-2000:]
    rep = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert rep["wap"]["published"] is False
    assert rep["wap"]["checks"]["bad_token_arrays"] == 1
    t = load_table(root)
    assert t.row_count() == rows_before
    assert t.staged_snapshots() == []

    good_dir = str(tmp_path / "cl_good")
    changelog_df(spark, [
        (1, "I", "web:9999999001", [1, 2, 3], 3, "web", E, 1),
    ]).write.parquet(good_dir)
    rep2 = run_job("canal_spark.jobs.run_pass", root,
                   "--changelog", good_dir, "--wap")
    assert rep2["wap"]["published"] is True
    assert load_table(root).row_count() == rows_before + 1
    shutil.rmtree(bad_dir, ignore_errors=True)


def test_dedup_cli_self_dedup(tmp_path):
    """--self-dedup end-to-end: full index build, dry-run reports
    without touching, real run removes losers and exits 0."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("self-dedup-cli-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    idx = str(tmp_path / "bands")
    toks = list(range(3000, 3040))
    rows = [
        ("web:d0", toks, len(toks), "web"),
        ("web:d1", toks, len(toks), "web"),
    ] + [
        (f"web:u{i:03d}", [40_000 + 89 * i + j for j in range(25)], 25, "web")
        for i in range(30)
    ]
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, spark.createDataFrame(rows, TOKEN_TABLE_SCHEMA))

    run_job("canal_spark.jobs.dedup", root, "--index", idx, "--full")

    dry = run_job("canal_spark.jobs.dedup", root, "--index", idx,
                  "--self-dedup", "--dry-run")
    assert dry["dry_run"] and dry["losers_removed"] == 1
    assert load_table(root).row_count() == len(rows)

    res = run_job("canal_spark.jobs.dedup", root, "--index", idx,
                  "--self-dedup", "--wap")
    assert res["applied"] and res["losers_removed"] == 1
    assert res["wap"]["published"] is True
    t = load_table(root)
    assert t.row_count() == len(rows) - 1
    ids = {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()}
    assert "web:d0" in ids and "web:d1" not in ids


def test_dedup_cli_span_cut(tmp_path):
    """--span-cut end-to-end: dry-run reports, real run excises the
    shared run keeping the first copy, band index follows."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("span-cut-cli-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    idx = str(tmp_path / "bands")
    run = list(range(7000, 7006))
    rows = [
        ("web:a", [100 + i for i in range(8)] + run, 8 + len(run), "web"),
        ("web:b", [200 + i for i in range(8)] + run, 8 + len(run), "web"),
        ("web:c", [300 + i for i in range(12)], 12, "web"),
    ]
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, spark.createDataFrame(rows, TOKEN_TABLE_SCHEMA))
    run_job("canal_spark.jobs.dedup", root, "--index", idx, "--full")

    dry = run_job("canal_spark.jobs.dedup", root, "--index", idx,
                  "--span-cut", "--span-w", "4", "--dry-run")
    assert dry["dry_run"] and dry["docs_affected"] == 1
    assert dry["tokens_removed"] == len(run)

    res = run_job("canal_spark.jobs.dedup", root, "--index", idx,
                  "--span-cut", "--span-w", "4", "--wap")
    assert res["applied"] and res["docs_affected"] == 1
    assert res["index_refresh"]["applied"]
    t = load_table(root)
    got = {r["doc_id"]: list(r["tokens"]) for r in t.scan(spark).collect()}
    assert got["web:a"] == rows[0][1]          # first copy kept
    assert got["web:b"] == rows[1][1][:8]      # run excised
    assert got["web:c"] == rows[2][1]


def test_tag_cli_set_list_delete(cli_table):
    root, _, _, _ = cli_table
    res = run_job("canal_spark.jobs.tag", root, "--set", "train-v1")
    assert "train-v1" in res["refs"]
    sid = res["refs"]["train-v1"]["snapshot_id"]
    res = run_job("canal_spark.jobs.tag", root, "--list")
    assert res["refs"]["train-v1"]["snapshot_id"] == sid
    res = run_job("canal_spark.jobs.tag", root, "--delete", "train-v1")
    assert res["refs"] == {} and res["deleted"] == "train-v1"


def test_apply_changelog_cli_batch_wap(tmp_path):
    """--wap on the BATCH path: a corrupt changelog stages, fails the
    audit, aborts (exit 3, table untouched); the fixed one publishes."""
    import datetime as dt

    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import base_table_df, changelog_df, synth_token_rows
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("apply-wap-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(200)
    append(spark, t, base_table_df(spark, 200).repartition(4))
    rows_before = t.row_count()
    E = dt.datetime(2026, 1, 1)

    bad_dir = str(tmp_path / "bad")
    changelog_df(spark, [
        (1, "I", "web:9999999031", [1, 2], 9, "web", E, 1),
    ]).write.parquet(bad_dir)
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "canal_spark.jobs.apply_changelog", root,
         "--changelog", bad_dir, "--wap"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 3, out.stderr[-2000:]
    rep = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert rep["applied"] is False and rep["wap"]["published"] is False
    t = load_table(root)
    assert t.row_count() == rows_before and t.staged_snapshots() == []

    good_dir = str(tmp_path / "good")
    changelog_df(spark, [
        (1, "I", "web:9999999031", [1, 2], 2, "web", E, 1),
    ]).write.parquet(good_dir)
    rep2 = run_job("canal_spark.jobs.apply_changelog", root,
                   "--changelog", good_dir, "--wap")
    assert rep2["applied"] is True and rep2["wap"]["published"] is True
    assert load_table(root).row_count() == rows_before + 1


def test_spark_submit_py_files_zip_ships_the_package(tmp_path):
    """North-rule deployment contract, end to end: the engine runs via
    `spark-submit --py-files canal_spark.zip` with NO repo dir on
    PYTHONPATH and the cwd OUTSIDE the repo — i.e. the package imports
    purely from the shipped zip (no ``__file__``-relative resource
    loads anywhere).  The probe does real maintenance work: create
    table, append, MERGE a changelog, scan — not just an import."""
    import shutil
    import zipfile

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not installed")

    zp = tmp_path / "canal_spark.zip"
    pkg = os.path.join(REPO, "canal_spark")
    with zipfile.ZipFile(zp, "w") as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    probe = tmp_path / "probe.py"
    probe.write_text(
        "import argparse, sys\n"
        "from canal_spark import create_table\n"
        "from canal_spark.jobs.common import session\n"
        "from canal_spark.schema import TOKEN_TABLE_SCHEMA\n"
        "from canal_spark.table.writer import append\n"
        "from canal_spark.changelog import (base_table_df, changelog_df,\n"
        "    synth_changelog_rows, synth_token_rows)\n"
        "from canal_spark.merge import merge_into\n"
        "spark = session(argparse.Namespace(app_name=None), 'zip-probe')\n"
        "t = create_table(sys.argv[1], TOKEN_TABLE_SCHEMA,\n"
        "                 partition_by=['source'])\n"
        "base = synth_token_rows(300)\n"
        "append(spark, t, base_table_df(spark, 300).repartition(4))\n"
        "cl = synth_changelog_rows(base, 80)\n"
        "res = merge_into(spark, t, changelog_df(spark, cl))\n"
        "print('APPLIED=' + str(bool(res.applied)))\n"
        "print('SCAN_ROWS=' + str(t.scan(spark).count()))\n"
        "spark.stop()\n"
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    env.pop("PYTHONPATH", None)
    env.pop("SPARK_GRAFT_MASTER", None)
    out = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", str(zp),
         str(probe), str(tmp_path / "tbl")],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert "APPLIED=True" in lines
    scan = [l for l in lines if l.startswith("SCAN_ROWS=")]
    assert scan and int(scan[0].split("=")[1]) > 0


def test_branch_cli_create_apply_fast_forward(tmp_path):
    """Branch lifecycle across PROCESSES: create (instant metadata job),
    apply a changelog on the branch (spark job), list, fast-forward —
    mainline only moves at publish."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import (
        base_table_df,
        changelog_df,
        synth_changelog_rows,
        synth_token_rows,
    )
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("branch-cli-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(300)
    append(spark, t, base_table_df(spark, 300).repartition(4))
    cl_dir = str(tmp_path / "cl")
    rows = synth_changelog_rows(base, 80, seed=31)
    changelog_df(spark, rows).write.parquet(cl_dir)
    cur_before = t.current_snapshot_id

    res = run_job("canal_spark.jobs.branch", root, "--create", "audit")
    assert res["created"]["audit"]["snapshot_id"] == cur_before

    m = run_job("canal_spark.jobs.apply_changelog", root,
                "--changelog", cl_dir, "--branch", "audit")
    assert m["applied"] is True

    t = load_table(root)
    assert t.current_snapshot_id == cur_before  # mainline untouched
    res = run_job("canal_spark.jobs.branch", root, "--list")
    assert res["refs"]["audit"]["chain_len"] == 1

    res = run_job("canal_spark.jobs.branch", root, "--fast-forward", "audit")
    assert res["refs"] == {}
    t = load_table(root)
    assert t.current_snapshot_id == m["snapshot_id"]
    from canal_spark.changelog import python_oracle_apply

    want = python_oracle_apply({r[0]: (r[1], r[2], r[3]) for r in base}, rows)
    assert t.row_count() == len(want)


def test_tokenizer_cli_train_then_encode(tmp_path):
    """BPE train + encode as spark-submit subprocesses: model round-trips
    through disk (merges.json + vocab parquet) and encoding compresses."""
    docs = "/root/testdata/sf0.001/documents.parquet"
    model = str(tmp_path / "bpe")
    enc = str(tmp_path / "enc")

    res = run_job("canal_spark.jobs.tokenizer", docs,
                  "--model", model, "--train", "--n-merges", "6")
    assert res["train"]["n_merges"] == 6
    assert res["train"]["vocab_words"] > 0
    assert os.path.exists(os.path.join(model, "merges.json"))

    res = run_job("canal_spark.jobs.tokenizer", docs,
                  "--model", model, "--encode", enc)
    assert res["encode"]["docs"] == 500
    assert res["encode"]["compression_permille"] < 1000  # merges compress


def test_schema_cli_ddl_and_spec_evolution(tmp_path):
    """jobs/schema.py: add/rename/retype as metadata-only commits, era
    reads stay correct, spec evolution mints a new spec_id, and
    protected columns are rejected with a non-zero exit."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import base_table_df, synth_token_rows
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("schema-cli-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 200).repartition(2))

    s = run_job("canal_spark.jobs.schema", root,
                "--add", "quality:double", "--retype", "n_tok:long")
    assert s["schema"]["quality"] == "double"
    assert s["schema"]["n_tok"] == "bigint"
    assert "ddl_snapshot_id" in s

    s2 = run_job("canal_spark.jobs.schema", root,
                 "--rename", "tokens=toks",
                 "--evolve-partition-by", "")  # -> unpartitioned spec
    assert "toks" in s2["schema"] and "tokens" not in s2["schema"]
    assert s2["spec_id"] == len(s2["partition_specs"]) - 1
    assert s2["partition_specs"][s2["spec_id"]] == []

    # era read: pre-DDL files project through rename + widen, new
    # column reads null
    t = load_table(root)
    row = t.scan(spark).select("toks", "n_tok", "quality").first()
    assert row["toks"] is not None and row["quality"] is None

    # protected column: key cannot be renamed — job must exit non-zero
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "canal_spark.jobs.schema", root,
         "--rename", "doc_id=id"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert out.returncode != 0

    # --show is read-only
    sid_before = load_table(root).current_snapshot_id
    s3 = run_job("canal_spark.jobs.schema", root, "--show")
    assert s3["schema_id"] == s2["schema_id"]
    assert load_table(root).current_snapshot_id == sid_before


def test_delete_cli_predicate_cut(cli_table):
    """jobs/delete.py: a predicate cut lands as MoR debt, the row effect
    is visible to scans, and a re-run no-ops."""
    from canal_spark import get_spark, load_table

    root, _, _, _ = cli_table
    spark = get_spark("delete-cli-check", master="local[4]",
                      shuffle_partitions=4)
    t = load_table(root)
    before = {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()}
    keep = {
        r["doc_id"]
        for r in t.scan(spark).where("NOT (n_tok % 7 = 2)")
        .select("doc_id").collect()
    }
    assert keep < before

    d = run_job("canal_spark.jobs.delete", root, "--where", "n_tok % 7 = 2")
    assert d["applied"] is True and d["matched_rows"] == len(before) - len(keep)
    t = load_table(root)
    assert {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()} == keep
    assert len(t.delete_files()) >= 1  # MoR debt, repaid by the next pass

    d2 = run_job("canal_spark.jobs.delete", root, "--where", "n_tok % 7 = 2")
    assert d2["applied"] is False

    # repay the debt so later cli_table consumers (export/report, which
    # compare manifest row counts against live rows) see a clean table —
    # and prove CLI-created debt folds through the ordinary path
    from canal_spark.merge import materialize_deletes

    r = materialize_deletes(spark, load_table(root))
    assert r.applied
    t = load_table(root)
    assert t.delete_files() == []
    assert {x["doc_id"] for x in t.scan(spark).select("doc_id").collect()} == keep

    # the UPDATE sibling: backfill a column over a predicate via CLI
    u = run_job("canal_spark.jobs.update", root,
                "--where", "n_tok >= 30", "--set", "source='bulk'")
    assert u["applied"] is True and u["rows_upserted"] > 0
    t = load_table(root)
    got = {
        x["doc_id"]: (x["n_tok"], x["source"])
        for x in t.scan(spark).select("doc_id", "n_tok", "source").collect()
    }
    assert all(src == "bulk" for n, src in got.values() if n >= 30)
    assert any(src != "bulk" for n, src in got.values() if n < 30)

    # the POSITION-delete sibling: exact physical targeting via CLI,
    # rows_deleted is exact (not deferred), debt is pos-delete files,
    # and the fold-through repays it so later cli_table consumers stay
    # clean
    t = load_table(root)
    pre = {r["doc_id"] for r in t.scan(spark).select("doc_id").collect()}
    keep2 = {
        r["doc_id"]
        for r in t.scan(spark).where("NOT (n_tok % 11 = 3)")
        .select("doc_id").collect()
    }
    dp = run_job("canal_spark.jobs.delete", root,
                 "--where", "n_tok % 11 = 3", "--mode", "mor-pos")
    assert dp["applied"] is (len(pre) > len(keep2))
    if dp["applied"]:
        assert dp["rows_deleted"] == len(pre) - len(keep2)
        t = load_table(root)
        assert t.pos_delete_files()
        assert {
            r["doc_id"] for r in t.scan(spark).select("doc_id").collect()
        } == keep2
        r2 = materialize_deletes(spark, load_table(root))
        assert r2.applied
        t = load_table(root)
        assert t.delete_files() == []
        assert {
            r["doc_id"] for r in t.scan(spark).select("doc_id").collect()
        } == keep2


def test_stream_cli_drains_then_replays_noop(tmp_path):
    """jobs/stream.py in drain mode: applies the staged changelog files,
    then a re-run with the SAME checkpoint sees no new input (exactly-
    once across process restarts)."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import (
        base_table_df,
        changelog_df,
        synth_changelog_rows,
        synth_token_rows,
    )
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("stream-cli-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    cl_dir = str(tmp_path / "cl")
    ckpt = str(tmp_path / "ckpt")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(500)
    append(spark, t, base_table_df(spark, 500).repartition(4))
    rows = synth_changelog_rows(base, 120, seed=31)
    changelog_df(spark, rows).write.parquet(cl_dir)

    s = run_job("canal_spark.jobs.stream", root,
                "--changelog", cl_dir, "--checkpoint", ckpt,
                "--target-file-rows", "300")
    assert s["batches_applied"] >= 1
    assert s["quarantined"] == []

    from tests.conftest import oracle_dict, scan_dict

    t = load_table(root)
    assert scan_dict(spark, t) == oracle_dict(base, rows)

    # restart with the same checkpoint: nothing new, zero batches
    s2 = run_job("canal_spark.jobs.stream", root,
                 "--changelog", cl_dir, "--checkpoint", ckpt)
    assert s2["batches_applied"] == 0
    assert scan_dict(spark, load_table(root)) == oracle_dict(base, rows)


def test_export_cli_and_report_cli(cli_table, tmp_path):
    """The consumption loop: tag the current snapshot, export it via the
    CLI, and scrape the health report — the two zero-surprise ops a
    training launch runs."""
    root, cl_dir, base, rows = cli_table
    run_job("canal_spark.jobs.tag", root, "--set", "train-v1")

    out = str(tmp_path / "exp")
    e = run_job("canal_spark.jobs.export", root, "--out", out,
                "--tag", "train-v1", "--shards", "3", "--epoch-seed", "5")
    assert e["shards"] == 3 and e["rows"] > 0
    assert sorted(d for d in os.listdir(out) if d.startswith("shard=")) == [
        "shard=0", "shard=1", "shard=2"
    ]

    r = run_job("canal_spark.jobs.report", root)
    assert r["files"]["rows"] == e["rows"]
    assert r["tags"] == ["train-v1"]
    assert r["current_snapshot_id"] is not None


def test_run_pass_cli_branch_publish(tmp_path):
    """--branch: the whole pass commits on a branch and publishes
    atomically; the emitted report carries the branch outcome."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import (
        base_table_df,
        changelog_df,
        synth_changelog_rows,
        synth_token_rows,
    )
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("run-pass-branch-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    cl_dir = str(tmp_path / "cl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(400)
    append(spark, t, base_table_df(spark, 400).repartition(4))
    rows = synth_changelog_rows(base, 100, seed=41)
    changelog_df(spark, rows).write.parquet(cl_dir)

    rep = run_job("canal_spark.jobs.run_pass", root,
                  "--changelog", cl_dir, "--branch", "nightly",
                  "--target-file-rows", "300")
    assert rep["branch"]["published"] is True
    assert rep["merge"]["applied"] is True and rep["branch"]["commits"] >= 2

    from tests.conftest import oracle_dict, scan_dict

    t = load_table(root)
    assert "nightly" not in t.refs
    assert scan_dict(spark, t) == oracle_dict(base, rows)


def test_schema_cli_set_properties(tmp_path):
    """--set-property/--unset-property: sessionless TBLPROPERTIES CAS,
    reserved checkpoint keys rejected non-zero."""
    from canal_spark import create_table, load_table
    from canal_spark.schema import TOKEN_TABLE_SCHEMA

    root = str(tmp_path / "tbl")
    create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])

    s = run_job("canal_spark.jobs.schema", root,
                "--set-property", "write.bloom.col=doc_id",
                "--set-property", "commit.retries=7")
    assert s["properties"]["write.bloom.col"] == "doc_id"
    assert load_table(root).properties["commit.retries"] == "7"

    s2 = run_job("canal_spark.jobs.schema", root,
                 "--unset-property", "commit.retries")
    assert "commit.retries" not in s2["properties"]

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "canal_spark.jobs.schema", root,
         "--set-property", "merge-hwm-ordinal=5"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert out.returncode != 0


def test_bloom_cli_backfill(tmp_path):
    """jobs/bloom.py --backfill: annotates pre-property files, idempotent."""
    from canal_spark import create_table, get_spark, load_table
    from canal_spark.changelog import base_table_df
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    spark = get_spark("bloom-cli-fixture", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "tbl")
    t = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 300).repartition(3))

    run_job("canal_spark.jobs.schema", root,
            "--set-property", "write.bloom.col=doc_id")
    b = run_job("canal_spark.jobs.bloom", root, "--backfill")
    assert b["annotated"] == 3 and b["already"] == 0
    b2 = run_job("canal_spark.jobs.bloom", root, "--backfill")
    assert b2["annotated"] == 0 and b2["already"] == 3
    t = load_table(root)
    for e in t.files():
        assert "bloom" in e.stats["doc_id"]
