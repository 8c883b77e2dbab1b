"""Multi-destination instance management (instance.py + jobs/server.py)
— the CanalController / SpringInstanceConfigMonitor analogue: conf-dir
scan, start/reload/stop lifecycle, source white/black filters, fleet
failure isolation, parallel == sequential equivalence."""

import json
import os
import subprocess
import sys

import pytest

from tests.conftest import oracle_dict, scan_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_spec(conf_dir, dest, **doc):
    d = conf_dir / dest
    d.mkdir(parents=True, exist_ok=True)
    (d / "instance.json").write_text(json.dumps(doc))
    return d / "instance.json"


def _mk_dest(spark, root_dir, name, n=300, n_changes=120, seed=7):
    """One destination: table + staged changelog dir; returns
    (spec_doc, base_rows, change_rows)."""
    from canal_spark import create_table
    from canal_spark.changelog import (base_table_df, changelog_df,
                                       synth_changelog_rows, synth_token_rows)
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    troot = str(root_dir / f"{name}_tbl")
    cdir = str(root_dir / f"{name}_cl")
    t = create_table(troot, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(n, seed=seed)
    append(spark, t, base_table_df(spark, n, seed=seed).repartition(4))
    rows = synth_changelog_rows(base, n_changes, seed=seed + 1)
    changelog_df(spark, rows).write.parquet(cdir)
    return {"table": troot, "changelog": cdir}, base, rows


# ---- spec parsing -----------------------------------------------------


def test_spec_defaults_and_fingerprint(tmp_path):
    from canal_spark.instance import load_instance

    _write_spec(tmp_path, "a", table="/x", target_mb=64, merge_mode="mor")
    s = load_instance(str(tmp_path), "a")
    assert s.destination == "a"
    assert s.run_pass_kwargs() == {
        "merge_mode": "mor", "target_file_bytes": 64 << 20,
    }
    assert len(s.fingerprint) == 64
    # identical bytes -> identical fingerprint (idempotent rewrite is
    # NOT a reload); any byte change -> different
    fp = s.fingerprint
    _write_spec(tmp_path, "a", table="/x", target_mb=64, merge_mode="mor")
    assert load_instance(str(tmp_path), "a").fingerprint == fp
    _write_spec(tmp_path, "a", table="/x", target_mb=65, merge_mode="mor")
    assert load_instance(str(tmp_path), "a").fingerprint != fp


@pytest.mark.parametrize("doc,msg", [
    ({"table": "/x", "target_md": 64}, "unknown instance keys"),
    ({}, "'table' is required"),
    ({"table": "/x", "wap": "yes"}, "must be a boolean"),
    ({"table": "/x", "target_mb": -1}, "positive integer"),
    ({"table": "/x", "keep_snapshots": "5"}, "must be a number"),
    ({"table": "/x", "changelog": 3}, "must be a string"),
    # malformed regex is a config_error at LOAD time, not a pass_error
    # every round / an HTTP 500 on every consumer get
    ({"table": "/x", "filter_regex": "db1.("}, "not a valid regex"),
    ({"table": "/x", "filter_black_regex": "[z"}, "not a valid regex"),
    # signature family is validated at load time too
    ({"table": "/x", "band_index": "/b",
      "band_index_signature": "simhash"}, "must be one of"),
    ({"table": "/x", "band_index_signature": "winnow"},
     "requires 'band_index'"),
])
def test_spec_validation_errors(tmp_path, doc, msg):
    from canal_spark.instance import load_instance

    _write_spec(tmp_path, "bad", **doc)
    with pytest.raises(ValueError, match=msg):
        load_instance(str(tmp_path), "bad")


def test_scan_skips_support_dirs_and_collects_errors(tmp_path):
    from canal_spark.instance import scan_instances

    _write_spec(tmp_path, "good", table="/x")
    (tmp_path / "spring").mkdir()  # support dir without instance.json
    (tmp_path / "bad").mkdir()
    (tmp_path / "bad" / "instance.json").write_text("{not json")
    specs, errors = scan_instances(str(tmp_path))
    assert set(specs) == {"good"}
    assert set(errors) == {"bad"} and "JSON" in errors["bad"]
    # missing conf dir is an empty fleet, not a crash
    assert scan_instances(str(tmp_path / "nope")) == ({}, {})


# ---- lifecycle (auto-scan) -------------------------------------------


def test_diff_registry_start_reload_stop(tmp_path):
    from canal_spark.instance import diff_registry, scan_instances

    registry = {}
    _write_spec(tmp_path, "a", table="/x")
    _write_spec(tmp_path, "b", table="/y")
    specs, _ = scan_instances(str(tmp_path))
    evs = diff_registry(registry, specs)
    assert [(e["event"], e["destination"]) for e in evs] == [
        ("start", "a"), ("start", "b")]
    # unchanged round: no events
    specs, _ = scan_instances(str(tmp_path))
    assert diff_registry(registry, specs) == []
    # change a's config -> reload; remove b -> stop
    _write_spec(tmp_path, "a", table="/x", target_mb=128)
    import shutil

    shutil.rmtree(tmp_path / "b")
    specs, _ = scan_instances(str(tmp_path))
    evs = diff_registry(registry, specs)
    assert [(e["event"], e["destination"]) for e in evs] == [
        ("reload", "a"), ("stop", "b")]
    assert set(registry) == {"a"}


# ---- server rounds ----------------------------------------------------


def test_two_instances_one_round(spark, tmp_path):
    """Two destinations maintained in one round; each table matches its
    own oracle (per-instance isolation of tables + checkpoints)."""
    from canal_spark import load_table
    from canal_spark.instance import run_server_round, scan_instances

    conf = tmp_path / "conf"
    d1, b1, r1 = _mk_dest(spark, tmp_path, "one", seed=11)
    d2, b2, r2 = _mk_dest(spark, tmp_path, "two", seed=22)
    _write_spec(conf, "one", **d1)
    _write_spec(conf, "two", **d2)
    specs, errors = scan_instances(str(conf))
    assert errors == {}
    results = run_server_round(spark, specs)
    assert set(results) == {"one", "two"}
    for dest, (base, rows, doc) in {
        "one": (b1, r1, d1), "two": (b2, r2, d2),
    }.items():
        assert "error" not in results[dest]
        assert results[dest]["merge"]["applied"]
        lbl = f'canal_instance_put_rows{{destination="{dest}"}}'
        assert results[dest]["metrics"][lbl] > 0
        assert scan_dict(spark, load_table(doc["table"])) == oracle_dict(base, rows)
    # second round replays the same changelog dirs -> hwm no-op
    results2 = run_server_round(spark, specs)
    assert all(not r["merge"]["applied"] for r in results2.values())


def test_source_black_filter_excludes_rows(spark, tmp_path):
    """filter_black_regex drops matching sources from the changelog
    before apply — Canal's filter.black.regex semantics."""
    from canal_spark import load_table
    from canal_spark.instance import load_instance, run_instance_pass

    conf = tmp_path / "conf"
    doc, base, rows = _mk_dest(spark, tmp_path, "flt", seed=5)
    sources = sorted({r[5] for r in rows if r[5] is not None})
    black = sources[0]
    _write_spec(conf, "flt", **doc, filter_black_regex=f"^{black}$")
    spec = load_instance(str(conf), "flt")
    run_instance_pass(spark, spec)
    kept = [r for r in rows if r[5] != black]
    assert scan_dict(spark, load_table(doc["table"])) == oracle_dict(base, kept)


def test_fleet_isolation_bad_table(spark, tmp_path):
    """A destination pointing at a missing table errors in ITS slot;
    the healthy neighbour still applies."""
    from canal_spark import load_table
    from canal_spark.instance import run_server_round, scan_instances

    conf = tmp_path / "conf"
    doc, base, rows = _mk_dest(spark, tmp_path, "ok", seed=3)
    _write_spec(conf, "ok", **doc)
    _write_spec(conf, "broken", table=str(tmp_path / "missing_tbl"))
    specs, _ = scan_instances(str(conf))
    results = run_server_round(spark, specs)
    assert "error" in results["broken"]
    assert results["ok"]["merge"]["applied"]
    assert scan_dict(spark, load_table(doc["table"])) == oracle_dict(base, rows)


def test_parallel_round_matches_sequential(spark, tmp_path):
    """parallel=2 (thread pool, per-destination pools/job groups)
    produces the same table states as sequential."""
    from canal_spark import load_table
    from canal_spark.instance import run_server_round, scan_instances

    conf = tmp_path / "conf"
    d1, b1, r1 = _mk_dest(spark, tmp_path, "p1", seed=41)
    d2, b2, r2 = _mk_dest(spark, tmp_path, "p2", seed=42)
    _write_spec(conf, "p1", **d1)
    _write_spec(conf, "p2", **d2)
    specs, _ = scan_instances(str(conf))
    results = run_server_round(spark, specs, parallel=2)
    assert all("error" not in r for r in results.values())
    assert scan_dict(spark, load_table(d1["table"])) == oracle_dict(b1, r1)
    assert scan_dict(spark, load_table(d2["table"])) == oracle_dict(b2, r2)


def test_changelog_dir_absent_still_maintains(spark, tmp_path):
    """An instance whose producer hasn't started yet (no changelog dir)
    still gets compaction/clustering — changes=None pass."""
    from canal_spark.instance import load_instance, run_instance_pass

    conf = tmp_path / "conf"
    doc, _, _ = _mk_dest(spark, tmp_path, "idle", seed=9)
    doc["changelog"] = str(tmp_path / "never_created")
    _write_spec(conf, "idle", **doc)
    r = run_instance_pass(spark, load_instance(str(conf), "idle"))
    assert "error" not in r
    assert not r["merge"].get("applied")
    assert r["compact"] is not None


# ---- streaming instances ---------------------------------------------


def test_stream_spec_validation(tmp_path):
    from canal_spark.instance import load_instance

    # stream mode requires checkpoint + changelog
    _write_spec(tmp_path, "s1", table="/x", mode="stream", changelog="/c")
    with pytest.raises(ValueError, match="checkpoint"):
        load_instance(str(tmp_path), "s1")
    _write_spec(tmp_path, "s2", table="/x", mode="stream", checkpoint="/k")
    with pytest.raises(ValueError, match="changelog"):
        load_instance(str(tmp_path), "s2")
    # batch-only knob in stream mode is a config bug, not ignored
    _write_spec(tmp_path, "s3", table="/x", mode="stream", changelog="/c",
                checkpoint="/k", curve="hilbert")
    with pytest.raises(ValueError, match="do not apply to mode='stream'"):
        load_instance(str(tmp_path), "s3")
    # stream-only knob in batch mode likewise
    _write_spec(tmp_path, "s4", table="/x", checkpoint="/k")
    with pytest.raises(ValueError, match="do not apply to mode='batch'"):
        load_instance(str(tmp_path), "s4")
    # valid stream spec forwards only the stream knobs
    _write_spec(tmp_path, "s5", table="/x", mode="stream", changelog="/c",
                checkpoint="/k", merge_mode="mor", max_files_per_trigger=2)
    s = load_instance(str(tmp_path), "s5")
    assert s.mode == "stream"
    assert s.stream_kwargs() == {"merge_mode": "mor", "max_files_per_trigger": 2}
    # derived-store roots are valid in BOTH modes (per-round vs
    # per-micro-batch sync); they ride the spec, not stream_kwargs
    _write_spec(tmp_path, "s6", table="/x", mode="stream", changelog="/c",
                checkpoint="/k", band_index="/b", ivf_index="/v")
    s6 = load_instance(str(tmp_path), "s6")
    assert s6.band_index == "/b" and s6.ivf_index == "/v"
    assert "band_index" not in s6.stream_kwargs()


def _wait_until(fn, timeout=120.0, interval=0.5):
    import time

    end = time.time() + timeout
    while time.time() < end:
        if fn():
            return True
        time.sleep(interval)
    return False


def test_stream_fleet_lifecycle(spark, tmp_path):
    """StreamFleet start -> apply -> second batch -> reload (restart)
    -> stop; the black filter rides the stream transform; final table
    matches the Python oracle over both batches."""
    from canal_spark import create_table, load_table
    from canal_spark.changelog import (base_table_df, changelog_df,
                                       synth_changelog_rows, synth_token_rows)
    from canal_spark.instance import StreamFleet, scan_instances
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    conf = tmp_path / "conf"
    troot = str(tmp_path / "st_tbl")
    cdir = tmp_path / "st_cl"
    cdir.mkdir()
    t = create_table(troot, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(200, seed=31)
    append(spark, t, base_table_df(spark, 200, seed=31).repartition(2))
    rows1 = synth_changelog_rows(base, 60, seed=32)
    changelog_df(spark, rows1).coalesce(1).write.mode("append").parquet(str(cdir))
    sources = sorted({r[5] for r in rows1 if r[5] is not None})
    black = sources[0]

    _write_spec(conf, "st", table=troot, mode="stream",
                changelog=str(cdir), checkpoint=str(tmp_path / "ckpt"),
                filter_black_regex=f"^{black}$")
    specs, errors = scan_instances(str(conf))
    assert errors == {}

    fleet = StreamFleet(spark)
    try:
        evs = fleet.sync(specs)
        assert [(e["event"], e["destination"]) for e in evs] == [("start", "st")]
        assert fleet.sync(specs) == []  # unchanged round: no events

        def kept(rows):
            return [r for r in rows if r[5] != black]

        want1 = oracle_dict(base, kept(rows1))
        assert _wait_until(
            lambda: scan_dict(spark, load_table(troot)) == want1
        )
        rows2 = synth_changelog_rows(base, 40, seed=33, start_ordinal=61)
        changelog_df(spark, rows2).coalesce(1).write.mode("append").parquet(str(cdir))
        want2 = oracle_dict(base, kept(rows1) + kept(rows2))
        assert _wait_until(
            lambda: scan_dict(spark, load_table(troot)) == want2
        )
        h = fleet.health()
        assert h[0]["active"] and h[0]["batches_applied"] >= 1
        assert h[0]["error"] is None

        # reload: changed spec restarts the query (new run id), and the
        # checkpoint + hwm make the replay a no-op
        old_run = fleet._running["st"][1].query.runId
        _write_spec(conf, "st", table=troot, mode="stream",
                    changelog=str(cdir), checkpoint=str(tmp_path / "ckpt"),
                    filter_black_regex=f"^{black}$", max_files_per_trigger=1)
        specs, _ = scan_instances(str(conf))
        evs = fleet.sync(specs)
        assert [e["event"] for e in evs] == ["reload"]
        assert fleet._running["st"][1].query.runId != old_run
        assert _wait_until(lambda: fleet._running["st"][1].query.isActive)
        assert scan_dict(spark, load_table(troot)) == want2

        # removing the spec stops the query
        import shutil

        shutil.rmtree(conf / "st")
        specs, _ = scan_instances(str(conf))
        evs = fleet.sync(specs)
        assert [e["event"] for e in evs] == ["stop"]
        assert fleet._running == {}
    finally:
        fleet.stop_all()


def test_stream_fleet_reload_soak(spark, tmp_path):
    """Churn soak: several reload cycles, each with a fresh batch
    landing concurrently with the restart.  Pins the always-on parity
    claims under churn: the final table matches the exactly-once
    oracle over EVERY batch (no checkpoint drift — no double-apply, no
    skipped ordinals across restarts), every reload really restarted
    the query (distinct run ids), and the per-micro-batch-maintained
    band index equals a from-scratch rebuild of the final state."""
    from canal_spark import create_table, load_table
    from canal_spark.changelog import (base_table_df, changelog_df,
                                       initial_state, synth_changelog_rows,
                                       synth_token_rows)
    from canal_spark.dedup_index import (create_band_index,
                                         load_or_create_band_index,
                                         refresh_band_index)
    from canal_spark.instance import StreamFleet, scan_instances
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    conf = tmp_path / "conf"
    troot = str(tmp_path / "soak_tbl")
    cdir = tmp_path / "soak_cl"
    cdir.mkdir()
    t = create_table(troot, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(150, seed=41)
    append(spark, t, base_table_df(spark, 150, seed=41).repartition(2))
    band_root = str(tmp_path / "soak_bands")

    def write_soak_spec(knob):
        _write_spec(conf, "soak", table=troot, mode="stream",
                    changelog=str(cdir),
                    checkpoint=str(tmp_path / "ckpt"),
                    band_index=band_root, max_files_per_trigger=knob)

    all_rows = []
    # threaded running state: without it each batch's synthetic no-op
    # updates (before == after) would carry the BASE value for keys an
    # earlier batch changed — the engine rightly suppresses those while
    # the oracle applies them (see synth_changelog_rows docstring)
    st = initial_state(base)

    def land(seed, start):
        rows = synth_changelog_rows(
            base, 40, seed=seed, start_ordinal=start, state=st
        )
        changelog_df(spark, rows).coalesce(1).write.mode("append").parquet(
            str(cdir)
        )
        all_rows.extend(rows)

    def table_settled():
        return scan_dict(spark, load_table(troot)) == oracle_dict(
            base, all_rows
        )

    land(42, 1)
    write_soak_spec(4)
    specs, errors = scan_instances(str(conf))
    assert errors == {}
    fleet = StreamFleet(spark)
    try:
        assert [e["event"] for e in fleet.sync(specs)] == ["start"]
        assert _wait_until(table_settled)
        run_ids = {fleet._running["soak"][1].query.runId}
        for cycle in range(3):
            land(43 + cycle, 1000 * (cycle + 1) + 1)  # batch in flight...
            write_soak_spec(1 + cycle % 2)  # ...while the spec churns
            specs, _ = scan_instances(str(conf))
            assert [e["event"] for e in fleet.sync(specs)] == ["reload"]
            run_ids.add(fleet._running["soak"][1].query.runId)
            assert _wait_until(table_settled)
        assert len(run_ids) == 4
        h = fleet.health()
        assert h[0]["active"] and h[0]["error"] is None

        # band-index == from-scratch rebuild of the final state.  Waited
        # for INSIDE the running fleet: the final epoch's index sync
        # follows its merge commit within the same micro-batch callback,
        # so the table settling does not yet mean the sync ran — tearing
        # the fleet down here would interrupt it (the crash window whose
        # repair is the NEXT epoch's job, which a stopped stream never
        # gets).
        final = load_table(troot)
        rebuilt = create_band_index(str(tmp_path / "soak_bands2"))
        refresh_band_index(spark, final, rebuilt)

        def band_set(ix):
            return {(r["doc_id"], r["band"], r["bucket"])
                    for r in ix.refresh().scan(spark).collect()}

        want_bands = band_set(rebuilt)
        idx = load_or_create_band_index(band_root)
        assert _wait_until(lambda: band_set(idx) == want_bands, timeout=60)
    finally:
        fleet.stop_all()


def test_stream_fleet_start_error_isolated(spark, tmp_path):
    """A stream spec with a missing table emits start_error; a healthy
    neighbour starts."""
    from canal_spark import create_table
    from canal_spark.changelog import base_table_df, synth_token_rows
    from canal_spark.instance import StreamFleet, scan_instances
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    conf = tmp_path / "conf"
    troot = str(tmp_path / "ok_tbl")
    cdir = tmp_path / "ok_cl"
    cdir.mkdir()
    t = create_table(troot, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 50, seed=61).repartition(1))
    _write_spec(conf, "okst", table=troot, mode="stream",
                changelog=str(cdir), checkpoint=str(tmp_path / "k1"))
    _write_spec(conf, "badst", table=str(tmp_path / "missing"), mode="stream",
                changelog=str(cdir), checkpoint=str(tmp_path / "k2"))
    specs, _ = scan_instances(str(conf))
    fleet = StreamFleet(spark)
    try:
        evs = {e["destination"]: e["event"] for e in fleet.sync(specs)}
        assert evs == {"okst": "start", "badst": "start_error"}
        assert set(fleet._running) == {"okst"}
    finally:
        fleet.stop_all()


# ---- CLI --------------------------------------------------------------


def test_server_cli_subprocess(tmp_path):
    """jobs/server.py end-to-end: scan -> start events -> passes ->
    round summary, one JSON line each (the tailable machine surface)."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    setup = f"""
import json, sys
sys.path.insert(0, {REPO!r})
from canal_spark import get_spark, create_table
from canal_spark.changelog import (base_table_df, changelog_df,
    synth_changelog_rows, synth_token_rows)
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.writer import append
spark = get_spark("fixture", master="local[4]", shuffle_partitions=4)
for name, seed in [("alpha", 1), ("beta", 2)]:
    troot = {str(tmp_path)!r} + "/" + name + "_tbl"
    cdir = {str(tmp_path)!r} + "/" + name + "_cl"
    t = create_table(troot, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    base = synth_token_rows(200, seed=seed)
    append(spark, t, base_table_df(spark, 200, seed=seed).repartition(2))
    changelog_df(spark, synth_changelog_rows(base, 60, seed=seed)).write.parquet(cdir)
    import os, json as j
    os.makedirs({str(tmp_path)!r} + "/conf/" + name, exist_ok=True)
    with open({str(tmp_path)!r} + "/conf/" + name + "/instance.json", "w") as f:
        j.dump({{"table": troot, "changelog": cdir, "keep_snapshots": 3}}, f)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", setup], capture_output=True,
                         text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    out = subprocess.run(
        [sys.executable, "-m", "canal_spark.jobs.server",
         str(tmp_path / "conf"), "--rounds", "1", "--parallel", "2",
         "--metrics-port", "0"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    events = [l["event"] for l in lines]
    assert events.count("start") == 2
    assert events.count("pass") == 2
    ep = [l for l in lines if l["event"] == "metrics_endpoint"][0]
    assert ep["path"] == "/metrics" and ep["port"] > 0
    summary = [l for l in lines if l["event"] == "round"][0]
    assert summary == {"event": "round", "round": 1, "instances": 2,
                       "ok": 2, "failed": 0, "config_errors": 0}
    for l in lines:
        if l["event"] == "pass":
            lbl = f'canal_instance_put_rows{{destination="{l["destination"]}"}}'
            assert l["metrics"][lbl] > 0


class _DeadHandle:
    """Stub of a StreamApplyHandle whose query died: stop() re-raises
    the streaming exception (awaitTermination semantics)."""

    class _Res:
        batches_seen = 3
        batches_applied = 2
        quarantined = ()
        quarantined_total = 0

    result = _Res()

    def stop(self, await_seconds=None):
        raise RuntimeError("query terminated with exception: boom")


def test_fleet_sync_survives_died_query(spark):
    """A destination whose query died and whose spec then disappears
    must produce a stop event with the error — never abort the sync
    (fleet isolation through the stop path)."""
    from canal_spark.instance import StreamFleet

    fleet = StreamFleet(spark)
    fleet._running["dead"] = ("fp0", _DeadHandle())
    events = fleet.sync({})  # spec gone -> stop the died query
    assert events == [
        {"event": "stop", "destination": "dead",
         "error": "RuntimeError: query terminated with exception: boom"}
    ]
    assert fleet._running == {}


def test_stop_all_reports_died_query(spark):
    from canal_spark.instance import StreamFleet

    fleet = StreamFleet(spark)
    fleet._running["dead"] = ("fp0", _DeadHandle())
    out = fleet.stop_all()
    assert out["dead"]["batches_seen"] == 3
    assert out["dead"]["batches_applied"] == 2
    assert "RuntimeError" in out["dead"]["error"]


def test_transient_config_error_does_not_stop_instance(tmp_path):
    """A registered destination whose instance.json fails ONE scan
    (mid-rewrite by a config tool, transient read error) is kept —
    logged and skipped, the reference's behavior — not stopped and
    churned back up when the file heals."""
    import json as _json

    from canal_spark.instance import diff_registry, scan_instances

    conf = tmp_path / "conf"
    d = conf / "d1"
    d.mkdir(parents=True)
    spec_doc = {"table": str(tmp_path / "tbl")}
    (d / "instance.json").write_text(_json.dumps(spec_doc))
    registry: dict = {}
    specs, errors = scan_instances(str(conf))
    assert [e["event"] for e in diff_registry(registry, specs, errors)] == ["start"]
    fp = registry["d1"]

    # a torn write lands: the scan errors, but the instance must stay
    (d / "instance.json").write_text('{"table": ')
    specs, errors = scan_instances(str(conf))
    assert "d1" in errors
    assert diff_registry(registry, specs, errors) == []
    assert registry["d1"] == fp  # still registered, old fingerprint

    # the file heals unchanged: no spurious start/reload either
    (d / "instance.json").write_text(_json.dumps(spec_doc))
    specs, errors = scan_instances(str(conf))
    assert diff_registry(registry, specs, errors) == []

    # a REAL removal still stops
    (d / "instance.json").unlink()
    specs, errors = scan_instances(str(conf))
    assert [e["event"] for e in diff_registry(registry, specs, errors)] == ["stop"]
    assert "d1" not in registry


def test_table_must_be_string(tmp_path):
    import json as _json

    import pytest as _pytest

    from canal_spark.instance import load_instance

    d = tmp_path / "d9"
    d.mkdir()
    (d / "instance.json").write_text(_json.dumps({"table": 123}))
    with _pytest.raises(ValueError, match="'table' must be a string"):
        load_instance(str(tmp_path), "d9")
