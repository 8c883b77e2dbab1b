"""Batch-consumer protocol (consumer.py, C5) — the
CanalServerWithEmbedded subscribe/getWithoutAck/ack/rollback surface:
batch-id monotonicity, in-order ack enforcement, rollback redelivery,
durable cursor resume, filter semantics, FlatMessage symmetry with the
Kafka ingest decoder, and the HTTP wire form."""

import json
import os
import urllib.error
import urllib.request

import pytest

from canal_spark.changelog import changelog_df, synth_changelog_rows, synth_token_rows
from canal_spark.consumer import ConsumerServer, start_consumer_http


@pytest.fixture()
def staged(spark, tmp_path):
    """A staged changelog dir + the rows it holds (ordinal-sorted)."""
    base = synth_token_rows(300)
    rows = sorted(synth_changelog_rows(base, 120, seed=91), key=lambda r: r[0])
    changelog_df(spark, rows).repartition(4).write.parquet(
        str(tmp_path / "changelog")
    )
    srv = ConsumerServer(
        spark, str(tmp_path / "changelog"), str(tmp_path / "meta")
    )
    return srv, rows


def _ids(entries):
    return [json.loads(e)["data"][0]["doc_id"] for e in entries]


def test_get_ack_cursor_flow(staged):
    srv, rows = staged
    srv.subscribe("c1")
    m1 = srv.get_without_ack("c1", batch_size=50)
    assert m1.id == 1 and len(m1.entries) == 50
    # entries are FlatMessage JSON in ordinal order
    assert _ids(m1.entries) == [r[2] for r in rows[:50]]
    env = json.loads(m1.entries[0])
    assert set(env) >= {"database", "table", "type", "es", "ts", "pkNames", "data"}
    # streaming get: the next batch continues past the unacked first
    m2 = srv.get_without_ack("c1", batch_size=50)
    assert m2.id == 2
    assert _ids(m2.entries) == [r[2] for r in rows[50:100]]
    srv.ack("c1", 1)
    srv.ack("c1", 2)
    m3 = srv.get_without_ack("c1", batch_size=50)
    assert m3.id == 3 and len(m3.entries) == 20
    srv.ack("c1", 3)
    # drained: empty packet, id -1, and NO batch id burned (:345)
    m4 = srv.get_without_ack("c1", batch_size=50)
    assert m4.is_empty and m4.entries == []
    assert srv.get_without_ack("c1", batch_size=50).id == -1
    m5 = srv.get_without_ack("c1", batch_size=10)
    assert m5.id == -1  # still nothing; ids continue from 4 when data arrives


def test_ack_must_be_in_order_and_exist(staged):
    srv, _ = staged
    srv.subscribe("c1")
    assert srv.get_without_ack("c1", 30).id == 1
    assert srv.get_without_ack("c1", 30).id == 2
    assert srv.list_batch_ids("c1") == [1, 2]
    with pytest.raises(ValueError, match="batchId:2 is not the firstly:1"):
        srv.ack("c1", 2)
    with pytest.raises(ValueError, match="batchId:9 is not exist"):
        srv.ack("c1", 9)
    srv.ack("c1", 1)
    srv.ack("c1", 2)
    with pytest.raises(ValueError, match="batchId:1 is not exist"):
        srv.ack("c1", 1)  # duplicate ack


def test_rollback_redelivers_with_fresh_ids(staged):
    srv, _ = staged
    srv.subscribe("c1")
    m1 = srv.get_without_ack("c1", 40)
    m2 = srv.get_without_ack("c1", 40)
    srv.rollback("c1")
    assert srv.list_batch_ids("c1") == []
    def _payload(entries):
        # the envelope's ts is DELIVERY time (current_timestamp) and
        # legitimately differs between deliveries; identity is the rest
        return [{k: v for k, v in json.loads(e).items() if k != "ts"}
                for e in entries]

    r1 = srv.get_without_ack("c1", 40)
    # same events redelivered, batch ids NEVER reused (monotone counter)
    assert r1.id == 3 and _payload(r1.entries) == _payload(m1.entries)
    r2 = srv.get_without_ack("c1", 40)
    assert r2.id == 4 and _payload(r2.entries) == _payload(m2.entries)
    # batch-id rollback validates the id but still requeues everything
    with pytest.raises(ValueError, match="batchId:9 is not exist"):
        srv.rollback("c1", 9)
    srv.rollback("c1", 3)
    assert _payload(srv.get_without_ack("c1", 40).entries) == _payload(m1.entries)


def test_unsubscribed_client_raises(staged):
    srv, _ = staged
    with pytest.raises(KeyError, match="subscribed"):
        srv.get_without_ack("ghost", 10)


def test_get_auto_acks(staged):
    srv, rows = staged
    srv.subscribe("c1")
    m = srv.get("c1", 60)
    assert m.id == 1 and srv.list_batch_ids("c1") == []
    m2 = srv.get("c1", 60)
    assert _ids(m2.entries) == [r[2] for r in rows[60:120]]


def test_durable_cursor_resumes_across_server_restart(spark, staged, tmp_path):
    srv, rows = staged
    srv.subscribe("c1")
    srv.ack("c1", srv.get_without_ack("c1", 70).id)
    srv.get_without_ack("c1", 30)  # unacked in-flight at "crash"
    # new server process over the same meta dir: the reference client
    # reconnect sequence is subscribe + rollback, then consume
    srv2 = ConsumerServer(spark, srv.changelog_dir, srv.meta_dir)
    assert srv2.subscribe("c1")["cursor"] > 0
    srv2.rollback("c1")
    m = srv2.get_without_ack("c1", 100)
    # exactly the unacked tail, nothing acked replayed, nothing lost
    assert _ids(m.entries) == [r[2] for r in rows[70:120]]


def test_unsubscribe_drops_durable_meta(staged):
    srv, _ = staged
    srv.subscribe("c1")
    srv.ack("c1", srv.get_without_ack("c1", 50).id)
    srv.unsubscribe("c1")
    assert not os.path.exists(os.path.join(srv.meta_dir, "c1.json"))
    srv.subscribe("c1")
    assert srv.get_without_ack("c1", 50).id == 1  # fresh meta, from head


def test_filter_regex_null_source_kept(spark, tmp_path):
    base = synth_token_rows(200)
    rows = sorted(synth_changelog_rows(base, 80, seed=17), key=lambda r: r[0])
    changelog_df(spark, rows).write.parquet(str(tmp_path / "cl"))
    srv = ConsumerServer(spark, str(tmp_path / "cl"), str(tmp_path / "meta"))
    srv.subscribe("c1", filter_regex="^web$")
    got = srv.get_without_ack("c1", 200)
    want = [r[2] for r in rows if r[5] is None or r[5] == "web"]
    assert _ids(got.entries) == want
    # null-source deletes ARE delivered (dropping an unclassifiable
    # delete would leak the key at the consumer forever)
    assert any(json.loads(e)["type"] == "DELETE" for e in got.entries)


def test_multi_stream_changelog_rejected(spark, tmp_path):
    from pyspark.sql import functions as F

    base = synth_token_rows(50)
    rows = synth_changelog_rows(base, 20, seed=3)
    changelog_df(spark, rows).withColumn("stream_id", F.lit("s1")).write.parquet(
        str(tmp_path / "cl")
    )
    srv = ConsumerServer(spark, str(tmp_path / "cl"), str(tmp_path / "meta"))
    with pytest.raises(ValueError, match="stream_apply"):
        srv.subscribe("c1")


def test_multi_stream_appearing_after_subscribe_rejected(spark, tmp_path):
    """A destination configured before its producer starts subscribes
    against an empty dir (probe skipped); a multi-stream producer that
    then appears must be refused at FETCH time — consuming it would
    ack stream A's ordinals and silently skip stream B's."""
    from pyspark.sql import functions as F

    srv = ConsumerServer(spark, str(tmp_path / "cl"), str(tmp_path / "meta"))
    srv.subscribe("c1")  # empty dir: subscribe-time probe is skipped
    base = synth_token_rows(50)
    rows = synth_changelog_rows(base, 20, seed=3)
    changelog_df(spark, rows).withColumn("stream_id", F.lit("s1")).write.parquet(
        str(tmp_path / "cl")
    )
    with pytest.raises(ValueError, match="stream_apply"):
        srv.get_without_ack("c1", 10)


def test_auto_ack_get_refused_while_batches_outstanding(staged):
    """get (auto-ack) with an older unacked batch must fail BEFORE
    fetching: failing after would persist the new batch, advance the
    get-pointer past its ordinals, and drop the entries — one
    undeliverable batch burned per retry."""
    srv, rows = staged
    srv.subscribe("c1")
    m1 = srv.get_without_ack("c1", 40)
    assert m1.id == 1
    with pytest.raises(ValueError, match="outstanding"):
        srv.get("c1", 40)
    # nothing burned: batch 1 is still the only outstanding batch and
    # the next plain fetch continues from batch 1's end, no gap
    assert srv.list_batch_ids("c1") == [1]
    m2 = srv.get_without_ack("c1", 40)
    assert _ids(m2.entries) == [r[2] for r in rows[40:80]]
    # after a rollback clears the outstanding set, auto-ack works again
    srv.rollback("c1")
    m3 = srv.get("c1", 40)
    assert m3.id > m2.id and _ids(m3.entries) == [r[2] for r in rows[0:40]]


def test_empty_store_returns_empty_packet(spark, tmp_path):
    srv = ConsumerServer(spark, str(tmp_path / "nope"), str(tmp_path / "meta"))
    srv.subscribe("c1")
    assert srv.get_without_ack("c1", 10).is_empty


def test_entries_decode_through_kafka_ingest(spark, staged):
    """C5/C7 symmetry: a consumer batch wrapped as Kafka records decodes
    through kafka_changelog_frame back into changelog rows — the same
    envelope end to end."""
    from pyspark.sql import functions as F

    from canal_spark.streaming.apply import kafka_changelog_frame

    srv, rows = staged
    srv.subscribe("c1")
    m = srv.get_without_ack("c1", 40)
    records = (
        spark.createDataFrame([(e,) for e in m.entries], "value string")
        .withColumn("value", F.col("value").cast("binary"))
        .withColumn("key", F.lit(None).cast("binary"))
        .withColumn("topic", F.lit("t"))
        .withColumn("partition", F.lit(0))
        .withColumn("offset", F.monotonically_increasing_id())
    )
    decoded = {r["doc_id"]: r for r in kafka_changelog_frame(records).collect()}
    want = {r[2]: r for r in rows[:40]}
    assert set(decoded) == set(want)
    for doc_id, r in want.items():
        d = decoded[doc_id]
        assert d["op"] == r[1]
        if r[1] != "D":
            assert list(d["tokens"]) == list(r[3]) and d["n_tok"] == r[4]


def _http(method, url, body=None):
    req = urllib.request.Request(
        url, method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_wire_form(staged):
    srv, rows = staged
    active = {"on": True}
    http = start_consumer_http(
        {"example": srv}, port=0, is_active=lambda d: active["on"]
    )
    try:
        base = f"http://127.0.0.1:{http.server_address[1]}/client/example/c1"
        code, out = _http("POST", f"{base}/subscribe", {"filter": None})
        assert code == 200 and out["client_id"] == "c1"
        code, out = _http("GET", f"{base}/get?batchSize=30")
        assert code == 200 and out["id"] == 1 and len(out["entries"]) == 30
        assert _ids(out["entries"]) == [r[2] for r in rows[:30]]
        code, _ = _http("POST", f"{base}/ack?batchId=1")
        assert code == 200
        code, out = _http("POST", f"{base}/ack?batchId=1")  # duplicate
        assert code == 400 and "is not exist" in out["error"]
        code, out = _http("GET", f"{base}/get?batchSize=500&ack=1")  # auto-ack get
        assert code == 200 and out["id"] == 2 and len(out["entries"]) == 90
        code, out = _http("GET", f"{base}/get?batchSize=10")
        assert code == 200 and out["id"] == -1
        code, out = _http("GET", f"{base}/batches")
        assert code == 200 and out["batches"] == []
        code, out = _http("POST", f"{base}/rollback")
        assert code == 200
        # unknown destination and standby gating
        code, out = _http("GET", f"http://127.0.0.1:{http.server_address[1]}"
                                 f"/client/ghost/c1/get")
        assert code == 404
        active["on"] = False
        code, out = _http("GET", f"{base}/get?batchSize=10")
        assert code == 503 and "not the running server" in out["error"]
    finally:
        http.shutdown()


def test_server_cli_client_port_end_to_end(tmp_path):
    """jobs/server.py --client-port serves the consumer protocol for a
    conf-dir destination: subscribe, consume the staged changelog in
    acked batches, drain to an empty packet — against a live fleet
    server process."""
    import subprocess
    import sys
    import time

    from tests.test_instance import REPO

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    setup = f"""
import json, os, sys
sys.path.insert(0, {REPO!r})
from canal_spark import get_spark, create_table
from canal_spark.changelog import (base_table_df, changelog_df,
    synth_changelog_rows, synth_token_rows)
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.writer import append
spark = get_spark("fixture", master="local[4]", shuffle_partitions=4)
troot = {str(tmp_path)!r} + "/alpha_tbl"
t = create_table(troot, TOKEN_TABLE_SCHEMA, partition_by=["source"])
base = synth_token_rows(150)
append(spark, t, base_table_df(spark, 150).repartition(2))
cl = synth_changelog_rows(base, 60, seed=7)
changelog_df(spark, cl).write.parquet({str(tmp_path)!r} + "/alpha_cl")
os.makedirs({str(tmp_path)!r} + "/conf/alpha", exist_ok=True)
with open({str(tmp_path)!r} + "/conf/alpha/instance.json", "w") as f:
    json.dump({{"table": troot, "changelog": {str(tmp_path)!r} + "/alpha_cl"}}, f)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", setup], capture_output=True,
                         text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]

    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "canal_spark.jobs.server",
         str(tmp_path / "conf"), "--rounds", "0", "--scan-interval", "1",
         "--client-port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=REPO,
    )
    try:
        port = None
        passed = False
        deadline = time.time() + 240
        while time.time() < deadline and not (port and passed):
            line = proc.stdout.readline()
            if not line:
                break
            if line.startswith("{"):
                ev = json.loads(line)
                if ev.get("event") == "client_endpoint":
                    port = ev["port"]
                elif ev.get("event") == "pass":
                    passed = True
        assert port and passed, "server never became ready"
        base = f"http://127.0.0.1:{port}/client/alpha/cli"
        code, _ = _http("POST", f"{base}/subscribe", {})
        assert code == 200
        seen = 0
        while True:
            code, out = _http("GET", f"{base}/get?batchSize=25")
            assert code == 200
            if out["id"] == -1:
                break
            seen += len(out["entries"])
            code, _ = _http("POST", f"{base}/ack?batchId={out['id']}")
            assert code == 200
        assert seen == 60
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_http_malformed_body_is_400(staged):
    """A garbage JSON body must come back as a 400 error payload, not a
    dropped connection (the parse happens inside the handler's error
    boundary)."""
    srv, _rows = staged
    http = start_consumer_http({"example": srv}, port=0)
    try:
        base = f"http://127.0.0.1:{http.server_address[1]}/client/example/cbad"
        req = urllib.request.Request(
            f"{base}/subscribe", method="POST", data=b"{not json",
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                code, out = resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            code, out = e.code, json.loads(e.read())
        assert code == 400 and "invalid JSON body" in out["error"]
    finally:
        http.shutdown()


def test_concurrent_clients_are_independent(staged):
    """Per-CLIENT locks: many clients drain the same destination from
    concurrent threads without cross-client serialization corrupting
    any stream — every client sees the full changelog exactly once,
    in ordinal order, with its own monotone batch ids."""
    import threading

    srv, rows = staged
    want = [r[2] for r in rows]
    out: dict[str, list] = {}
    errs: list[Exception] = []

    def drain(cid: str) -> None:
        try:
            srv.subscribe(cid)
            got: list = []
            ids: list[int] = []
            while True:
                m = srv.get_without_ack(cid, batch_size=17)
                if m.is_empty:
                    break
                ids.append(m.id)
                got.extend(_ids(m.entries))
                srv.ack(cid, m.id)
            assert ids == sorted(ids) and len(set(ids)) == len(ids)
            out[cid] = got
        except Exception as e:  # surface to the main thread
            errs.append(e)

    threads = [
        threading.Thread(target=drain, args=(f"c{i}",)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs, errs
    assert len(out) == 4
    for cid, got in out.items():
        assert got == want, f"client {cid} stream diverged"


def test_unsubscribe_marks_instance_dead_no_resurrection(staged):
    """A verb that resolved its _ClientMeta just before a concurrent
    unsubscribe popped it must fail like an unsubscribed client when it
    finally acquires the lock — its save() must never resurrect the
    deleted meta file."""
    srv, rows = staged
    srv.subscribe("c1")
    m = srv._client("c1")
    srv.unsubscribe("c1")
    assert m.dead and not os.path.exists(m.path)
    # the in-flight verb's path: the dead check refuses the instance
    with pytest.raises(KeyError):
        with m.lock:
            srv._check_live(m, "c1")
    # a fresh verb fails the ordinary not-subscribed way
    with pytest.raises(KeyError):
        srv.get_without_ack("c1")
    assert not os.path.exists(m.path)
    # re-subscribe starts clean at the store head, not the old cursor
    out = srv.subscribe("c1")
    assert out["cursor"] == 0


def test_concurrent_auto_ack_gets_share_one_stream(staged):
    """get (auto-ack) holds ONE lock across fetch+ack — two threads
    draining the same client split the changelog exactly once between
    them with no 'is not the firstly' wedge (the reference runs get in
    a single synchronized block)."""
    import threading

    srv, rows = staged
    srv.subscribe("c1")
    got: list = []
    errs: list = []

    def drain() -> None:
        try:
            while True:
                m = srv.get("c1", batch_size=13)
                if m.is_empty:
                    return
                got.extend(_ids(m.entries))
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=drain) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs, errs
    assert sorted(got) == sorted(r[2] for r in rows)  # once each, no gaps
