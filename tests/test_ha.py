"""Active/standby failover (ha.py + jobs/server.py --ha) — the
ServerRunningMonitor ephemeral-node election mapped onto atomic-rename
lease files: acquisition, heartbeat TTL, stale takeover, stolen-lease
demotion, voluntary release, and fleet-level destination splitting."""

import json
import os

from canal_spark.ha import DestinationLease, FleetHA


class Clock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def _mk(conf, dest):
    os.makedirs(os.path.join(conf, dest), exist_ok=True)


def test_acquire_is_exclusive_and_idempotent(tmp_path):
    conf = str(tmp_path)
    _mk(conf, "d1")
    clock = Clock()
    a = DestinationLease(conf, "d1", "srv-a", ttl_s=30, _clock=clock)
    b = DestinationLease(conf, "d1", "srv-b", ttl_s=30, _clock=clock)
    assert a.try_acquire()
    assert a.is_active
    assert not b.try_acquire()  # fresh lease held elsewhere
    assert not b.is_active
    assert a.try_acquire()  # held -> acts as heartbeat, still true
    h = a.holder()
    assert h["server_id"] == "srv-a"
    assert h["incarnation"] == a.incarnation


def test_stale_lease_taken_over_after_ttl(tmp_path):
    conf = str(tmp_path)
    _mk(conf, "d1")
    clock = Clock()
    a = DestinationLease(conf, "d1", "srv-a", ttl_s=30, _clock=clock)
    b = DestinationLease(conf, "d1", "srv-b", ttl_s=30, _clock=clock)
    assert a.try_acquire()
    clock.t += 29
    assert not b.try_acquire()  # inside TTL
    clock.t += 2  # heartbeat now 31s old
    assert b.try_acquire()
    assert b.holder()["server_id"] == "srv-b"
    # the expired holder detects the steal on its next heartbeat and
    # demotes without touching the new lease (isMine re-check)
    assert not a.heartbeat()
    assert not a.is_active
    assert b.holder()["server_id"] == "srv-b"


def test_heartbeat_refreshes_ttl_and_keeps_acquired_ts(tmp_path):
    conf = str(tmp_path)
    _mk(conf, "d1")
    clock = Clock()
    a = DestinationLease(conf, "d1", "srv-a", ttl_s=30, _clock=clock)
    b = DestinationLease(conf, "d1", "srv-b", ttl_s=30, _clock=clock)
    assert a.try_acquire()
    t0 = a.holder()["acquired_ts"]
    for _ in range(5):
        clock.t += 20  # each gap < ttl
        assert a.heartbeat()
        assert not b.try_acquire()  # never goes stale while heartbeating
    assert a.holder()["acquired_ts"] == t0  # acquisition time preserved


def test_release_allows_immediate_reacquire_and_is_ownership_scoped(tmp_path):
    conf = str(tmp_path)
    _mk(conf, "d1")
    clock = Clock()
    a = DestinationLease(conf, "d1", "srv-a", ttl_s=30, _clock=clock)
    b = DestinationLease(conf, "d1", "srv-b", ttl_s=30, _clock=clock)
    assert a.try_acquire()
    a.release()
    assert a.holder() is None
    assert b.try_acquire()  # no TTL wait after voluntary release
    # a demoted holder's release must not delete the new holder's lease
    a.release()
    assert b.holder()["server_id"] == "srv-b"
    assert b.heartbeat()


def test_corrupt_lease_file_reads_as_unheld(tmp_path):
    conf = str(tmp_path)
    _mk(conf, "d1")
    lease_path = os.path.join(conf, "d1", "running.json")
    with open(lease_path, "w") as f:
        f.write("{not json")
    a = DestinationLease(conf, "d1", "srv-a", ttl_s=30, _clock=Clock())
    assert a.holder() is None
    # unreadable payload is not stale (no heartbeat to age) but the
    # O_EXCL create fails -> acquisition waits for an operator sweep OR
    # the file to become valid; assert no crash and no false ownership
    assert not a.try_acquire()
    os.remove(lease_path)
    assert a.try_acquire()


def test_fleet_splits_destinations_and_migrates_on_death(tmp_path):
    conf = str(tmp_path)
    for d in ("alpha", "beta", "gamma"):
        _mk(conf, d)
    clock = Clock()
    A = FleetHA(conf, "srv-a", ttl_s=30, _clock=clock)
    B = FleetHA(conf, "srv-b", ttl_s=30, _clock=clock)
    dests = ["alpha", "beta", "gamma"]
    owned_a, ev_a = A.select(dests)
    owned_b, ev_b = B.select(dests)
    # A ran first: it owns everything, B owns nothing — disjoint, complete
    assert owned_a == dests and owned_b == []
    assert {e["event"] for e in ev_a} == {"ha_active"}
    # steady state is silent
    owned_a2, ev_a2 = A.select(dests)
    assert owned_a2 == dests and ev_a2 == []
    # server A dies (stops heartbeating); after TTL B takes over ALL
    clock.t += 31
    owned_b2, ev_b2 = B.select(dests)
    assert owned_b2 == dests
    assert [e["event"] for e in ev_b2] == ["ha_active"] * 3
    # A comes back: sees the steal, demotes with ha_lost events
    owned_a3, ev_a3 = A.select(dests)
    assert owned_a3 == []
    assert [e["event"] for e in ev_a3] == ["ha_lost"] * 3
    assert all(e["holder"] == "srv-b" for e in ev_a3)


def test_fleet_releases_vanished_specs(tmp_path):
    conf = str(tmp_path)
    for d in ("alpha", "beta"):
        _mk(conf, d)
    clock = Clock()
    A = FleetHA(conf, "srv-a", ttl_s=30, _clock=clock)
    B = FleetHA(conf, "srv-b", ttl_s=30, _clock=clock)
    assert A.select(["alpha", "beta"])[0] == ["alpha", "beta"]
    # alpha's spec disappears from A's scan -> voluntary release, so B
    # acquires it immediately (no TTL wait)
    owned, events = A.select(["beta"])
    assert owned == ["beta"]
    assert events == [{"event": "ha_release", "destination": "alpha"}]
    assert B.select(["alpha", "beta"])[0] == ["alpha"]
    # shutdown releases the rest
    assert A.release_all() == ["beta"]
    assert B.select(["alpha", "beta"])[0] == ["alpha", "beta"]


def test_server_cli_ha_two_servers_split_then_failover(tmp_path):
    """jobs/server.py --ha end-to-end over one conf dir: server 1 owns
    both destinations; after it exits WITHOUT releasing (SIGKILL
    analogue: we delete nothing, just age the leases), server 2 takes
    over past the TTL."""
    import subprocess
    import sys

    from tests.test_instance import REPO

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    setup = f"""
import json, sys
sys.path.insert(0, {REPO!r})
from canal_spark import get_spark, create_table
from canal_spark.changelog import base_table_df, synth_token_rows
from canal_spark.schema import TOKEN_TABLE_SCHEMA
from canal_spark.table.writer import append
spark = get_spark("fixture", master="local[4]", shuffle_partitions=4)
import os, json as j
for name, seed in [("alpha", 1), ("beta", 2)]:
    troot = {str(tmp_path)!r} + "/" + name + "_tbl"
    t = create_table(troot, TOKEN_TABLE_SCHEMA, partition_by=["source"])
    append(spark, t, base_table_df(spark, 120, seed=seed).repartition(2))
    os.makedirs({str(tmp_path)!r} + "/conf/" + name, exist_ok=True)
    with open({str(tmp_path)!r} + "/conf/" + name + "/instance.json", "w") as f:
        j.dump({{"table": troot}}, f)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", setup], capture_output=True,
                         text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]

    def run_server(server_id):
        return subprocess.run(
            [sys.executable, "-m", "canal_spark.jobs.server",
             str(tmp_path / "conf"), "--rounds", "1", "--ha",
             "--server-id", server_id, "--ha-ttl", "2"],
            capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
        )

    out1 = run_server("srv-1")
    assert out1.returncode == 0, out1.stderr[-2000:]
    lines1 = [json.loads(l) for l in out1.stdout.splitlines() if l.startswith("{")]
    ev1 = [l["event"] for l in lines1]
    assert ev1.count("ha_active") == 2 and ev1.count("pass") == 2
    # clean exit released the leases; simulate a CRASHED holder instead:
    # rewrite both leases as srv-1's with stale heartbeats
    import time
    for d in ("alpha", "beta"):
        with open(tmp_path / "conf" / d / "running.json", "w") as f:
            json.dump({"server_id": "srv-1", "incarnation": "dead",
                       "acquired_ts": time.time() - 100,
                       "heartbeat_ts": time.time() - 100}, f)
    out2 = run_server("srv-2")
    assert out2.returncode == 0, out2.stderr[-2000:]
    lines2 = [json.loads(l) for l in out2.stdout.splitlines() if l.startswith("{")]
    ev2 = [l["event"] for l in lines2]
    assert ev2.count("ha_active") == 2 and ev2.count("pass") == 2
    assert ev2.count("ha_release") == 2  # clean shutdown hands back


def test_background_heartbeats_survive_a_long_pass(tmp_path):
    """A maintenance pass longer than the TTL must not lose the lease:
    the fleet's daemon heartbeat keeps owned leases fresh while the
    round loop is busy, so a standby's takeover probe keeps failing."""
    import time

    conf = str(tmp_path)
    _mk(conf, "d1")
    fleet = FleetHA(conf, "srv-a", ttl_s=0.6)  # real clock, tiny TTL
    owned, _ = fleet.select(["d1"])
    assert owned == ["d1"]
    fleet.start_heartbeats(interval_s=0.1)
    standby = DestinationLease(conf, "d1", "srv-b", ttl_s=0.6)
    deadline = time.time() + 1.5  # >2 TTLs of "pass" time
    while time.time() < deadline:
        assert not standby.try_acquire()  # never goes stale
        time.sleep(0.1)
    assert fleet.lease("d1").is_active
    # release_all stops the thread and frees the lease for the standby
    assert fleet.release_all() == ["d1"]
    assert standby.try_acquire()


def test_delayed_sweep_cannot_delete_fresh_lease(tmp_path):
    """The remove-then-create takeover race: standbys A and B both read
    the same stale payload; A sweeps and acquires a fresh lease; B's
    DELAYED sweep (still holding the old payload) must be a no-op on
    A's fresh file — the incarnation re-check inside _sweep_stale —
    so the fleet never has two active holders from a steal."""
    conf = str(tmp_path)
    _mk(conf, "d1")
    clock = Clock()
    dead = DestinationLease(conf, "d1", "srv-dead", ttl_s=30, _clock=clock)
    assert dead.try_acquire()
    clock.t += 31  # dead server stops heartbeating; lease goes stale

    a = DestinationLease(conf, "d1", "srv-a", ttl_s=30, _clock=clock)
    b = DestinationLease(conf, "d1", "srv-b", ttl_s=30, _clock=clock)
    stale_payload = b.holder()  # B's read, taken BEFORE A's takeover
    assert b.is_stale(stale_payload)

    assert a.try_acquire()  # A sweeps the stale lease and acquires
    fresh = a.holder()
    assert fresh["incarnation"] == a.incarnation

    # B's delayed remove: sweep with the OLD payload — must not touch
    # A's fresh lease, and B must not become active
    assert b._sweep_stale(stale_payload)  # tombstone won, but no victim
    assert a.holder() == fresh
    assert not b.try_acquire()
    assert a.heartbeat()  # A is still the one holder


def test_concurrent_sweeper_tombstone_blocks_second_remove(tmp_path):
    """While one standby is mid-sweep (tombstone held), a second
    standby's takeover attempt yields the round instead of removing
    the file out from under the sweeper; crashed-sweeper debris older
    than the TTL is cleaned so takeover never deadlocks."""
    conf = str(tmp_path)
    _mk(conf, "d1")
    clock = Clock()
    dead = DestinationLease(conf, "d1", "srv-dead", ttl_s=30, _clock=clock)
    assert dead.try_acquire()
    clock.t += 31
    stale = dead.holder()

    b = DestinationLease(conf, "d1", "srv-b", ttl_s=30, _clock=clock)
    tomb = f"{b.path}.sweep.{stale['incarnation']}"
    open(tomb, "w").close()  # a sibling standby is mid-sweep
    assert not b.try_acquire()  # yields; the stale file is untouched
    assert os.path.exists(b.path)

    # crashed sweeper: the tombstone never cleared — once it is older
    # than the TTL the next attempt removes the debris, and the round
    # after that completes the takeover
    os.utime(tomb, (0, 0))
    assert not b.try_acquire()  # sweeps the debris this round
    assert not os.path.exists(tomb)
    assert b.try_acquire()
    assert b.is_active
