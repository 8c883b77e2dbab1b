"""Active/standby failover for the fleet server — the C6 cluster-HA
analogue (common/.../zookeeper/running/ServerRunningMonitor.java:147
creates an EPHEMERAL ``running`` node per destination holding a
``ServerRunningData`` payload; standbys watch it and race to recreate
on session loss; :115,204-207 is the voluntary release path;
client/.../ClusterCanalConnector.java fails the consumer over the same
way).

Spark-native replacement: the lakehouse already requires ONE shared
primitive — an atomic filesystem rename (the table format's CAS commit
uses exactly this) — so the zk ephemeral node becomes a LEASE FILE
next to the destination's instance spec:

  <conf_dir>/<destination>/running.json
      {"server_id", "incarnation", "acquired_utc", "heartbeat_utc"}

* acquire   = payload written to a private temp then hard-linked into
  place (one winner, kernel-atomic like ``O_EXCL``, and the file is
  never visible without its payload — a crash mid-acquire cannot
  leave an unparseable 0-byte lease that wedges every takeover);
* liveness  = the holder rewrites the payload each round (write temp +
  ``os.replace`` — readers never see a torn file); zk's session
  timeout becomes the lease TTL on the heartbeat timestamp;
* failover  = a standby that observes a heartbeat older than the TTL
  sweeps the stale file and races the O_EXCL create again — exactly
  the watch-then-recreate scramble of ServerRunningMonitor:56-66, with
  the kernel as the arbiter instead of zk.  The sweep itself is
  single-winner (an O_EXCL tombstone keyed by the stale incarnation +
  incarnation-and-tombstone re-checks before the remove), so a SLOW
  standby's delayed delete cannot hit the fast standby's fresh lease
  except through the same unfenceable pause-past-TTL window documented
  below — see :meth:`DestinationLease._sweep_stale`;
* release   = the holder deletes its OWN incarnation only (:204-207).

Split-brain honesty: a POSIX rename has no fencing token, so a holder
paused longer than the TTL (GC stop, VM freeze) can coexist with a new
holder for one round — the same window a zk session expiry leaves.
Two guards bound it: the holder re-reads the file each ``heartbeat()``
and DEMOTES the moment its incarnation is gone (ServerRunningMonitor's
``isMine`` check, :182-187), and every table write downstream is an
optimistic CAS commit, so even during the window concurrent passes
cannot corrupt a table — one of them loses the commit race and
retries/aborts (the engine's normal concurrent-writer path).  On a
real deployment the conf dir lives on the same shared filesystem as
the warehouse; if only an object store is available, swap this class
for a zk/etcd lease behind the same four methods — the server loop
only sees ``try_acquire/heartbeat/release``.

Per-DESTINATION leases (not one per server) reproduce the reference's
deployment model: N servers point at the same conf dir and the
destinations spread across them one lease apiece; killing a server
(no more heartbeats) migrates exactly its destinations to the
survivors after one TTL.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import threading
import uuid

LEASE_FILE = "running.json"
DEFAULT_TTL_S = 30.0


def _utc_iso(ts: float) -> str:
    return _dt.datetime.fromtimestamp(ts, _dt.timezone.utc).isoformat()


class DestinationLease:
    """One destination's active-server lease (ephemeral-node analogue)."""

    def __init__(self, conf_dir: str, destination: str, server_id: str,
                 ttl_s: float = DEFAULT_TTL_S, _clock=None) -> None:
        self.path = os.path.join(conf_dir, destination, LEASE_FILE)
        self.destination = destination
        self.server_id = server_id
        self.ttl_s = float(ttl_s)
        self.incarnation: str | None = None
        # serializes same-process transitions: the round loop's
        # try_acquire vs the background heartbeat thread (see
        # FleetHA.start_heartbeats) — cross-process safety stays with
        # the O_EXCL/os.replace file protocol
        self._mutex = threading.Lock()
        # injectable clock so tests exercise TTL expiry without sleeping
        self._clock = _clock or (lambda: _dt.datetime.now(_dt.timezone.utc).timestamp())

    # -- reads ---------------------------------------------------------

    def holder(self) -> dict | None:
        """Current lease payload, or None when unheld/unreadable (a torn
        read is impossible — writes go through os.replace — but a racing
        delete can vanish the file between exists and open)."""
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def is_stale(self, payload: dict | None = None) -> bool:
        p = payload if payload is not None else self.holder()
        if p is None:
            return False
        return self._clock() - float(p.get("heartbeat_ts", 0)) > self.ttl_s

    @property
    def is_active(self) -> bool:
        return self.incarnation is not None

    # -- state transitions ----------------------------------------------

    def _payload(self, acquired_ts: float) -> bytes:
        now = self._clock()
        return json.dumps({
            "server_id": self.server_id,
            "incarnation": self.incarnation,
            "acquired_ts": acquired_ts,
            "heartbeat_ts": now,
            "acquired_utc": _utc_iso(acquired_ts),
            "heartbeat_utc": _utc_iso(now),
        }).encode()

    def try_acquire(self) -> bool:
        """One acquisition attempt: O_EXCL create, or steal a stale
        lease (delete + re-race — ServerRunningMonitor's watch-fired
        initRunning scramble).  Idempotent while held."""
        with self._mutex:
            return self._try_acquire_locked()

    def _try_acquire_locked(self) -> bool:
        if self.incarnation is not None:
            # already active — treat as a heartbeat so callers can use
            # try_acquire() as the single per-round verb
            return self._heartbeat_locked()
        p = self.holder()
        if p is not None and not self.is_stale(p):
            return False
        if p is not None and not self._sweep_stale(p):
            # another standby owns the sweep of this incarnation; yield
            # this round rather than racing a remove that could hit the
            # sweeper's FRESH lease
            return False
        self.incarnation = uuid.uuid4().hex
        # atomic create-WITH-content: write the payload to a private
        # temp file, then hard-link it into place — os.link fails with
        # FileExistsError when a rival won (the O_EXCL race, kernel-
        # arbitrated) and, unlike create-then-write, a crash can never
        # leave a 0-byte running.json that is unparseable (holder() →
        # None), never stale (no heartbeat to age) and therefore never
        # swept — the self-inflicted permanent wedge of the takeover.
        tmp = f"{self.path}.{self.incarnation}.acquire"
        try:
            with open(tmp, "wb") as f:
                f.write(self._payload(acquired_ts=self._clock()))
        except FileNotFoundError:
            # destination dir removed from the conf tree mid-race
            self.incarnation = None
            return False
        try:
            os.link(tmp, self.path)
        except (FileExistsError, FileNotFoundError):
            self.incarnation = None
            return False
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
        return True

    def _sweep_stale(self, p: dict) -> bool:
        """Remove a stale lease exactly once fleet-wide.

        A bare remove-then-create race has a two-active-holders hole:
        standbys A and B both read the stale payload; A removes it and
        O_EXCL-creates its fresh lease; B's delayed ``os.remove`` then
        deletes A's FRESH file and B creates its own — both believe
        they hold the destination until A's next isMine heartbeat.
        The fix is an O_EXCL TOMBSTONE keyed by the stale payload's
        incarnation (uuids never recur): only the tombstone winner may
        remove, and it re-verifies both the file's incarnation AND its
        own tombstone right before the remove — so a fresh lease (new
        incarnation) can never be the victim, and a sweeper whose
        tombstone was reaped as debris (see below) aborts instead of
        executing a delayed delete.  Losers yield the round.  The
        residual window is a sweeper pausing BETWEEN that final
        re-check and its os.remove — the same unfenceable POSIX pause
        the module docstring documents for holders, bounded the same
        way (isMine demotion + CAS table commits).

        A sweeper crashing between tombstone and remove would deadlock
        the takeover, so tombstones older than the TTL are reaped.
        That age test deliberately uses WALL time, not the injectable
        ``_clock``: file mtime is wall-clock, and mixing clocks would
        make the comparison meaningless (a monotonic clock would never
        reap — deadlock; a far-future fake would always reap).
        Returns True when this caller may proceed to the create race.
        """
        import time as _time

        tomb = f"{self.path}.sweep.{p.get('incarnation')}"
        try:
            fd = os.open(tomb, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # crashed sweeper's debris must not block takeover forever
            try:
                if _time.time() - os.path.getmtime(tomb) > self.ttl_s:
                    os.remove(tomb)
            except FileNotFoundError:
                pass
            return False
        except FileNotFoundError:
            return False  # destination dir removed mid-race
        os.close(fd)
        try:
            cur = self.holder()
            if (
                cur is not None
                and cur.get("incarnation") == p.get("incarnation")
                # tombstone reaped while we stalled = the sweep was
                # re-assigned; our delete right is gone
                and os.path.exists(tomb)
            ):
                try:
                    os.remove(self.path)
                except FileNotFoundError:
                    pass
        finally:
            try:
                os.remove(tomb)
            except FileNotFoundError:
                pass
        return True

    def heartbeat(self) -> bool:
        """Refresh the TTL; returns False (and demotes) when the lease
        was stolen or vanished — the isMine re-check of
        ServerRunningMonitor.java:182-187."""
        with self._mutex:
            return self._heartbeat_locked()

    def _heartbeat_locked(self) -> bool:
        if self.incarnation is None:
            return False
        p = self.holder()
        if p is None or p.get("incarnation") != self.incarnation:
            self.incarnation = None  # stolen: demote, do NOT touch the file
            return False
        acquired = float(p.get("acquired_ts", self._clock()))
        tmp = f"{self.path}.{self.incarnation}.tmp"
        try:
            with open(tmp, "wb") as f:
                f.write(self._payload(acquired_ts=acquired))
            os.replace(tmp, self.path)
        except FileNotFoundError:
            self.incarnation = None
            return False
        return True

    def release(self) -> None:
        """Voluntary handoff (:204-207): delete only if still mine, so a
        demoted holder can never delete the new holder's lease."""
        with self._mutex:
            if self.incarnation is None:
                return
            p = self.holder()
            if p is not None and p.get("incarnation") == self.incarnation:
                try:
                    os.remove(self.path)
                except FileNotFoundError:
                    pass
            self.incarnation = None


class FleetHA:
    """Per-destination lease book for one server process: the round
    loop calls :meth:`select` with the scan's spec names and runs only
    the destinations whose lease this server holds; dead destinations'
    leases are released when their spec disappears."""

    def __init__(self, conf_dir: str, server_id: str,
                 ttl_s: float = DEFAULT_TTL_S, _clock=None) -> None:
        self.conf_dir = conf_dir
        self.server_id = server_id
        self.ttl_s = ttl_s
        self._clock = _clock
        self._leases: dict[str, DestinationLease] = {}
        self._hb_stop: threading.Event | None = None

    def lease(self, destination: str) -> DestinationLease:
        if destination not in self._leases:
            self._leases[destination] = DestinationLease(
                self.conf_dir, destination, self.server_id,
                ttl_s=self.ttl_s, _clock=self._clock,
            )
        return self._leases[destination]

    def select(self, destinations) -> tuple[list[str], list[dict]]:
        """One round's ownership pass: try_acquire/heartbeat every
        destination; returns (owned, events).  Events cover ownership
        CHANGES only (ha_active / ha_lost / ha_release) — steady state,
        including steady standby, is silent."""
        owned: list[str] = []
        events: list[dict] = []
        names = set(destinations)
        # specs gone from the conf dir: voluntary release so a sibling
        # server (whose dir may still list them) can't wait out the TTL
        for dest in sorted(set(self._leases) - names):
            lease = self._leases.pop(dest)
            if lease.is_active:
                lease.release()
                events.append({"event": "ha_release", "destination": dest})
        for dest in sorted(names):
            lease = self.lease(dest)
            was = lease.is_active
            now_active = lease.try_acquire()
            if now_active:
                owned.append(dest)
            if now_active and not was:
                events.append({"event": "ha_active", "destination": dest,
                               "server_id": self.server_id})
            elif was and not now_active:
                events.append({"event": "ha_lost", "destination": dest,
                               "holder": (lease.holder() or {}).get("server_id")})
        return owned, events

    def start_heartbeats(self, interval_s: float | None = None) -> None:
        """Keep owned leases fresh from a daemon thread while the round
        loop is busy.  select() heartbeats once per ROUND — a single
        maintenance pass longer than the TTL would otherwise expire the
        holder's lease mid-round and hand a standby the destination
        while the pass is still running (minutes of two active servers,
        not the one-GC-pause window the lease protocol bounds).  The
        thread only touches leases that are currently active; a steal
        detected by the heartbeat demotes exactly as the round-loop
        path does, and the per-lease mutex serializes the two threads.
        Idempotent; stop with :meth:`stop_heartbeats` (release_all does
        it automatically)."""
        if self._hb_stop is not None:
            return
        stop = threading.Event()
        interval = interval_s if interval_s is not None else max(
            1.0, self.ttl_s / 3.0
        )

        def _beat() -> None:
            while not stop.wait(interval):
                for lease in list(self._leases.values()):
                    if lease.is_active:
                        lease.heartbeat()

        t = threading.Thread(target=_beat, daemon=True, name="ha-heartbeat")
        t.start()
        self._hb_stop = stop

    def stop_heartbeats(self) -> None:
        if self._hb_stop is not None:
            self._hb_stop.set()
            self._hb_stop = None

    def release_all(self) -> list[str]:
        self.stop_heartbeats()
        released = [d for d, l in sorted(self._leases.items()) if l.is_active]
        for lease in self._leases.values():
            lease.release()
        return released
