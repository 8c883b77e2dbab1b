"""Batch-consumer protocol (C5): the CanalServerWithEmbedded
subscribe / getWithoutAck / ack / rollback surface over a staged
changelog, with durable per-client cursors and an HTTP wire form.

Reference mapping (server/.../embedded/CanalServerWithEmbedded.java):

* ``subscribe``            — :151-173 registers the client in the meta
  manager and resolves its start position (last cursor, else store
  head);
* ``getWithoutAck``        — :308-370 fetches the next ``batchSize``
  events past the streaming get-pointer, allocates a MONOTONE per-
  client batch id (meta/.../MemoryMetaManager.java:157
  ``atomicMaxBatchId.getAndIncrement()``), returns ``Message(-1)``
  on empty WITHOUT burning an id (:345);
* ``ack``                  — :392-437 removes the batch (MUST be the
  first outstanding — MemoryMetaManager.java:162-171 raises
  ``batchId:%d is not the firstly:%d``; a missing/duplicate id raises
  ``is not exist`` :400-404) and advances the durable cursor to the
  batch's end position;
* ``rollback``             — :443-459 clears ALL outstanding batches
  and resets the get-pointer to the cursor; the batch-id overload
  :465-494 still rolls the event store all the way back (its targeted
  form is an open TODO in the reference) but validates the id first —
  both behaviors preserved here;
* ``get``                  — getWithoutAck + immediate ack
  (CanalServerWithEmbedded.get:219-268).

Spark-native restatement: the event store is the ordinal-ordered
changelog staging dir (the same parquet slice `merge_into` consumes),
so *position* ≡ ``ordinal`` and the store never needs a ring buffer —
retention is the staging dir's lifecycle.  One fetch is

    scan(changelog).where(ordinal > from).orderBy(ordinal).limit(n)

i.e. a parquet scan with the ordinal predicate pushed to row-group
stats plus a TakeOrderedAndProject — O(batch) driver transfer.  This
is a CONTROL-PLANE op by design (the reference's default batch is
50-1024 events against a 16k-slot memory store); the bulk data plane
stays `deliver_*`/`stream_apply`.  Entries go out as FlatMessage JSON
(protocol/.../FlatMessage.java) — the exact envelope
`streaming.apply.kafka_changelog_frame` decodes, so a consumer's
batches feed the ingest half unchanged.

Client meta is a JSON file per client under the destination's meta
dir, written atomically (temp + ``os.replace``) on every state change
— the FileMixedMetaManager analogue (meta/.../FileMixedMetaManager
.java persists ``meta.dat`` beside the instance), synchronous instead
of period-flushed so a crash never replays an acked batch.  On a
shared filesystem the meta survives server failover: the new lease
holder (ha.py) serves the same cursors.

Multi-stream changelogs (a ``stream_id`` column: GTID/Kafka ingests)
have per-stream ordinals that overlap across streams, so a single
scalar cursor is NOT a valid position for them — ``ConsumerServer``
raises at subscribe time; multi-stream consumption goes through
``stream_apply``'s per-stream GTID marks instead.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Message:
    """One get() result — protocol Messages packet
    (protocol/.../CanalProtocol.proto ``Messages``: batch_id +
    repeated messages).  ``id == -1`` means empty (no events past the
    get-pointer); ``entries`` are FlatMessage JSON strings in ordinal
    order."""

    id: int
    entries: list[str] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return self.id == -1


class _ClientMeta:
    """Durable per-client state: cursor, outstanding batches, next
    batch id.  Every mutation is persisted atomically before it is
    visible to the caller."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.filter_regex: str | None = None
        self.black_regex: str | None = None
        self.cursor: int = 0  # last ACKED ordinal (0 = store head)
        self.next_batch_id: int = 1
        self.batches: dict[int, tuple[int, int]] = {}  # id -> (start, end]
        # per-client serialization: a fetch's Spark collect must not
        # block OTHER clients of the destination (Spark schedules jobs
        # from many threads fine); same-client verbs stay sequential
        self.lock = threading.Lock()
        # set (under lock) by unsubscribe: a verb that grabbed this
        # instance from the registry BEFORE the pop must not run after
        # the meta file is deleted — its save() would resurrect it
        self.dead = False

    @classmethod
    def load(cls, path: str) -> "_ClientMeta":
        m = cls(path)
        try:
            with open(path) as f:
                d = json.load(f)
        except FileNotFoundError:
            return m
        m.filter_regex = d.get("filter_regex")
        m.black_regex = d.get("black_regex")
        m.cursor = int(d.get("cursor", 0))
        m.next_batch_id = int(d.get("next_batch_id", 1))
        m.batches = {
            int(k): (int(v[0]), int(v[1]))
            for k, v in d.get("batches", {}).items()
        }
        return m

    def save(self) -> None:
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "filter_regex": self.filter_regex,
                    "black_regex": self.black_regex,
                    "cursor": self.cursor,
                    "next_batch_id": self.next_batch_id,
                    "batches": {str(k): list(v) for k, v in self.batches.items()},
                },
                f,
            )
        os.replace(tmp, self.path)


class ConsumerServer:
    """One destination's embedded consumer server.

    ``changelog_dir`` is the staged-changelog parquet dir (the
    instance spec's ``changelog``); ``meta_dir`` holds one
    ``<client_id>.json`` per subscribed client."""

    def __init__(
        self,
        spark: SparkSession,
        changelog_dir: str,
        meta_dir: str,
        database: str = "lakehouse",
        table: str = "tokens",
        archive_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.changelog_dir = changelog_dir
        self.meta_dir = meta_dir
        self.database = database
        self.table = table
        # cold-archive fallback (S3, archive.py): a client whose cursor
        # predates the staging dir's retention resumes from archived
        # segments and hands off to the live dir seamlessly — the
        # RdsBinlogEventParserProxy behavior
        self.archive_dir = archive_dir
        # registry lock only (subscribe/unsubscribe/lookup); each verb
        # then serializes on the CLIENT's own lock — lock order is
        # always registry -> client, and the long Spark fetch holds
        # only the client lock, so clients proceed independently
        self._lock = threading.Lock()  # HTTP handlers are threaded
        self._clients: dict[str, _ClientMeta] = {}
        os.makedirs(meta_dir, exist_ok=True)

    # -- store reads -----------------------------------------------------

    def _scan(self):
        """The event store: None when the staging dir is absent/empty
        (a destination configured before its producer starts)."""
        from canal_spark.changelog import changelog_dir_has_data

        if not changelog_dir_has_data(self.changelog_dir):
            return None
        return self.spark.read.parquet(self.changelog_dir)

    # -- protocol verbs ----------------------------------------------------

    def _client(self, client_id: str) -> _ClientMeta:
        with self._lock:
            m = self._clients.get(client_id)
        if m is None:
            raise KeyError(
                f"something goes wrong with channel, please check if client "
                f"{client_id} is subscribed"  # checkSubscribe analogue, :562
            )
        return m

    @staticmethod
    def _check_live(m: _ClientMeta, client_id: str) -> None:
        """Call under ``m.lock``: a verb that resolved its _ClientMeta
        just before a concurrent unsubscribe popped it must fail like
        an unsubscribed client, not run against (and re-persist) the
        deleted meta."""
        if m.dead:
            raise KeyError(
                f"something goes wrong with channel, please check if client "
                f"{client_id} is subscribed"
            )

    def subscribe(
        self,
        client_id: str,
        filter_regex: str | None = None,
        black_regex: str | None = None,
    ) -> dict:
        """Register the client; an existing meta file resumes the last
        cursor (subscribe:163-170 'use last cursor position'), a fresh
        one starts at the store head.  Re-subscribing with a different
        filter REPLACES it (subscribeChange:173)."""
        # the store probe runs OUTSIDE every lock: it can touch Spark
        # (driver-side schema read) and must not stall other clients
        store = self._scan()
        if store is not None and "stream_id" in store.columns:
            raise ValueError(
                "multi-stream changelog (stream_id column): per-stream "
                "ordinals overlap, a scalar consumer cursor is not a "
                "valid position — consume through stream_apply instead"
            )
        path = os.path.join(self.meta_dir, f"{client_id}.json")
        while True:
            with self._lock:
                m = self._clients.get(client_id)
                if m is None:
                    m = _ClientMeta.load(path)
                    self._clients[client_id] = m
            with m.lock:  # never held together with the registry lock
                if m.dead:
                    # lost a race with unsubscribe on the instance we
                    # grabbed: re-resolve (the registry no longer holds
                    # it, so the next loop loads a fresh meta)
                    continue
                m.filter_regex = filter_regex
                m.black_regex = black_regex
                m.save()
                return {"client_id": client_id, "cursor": m.cursor}

    def unsubscribe(self, client_id: str) -> None:
        """Drop the registration AND the durable meta (unsubscribe:
        180-184 removes the client from the meta manager)."""
        path = os.path.join(self.meta_dir, f"{client_id}.json")
        with self._lock:
            m = self._clients.pop(client_id, None)
            # delete under the REGISTRY lock: subscribe() loads the
            # meta file under this same lock, so a racing re-subscribe
            # can never read the old cursor from a file this call is
            # about to delete (then be left registered with no durable
            # meta behind it)
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
        # wait out any in-flight verb OUTSIDE the registry lock (a slow
        # fetch must not block other clients' lookups), then mark the
        # instance dead: a verb that resolved this instance before the
        # pop but acquires the lock after us fails _check_live instead
        # of resurrecting the deleted meta file with its save()
        with (m.lock if m is not None else threading.Lock()):
            if m is not None:
                m.dead = True
            # an in-flight save() between the two sections may have
            # recreated the file — remove again now that dead is set
            try:
                os.remove(path)
            except FileNotFoundError:
                pass

    def get_without_ack(self, client_id: str, batch_size: int = 1000) -> Message:
        m = self._client(client_id)
        with m.lock:
            self._check_live(m, client_id)
            return self._fetch_locked(m, batch_size)

    def _fetch_locked(self, m: _ClientMeta, batch_size: int) -> Message:
        """getWithoutAck body; caller holds ``m.lock``."""
        # get-pointer: past every outstanding batch, else the cursor
        # (getLastestBatch / getCursor split, :318-327)
        fetch_from = max([m.cursor] + [e for _, e in m.batches.values()])
        if self.archive_dir is not None:
            from canal_spark.archive import resolve_changelog

            sl, _ = resolve_changelog(
                self.spark, self.changelog_dir, self.archive_dir, fetch_from
            )
            if sl is None:
                return Message(-1)
        else:
            store = self._scan()
            if store is None:
                return Message(-1)
            sl = store.where(F.col("ordinal") > F.lit(int(fetch_from)))
        # re-checked per fetch, not only at subscribe: a destination
        # configured BEFORE its producer starts subscribes against an
        # empty dir (probe skipped), and a multi-stream producer that
        # then appears would otherwise be consumed with overlapping
        # per-stream ordinals — acking stream A's 1-10 silently skips
        # stream B's 1-10 forever
        if "stream_id" in sl.columns:
            raise ValueError(
                "multi-stream changelog (stream_id column): per-stream "
                "ordinals overlap, a scalar consumer cursor is not a "
                "valid position — consume through stream_apply instead"
            )
        # client-side subscription filter on the event's source —
        # NULL kept (a D row's after-image source is null; dropping
        # an unclassifiable delete would leak the key forever)
        if m.filter_regex:
            sl = sl.where(
                F.col("source").isNull() | F.col("source").rlike(m.filter_regex)
            )
        if m.black_regex:
            sl = sl.where(
                F.col("source").isNull() | ~F.col("source").rlike(m.black_regex)
            )
        from canal_spark.deliver import flat_message_col

        with_old = any(
            c in sl.columns for c in ("before_tokens", "before_n_tok")
        )
        if with_old:
            if "before_tokens" not in sl.columns:
                sl = sl.withColumn("before_tokens", F.lit(None).cast("array<int>"))
            if "before_n_tok" not in sl.columns:
                sl = sl.withColumn("before_n_tok", F.lit(None).cast("int"))
        rows = (
            sl.orderBy("ordinal")
            .limit(int(batch_size))
            .select(
                "ordinal",
                flat_message_col(
                    self.database, self.table, with_old=with_old
                ).alias("value"),
            )
            .collect()
        )
        if not rows:
            return Message(-1)  # empty packet, no id burned (:345)
        batch_id = m.next_batch_id
        m.next_batch_id += 1
        m.batches[batch_id] = (int(fetch_from), int(rows[-1]["ordinal"]))
        m.save()
        return Message(batch_id, [r["value"] for r in rows])

    def _ack_locked(self, m: _ClientMeta, client_id: str, batch_id: int) -> None:
        """ack body; caller holds ``m.lock``."""
        batch_id = int(batch_id)
        if batch_id not in m.batches:
            raise ValueError(
                f"ack error, clientId:{client_id} batchId:{batch_id} "
                f"is not exist, please check"
            )
        first = min(m.batches)
        if batch_id != first:
            raise ValueError(
                f"batchId:{batch_id} is not the firstly:{first}"
            )
        _, end = m.batches.pop(batch_id)
        m.cursor = max(m.cursor, end)  # no-regress, like the hwm
        m.save()

    def ack(self, client_id: str, batch_id: int) -> None:
        m = self._client(client_id)
        with m.lock:
            self._check_live(m, client_id)
            self._ack_locked(m, client_id, batch_id)

    def get(self, client_id: str, batch_size: int = 1000) -> Message:
        """getWithoutAck + immediate ack under ONE lock hold — the
        reference runs get inside a single synchronized block
        (CanalServerWithEmbedded.get:219-268).  Dropping the lock
        between the two lets a concurrent auto-ack get interleave:
        T1 fetches batch 1, T2 fetches batch 2, T1 acks 1, T2's ack(2)
        then fails first-outstanding and batch 2's ordinals are skipped
        forever — one race permanently wedging the client."""
        m = self._client(client_id)
        with m.lock:
            self._check_live(m, client_id)
            # feasibility BEFORE the fetch: with an older batch still
            # outstanding the auto-ack can only fail first-outstanding —
            # failing after _fetch_locked would persist the new batch,
            # advance the get-pointer past its ordinals, and drop the
            # entries, burning one undeliverable batch per retry
            if m.batches:
                raise ValueError(
                    f"get with auto-ack refused, clientId:{client_id} has "
                    f"outstanding batchIds:{sorted(m.batches)} — ack or "
                    f"rollback them first"
                )
            msg = self._fetch_locked(m, batch_size)
            if not msg.is_empty:
                self._ack_locked(m, client_id, msg.id)
            return msg

    def rollback(self, client_id: str, batch_id: int | None = None) -> None:
        """Requeue everything unacked; the batch-id form validates the
        id exists (rollback:478-483 raises ``is not exist``) but still
        rolls the store back to the cursor — the reference's own
        behavior (its targeted rollback is an open TODO, :486)."""
        m = self._client(client_id)
        with m.lock:
            self._check_live(m, client_id)
            if batch_id is not None and int(batch_id) not in m.batches:
                raise ValueError(
                    f"rollback error, clientId:{client_id} batchId:{batch_id} "
                    f"is not exist, please check"
                )
            m.batches.clear()
            m.save()

    def list_batch_ids(self, client_id: str) -> list[int]:
        """Outstanding batch ids, ascending (listBatchIds:373-383)."""
        m = self._client(client_id)
        with m.lock:
            self._check_live(m, client_id)
            return sorted(m.batches)


# -- HTTP wire form ---------------------------------------------------------


def start_consumer_http(
    servers: dict[str, ConsumerServer],
    port: int = 0,
    is_active=None,
):
    """Serve the consumer protocol over HTTP from a daemon thread —
    the netty CanalServerWithNetty analogue with JSON in place of the
    protobuf framing.  Packet-type mapping
    (protocol/.../CanalProtocol.proto):

    * HANDSHAKE/CLIENTAUTHENTICATION — carried by HTTP itself;
    * SUBSCRIPTION / UNSUBSCRIPTION  — POST ``/client/<dest>/<id>/
      subscribe`` (JSON body ``{"filter": …, "black": …}``) and
      ``…/unsubscribe``;
    * GET → MESSAGES — GET ``…/get?batchSize=N[&ack=1]`` →
      ``{"id": N, "entries": [FlatMessage…]}`` (``ack=1`` = the
      auto-ack ``get``);
    * CLIENTACK — POST ``…/ack?batchId=N``;
    * CLIENTROLLBACK — POST ``…/rollback[?batchId=N]``;
    * ACK(error) — HTTP 4xx with ``{"error": …}``.

    ``is_active(dest) -> bool`` gates every request when the process
    runs under ha.py leases: a standby answers 503 so clients re-seek
    the running server, exactly ClusterCanalConnector's
    redirect-to-running behavior.  ``port=0`` binds ephemeral; the
    bound port is ``server.server_address[1]``."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _route(self):
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            if len(parts) != 4 or parts[0] != "client":
                self._send(404, {"error": "use /client/<dest>/<client>/<verb>"})
                return None
            _, dest, client_id, verb = parts
            srv = servers.get(dest)
            if srv is None:
                self._send(404, {"error": f"destination {dest} not found"})
                return None
            if is_active is not None and not is_active(dest):
                # standby: point the client back at the election
                self._send(503, {"error": f"not the running server for {dest}"})
                return None
            return srv, client_id, verb, parse_qs(u.query)

        def do_GET(self):  # noqa: N802 — http.server API
            r = self._route()
            if r is None:
                return
            srv, client_id, verb, q = r
            try:
                if verb == "get":
                    n = int(q.get("batchSize", ["1000"])[0])
                    fn = srv.get if q.get("ack", ["0"])[0] == "1" else srv.get_without_ack
                    msg = fn(client_id, n)
                    self._send(200, {"id": msg.id, "entries": msg.entries})
                elif verb == "batches":
                    self._send(200, {"batches": srv.list_batch_ids(client_id)})
                else:
                    self._send(404, {"error": f"unknown verb {verb}"})
            except KeyError as e:
                self._send(400, {"error": str(e)})
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — wire boundary
                # a Spark/IO failure mid-fetch (vanished staging file,
                # analysis error) must be a JSON 500, not a dropped
                # socket with a driver-side traceback
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def do_POST(self):  # noqa: N802 — http.server API
            r = self._route()
            if r is None:
                return
            srv, client_id, verb, q = r
            n = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(n) or b"{}") if n else {}
            except json.JSONDecodeError as e:
                # a malformed body must be a 400, not a dead connection
                self._send(400, {"error": f"invalid JSON body: {e}"})
                return
            try:
                if verb == "subscribe":
                    out = srv.subscribe(
                        client_id, body.get("filter"), body.get("black")
                    )
                    self._send(200, out)
                elif verb == "unsubscribe":
                    srv.unsubscribe(client_id)
                    self._send(200, {"ok": True})
                elif verb == "ack":
                    srv.ack(client_id, int(q["batchId"][0]))
                    self._send(200, {"ok": True})
                elif verb == "rollback":
                    bid = q.get("batchId")
                    srv.rollback(client_id, int(bid[0]) if bid else None)
                    self._send(200, {"ok": True})
                else:
                    self._send(404, {"error": f"unknown verb {verb}"})
            except KeyError as e:
                self._send(400, {"error": str(e)})
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — wire boundary
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # client calls are not server events
            pass

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    t = threading.Thread(
        target=server.serve_forever, name="canal-spark-consumer", daemon=True
    )
    t.start()
    return server
