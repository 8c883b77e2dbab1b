"""spark-submit job: the multi-instance maintenance server — the
CanalLauncher/CanalController analogue (deployer/.../CanalLauncher.java,
CanalController.java:90,145-247).  Polls a conf dir of per-destination
``instance.json`` specs (SpringInstanceConfigMonitor.java:96-170 — the
5 s auto-scan that starts new instances, reloads changed ones, stops
removed ones) and runs one maintenance pass per active instance per
round, optionally in parallel under FAIR scheduling.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/server.py \\
      /etc/canal-spark/instances --rounds 0 --scan-interval 30 --parallel 4

Emits one JSON line per lifecycle event, one per instance pass, and a
round summary — the machine surface a fleet scheduler tails.
"""

from __future__ import annotations

import argparse
import time
import uuid


def main() -> None:
    p = argparse.ArgumentParser(description="multi-instance maintenance server")
    p.add_argument("conf_dir", help="dir of <destination>/instance.json specs")
    p.add_argument("--rounds", type=int, default=1,
                   help="maintenance rounds to run (0 = run forever)")
    p.add_argument("--scan-interval", type=float, default=5.0,
                   help="seconds between rounds (reference default 5, "
                        "SpringInstanceConfigMonitor.java:39)")
    p.add_argument("--parallel", type=int, default=1,
                   help="concurrent instance passes (thread pool; each "
                        "pass tagged with a per-destination FAIR pool "
                        "and job group)")
    p.add_argument("--metrics-port", type=int, default=None,
                   help="serve Prometheus /metrics on this port (0 = "
                        "ephemeral; reference default 11112, "
                        "canal.properties canal.metrics.pull.port)")
    p.add_argument("--ha", action="store_true",
                   help="active/standby failover: run only destinations "
                        "whose per-destination lease this server holds "
                        "(ServerRunningMonitor analogue — N servers on "
                        "one conf dir split the fleet, a dead server's "
                        "destinations migrate after --ha-ttl)")
    p.add_argument("--server-id", default=None,
                   help="this server's identity in lease files "
                        "(default host:pid)")
    p.add_argument("--ha-ttl", type=float, default=None,
                   help="lease TTL seconds (default 30; must exceed the "
                        "scan interval or the holder expires between "
                        "its own rounds)")
    p.add_argument("--client-port", type=int, default=None,
                   help="serve the batch-consumer protocol "
                        "(subscribe/get/ack/rollback, C5) on this port "
                        "(0 = ephemeral; reference netty default 11111, "
                        "canal.properties canal.port)")
    p.add_argument("--app-name", default=None)
    args = p.parse_args()

    from canal_spark import get_spark
    from canal_spark.consumer import ConsumerServer, start_consumer_http
    from canal_spark.exporter import MetricsRegistry, start_exporter
    from canal_spark.ha import DEFAULT_TTL_S, FleetHA
    from canal_spark.instance import (StreamFleet, diff_registry,
                                      run_server_round, scan_instances)
    from canal_spark.jobs.common import emit

    # FAIR mode so --parallel shares executor slots across destinations
    # instead of FIFO head-of-line blocking on the biggest table
    import os

    master = os.environ.get("SPARK_GRAFT_MASTER")
    if not master and "PYSPARK_GATEWAY_PORT" in os.environ:
        master = "from-submit"  # spark-submit supplies spark.master
    spark = get_spark(
        args.app_name or "canal-server",
        master=master,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )

    ha = None
    if args.ha:
        import socket

        server_id = args.server_id or f"{socket.gethostname()}:{os.getpid()}"
        ttl = args.ha_ttl if args.ha_ttl is not None else max(
            DEFAULT_TTL_S, 3 * args.scan_interval
        )
        ha = FleetHA(args.conf_dir, server_id, ttl_s=ttl)
        # leases stay fresh while a round's passes run longer than the
        # TTL — without this a 10-minute compaction expires the lease
        # mid-pass and a standby goes dual-active for the remainder
        ha.start_heartbeats()
        emit({"event": "ha_enabled", "server_id": server_id, "ttl_s": ttl})

    registry: dict[str, str] = {}
    fleet = StreamFleet(spark)
    metrics = exporter = None
    if args.metrics_port is not None:
        metrics = MetricsRegistry()
        exporter = start_exporter(metrics, args.metrics_port)
        emit({"event": "metrics_endpoint",
              "port": exporter.server_address[1], "path": "/metrics"})
    consumers: dict[str, ConsumerServer] = {}
    owned_now: set[str] = set()
    client_http = None
    if args.client_port is not None:
        # under --ha a standby answers 503 so clients re-seek the
        # running server (ClusterCanalConnector redirect semantics);
        # without HA every destination this server scans is active
        client_http = start_consumer_http(
            consumers, args.client_port,
            is_active=(lambda d: d in owned_now) if args.ha else None,
        )
        emit({"event": "client_endpoint",
              "port": client_http.server_address[1], "path": "/client"})
    round_no = 0
    while True:
        round_no += 1
        specs, errors = scan_instances(args.conf_dir)
        for dest, err in sorted(errors.items()):
            emit({"event": "config_error", "destination": dest, "error": err})
        if ha is not None:
            # ownership gate BEFORE lifecycle diffing: a standby never
            # claims start events for destinations it doesn't hold, and
            # losing a lease reads as the spec vanishing (stop + stream
            # shutdown) exactly like a conf-dir removal
            # broken-but-present specs keep their lease: a config tool
            # mid-rewrite must not trigger a release-and-migrate flap
            # (the sibling acquires, then loses it back one round later)
            owned, ha_events = ha.select(list(specs) + sorted(errors))
            for ev in ha_events:
                emit(ev)
            specs = {d: s for d, s in specs.items() if d in owned}
            # active = LEASE-held, not error-filtered specs: a dest
            # whose instance.json is transiently unreadable still holds
            # its lease here (no other server can be "the running
            # server"), so its consumer endpoint must keep answering.
            # add-then-retain ordering: never empty mid-update against
            # concurrent HTTP threads reading the set
            owned_now.update(owned)
            owned_now.intersection_update(owned)
        else:
            owned_now.update(specs)
            owned_now.intersection_update(specs)
        if client_http is not None:
            # register consumer endpoints for every active destination
            # with a staged changelog; drop vanished ones (but keep a
            # destination whose spec is only transiently unreadable —
            # clients should not 404 while a config tool mid-rewrites)
            for dest in sorted(set(consumers) - set(specs) - set(errors)):
                del consumers[dest]
            for dest, s in specs.items():
                if s.changelog and (
                    dest not in consumers
                    or consumers[dest].changelog_dir != s.changelog
                    or consumers[dest].archive_dir != s.archive
                ):
                    consumers[dest] = ConsumerServer(
                        spark, s.changelog,
                        os.path.join(args.conf_dir, dest, "consumer_meta"),
                        archive_dir=s.archive,
                    )
                elif not s.changelog and dest in consumers:
                    # reload REMOVED the changelog: keeping the old
                    # endpoint would serve batches from a dir the
                    # instance no longer consumes
                    del consumers[dest]
        batch_specs = {d: s for d, s in specs.items() if s.mode == "batch"}
        for ev in diff_registry(registry, batch_specs, errors=errors):
            emit(ev)
            if metrics and ev["event"] == "stop":
                metrics.remove_instance(ev["destination"])
        for ev in fleet.sync(specs, errors=errors):  # stream-mode lifecycle
            emit({**ev, "mode": "stream"})
            if metrics and ev["event"] == "stop":
                metrics.remove_instance(ev["destination"])
        results = run_server_round(
            spark, batch_specs, parallel=args.parallel,
            job_id_prefix=f"srv-{uuid.uuid4().hex[:8]}-r{round_no}",
        )
        ok = failed = 0
        for dest in sorted(results):
            r = results[dest]
            if "error" in r:
                failed += 1
                emit({"event": "pass_error", **r})
            else:
                ok += 1
                emit({"event": "pass", **r})
                if metrics:
                    metrics.update_instance(dest, r["metrics"])
        for h in fleet.health():
            emit({"event": "stream_health", **h})
            if metrics:
                lbl = f'{{destination="{h["destination"]}"}}'
                metrics.update_instance(h["destination"], {
                    f"canal_spark_stream_active{lbl}": 1 if h["active"] else 0,
                    f"canal_spark_stream_batches_seen{lbl}": h["batches_seen"],
                    f"canal_spark_stream_batches_applied{lbl}": h["batches_applied"],
                    f"canal_spark_stream_quarantined_batches{lbl}": h["quarantined"],
                })
        emit({"event": "round", "round": round_no, "instances": len(specs),
              "ok": ok, "failed": failed, "config_errors": len(errors)})
        if metrics:
            metrics.update_server({
                "canal_spark_server_rounds_total": round_no,
                "canal_spark_server_instances": len(specs),
                "canal_spark_server_pass_errors": failed,
                "canal_spark_server_config_errors": len(errors),
            })
        if args.rounds and round_no >= args.rounds:
            break
        time.sleep(args.scan_interval)
    for dest, final in fleet.stop_all().items():
        emit({"event": "stream_final", "destination": dest, **final})
    if ha is not None:
        for dest in ha.release_all():
            emit({"event": "ha_release", "destination": dest})
    if client_http is not None:
        client_http.shutdown()
    if exporter is not None:
        exporter.shutdown()


if __name__ == "__main__":
    main()
