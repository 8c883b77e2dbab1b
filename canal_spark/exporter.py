"""Prometheus pull-mode metrics exporter — the reference's prometheus
module analogue (prometheus/.../PrometheusService.java:43-57 starts an
HTTPServer on ``canal.metrics.pull.port``; CanalInstanceExports.java:19
labels every per-instance family with ``destination``;
InstanceRegistry.java keeps the live instance→collector map).

Spark-native shape: the maintenance engine's metric VALUES already
exist as the flat ``name{destination="…"} -> value`` dicts
:func:`canal_spark.maintenance.prometheus_metrics` builds per pass.
This module adds the two missing pieces of operational parity:

* :class:`MetricsRegistry` — a thread-safe latest-value store keyed by
  destination (the InstanceRegistry analogue: register on start/pass,
  unregister on stop), plus server-level gauges (rounds, instance and
  error counts, stream health).
* :func:`start_exporter` — a stdlib ``http.server`` on a daemon thread
  serving GET ``/metrics`` in Prometheus text exposition format 0.0.4,
  so an unmodified Prometheus scrapes the fleet exactly as it scrapes
  the reference's port-11112 endpoint.

Why a latest-value store and not live collectors: a maintenance pass is
a discrete transaction, so its counters are complete AT COMMIT — the
scrape between passes must see the last committed pass, not a
half-updated one.  ``update_instance`` swaps the whole per-destination
dict under one lock; a scrape can never observe a torn pass.

Driver-side only by design: metrics are manifest/report scale (a few
dozen numbers per destination), never data scale — the exporter holds
no DataFrames and runs no Spark jobs.
"""

from __future__ import annotations

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

DEFAULT_PORT = 11112  # reference default: canal.properties canal.metrics.pull.port

# Families whose value is a monotone total over the instance's lifetime
# in the reference exposition (EntryCollector/StoreCollector semantics:
# put/ack row totals, transaction counts).  prometheus_metrics() emits
# PER-PASS deltas for these, so MetricsRegistry ACCUMULATES them across
# passes — the exposed sample is a true monotone counter (reset on
# server restart, which Prometheus rate() handles natively).  Everything
# else (file/byte snapshots, tightness, high-water mark) is a gauge.
_COUNTER_RE = re.compile(r"_(total|rows|transactions)$")

_NAME_RE = re.compile(r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(\{.*\})?$")


def _family(key: str) -> tuple[str, str]:
    """Split ``name{labels}`` -> (family, labels-with-braces-or-'')."""
    m = _NAME_RE.match(key)
    if not m:
        raise ValueError(f"not a prometheus sample key: {key!r}")
    return m.group(1), m.group(2) or ""


def _fmt(v: float) -> str:
    f = float(v)
    return str(int(f)) if f.is_integer() else repr(f)


def render_exposition(samples: dict[str, float], help_text: dict[str, str] | None = None) -> str:
    """Render flat ``name{labels} -> value`` samples as Prometheus text
    exposition 0.0.4: one ``# HELP`` / ``# TYPE`` header per family,
    samples grouped under their family, deterministic (sorted) order so
    the output is diff-able in tests and ops runbooks."""
    help_text = help_text or {}
    fams: dict[str, list[tuple[str, float]]] = {}
    for key, val in samples.items():
        fam, lbl = _family(key)
        fams.setdefault(fam, []).append((lbl, float(val)))
    out: list[str] = []
    for fam in sorted(fams):
        kind = "counter" if _COUNTER_RE.search(fam) else "gauge"
        hlp = help_text.get(fam, fam.replace("_", " "))
        out.append(f"# HELP {fam} {hlp}")
        out.append(f"# TYPE {fam} {kind}")
        for lbl, val in sorted(fams[fam]):
            out.append(f"{fam}{lbl} {_fmt(val)}")
    return "\n".join(out) + "\n"


class MetricsRegistry:
    """Latest-value metric store for one server process.

    ``update_instance`` ingests one pass's metric dict: counter
    families accumulate into lifetime totals, gauge families replace —
    both swapped under one lock so a scrape never observes a torn pass.
    ``remove_instance`` is the stop-event unregister
    (InstanceRegistry.unregister analogue); ``update_server`` holds
    fleet-level samples keyed by full sample name (round counter,
    instance/error counts, stream health)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._gauges: dict[str, dict[str, float]] = {}  # dest -> {key: v}
        self._counters: dict[str, dict[str, float]] = {}  # dest -> {key: total}
        self._server: dict[str, float] = {}

    def update_instance(self, destination: str, metrics: dict[str, float]) -> None:
        with self._lock:
            g: dict[str, float] = {}
            c = self._counters.setdefault(destination, {})
            for key, val in metrics.items():
                fam, _ = _family(key)
                if _COUNTER_RE.search(fam):
                    c[key] = c.get(key, 0.0) + float(val)
                else:
                    g[key] = float(val)
            self._gauges[destination] = g

    def remove_instance(self, destination: str) -> None:
        with self._lock:
            self._gauges.pop(destination, None)
            self._counters.pop(destination, None)

    def update_server(self, metrics: dict[str, float]) -> None:
        with self._lock:
            self._server.update(metrics)

    def render(self) -> str:
        with self._lock:
            merged: dict[str, float] = dict(self._server)
            for dest in sorted(set(self._gauges) | set(self._counters)):
                merged.update(self._counters.get(dest, {}))
                merged.update(self._gauges.get(dest, {}))
        return render_exposition(merged)


class _Handler(BaseHTTPRequestHandler):
    registry: MetricsRegistry  # set by start_exporter on the subclass

    def do_GET(self):  # noqa: N802 — http.server API
        if self.path.split("?", 1)[0] != "/metrics":
            self.send_error(404, "only /metrics is exported")
            return
        body = self.registry.render().encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # scrapes are not server events
        pass


def start_exporter(registry: MetricsRegistry, port: int = DEFAULT_PORT) -> ThreadingHTTPServer:
    """Serve ``registry`` at ``http://0.0.0.0:<port>/metrics`` from a
    daemon thread (PrometheusService.initialize analogue,
    PrometheusService.java:43-47).  ``port=0`` binds an ephemeral port
    (tests); the bound port is ``server.server_address[1]``.  Returns
    the server; call ``.shutdown()`` for a graceful stop."""
    handler = type("BoundHandler", (_Handler,), {"registry": registry})
    server = ThreadingHTTPServer(("0.0.0.0", port), handler)
    t = threading.Thread(target=server.serve_forever, name="canal-spark-metrics", daemon=True)
    t.start()
    return server
