"""Multi-destination instance management — the CanalController analogue.

The reference deployer runs MANY named instances inside one server:
``CanalController`` scans a conf dir for per-destination directories,
parses each ``instance.properties``, and starts/stops/reloads one
``CanalInstance`` per destination as the files appear, change, or
vanish (deployer/.../CanalController.java:90,145-170,221-247;
deployer/.../monitor/SpringInstanceConfigMonitor.java:96-170 — the
5-second auto-scan, :39).  The Spark-native analogue: an *instance* is
a per-table maintenance configuration — a JSON spec in
``<conf_dir>/<destination>/instance.json`` naming the token table, its
changelog staging dir, the source white/black filter regexes
(``canal.instance.filter.regex`` / ``filter.black.regex``,
deployer/.../example/instance.properties:42-45), and the maintenance
knobs — and the *server* (``jobs/server.py``) polls the conf dir and
runs one ``run_pass`` per active instance per round.

Design notes, Spark-first:

* Instances share ONE SparkSession (they are configs, not processes —
  exactly as the reference's instances share one JVM).  Concurrent
  passes come from the server's thread pool: Spark's scheduler
  multiplexes jobs submitted from separate driver threads, and each
  worker tags its jobs with a per-destination scheduler pool + job
  group so FAIR scheduling and cancellation stay per-instance.
* Resume/replay safety needs no per-instance position files: the
  changelog dir is re-read whole every round and ``merge_into``'s
  high-water mark (stored IN the destination table's snapshot
  metadata) drops already-applied ordinals — the reference's
  meta-manager position persist (K1/K2) collapsed into the table
  itself.
* Reload detection is content-addressed (sha256 of the spec bytes)
  rather than the reference's lastModified compare
  (SpringInstanceConfigMonitor.java:151) — a rewrite with identical
  bytes is NOT a reload, which keeps the control loop idempotent on
  config-management systems that rewrite files in place.
* Unknown spec keys are a hard error, not silently ignored: a typoed
  knob (``target_md``) silently falling back to defaults is the worst
  failure mode a fleet config can have.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INSTANCE_FILE = "instance.json"

# knobs forwarded verbatim to run_pass(**kwargs) — single source of
# truth for names AND defaults (defaults live in run_pass itself; the
# spec only records explicit overrides)
_PASS_KNOBS = {
    "merge_mode": str,
    "target_file_rows": int,
    "curve": str,
    "cluster_scope": str,
    "do_cluster": bool,
    "do_compact": bool,
    "keep_snapshots": int,
    "max_pending_delete_files": int,
    "convert_eq_debt": bool,
    "rewrite_pos_debt_files": int,
    "wap": bool,
    "wap_max_delete_fraction": float,
    "branch": str,
    "publish_branch": bool,
    "span_cut": bool,
    "span_cut_w": int,
    "span_cut_sample_mod": int,
    "span_cut_max_fraction": float,
}

# knobs forwarded verbatim to stream_apply(**kwargs) in stream mode;
# the intersection with _PASS_KNOBS is deliberately the shared contract
_STREAM_KNOBS = {
    "merge_mode": str,
    "target_file_rows": int,
    "max_files_per_trigger": int,
    "max_pending_delete_files": int,
    "convert_eq_debt_files": int,
    "rewrite_pos_debt_files": int,
    "wap": bool,
    "wap_max_delete_fraction": float,
    "quarantine_dir": str,
}

_TOP_KEYS = {
    "table",            # required: destination table root
    "changelog",        # parquet staging dir (optional; may not exist yet)
    "archive",          # cold-archive root for purged changelog segments (S3)
    "filter_regex",     # whitelist on changelog `source` (schema.table analogue)
    "filter_black_regex",  # blacklist — wins over the whitelist, Canal order
    "lineage",          # lineage table root
    "band_index",       # dedup signature-index table root (created if absent)
    "band_index_signature",  # family for a NEW band index (minhash|winnow)
    "ivf_index",        # IVF ANN-index table root (must be pre-built)
    "target_mb",        # compaction target file size (MB)
    "mode",             # "batch" (default: one run_pass per round) | "stream"
    "checkpoint",       # stream mode: Structured Streaming checkpoint dir
} | set(_PASS_KNOBS) | set(_STREAM_KNOBS)

# keys meaningless for the other mode — configuring them is a spec bug
# (band_index / ivf_index are valid in BOTH modes: run_pass refreshes
# them per round, stream mode per micro-batch)
_BATCH_ONLY = (set(_PASS_KNOBS) - set(_STREAM_KNOBS)) | {
    "lineage", "target_mb",
}
_STREAM_ONLY = (set(_STREAM_KNOBS) - set(_PASS_KNOBS)) | {"checkpoint"}


@dataclass(frozen=True)
class InstanceSpec:
    """One destination's validated maintenance configuration."""

    destination: str
    table: str
    mode: str = "batch"
    changelog: str | None = None
    archive: str | None = None
    checkpoint: str | None = None
    filter_regex: str | None = None
    filter_black_regex: str | None = None
    lineage: str | None = None
    band_index: str | None = None
    band_index_signature: str | None = None
    ivf_index: str | None = None
    target_mb: int | None = None
    pass_kwargs: dict = field(default_factory=dict)
    fingerprint: str = ""

    def run_pass_kwargs(self) -> dict:
        kw = dict(self.pass_kwargs)
        if self.target_mb is not None:
            kw["target_file_bytes"] = int(self.target_mb) << 20
        if self.lineage is not None:
            kw["lineage_root"] = self.lineage
        return kw

    def stream_kwargs(self) -> dict:
        return {k: v for k, v in self.pass_kwargs.items() if k in _STREAM_KNOBS}


def load_instance(conf_dir: str, destination: str) -> InstanceSpec:
    """Parse + validate ``<conf_dir>/<destination>/instance.json``."""
    path = os.path.join(conf_dir, destination, INSTANCE_FILE)
    with open(path, "rb") as f:
        raw = f.read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError as e:
        raise ValueError(f"[{destination}] {INSTANCE_FILE} is not valid JSON: {e}")
    if not isinstance(doc, dict):
        raise ValueError(f"[{destination}] {INSTANCE_FILE} must be a JSON object")
    unknown = sorted(set(doc) - _TOP_KEYS)
    if unknown:
        raise ValueError(
            f"[{destination}] unknown instance keys {unknown} — "
            f"known: {sorted(_TOP_KEYS)}"
        )
    if not doc.get("table"):
        raise ValueError(f"[{destination}] 'table' is required")
    mode = doc.get("mode", "batch")
    if mode not in ("batch", "stream"):
        raise ValueError(f"[{destination}] 'mode' must be 'batch' or 'stream'")
    wrong_mode = sorted(
        (set(doc) & (_STREAM_ONLY if mode == "batch" else _BATCH_ONLY))
    )
    if wrong_mode:
        raise ValueError(
            f"[{destination}] keys {wrong_mode} do not apply to "
            f"mode={mode!r} — a silently-ignored knob is a config bug"
        )
    if mode == "stream":
        if not doc.get("checkpoint"):
            raise ValueError(
                f"[{destination}] stream mode requires 'checkpoint' "
                "(exactly-once resume lives there)"
            )
        if not doc.get("changelog"):
            raise ValueError(f"[{destination}] stream mode requires 'changelog'")
    pass_kwargs = {}
    for k, typ in {**_PASS_KNOBS, **_STREAM_KNOBS}.items():
        if k in doc and doc[k] is not None:
            v = doc[k]
            # bool is an int subclass — check it first and exactly
            if typ is bool:
                if not isinstance(v, bool):
                    raise ValueError(f"[{destination}] '{k}' must be a boolean")
            elif typ in (int, float):
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    raise ValueError(f"[{destination}] '{k}' must be a number")
                v = typ(v)
            elif not isinstance(v, typ):
                raise ValueError(f"[{destination}] '{k}' must be {typ.__name__}")
            pass_kwargs[k] = v
    for k in ("table", "changelog", "archive", "checkpoint", "filter_regex",
              "filter_black_regex", "lineage", "band_index",
              "band_index_signature", "ivf_index"):
        if doc.get(k) is not None and not isinstance(doc[k], str):
            raise ValueError(f"[{destination}] '{k}' must be a string")
    for k in ("filter_regex", "filter_black_regex"):
        if doc.get(k):
            # compile NOW: a malformed pattern must be a config_error at
            # load time (the module's hard-error stance), not a
            # pass_error every round / an HTTP 500 on every consumer get
            import re as _re

            try:
                _re.compile(doc[k])
            except _re.error as e:
                raise ValueError(
                    f"[{destination}] '{k}' is not a valid regex: {e}"
                ) from e
    sig = doc.get("band_index_signature")
    if sig is not None:
        from canal_spark.dedup_index import SIGNATURES

        # config-time hard errors, same stance as the regex compile:
        # a bad family must fail the spec load, not every round
        if sig not in SIGNATURES:
            raise ValueError(
                f"[{destination}] 'band_index_signature' must be one of "
                f"{sorted(SIGNATURES)}, got {sig!r}"
            )
        if not doc.get("band_index"):
            raise ValueError(
                f"[{destination}] 'band_index_signature' requires 'band_index'"
            )
    tmb = doc.get("target_mb")
    if tmb is not None and (isinstance(tmb, bool) or not isinstance(tmb, int) or tmb <= 0):
        raise ValueError(f"[{destination}] 'target_mb' must be a positive integer")
    return InstanceSpec(
        destination=destination,
        table=doc["table"],
        mode=mode,
        checkpoint=doc.get("checkpoint"),
        changelog=doc.get("changelog"),
        archive=doc.get("archive"),
        filter_regex=doc.get("filter_regex"),
        filter_black_regex=doc.get("filter_black_regex"),
        lineage=doc.get("lineage"),
        band_index=doc.get("band_index"),
        band_index_signature=doc.get("band_index_signature"),
        ivf_index=doc.get("ivf_index"),
        target_mb=tmb,
        pass_kwargs=pass_kwargs,
        fingerprint=hashlib.sha256(raw).hexdigest(),
    )


def scan_instances(conf_dir: str) -> tuple[dict[str, InstanceSpec], dict[str, str]]:
    """One conf-dir sweep: ``{destination: spec}`` for every subdir
    carrying an ``instance.json`` plus ``{destination: error}`` for the
    ones that fail validation (a broken config must not take down its
    healthy neighbours — the reference logs and skips too,
    SpringInstanceConfigMonitor.java:116-126 restricts the scan to
    ``instance.properties`` files for the same reason)."""
    specs: dict[str, InstanceSpec] = {}
    errors: dict[str, str] = {}
    if not os.path.isdir(conf_dir):
        return specs, errors
    for name in sorted(os.listdir(conf_dir)):
        sub = os.path.join(conf_dir, name)
        if not os.path.isdir(sub):
            continue
        if not os.path.isfile(os.path.join(sub, INSTANCE_FILE)):
            continue  # spring/ and tsdb/ style support dirs are not instances
        try:
            specs[name] = load_instance(conf_dir, name)
        except (ValueError, OSError) as e:
            errors[name] = str(e)
    return specs, errors


def diff_registry(
    registry: dict[str, str],
    specs: dict[str, InstanceSpec],
    errors: dict[str, str] | None = None,
) -> list[dict]:
    """Start/reload/stop events from one scan, CanalController-style
    (SpringInstanceConfigMonitor.scan:127-170: present+unregistered →
    start, fingerprint changed → reload, registered+gone → stop).
    Mutates ``registry`` (destination → fingerprint) in place.

    ``errors`` (the scan's per-destination validation failures) makes
    a TRANSIENTLY unreadable spec distinguishable from a removed one:
    a registered destination whose instance.json failed this round's
    read (mid-rewrite by a config tool, transient OSError, a bad edit)
    is KEPT — logged and skipped, the reference's behavior — instead
    of being stopped and churned back up when the file heals."""
    events: list[dict] = []
    for dest, spec in specs.items():
        old = registry.get(dest)
        if old is None:
            events.append({"event": "start", "destination": dest})
        elif old != spec.fingerprint:
            events.append({"event": "reload", "destination": dest})
        registry[dest] = spec.fingerprint
    broken = set(errors or ())
    for dest in sorted(set(registry) - set(specs) - broken):
        events.append({"event": "stop", "destination": dest})
        del registry[dest]
    return events


def _read_changelog(spark: SparkSession, spec: InstanceSpec) -> DataFrame | None:
    """The instance's staged changelog, source-filtered; None when the
    staging dir is absent/empty (a destination may be configured before
    its producer starts — the pass still compacts/clusters)."""
    from canal_spark.changelog import changelog_dir_has_data

    if not changelog_dir_has_data(spec.changelog):
        return None
    return _source_filter(spark.read.parquet(spec.changelog), spec)


def _source_filter(df: DataFrame, spec: InstanceSpec) -> DataFrame:
    """canal.instance.filter.regex / filter.black.regex on the event's
    schema.table — here the changelog's `source`.  Black wins (the
    reference applies the blacklist after the whitelist:
    filter/.../AviatorRegexFilter usage in
    parse/.../AbstractEventParser.java filter chain).  NULL source is
    KEPT by both filters: delete events carry no after-image source
    (CHANGELOG_SCHEMA — D rows are (doc_id, NULLs)), and silently
    dropping an unclassifiable delete would leak the key forever;
    the merge's key lookup routes it to the right row regardless."""
    if spec.filter_regex:
        df = df.where(
            F.col("source").isNull() | F.col("source").rlike(spec.filter_regex)
        )
    if spec.filter_black_regex:
        df = df.where(
            F.col("source").isNull()
            | ~F.col("source").rlike(spec.filter_black_regex)
        )
    return df


def run_instance_pass(
    spark: SparkSession, spec: InstanceSpec, job_id: str | None = None
) -> dict:
    """One maintenance pass for one destination; returns the flat
    per-instance report the server emits (prometheus metrics labeled
    with the DESTINATION name, not the table path — matching the
    reference's per-instance exposition labels)."""
    from canal_spark import load_table
    from canal_spark.ann_index import load_or_create_ivf_index
    from canal_spark.dedup_index import load_or_create_band_index
    from canal_spark.maintenance import prometheus_metrics, run_pass

    if spec.mode != "batch":
        raise ValueError(
            f"[{spec.destination}] mode={spec.mode!r} instances are "
            "supervised by StreamFleet, not the batch round"
        )
    table = load_table(spec.table)
    band_index = (
        load_or_create_band_index(
            spec.band_index, signature=spec.band_index_signature
        )
        if spec.band_index else None
    )
    rep = run_pass(
        spark,
        table,
        changes=_read_changelog(spark, spec),
        job_id=job_id,
        band_index=band_index,
        # load_or_create, matching the stream path: a spec pointing at a
        # not-yet-built index must bootstrap it on the first pass, not
        # emit a pass_error every round until someone builds it by hand
        ivf_index=(
            load_or_create_ivf_index(spec.ivf_index) if spec.ivf_index else None
        ),
        **spec.run_pass_kwargs(),
    )
    return {
        "destination": spec.destination,
        "job_id": rep.job_id,
        "merge": rep.merge,
        "compact": rep.compact,
        "cluster": rep.cluster,
        "expire": rep.expire,
        "timings": rep.timings,
        "metrics": prometheus_metrics(rep, destination=spec.destination),
    }


def run_server_round(
    spark: SparkSession,
    specs: dict[str, InstanceSpec],
    parallel: int = 1,
    job_id_prefix: str | None = None,
) -> dict[str, dict]:
    """Run one pass per active instance; per-instance failures are
    captured (``{"error": ...}``), never propagated — one destination's
    bad table must not starve the fleet (the reference's per-instance
    ServerRunningMonitor isolates failures the same way,
    CanalController.java:145-170).

    ``parallel > 1`` submits passes from a thread pool: each worker
    pins its jobs to a per-destination scheduler pool and job group, so
    under ``spark.scheduler.mode=FAIR`` instances share the cluster
    fairly and a hung destination can be cancelled by group without
    touching its neighbours."""
    from concurrent.futures import ThreadPoolExecutor

    sc = spark.sparkContext

    def one(item: tuple[str, InstanceSpec]) -> tuple[str, dict]:
        dest, spec = item
        sc.setLocalProperty("spark.scheduler.pool", dest)
        sc.setJobGroup(f"instance:{dest}", f"maintenance pass [{dest}]",
                       interruptOnCancel=True)
        try:
            jid = f"{job_id_prefix}-{dest}" if job_id_prefix else None
            return dest, run_instance_pass(spark, spec, job_id=jid)
        except Exception as e:  # noqa: BLE001 — fleet isolation boundary
            return dest, {"destination": dest, "error": f"{type(e).__name__}: {e}"}
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)
            # pyspark has no clearJobGroup; nulling the local properties
            # is the documented equivalent
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
            sc.setLocalProperty("spark.job.interruptOnCancel", None)

    items = sorted(specs.items())
    if parallel <= 1 or len(items) <= 1:
        return dict(one(it) for it in items)
    with ThreadPoolExecutor(max_workers=parallel) as pool:
        return dict(pool.map(one, items))


# ---- streaming instances ----------------------------------------------


def start_instance_stream(spark: SparkSession, spec: InstanceSpec):
    """Launch one destination's continuous apply as a supervised
    StreamingQuery (the reference's ``embededCanalServer.start(
    destination)``, CanalController.java:145-160 — an instance IS an
    always-on pipeline there; batch mode is our maintenance-round
    specialization)."""
    from canal_spark import load_table
    from canal_spark.ann_index import load_or_create_ivf_index
    from canal_spark.dedup_index import load_or_create_band_index
    from canal_spark.streaming.apply import stream_apply

    return stream_apply(
        spark,
        load_table(spec.table),
        spec.changelog,
        spec.checkpoint,
        transform=(lambda df: _source_filter(df, spec))
        if (spec.filter_regex or spec.filter_black_regex) else None,
        return_query=True,
        band_index=(
            load_or_create_band_index(
                spec.band_index, signature=spec.band_index_signature
            )
            if spec.band_index else None
        ),
        ivf_index=(
            load_or_create_ivf_index(spec.ivf_index)
            if spec.ivf_index else None
        ),
        **spec.stream_kwargs(),
    )


class StreamFleet:
    """Supervisor for ``mode="stream"`` instances: conf-dir lifecycle
    events map onto StreamingQuery start/stop/restart — the
    InstanceConfigMonitor's notifyStart/notifyReload/notifyStop
    (SpringInstanceConfigMonitor.java:173-205) with Structured
    Streaming as the runtime.  Restart-on-reload is safe by
    construction: the checkpoint + the table's high-water mark make a
    replayed micro-batch a no-op, so a config change never double-
    applies or skips ordinals."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._running: dict[str, tuple[str, object]] = {}  # dest -> (fp, handle)

    @staticmethod
    def _safe_stop(handle) -> tuple[object, str | None]:
        """Stop one query WITHOUT letting a died query poison the fleet:
        ``awaitTermination`` re-raises a failed query's
        StreamingQueryException, so a destination that crashed and was
        then removed/reloaded would otherwise abort the whole sync.
        Returns (result, error_string)."""
        try:
            return handle.stop(), None
        except Exception as e:  # noqa: BLE001 — fleet isolation boundary
            return handle.result, f"{type(e).__name__}: {e}"

    def sync(
        self,
        specs: dict[str, InstanceSpec],
        errors: dict[str, str] | None = None,
    ) -> list[dict]:
        """Reconcile the running queries against one scan's stream-mode
        specs; returns lifecycle events.  A failed start is an event,
        not an exception (fleet isolation).  ``errors`` (the scan's
        validation failures) protects a RUNNING query from a transiently
        unreadable spec: like :func:`diff_registry`, a broken config is
        logged and skipped, never a physical stop of a healthy stream."""
        events: list[dict] = []
        stream_specs = {d: s for d, s in specs.items() if s.mode == "stream"}
        broken = set(errors or ())
        for dest in sorted(set(self._running) - set(stream_specs) - broken):
            fp, handle = self._running.pop(dest)
            _res, err = self._safe_stop(handle)
            ev = {"event": "stop", "destination": dest}
            if err:
                ev["error"] = err  # the query had already died — surface it
            events.append(ev)
        for dest in sorted(stream_specs):
            spec = stream_specs[dest]
            cur = self._running.get(dest)
            if cur is not None and cur[0] == spec.fingerprint:
                continue
            ev = {"event": "start" if cur is None else "reload",
                  "destination": dest}
            if cur is not None:
                # a query that DIED before this reload must not lose its
                # terminal exception — surface it on the reload event
                _res, err = self._safe_stop(cur[1])
                if err:
                    ev["previous_error"] = err
            try:
                handle = start_instance_stream(self.spark, spec)
            except Exception as e:  # noqa: BLE001 — fleet isolation boundary
                if cur is not None:
                    del self._running[dest]
                err_ev = {"event": "start_error", "destination": dest,
                          "error": f"{type(e).__name__}: {e}"}
                if "previous_error" in ev:
                    # the stopped query's terminal exception is the only
                    # record of why it died — must survive a failed
                    # restart, not vanish with the unsent reload event
                    err_ev["previous_error"] = ev["previous_error"]
                events.append(err_ev)
                continue
            self._running[dest] = (spec.fingerprint, handle)
            events.append(ev)
        return events

    def health(self) -> list[dict]:
        """One row per running query: active flag, progress counters,
        and any terminal exception (a died query stays in the registry
        so the NEXT sync's unchanged-fingerprint check doesn't mask it
        — report, let the operator fix the spec, reload restarts it)."""
        rows = []
        for dest in sorted(self._running):
            _fp, handle = self._running[dest]
            exc = handle.query.exception()
            rows.append({
                "destination": dest,
                "active": handle.query.isActive,
                "batches_seen": handle.result.batches_seen,
                "batches_applied": handle.result.batches_applied,
                "quarantined": handle.result.quarantined_total,
                "error": str(exc) if exc else None,
            })
        return rows

    def restart(self, destination: str, spec: InstanceSpec) -> None:
        """Force-restart one destination (operator verb for a died
        query whose spec did not change)."""
        cur = self._running.pop(destination, None)
        if cur is not None:
            self._safe_stop(cur[1])  # restart IS the died-query verb
        self._running[destination] = (
            spec.fingerprint, start_instance_stream(self.spark, spec)
        )

    def stop_all(self) -> dict[str, dict]:
        """Graceful shutdown; returns final per-destination counters."""
        out = {}
        for dest in sorted(self._running):
            _fp, handle = self._running.pop(dest)
            res, err = self._safe_stop(handle)
            out[dest] = {
                "batches_seen": res.batches_seen,
                "batches_applied": res.batches_applied,
                "quarantined": res.quarantined_total,
            }
            if err:
                out[dest]["error"] = err
        return out
