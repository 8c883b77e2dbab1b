"""Benchmark harness: maintenance-pass wall time + post-maintenance
full-scan throughput on a synthetic token table, plus per-operator
query timings at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "maintenance_pass_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "scan_seq_per_sec": ...,
   "phases": {...}, "cpus": ...}

Scale model: the token table is synthesized deterministically from the
`documents` fixture, replicated SPARK_GRAFT_BENCH_REPLICAS times (so
row count scales independently of the fixture SF) and written
fragmented (many small files) so the pass has real merge / compact /
cluster work to do — the sandbox-scale stand-in for the 10^12-sequence
Iceberg table in BASELINE.json.

Env knobs:
  SPARK_GRAFT_SF_DIR     fixture dir       (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS       local[N] threads  (default 32)
  SPARK_GRAFT_BENCH_REPLICAS  token-table replication factor (default 40)
  SPARK_GRAFT_BENCH_QUERIES   "all" | "none" | comma list (default all)
  SPARK_GRAFT_BENCH_PASS_RUNS full load+pass repetitions, best reported
                              (default 2 — this host drifts ±30%, one
                              sample made r2 vs r3 walls unreadable)
  SPARK_GRAFT_BENCH_SCALE_MULT extra probe at replicas×MULT for
                              machine-readable data-scale linearity
                              (default 10; 0/1 disables)
  SPARK_GRAFT_BENCH_EXTRAS    "0" drops the branch(WAP)-pass and
                              cold-archive phases (default on)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_token_table(spark, sf_dir: str, replicas: int):
    """Deterministic fragmented token table from `documents` x replicas.

    Pure JVM expressions (no Python row path): tokens are 60-bit md5
    word hashes mod 50257; replica rows get a rolled token array so
    replicas are not byte-identical.
    """
    from pyspark.sql import functions as F

    # repartition BEFORE the crossJoin: documents is one small file (one
    # split), and the broadcast-NL join keeps the left side's layout — so
    # without this the whole tokenization of docs × replicas rows runs in
    # a single task.
    from canal_spark.etl import _TOKENS_EXPR  # the SHIPPED tokenizer —
    # the bench must measure the same transform the real ETL runs

    n_part = spark.sparkContext.defaultParallelism * 2
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(n_part)
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    toks = F.expr(_TOKENS_EXPR)
    base = docs.select(
        F.col("doc_id").cast("string").alias("did"), toks.alias("toks"),
        "source",
    )
    return base.crossJoin(rep).select(
        F.concat_ws(":", "source", "did", F.col("rep").cast("string")).alias("doc_id"),
        # roll the array by rep so replicas differ: concat(slice(r+1..), slice(1..r))
        F.expr(
            "concat(slice(toks, CAST(rep % size(toks) AS INT) + 1, size(toks)),"
            "       slice(toks, 1, CAST(rep % size(toks) AS INT)))"
        ).alias("tokens"),
        F.size("toks").cast("int").alias("n_tok"),
        "source",
    )


def synth_changelog(spark, token_df, n_upd_mod: int, n_del_mod: int,
                    ordinal_base: int = 0):
    """Binlog-shaped changelog over the synthesized table: updates
    truncate tokens to 16, deletes tombstone; ordinal = xxhash-ranked.
    ``ordinal_base`` offsets a follow-up batch past the first batch's
    high-water mark.  The per-doc hash domain is 2^40 — only SAME-key
    ordinal order matters for last-wins dedupe (U=2h+1 < D=2h+2), and
    the compact domain leaves headroom for many follow-up batches
    before int64 overflows (base 2^42, 2^43, ... all safe)."""
    from pyspark.sql import functions as F

    # U and D ordinals must never collide for the same doc (a doc can
    # match both filters): U = 2h+1, D = 2h+2 — delete wins, and the
    # dedupe tie-break is deterministic run to run.
    h = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(1 << 40)) + F.lit(
        ordinal_base // 2
    )
    upd = token_df.where(F.crc32(F.col("doc_id")) % n_upd_mod == 0).select(
        (h * 2 + 1).cast("long").alias("ordinal"),
        F.lit("U").alias("op"),
        "doc_id",
        F.slice("tokens", 1, 16).alias("tokens"),
        F.least("n_tok", F.lit(16)).cast("int").alias("n_tok"),
        "source",
        F.to_timestamp(F.lit("2026-01-01")).alias("es"),
        F.lit(1).cast("long").alias("batch_id"),
    )
    dels = token_df.where(F.crc32(F.col("doc_id")) % n_del_mod == 1).select(
        (h * 2 + 2).cast("long").alias("ordinal"),
        F.lit("D").alias("op"),
        "doc_id",
        F.lit(None).cast("array<int>").alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        F.lit(None).cast("string").alias("source"),
        F.to_timestamp(F.lit("2026-01-01")).alias("es"),
        F.lit(2).cast("long").alias("batch_id"),
    )
    # ordinals are pmod-nonnegative and offset by +1/+2, so always > hwm(0)
    return upd.unionByName(dels)


def bench_archive(spark, root: str, changes) -> dict:
    """Cold-archive machinery cost at bench scale (S3/OSS archived-binlog
    path, archive.py): re-stage the changelog as ordinal-contiguous
    segments (the real binlog-slice layout — range partitioning, each
    file a contiguous ordinal window), archive the cold half (below the
    median ordinal), then time the cold∪live resolve a consumer pays per
    fetch, resuming from the 25th-percentile ordinal — inside the
    archived range, so the range catalog both PRUNES the older cold
    segments and FETCHES the newer ones (the zero-exchange
    scan+filter+union claim's cost side, both catalog decisions)."""
    import glob

    from canal_spark.archive import archive_segments, resolve_changelog

    staging = os.path.join(root, "_archive_staging")
    archive_dir = os.path.join(root, "_archive")
    q = changes.selectExpr("ordinal").approxQuantile("ordinal", [0.25, 0.5], 0.001)
    resume, mid = int(q[0]), int(q[1])
    changes.repartitionByRange(32, "ordinal").write.parquet(staging)
    out: dict = {"segments_staged": len(glob.glob(f"{staging}/part-*"))}
    t0 = time.perf_counter()
    rep = archive_segments(spark, staging, archive_dir, retain_from_ordinal=mid)
    out["archive_sec"] = round(time.perf_counter() - t0, 3)
    out["segments_archived"] = rep["archived_files"]
    t0 = time.perf_counter()
    df, rrep = resolve_changelog(spark, staging, archive_dir, from_ordinal=resume)
    out["resolve_rows"] = df.count() if df is not None else 0
    out["resolve_sec"] = round(time.perf_counter() - t0, 3)
    out["segments_fetched"] = rrep["segments_fetched"]
    out["segments_pruned"] = rrep["segments_pruned"]
    out["live_files"] = rrep["live_files"]
    return out


def bench_maintenance(spark, sf_dir: str, replicas: int, extras: bool = True) -> dict:
    # SPARK_GRAFT_BENCH_EXTRAS=0 drops the branch(WAP) + archive phases
    # (harnesses isolating the core pass — e.g. tools/scaling_bench.py)
    if os.environ.get("SPARK_GRAFT_BENCH_EXTRAS", "1") == "0":
        extras = False
    from pyspark.sql import functions as F

    from canal_spark import create_table
    from canal_spark.maintenance import run_pass
    from canal_spark.schema import TOKEN_TABLE_SCHEMA
    from canal_spark.table.writer import append

    keep_dir = os.environ.get("SPARK_GRAFT_BENCH_KEEP_DIR")
    root = keep_dir or tempfile.mkdtemp(prefix="canal_bench_")
    if keep_dir and os.path.isdir(keep_dir) and os.listdir(keep_dir):
        # refuse to wipe arbitrary pre-existing content — ONLY a dir
        # this bench itself created (stamped with the marker below) may
        # be replaced; any real table also has metadata/, so checking
        # for that would green-light deleting production data
        if not os.path.exists(os.path.join(keep_dir, "_CANAL_BENCH")):
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_KEEP_DIR={keep_dir} is non-empty and was "
                "not created by this bench — refusing to delete it"
            )
    shutil.rmtree(root, ignore_errors=True)
    if keep_dir:
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "_CANAL_BENCH"), "w") as f:
            f.write("created by bench.py; safe to replace on re-run\n")
    phases: dict[str, float] = {}
    try:
        table = create_table(root, TOKEN_TABLE_SCHEMA, partition_by=["source"])
        tok = make_token_table(spark, sf_dir, replicas)

        t0 = time.perf_counter()
        # fragmented initial load: 64 writer partitions -> many small files
        append(spark, table, tok.repartition(64))
        phases["load"] = time.perf_counter() - t0
        n_rows = sum(e.rows for e in table.files())

        # stage the changelog as parquet and read it back — the real flow
        # (binlog slices land as files before apply), and it keeps the
        # apply engine's several actions from recomputing the synthesis
        t0 = time.perf_counter()
        cl_dir = os.path.join(root, "_changelog_stage")
        synth_changelog(
            spark, table.scan(spark), n_upd_mod=11, n_del_mod=17
        ).write.parquet(cl_dir)
        changes = spark.read.parquet(cl_dir)
        phases["stage_changelog"] = time.perf_counter() - t0

        target_rows = int(os.environ.get("SPARK_GRAFT_BENCH_TARGET_ROWS", "500000"))
        target_mb = int(os.environ.get("SPARK_GRAFT_BENCH_TARGET_MB", "256"))
        t0 = time.perf_counter()
        rep = run_pass(
            spark, table, changes,
            target_file_bytes=target_mb << 20, target_file_rows=target_rows,
            keep_snapshots=3, measure=False,
        )
        pass_wall = time.perf_counter() - t0
        phases["maintenance_pass"] = pass_wall

        # post-maintenance full scan: reads EVERY token of EVERY row
        # (aggregate over the array, JVM-side) so the number is real
        # decode+compute throughput, not metadata pruning.  Best of 5
        # (first iteration pays scheduler/code-gen warmup).
        scan_wall = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            row = (
                table.scan(spark)
                .agg(
                    F.count("*").alias("n"),
                    F.sum("n_tok").alias("tot"),
                    F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)")).alias("chk"),
                )
                .collect()[0]
            )
            scan_wall = min(scan_wall, time.perf_counter() - t0)
        phases["full_scan"] = scan_wall
        seq_per_sec = row["n"] / scan_wall if scan_wall > 0 else 0.0

        # STEADY-STATE pass: a second changelog applied to the now
        # maintained (clustered + compacted + tagged) table — the shape
        # every pass after bootstrap has at the 10^12-row design point.
        # With cluster-tag preservation the merge keeps files tagged and
        # clustering rewrites only the batch-sized upsert files, so this
        # wall is the engine's real per-batch cost (the first pass above
        # includes the one-time bootstrap re-sort of the fragmented
        # load).
        t0 = time.perf_counter()
        cl2_dir = os.path.join(root, "_changelog_stage2")
        synth_changelog(
            spark, table.scan(spark), n_upd_mod=13, n_del_mod=19,
            ordinal_base=1 << 42,
        ).write.parquet(cl2_dir)
        changes2 = spark.read.parquet(cl2_dir)
        phases["stage_changelog2"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        rep2 = run_pass(
            spark, table, changes2,
            target_file_bytes=target_mb << 20, target_file_rows=target_rows,
            keep_snapshots=3, measure=False,
        )
        steady_wall = time.perf_counter() - t0
        phases["steady_pass"] = steady_wall

        # MERGE-ON-READ pass: the same steady-state shape applied as
        # equality deletes (mode="mor") — the batch commits as upsert
        # files + one delete file with ZERO base-table reads/rewrites.
        # At the 10^12-row design point this is the apply strategy for
        # batches whose keys spray wide (COW would touch O(table)
        # files); the wall here is the pure O(batch) write cost.  Debt
        # repayment is deferred (high threshold) so the number isolates
        # the apply; the materialize cost is amortized and shows up in
        # the steady COW pass shape instead.
        t0 = time.perf_counter()
        cl3_dir = os.path.join(root, "_changelog_stage3")
        synth_changelog(
            spark, table.scan(spark), n_upd_mod=23, n_del_mod=29,
            ordinal_base=1 << 43,
        ).write.parquet(cl3_dir)
        changes3 = spark.read.parquet(cl3_dir)
        phases["stage_changelog3"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        rep3 = run_pass(
            spark, table, changes3,
            target_file_bytes=target_mb << 20, target_file_rows=target_rows,
            keep_snapshots=3, measure=False,
            merge_mode="mor", max_pending_delete_files=1 << 30,
            do_cluster=False, do_compact=False,
        )
        mor_wall = time.perf_counter() - t0
        phases["mor_pass"] = mor_wall
        # post-MoR scan: the broadcast anti-join overhead a reader pays
        # while delete debt is pending (compare with scan_seq_per_sec)
        t0 = time.perf_counter()
        mor_row = table.scan(spark).agg(F.count("*").alias("n")).collect()[0]
        mor_scan_wall = time.perf_counter() - t0
        phases["mor_scan"] = mor_scan_wall

        # Delete-debt DML verbs, machine-readable round over round:
        # convert the eq debt the MoR pass just left (minor delete
        # compaction, zero data rewrites), re-scan to capture the
        # cheaper pos-debt tax, then one predicate position-delete.
        # Skipped for kept tables: the scaling harness re-scans the
        # kept table and must see the unmutated post-pass state.
        dml: dict = {}
        if not keep_dir:
            from canal_spark.merge import convert_eq_deletes, delete_where

            t0 = time.perf_counter()
            conv = convert_eq_deletes(spark, table)
            dml["convert_sec"] = round(time.perf_counter() - t0, 3)
            dml["convert_rows"] = conv.rows_deleted
            t0 = time.perf_counter()
            table.scan(spark).agg(F.count("*")).collect()
            dml["pos_debt_scan_sec"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            dw = delete_where(spark, table, "n_tok % 97 = 3", mode="mor-pos")
            dml["pos_delete_sec"] = round(time.perf_counter() - t0, 3)
            dml["pos_delete_rows"] = dw.rows_deleted
            phases.update(
                {f"dml_{k}": v for k, v in dml.items() if k.endswith("_sec")}
            )

        # Branch (WAP) pass: the audited single-publish flow — every
        # commit of the pass stages on a branch, then one fast-forward
        # publishes (run_pass: branch= IS the multi-commit
        # write-audit-publish) — with the same steady-state changelog
        # shape, measured in the externally-read path so its overhead vs
        # the direct steady pass is machine-readable round over round.
        wap_branch: dict = {}
        if extras and not keep_dir:
            t0 = time.perf_counter()
            cl4_dir = os.path.join(root, "_changelog_stage4")
            synth_changelog(
                spark, table.scan(spark), n_upd_mod=31, n_del_mod=37,
                ordinal_base=1 << 44,
            ).write.parquet(cl4_dir)
            changes4 = spark.read.parquet(cl4_dir)
            phases["stage_changelog4"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            rep4 = run_pass(
                spark, table, changes4,
                target_file_bytes=target_mb << 20,
                target_file_rows=target_rows,
                keep_snapshots=3, measure=False,
                branch="bench_audit", publish_branch=True,
            )
            wap_wall = time.perf_counter() - t0
            phases["wap_branch_pass"] = wap_wall
            wap_branch = {
                "wap_branch_pass_sec": round(wap_wall, 3),
                "wap_branch_published": rep4.branch.get("published"),
                "wap_branch_commits": rep4.branch.get("commits"),
                "wap_merge_files_rewritten": rep4.merge.get("files_rewritten"),
            }

        archive: dict = {}
        if extras and not keep_dir:
            archive = bench_archive(spark, root, changes)
            phases["archive_resolve"] = archive["resolve_sec"]

        return {
            "wap_branch": wap_branch,
            "archive": archive,
            "dml": dml,
            "mor_pass_sec": round(mor_wall, 3),
            "mor_merge_files_rewritten": rep3.merge.get("files_rewritten"),
            "mor_scan_sec": round(mor_scan_wall, 3),
            "mor_scan_seq_per_sec": round(
                mor_row["n"] / mor_scan_wall if mor_scan_wall > 0 else 0.0, 1
            ),
            "steady_pass_sec": round(steady_wall, 3),
            "steady_timings": rep2.timings,
            "steady_cluster_files_rewritten": rep2.cluster.get("files_before"),
            "steady_merge_files_rewritten": rep2.merge.get("files_rewritten"),
            "phases": {k: round(v, 3) for k, v in phases.items()},
            "pass_timings": rep.timings,
            "rows_loaded": int(n_rows),
            "rows_after": int(row["n"]),
            "total_tokens_after": int(row["tot"]),
            "maintenance_pass_sec": round(pass_wall, 3),
            "scan_seq_per_sec": round(seq_per_sec, 1),
            "merge": {k: rep.merge.get(k) for k in
                      ("files_rewritten", "files_pruned", "rows_upserted", "rows_deleted")},
            "compact_files_removed": rep.compact.get("files_removed"),
            "cluster_files_after": rep.cluster.get("files_after"),
        }
    finally:
        if not keep_dir:
            shutil.rmtree(root, ignore_errors=True)


def bench_queries(spark, sf_dir: str, which: str) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if which == "none":
        return {}
    if which != "all":
        keep = {s.strip() for s in which.split(",")}
        qs = {k: v for k, v in qs.items() if k in keep}
    from canal_spark.operators.common import release_cached_deps

    out = {}
    for name, fn in sorted(qs.items()):
        # best-of-2 per query, same reason as the pass's pass_runs:
        # whole-stage codegen + JIT land on the FIRST execution of each
        # unique plan (measured 2-4x on the heavy dedup queries), so a
        # single-shot sweep charges compilation to whichever queries
        # are cold and round-over-round comparison reads phantom
        # regressions.  Run 2 re-plans from scratch (no persisted state
        # survives release_cached_deps), so it measures the same work
        # minus the one-time compilation.
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            # queries that persist internal frames tag them on the
            # result; without the release the sweep accumulates one
            # cached corpus-scale frame per query per run for the
            # session lifetime
            release_cached_deps(df)
        out[name] = min(runs)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicas = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "40"))
    which = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "all")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        pass

    from canal_spark import get_spark

    extra = {}
    # For scaling runs on small stand-in tables: shrink the split size so
    # the scan has >= cpus splits (at 100 TB there are always enough
    # 128 MB splits; the tiny fixture needs help to expose parallelism).
    split_mb = os.environ.get("SPARK_GRAFT_BENCH_SPLIT_MB")
    if split_mb:
        extra["spark.sql.files.maxPartitionBytes"] = str(int(split_mb) << 20)
        extra["spark.sql.files.openCostInBytes"] = str(1 << 20)
    spark = get_spark("canal_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8), extra_conf=extra)

    t_all = time.perf_counter()
    # best-of-N full load+pass, fresh table each run: single samples on
    # this host drift ±30%, so one measurement cannot distinguish a real
    # regression from noise.  Both raw walls are reported alongside.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASS_RUNS", "2")))
    maints = [bench_maintenance(spark, sf_dir, replicas) for _ in range(n_runs)]
    maint = min(maints, key=lambda m: m["maintenance_pass_sec"])
    # steady gets its own independent best-of-N: the run that won the
    # cold pass is not necessarily the run that won the steady pass, and
    # inheriting the winner's (possibly noisy) steady sample re-imports
    # the drift the estimator exists to remove
    best_steady = min(maints, key=lambda m: m["steady_pass_sec"])
    queries = bench_queries(spark, sf_dir, which)

    result = {
        "metric": "maintenance_pass_wall_sec",
        "value": maint["maintenance_pass_sec"],
        "unit": "sec",
        "pass_runs": [m["maintenance_pass_sec"] for m in maints],
        "steady_pass_runs": [m["steady_pass_sec"] for m in maints],
        "load_runs": [m["phases"]["load"] for m in maints],
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "replicas": replicas,
        **{k: v for k, v in maint.items() if k != "maintenance_pass_sec"},
        "steady_pass_sec": best_steady["steady_pass_sec"],
        "steady_timings": best_steady["steady_timings"],
        "steady_cluster_files_rewritten":
            best_steady["steady_cluster_files_rewritten"],
        "steady_merge_files_rewritten":
            best_steady["steady_merge_files_rewritten"],
    }

    # data-scale linearity probe: the same job at replicas×MULT, with
    # the SAME best-of-N estimator as the base — dividing one noisy
    # probe sample by a best-of-N minimum biases the ratio high by the
    # host's ±30% drift, which is exactly the ambiguity this metric
    # exists to remove.
    mult = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_MULT", "10"))
    if mult > 1:
        # extras=False: the WAP/archive phases are measured at base
        # scale; the probe isolates the data-scale linearity of the
        # core load+pass+scan path.
        probes = [
            bench_maintenance(spark, sf_dir, replicas * mult, extras=False)
            for _ in range(n_runs)
        ]
        probe = min(probes, key=lambda m: m["maintenance_pass_sec"])
        result["scale_probe"] = {
            "replicas": replicas * mult,
            "rows_loaded": probe["rows_loaded"],
            "maintenance_pass_sec": probe["maintenance_pass_sec"],
            "pass_runs": [m["maintenance_pass_sec"] for m in probes],
            "scan_seq_per_sec": probe["scan_seq_per_sec"],
            "phases": probe["phases"],
            "pass_ratio_vs_base": round(
                probe["maintenance_pass_sec"] / maint["maintenance_pass_sec"], 2
            ),
        }
    result["total_wall_sec"] = round(time.perf_counter() - t_all, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
