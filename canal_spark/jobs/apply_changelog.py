"""spark-submit job: apply a changelog directory to the token table.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/apply_changelog.py \\
      /warehouse/tokens --changelog /staging/changelog --lineage /warehouse/_lineage

Reads every changelog parquet under --changelog, MERGEs the slice past
the table's high-water mark (replay-safe), records lineage.  With
--stream, runs the Structured Streaming loop instead (availableNow
unless --continuous).
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("CDC apply: changelog -> MERGE INTO token table")
    p.add_argument("--changelog", required=True, help="changelog parquet dir")
    p.add_argument("--target-file-rows", type=int, default=500_000)
    p.add_argument("--stream", action="store_true", help="use Structured Streaming")
    p.add_argument("--stream-checkpoint", default=None)
    p.add_argument("--continuous", action="store_true")
    p.add_argument(
        "--merge-mode", choices=("cow", "mor"), default="cow",
        help="cow rewrites affected files per batch; mor commits "
        "O(batch) equality-delete + upsert files (low-latency apply)",
    )
    p.add_argument(
        "--max-pending-delete-files", type=int, default=None,
        help="with --merge-mode mor: fold delete debt inline once this "
        "many delete files accumulate (default: defer to the next "
        "maintenance pass)",
    )
    p.add_argument(
        "--wap", action="store_true",
        help="write-audit-publish the merge: batch mode stages, audits "
        "and publishes (exit 3 on abort); stream mode audits each "
        "micro-batch (corrupt batches quarantine, stream continues)",
    )
    p.add_argument(
        "--wap-max-delete-fraction", type=float, default=None,
        help="with --wap: per-batch runaway-delete audit bound",
    )
    p.add_argument(
        "--branch", default=None,
        help="apply ON a writable branch (multi-commit WAP): create it "
        "with jobs/branch.py --create, chain several applies, then "
        "--fast-forward to publish or --delete to abandon",
    )
    args = p.parse_args()
    if args.branch and (args.wap or args.stream):
        p.error("--branch is batch-mode only and exclusive with --wap "
                "(branches ARE the multi-commit WAP)")

    from canal_spark import load_table
    from canal_spark.checkpoint import ensure_lineage, record

    spark = session(args, "canal-apply-changelog")
    table = load_table(args.table)

    if args.stream:
        from canal_spark.streaming import stream_apply

        res = stream_apply(
            spark, table, args.changelog,
            args.stream_checkpoint or f"{args.table}/_stream_ckpt",
            target_file_rows=args.target_file_rows,
            available_now=not args.continuous,
            merge_mode=args.merge_mode,
            max_pending_delete_files=args.max_pending_delete_files,
            wap=args.wap,
            wap_max_delete_fraction=args.wap_max_delete_fraction,
        )
        emit({"job": "apply_changelog", "mode": "stream",
              "batches_seen": res.batches_seen,
              "batches_applied": res.batches_applied, "merges": res.merges,
              "quarantined": res.quarantined})
        return

    from canal_spark.merge import merge_into

    changes = spark.read.parquet(args.changelog)
    wap_rep = {}
    parent_rows = None
    if args.wap:
        from canal_spark.maintenance import wap_finalize, wap_parent_rows

        parent_rows = wap_parent_rows(spark, table)
    m = merge_into(spark, table, changes,
                   target_file_rows=args.target_file_rows,
                   mode=args.merge_mode, job_id=args.job_id,
                   stage_only=args.wap, branch=args.branch)
    applied = m.applied
    if args.wap and m.applied:
        wap_rep = wap_finalize(
            spark, table, m, parent_rows=parent_rows,
            max_delete_fraction=args.wap_max_delete_fraction,
        )
        applied = wap_rep["published"]
    if args.lineage and applied:
        record(spark, ensure_lineage(args.lineage), m.job_id, "merge",
               ordinal=m.high_water_mark, snapshot_id=m.snapshot_id,
               files_rewritten=m.files_rewritten, bytes_shuffled=m.bytes_rewritten)
    emit({"job": "apply_changelog", "mode": "batch",
          **{**m.__dict__, "applied": applied}, "wap": wap_rep})
    if args.wap and wap_rep and not wap_rep.get("published", True):
        raise SystemExit(3)


if __name__ == "__main__":
    main()
