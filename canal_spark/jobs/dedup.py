"""spark-submit job: maintain the MinHash band index alongside the
token table — full build or incremental refresh from a changelog batch
(the derived-store sync of the dedup suite; see canal_spark/dedup_index).

  # one-time full build
  spark-submit --py-files canal_spark.zip canal_spark/jobs/dedup.py \\
      /warehouse/tokens --index /warehouse/tokens_bands --full

  # per-batch incremental refresh (run AFTER the data merge of the same
  # changelog, e.g. by run_pass --band-index, or standalone):
  spark-submit ... canal_spark/jobs/dedup.py /warehouse/tokens \\
      --index /warehouse/tokens_bands --changelog /staging/changelog \\
      --lineage /warehouse/_lineage
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("MinHash band-index maintenance")
    p.add_argument("--index", required=True, help="band-index table root")
    p.add_argument("--signature", choices=["minhash", "winnow"], default=None,
                   help="signature family for a NEW index (existing "
                        "indexes keep their pinned family; a mismatch "
                        "errors instead of corrupting the index)")
    p.add_argument("--changelog", default=None,
                   help="changelog parquet dir (keys to refresh)")
    p.add_argument("--full", action="store_true",
                   help="full rebuild regardless of --changelog")
    p.add_argument("--max-bucket", type=int, default=None,
                   help="hot-bucket cap for candidate reporting")
    p.add_argument("--keep-snapshots", type=int, default=5,
                   help="index snapshots to retain after the refresh")
    p.add_argument("--self-dedup", action="store_true",
                   help="corpus self-dedup: LSH groups from the index, "
                        "keep the longest doc per group, DELETE the rest "
                        "through MERGE, drop their index rows")
    p.add_argument("--dry-run", action="store_true",
                   help="with --self-dedup: report would-be removals only")
    p.add_argument("--wap", action="store_true",
                   help="with --self-dedup: stage + audit the delete merge "
                        "(runaway-delete bound) before publishing")
    p.add_argument("--max-delete-fraction", type=float, default=0.5,
                   help="with --self-dedup --wap: abort if the dedup would "
                        "shrink the corpus by more than this fraction")
    p.add_argument("--span-cut", action="store_true",
                   help="duplicated-span excision: cut every w-token run "
                        "occurring in >=2 docs (keep the first copy), "
                        "applied as an out-of-band UPDATE/DELETE merge; "
                        "refreshes the band index for touched keys")
    p.add_argument("--span-w", type=int, default=None,
                   help="with --span-cut: window width in tokens")
    p.add_argument("--span-sample-mod", type=int, default=1,
                   help="with --span-cut: 1-in-k hash-threshold window "
                        "sampling (the cluster-scale knob)")
    p.add_argument("--span-keep-all", action="store_true",
                   help="with --span-cut: excise EVERY occurrence instead "
                        "of keeping the first copy")
    p.add_argument("--max-cut-fraction", type=float, default=0.5,
                   help="with --span-cut: abort before writing if more than "
                        "this fraction of docs would be touched")
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.checkpoint import ensure_lineage, record
    from canal_spark.dedup_index import (
        MAX_BUCKET,
        corpus_dedup_pass,
        load_or_create_band_index,
        refresh_band_index,
    )

    if not (args.full or args.changelog or args.self_dedup or args.span_cut):
        # keys=None means a FULL O(table) rebuild — that mode is what
        # --full exists to opt into explicitly; a cron line that lost
        # its --changelog must not silently rebuild the index every run
        p.error("pass --changelog for an incremental refresh or --full "
                "for a complete rebuild")
    spark = session(args, "canal-dedup-index")
    table = load_table(args.table)
    index = load_or_create_band_index(args.index, signature=args.signature)

    if args.span_cut:
        from canal_spark.dupspan import dup_span_cut_pass
        from canal_spark.operators.tokenops import DUP_W

        res = dup_span_cut_pass(
            spark, table,
            w=args.span_w or DUP_W,
            sample_mod=args.span_sample_mod,
            keep_one=not args.span_keep_all,
            dry_run=args.dry_run,
            wap=args.wap,
            max_cut_fraction=args.max_cut_fraction,
            index=index,
            job_id=args.job_id,
        )
        if args.lineage and res.applied:
            lineage = ensure_lineage(args.lineage)
            record(
                spark, lineage, res.job_id, "span_cut",
                snapshot_id=res.snapshot_id,
                metrics={
                    "dup_windows": res.dup_windows,
                    "docs_affected": res.docs_affected,
                    "docs_deleted": res.docs_deleted,
                    "tokens_removed": res.tokens_removed,
                },
            )
        out = dict(res.__dict__)
        if res.applied:
            # the pass COW-refreshed the index for touched keys — expire
            # here like the refresh verb below, or scheduled span-cut
            # runs retain every historical index file forever
            out["index_expire"] = index.expire_snapshots(
                keep_last=args.keep_snapshots
            )
        emit({"job": "span_cut", **out})
        if res.aborted or (
            args.wap and res.wap and not res.wap.get("published", True)
        ):
            raise SystemExit(3)
        return

    if args.self_dedup:
        res = corpus_dedup_pass(
            spark, table, index,
            max_bucket=args.max_bucket or MAX_BUCKET,
            dry_run=args.dry_run,
            wap=args.wap,
            max_delete_fraction=args.max_delete_fraction,
            job_id=args.job_id,
        )
        if args.lineage and res.applied:
            lineage = ensure_lineage(args.lineage)
            record(
                spark, lineage, res.job_id, "self_dedup",
                snapshot_id=res.snapshot_id,
                metrics={
                    "groups": res.groups,
                    "losers_removed": res.losers_removed,
                    "hot_buckets_capped": res.hot_buckets_capped,
                },
            )
        out = dict(res.__dict__)
        if res.applied:
            out["index_expire"] = index.expire_snapshots(
                keep_last=args.keep_snapshots
            )
        emit({"job": "self_dedup", **out})
        if args.wap and res.wap and not res.wap.get("published", True):
            raise SystemExit(3)
        return

    keys = None
    if not args.full and args.changelog:
        keys = spark.read.parquet(args.changelog).select("doc_id")
    res = refresh_band_index(
        spark, table, index, keys=keys,
        max_bucket=args.max_bucket or MAX_BUCKET,
        job_id=args.job_id,
    )
    if args.lineage and res.applied:
        lineage = ensure_lineage(args.lineage)
        record(
            spark, lineage, res.job_id, "band_index",
            snapshot_id=res.snapshot_id,
            files_rewritten=res.files_rewritten,
            metrics={
                "dup_candidates": res.dup_candidates,
                "dup_docs": res.dup_docs,
                "hot_buckets_capped": res.hot_buckets_capped,
            },
        )
    # expire like any table: per-batch COW refreshes otherwise retain
    # every historical index file forever
    expire = index.expire_snapshots(keep_last=args.keep_snapshots)
    emit({"job": "dedup_index", "expire": expire, **res.__dict__})


if __name__ == "__main__":
    main()
