"""spark-submit job: one full maintenance pass (merge -> cluster ->
compact -> expire), the adapter consume-loop analogue.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/run_pass.py \\
      /warehouse/tokens --changelog /staging/changelog --lineage /warehouse/_lineage
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("full maintenance pass")
    p.add_argument("--changelog", default=None, help="changelog parquet dir (optional)")
    p.add_argument("--target-mb", type=int, default=512)
    p.add_argument("--target-file-rows", type=int, default=500_000)
    p.add_argument("--curve", choices=["zorder", "hilbert"], default="zorder")
    p.add_argument("--keep-last", type=int, default=5)
    p.add_argument("--band-index", default=None,
                   help="band-index table root to sync after the merge "
                        "(created empty if absent)")
    p.add_argument("--ivf-index", default=None,
                   help="IVF ANN-index table root to sync after the merge "
                        "(must already be fully built — the codebook is "
                        "trained by jobs/ann.py --full)")
    p.add_argument("--merge-mode", choices=["cow", "mor"], default="cow",
                   help="cow: rewrite affected files in place; mor: commit "
                        "equality-delete files (O(batch) write, scans fold "
                        "deletes until materialization)")
    p.add_argument("--max-pending-delete-files", type=int, default=8,
                   help="materialize merge-on-read delete debt once this "
                        "many delete files accumulate")
    p.add_argument("--convert-eq-debt", action="store_true",
                   help="below the materialize threshold, convert pending "
                        "equality deletes to position deletes (zero data "
                        "rewrites) so in-window scans pay the cheap 2-key "
                        "anti-join instead of the key+sequence join")
    p.add_argument("--rewrite-pos-debt-files", type=int, default=None,
                   help="consolidate pos-delete files once this many pile "
                        "up (merges small delete files, GCs dangling rows, "
                        "zero data rewrites)")
    p.add_argument("--wap", action="store_true",
                   help="write-audit-publish: stage the merge, audit "
                        "structural invariants (key uniqueness, token-array "
                        "equality, optional delete bound), publish only if "
                        "clean — an aborted stage leaves the batch "
                        "unapplied for retry and the job exits nonzero")
    p.add_argument("--wap-max-delete-fraction", type=float, default=None,
                   help="abort the staged merge if it would shrink the "
                        "table by more than this fraction (runaway-delete "
                        "guard); only with --wap")
    p.add_argument("--branch", default=None,
                   help="run the WHOLE pass on a writable branch and "
                        "publish it atomically at the end (spark.wap.branch "
                        "flow); created if absent; a publish conflict exits "
                        "4 and leaves the chain for inspection")
    p.add_argument("--branch-no-publish", action="store_true",
                   help="with --branch: leave the chain unpublished for "
                        "out-of-band audit (publish via jobs/branch.py "
                        "--fast-forward, discard via --delete)")
    p.add_argument("--span-cut", action="store_true",
                   help="excise cross-document duplicated token runs "
                        "before clustering (dupspan.py; keep-first-copy, "
                        "out-of-band merge, mainline only)")
    p.add_argument("--span-cut-w", type=int, default=None,
                   help="with --span-cut: window width in tokens")
    p.add_argument("--span-cut-sample-mod", type=int, default=1,
                   help="with --span-cut: 1-in-k window sampling")
    p.add_argument("--span-cut-max-fraction", type=float, default=0.5,
                   help="with --span-cut: abort before writing past this "
                        "touched-docs fraction")
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.maintenance import prometheus_metrics, run_pass

    spark = session(args, "canal-run-pass")
    table = load_table(args.table)
    changes = spark.read.parquet(args.changelog) if args.changelog else None
    band_index = None
    if args.band_index:
        from canal_spark.dedup_index import load_or_create_band_index

        band_index = load_or_create_band_index(args.band_index)
    rep = run_pass(
        spark, table, changes,
        lineage_root=args.lineage,
        target_file_bytes=args.target_mb << 20,
        target_file_rows=args.target_file_rows,
        curve=args.curve,
        keep_snapshots=args.keep_last,
        job_id=args.job_id,
        band_index=band_index,
        ivf_index=load_table(args.ivf_index) if args.ivf_index else None,
        merge_mode=args.merge_mode,
        max_pending_delete_files=args.max_pending_delete_files,
        convert_eq_debt=args.convert_eq_debt,
        rewrite_pos_debt_files=args.rewrite_pos_debt_files,
        wap=args.wap,
        wap_max_delete_fraction=args.wap_max_delete_fraction,
        branch=args.branch,
        publish_branch=not args.branch_no_publish,
        span_cut=args.span_cut,
        span_cut_w=args.span_cut_w,
        span_cut_sample_mod=args.span_cut_sample_mod,
        span_cut_max_fraction=args.span_cut_max_fraction,
    )
    emit({"job": "run_pass", "job_id": rep.job_id, "merge": rep.merge,
          "wap": rep.wap, "branch": rep.branch,
          "materialize": rep.materialize, "convert": rep.convert,
          "pos_rewrite": rep.pos_rewrite,
          "span_cut": rep.span_cut,
          "ivf_index": rep.ivf_index,
          "compact": rep.compact, "cluster": rep.cluster, "expire": rep.expire,
          "band_index": rep.band_index,
          "metrics": prometheus_metrics(rep, destination=args.table)})
    if args.wap and rep.wap and not rep.wap.get("published", True):
        raise SystemExit(3)  # staged merge failed audit and was aborted
    if args.branch and rep.branch.get("conflict"):
        raise SystemExit(4)  # publish conflicted; chain kept for inspection


if __name__ == "__main__":
    main()
