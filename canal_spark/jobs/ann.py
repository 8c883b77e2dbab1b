"""spark-submit job: maintain the IVF (ANN) cell index alongside an
embedding table — full build (trains + pins a codebook) or incremental
refresh from a changelog batch under the frozen codebook (the second
derived-store sync instance; see canal_spark/ann_index).

  # one-time full build (trains the codebook)
  spark-submit --py-files canal_spark.zip canal_spark/jobs/ann.py \\
      /warehouse/embeddings --index /warehouse/embeddings_ivf --full

  # per-batch incremental refresh (run AFTER the data merge of the same
  # changelog, e.g. by run_pass --ivf-index, or standalone):
  spark-submit ... canal_spark/jobs/ann.py /warehouse/embeddings \\
      --index /warehouse/embeddings_ivf --changelog /staging/changelog \\
      --lineage /warehouse/_lineage
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("IVF ANN-index maintenance")
    p.add_argument("--index", required=True, help="IVF index table root")
    p.add_argument("--changelog", default=None,
                   help="changelog parquet dir (keys to refresh)")
    p.add_argument("--full", action="store_true",
                   help="full rebuild (retrains the codebook)")
    p.add_argument("--emb-col", default="embedding",
                   help="embedding column name in the data table")
    p.add_argument("--keep-snapshots", type=int, default=5,
                   help="index snapshots to retain after the refresh")
    p.add_argument("--semantic-prune", action="store_true",
                   help="SemDedup pass: drop semantic duplicates within "
                        "IVF cells under the frozen codebook "
                        "(keep-furthest-from-centroid), deletes via the "
                        "ordinary MERGE + index refresh")
    p.add_argument("--eps", type=float, default=None,
                   help="semantic-prune cosine threshold (default SEM_EPS)")
    p.add_argument("--dry-run", action="store_true",
                   help="semantic-prune: report would-be removals only")
    p.add_argument("--wap", action="store_true",
                   help="semantic-prune: stage + audit before publish")
    p.add_argument("--max-delete-fraction", type=float, default=0.5,
                   help="semantic-prune WAP audit: abort if the pass "
                        "would delete more than this corpus fraction")
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.ann_index import load_or_create_ivf_index, refresh_ivf_index
    from canal_spark.checkpoint import ensure_lineage, record

    spark = session(args, "canal-ann-index")
    table = load_table(args.table)
    index = load_or_create_ivf_index(args.index)

    if args.semantic_prune:
        from canal_spark.ann_index import semantic_prune_pass
        from canal_spark.operators.similarity import SEM_EPS

        res = semantic_prune_pass(
            spark, table, index,
            eps=args.eps if args.eps is not None else SEM_EPS,
            emb_col=args.emb_col, dry_run=args.dry_run, wap=args.wap,
            max_delete_fraction=args.max_delete_fraction,
            job_id=args.job_id,
        )
        if args.lineage and res.applied:
            lineage = ensure_lineage(args.lineage)
            record(
                spark, lineage, res.job_id, "semantic_prune",
                snapshot_id=res.snapshot_id,
                metrics={
                    "vecs_scored": res.vecs_scored,
                    "losers_removed": res.losers_removed,
                    "codebook_version": res.codebook_version,
                },
            )
        # the prune's incremental refresh commits an index snapshot too —
        # same retention policy as the refresh path
        expire = index.expire_snapshots(keep_last=args.keep_snapshots)
        emit({"job": "semantic_prune", "expire": expire, **res.__dict__})
        return

    keys = None
    if not args.full and args.changelog:
        keys = spark.read.parquet(args.changelog).select(table.key_cols[0])
    res = refresh_ivf_index(
        spark, table, index, keys=keys, emb_col=args.emb_col,
        job_id=args.job_id,
    )
    if args.lineage and res.applied:
        lineage = ensure_lineage(args.lineage)
        record(
            spark, lineage, res.job_id, "ivf_index",
            snapshot_id=res.snapshot_id,
            files_rewritten=res.files_rewritten,
            metrics={
                "vecs_changed": res.vecs_changed,
                "codebook_version": res.codebook_version,
            },
        )
    expire = index.expire_snapshots(keep_last=args.keep_snapshots)
    emit({"job": "ann_index", "expire": expire, **res.__dict__})


if __name__ == "__main__":
    main()
