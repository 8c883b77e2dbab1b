"""spark-submit job: Z-order / Hilbert clustering rewrite.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/cluster.py \\
      /warehouse/tokens --curve zorder --target-file-rows 500000
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("cluster the table along a space-filling curve")
    p.add_argument("--curve", choices=["zorder", "hilbert"], default="zorder")
    p.add_argument("--target-file-rows", type=int, default=500_000)
    p.add_argument("--no-measure", action="store_true",
                   help="skip min/max stat-tightness measurement")
    p.add_argument("--scope", choices=["incremental", "full"],
                   default="incremental")
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.checkpoint import ensure_lineage, record
    from canal_spark.cluster import cluster

    spark = session(args, "canal-cluster")
    table = load_table(args.table)
    res = cluster(spark, table, curve=args.curve,
                  target_file_rows=args.target_file_rows,
                  measure=not args.no_measure, scope=args.scope,
                  job_id=args.job_id)
    if args.lineage:
        record(spark, ensure_lineage(args.lineage), res.job_id, "cluster",
               snapshot_id=res.snapshot_id, files_rewritten=res.files_before,
               tightness_before=res.tightness_before.get("hash_range"),
               tightness_after=res.tightness_after.get("hash_range"))
    emit({"job": "cluster", "snapshot_id": res.snapshot_id, "curve": res.curve,
          "files_before": res.files_before, "files_after": res.files_after,
          "tightness_before": res.tightness_before,
          "tightness_after": res.tightness_after})


if __name__ == "__main__":
    main()
