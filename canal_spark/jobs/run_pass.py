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
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.maintenance import run_pass

    spark = session(args, "canal-run-pass")
    table = load_table(args.table)
    changes = spark.read.parquet(args.changelog) if args.changelog else None
    rep = run_pass(
        spark, table, changes,
        lineage_root=args.lineage,
        target_file_bytes=args.target_mb << 20,
        target_file_rows=args.target_file_rows,
        curve=args.curve,
        keep_snapshots=args.keep_last,
        job_id=args.job_id,
    )
    emit({"job": "run_pass", "job_id": rep.job_id, "merge": rep.merge,
          "compact": rep.compact, "cluster": rep.cluster, "expire": rep.expire})


if __name__ == "__main__":
    main()
