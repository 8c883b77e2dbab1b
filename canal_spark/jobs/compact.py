"""spark-submit job: bin-pack small files into target-size files.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/compact.py \\
      /warehouse/tokens --target-mb 512 --pack-by n_tok
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("small-file compaction (greedy bin-packing)")
    p.add_argument("--target-mb", type=int, default=512)
    p.add_argument("--pack-by", choices=["bytes", "n_tok"], default="n_tok")
    p.add_argument("--max-bins-per-commit", type=int, default=64)
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.checkpoint import ensure_lineage, record
    from canal_spark.compact import compact

    spark = session(args, "canal-compact")
    table = load_table(args.table)
    res = compact(spark, table, target_bytes=args.target_mb << 20,
                  pack_by=args.pack_by,
                  max_bins_per_commit=args.max_bins_per_commit,
                  job_id=args.job_id)
    if args.lineage and res.commits:
        record(spark, ensure_lineage(args.lineage), res.job_id, "compact",
               snapshot_id=res.snapshot_ids[-1], files_rewritten=res.files_removed,
               bytes_shuffled=res.bytes_compacted)
    emit({"job": "compact", **{k: v for k, v in res.__dict__.items()}})


if __name__ == "__main__":
    main()
