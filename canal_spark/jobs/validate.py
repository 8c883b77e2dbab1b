"""spark-submit job: table consistency check (doctor).

  spark-submit --py-files canal_spark.zip canal_spark/jobs/validate.py \\
      /warehouse/tokens [--snapshot-id N] [--skip-footers]

Exits non-zero when violations are found, so it slots into an ops
pipeline as a gate before promoting a snapshot.
"""

from __future__ import annotations

import sys

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("validate manifests vs physical files")
    p.add_argument("--snapshot-id", type=int, default=None)
    p.add_argument("--skip-footers", action="store_true")
    p.add_argument(
        "--archive-dir", default=None,
        help="also check a cold-archive catalog vs its segment files",
    )
    p.add_argument(
        "--dedup-index", default=None,
        help="also check a maintained dedup signature index vs the table",
    )
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.doctor import check_archive, check_dedup_index, check_table

    spark = session(args, "canal-validate")
    table = load_table(args.table)
    rep = check_table(
        spark, table,
        snapshot_id=args.snapshot_id,
        verify_footers=not args.skip_footers,
    )
    if args.archive_dir:
        arep = check_archive(args.archive_dir)
        rep["archive"] = arep
        rep["ok"] = rep["ok"] and arep["ok"]
    if args.dedup_index:
        drep = check_dedup_index(spark, table, load_table(args.dedup_index))
        rep["dedup_index"] = drep
        rep["ok"] = rep["ok"] and drep["ok"]
    emit({"job": "validate", **rep})
    if not rep["ok"]:
        sys.exit(2)


if __name__ == "__main__":
    main()
