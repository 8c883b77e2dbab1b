"""spark-submit job: bloom-sidecar backfill for existing data files.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/bloom.py \\
      /warehouse/tokens --backfill

Builds per-file key bloom sidecars (`table/bloom.py`) for every data
file of the current snapshot that predates the ``write.bloom.col``
table property (set it first: ``jobs/schema.py --set-property
write.bloom.col=doc_id``) and registers the markers in one
metadata-only ``replace`` commit, so the whole table history gets
membership-based merge pruning immediately.  Idempotent; exits 4 on a
concurrent-writer conflict (re-run to re-plan against the new
snapshot).
"""

from __future__ import annotations

import sys

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("backfill bloom sidecars for pre-property data files")
    p.add_argument("--backfill", action="store_true",
                   help="build + register sidecars (the only verb; "
                        "explicit so the job never mutates by default)")
    args = p.parse_args()
    if not args.backfill:
        p.error("nothing to do: pass --backfill")

    from canal_spark import load_table
    from canal_spark.table.bloom import backfill
    from canal_spark.table.format import CommitConflict

    table = load_table(args.table)
    spark = session(args, "canal-bloom")
    try:
        out = backfill(spark, table)
    except CommitConflict as e:
        emit({"job": "bloom", "conflict": str(e)})
        sys.exit(4)
    emit({"job": "bloom", **out})


if __name__ == "__main__":
    main()
