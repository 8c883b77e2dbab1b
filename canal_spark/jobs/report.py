"""spark-submit job: one-line JSON table-health report.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/report.py \\
      /warehouse/tokens

The canal-admin instance-status analogue
(admin/.../InstanceController.java list view): snapshot/ref counts,
file + byte totals, small-file and unclustered fractions, MoR delete
debt, per-partition skew — the numbers a scheduler scrapes between
passes to decide whether to trigger compaction/clustering early.  Pure
metadata reads, so the job never starts a SparkSession (instant, like
jobs/tag.py); for ad-hoc SQL over the same state use
``canal_spark.report.metadata_df`` in a notebook/shell.
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit


def main() -> None:
    p = base_parser("emit a one-line table-health report")
    p.add_argument("--small-file-bytes", type=int, default=None,
                   help="small-file cutoff for the fraction metrics "
                        "(default: half the compaction target)")
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.report import table_report

    table = load_table(args.table)
    kw = {}
    if args.small_file_bytes is not None:
        kw["small_file_bytes"] = args.small_file_bytes
    emit({"job": "report", **table_report(table, **kw)})


if __name__ == "__main__":
    main()
