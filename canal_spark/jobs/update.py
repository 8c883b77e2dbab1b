"""spark-submit job: predicate UPDATE (UPDATE table SET ... WHERE cond).

  spark-submit --py-files canal_spark.zip canal_spark/jobs/update.py \\
      /warehouse/tokens --where "source = 'web'" \\
      --set source="'web-v2'" --set n_tok="size(tokens)"

Each --set is column=SQL-expression evaluated over the matching row;
key columns are rejected (a key change is a D+I changelog event).  The
after-images apply as an out-of-band U changelog through the ordinary
MERGE (see merge.update_where): --mode cow (default) rewrites affected
files, --mode mor commits new images + one equality-delete file for
spray-keyed bulk updates.
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("predicate UPDATE over the table")
    p.add_argument("--where", required=True, dest="cond",
                   help="SQL predicate over the table's current schema")
    p.add_argument("--set", required=True, action="append", dest="sets",
                   metavar="COL=EXPR",
                   help="assignment (repeatable): column=SQL expression")
    p.add_argument("--mode", choices=["cow", "mor"], default="cow")
    p.add_argument("--branch", default=None,
                   help="apply on a writable branch (audit flow)")
    args = p.parse_args()

    assignments = {}
    for s in args.sets:
        col, eq, expr = s.partition("=")
        if not eq or not col or not expr:
            p.error(f"--set must be COL=EXPR, got {s!r}")
        assignments[col.strip()] = expr

    from canal_spark import load_table
    from canal_spark.merge import update_where

    spark = session(args, "canal-update")
    table = load_table(args.table)
    m = update_where(
        spark, table, args.cond, assignments,
        mode=args.mode, job_id=args.job_id, branch=args.branch,
    )
    emit({"job": "update", "where": args.cond, "set": assignments,
          "mode": args.mode, "applied": m.applied,
          "rows_upserted": m.rows_upserted,
          "matched_rows": m.extra.get("slice_rows"),
          "snapshot_id": m.snapshot_id, "branch": args.branch})


if __name__ == "__main__":
    main()
