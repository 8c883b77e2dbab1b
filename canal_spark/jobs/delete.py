"""spark-submit job: predicate DELETE (DELETE FROM table WHERE cond).

  spark-submit --py-files canal_spark.zip canal_spark/jobs/delete.py \\
      /warehouse/tokens --where "source = 'spam'"              # MoR
  ... --where "n_tok < 16" --mode cow                          # rewrite
  ... --where "source = 'crawl-2019'" --branch purge-audit     # staged

The curation cut that isn't a keyed changelog: one pruned live scan
finds the matches, their keys apply as an out-of-band delete through
the ordinary MERGE (see merge.delete_where).  MoR (default) writes one
equality-delete file — O(matches), zero base rewrites; ``--mode
mor-pos`` writes position-delete files instead ((file_path, row_index)
— exact physical targeting, no key read at scan time); debt is repaid
by the next maintenance pass.  ``--branch`` stages the cut on a
writable branch for audit (publish with jobs/branch.py
--fast-forward, discard with --delete).
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("predicate DELETE over the table")
    p.add_argument("--where", required=True, dest="cond",
                   help="SQL predicate over the table's current schema")
    p.add_argument("--mode", choices=["mor", "cow", "mor-pos"], default="mor")
    p.add_argument("--branch", default=None,
                   help="apply the cut on a writable branch (audit flow)")
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.merge import delete_where

    spark = session(args, "canal-delete")
    table = load_table(args.table)
    m = delete_where(
        spark, table, args.cond,
        mode=args.mode, job_id=args.job_id, branch=args.branch,
    )
    emit({"job": "delete", "where": args.cond, "mode": args.mode,
          "applied": m.applied,
          # exact in cow/mor-pos modes; mor defers the kill to scan time
          "rows_deleted": m.rows_deleted,
          "matched_rows": m.extra.get("slice_rows"),
          "snapshot_id": m.snapshot_id, "branch": args.branch})


if __name__ == "__main__":
    main()
