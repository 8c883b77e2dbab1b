"""spark-submit job: snapshot expiry + manifest rewrite (time-travel GC).

  spark-submit --py-files canal_spark.zip canal_spark/jobs/expire.py \\
      /warehouse/tokens --keep-last 5 --rewrite-manifests
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("expire snapshots / rewrite manifests")
    p.add_argument("--keep-last", type=int, default=5)
    p.add_argument("--older-than-hours", type=float, default=None)
    p.add_argument("--rewrite-manifests", action="store_true")
    p.add_argument(
        "--remove-orphans-hours", type=float, default=None,
        help="also delete uncommitted data files older than this many "
             "hours (crash debris; Iceberg remove_orphan_files)",
    )
    args = p.parse_args()

    import time

    from canal_spark import load_table

    spark = session(args, "canal-expire")  # session kept for API symmetry
    table = load_table(args.table)
    older_ms = (
        int((time.time() - args.older_than_hours * 3600) * 1000)
        if args.older_than_hours is not None else None
    )
    rep = table.expire_snapshots(keep_last=args.keep_last, older_than_ms=older_ms)
    out = {"job": "expire", **rep}
    if args.rewrite_manifests:
        out["rewrite_manifests"] = table.rewrite_manifests()
    if args.remove_orphans_hours is not None:
        out["remove_orphans"] = table.remove_orphan_files(
            older_than_s=args.remove_orphans_hours * 3600
        )
    emit(out)


if __name__ == "__main__":
    main()
