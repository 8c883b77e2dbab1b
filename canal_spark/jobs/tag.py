"""spark-submit job: manage named snapshot tags (Iceberg-style refs).

  spark-submit --py-files canal_spark.zip canal_spark/jobs/tag.py \\
      /warehouse/tokens --set train-v1            # tag current snapshot
  ... --set train-v1 --snapshot-id 42             # tag a specific one
  ... --delete train-v0                           # release it to expiry
  ... --list                                      # print refs

Tags are the training-set pinning primitive: a tagged snapshot re-reads
byte-identically forever (immune to merges, compaction AND expiry)
until the tag is deleted.  Roll a table back to a tag with
`jobs/rollback.py --snapshot-id $(tag's id)`.
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit


def main() -> None:
    p = base_parser("manage named snapshot tags")
    p.add_argument("--set", dest="set_name", default=None,
                   help="create/move a tag (default target: current snapshot)")
    p.add_argument("--snapshot-id", type=int, default=None,
                   help="with --set: tag this snapshot instead of current")
    p.add_argument("--delete", dest="delete_name", default=None,
                   help="delete a tag, releasing its snapshot to expiry")
    p.add_argument("--list", dest="do_list", action="store_true",
                   help="print all refs")
    args = p.parse_args()
    if not (args.set_name or args.delete_name or args.do_list):
        p.error("one of --set/--delete/--list is required")

    from canal_spark import load_table

    # no SparkSession: tags are pure metadata CAS writes — the job is
    # instant instead of paying a JVM spin-up for zero Spark work
    table = load_table(args.table)
    out = {"job": "tag"}
    if args.set_name:
        ref = table.set_tag(args.set_name, snapshot_id=args.snapshot_id)
        out["set"] = {args.set_name: ref}
    if args.delete_name:
        table.delete_tag(args.delete_name)
        out["deleted"] = args.delete_name
    out["refs"] = table.refs
    emit(out)


if __name__ == "__main__":
    main()
