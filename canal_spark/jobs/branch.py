"""spark-submit job: manage writable branches (multi-commit WAP).

  spark-submit --py-files canal_spark.zip canal_spark/jobs/branch.py \\
      /warehouse/tokens --create audit              # branch off current
  ... --create audit --snapshot-id 42               # branch off a snapshot
  ... --fast-forward audit                          # publish the chain
  ... --delete audit                                # abandon + GC the chain
  ... --list                                        # print refs + chain sizes

Branches generalize single-commit write-audit-publish to a CHAIN of
commits: apply several changelog batches on the branch
(`jobs/apply_changelog.py --branch audit`), audit the composed state
with `scan(tag="audit")`, then fast-forward to publish all of them
atomically — or delete the branch and the batches re-apply on the main
line later (their checkpoint marks defer with the chain).  The
operational analogue of the reference's multi-batch get/ack/rollback
window (store/.../MemoryEventStoreWithBuffer.java:416-470): acks become
durable only at publish.
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit


def main() -> None:
    p = base_parser("manage writable branches")
    p.add_argument("--create", default=None,
                   help="create a branch (default base: current snapshot)")
    p.add_argument("--snapshot-id", type=int, default=None,
                   help="with --create: branch off this snapshot instead")
    p.add_argument("--fast-forward", dest="ff", default=None,
                   help="publish a branch's whole chain atomically")
    p.add_argument("--delete", dest="delete_name", default=None,
                   help="abandon a branch: drop its chain and GC its files")
    p.add_argument("--list", dest="do_list", action="store_true",
                   help="print all refs with branch chain lengths")
    args = p.parse_args()
    if not (args.create or args.ff or args.delete_name or args.do_list):
        p.error("one of --create/--fast-forward/--delete/--list is required")

    from canal_spark import load_table

    # no SparkSession: branch lifecycle is pure metadata CAS (plus local
    # file GC on delete) — same instant-job contract as jobs/tag.py
    table = load_table(args.table)
    out = {"job": "branch"}
    if args.create:
        ref = table.create_branch(args.create, snapshot_id=args.snapshot_id)
        out["created"] = {args.create: ref}
    if args.ff:
        snap = table.fast_forward(args.ff)
        out["fast_forwarded"] = {
            args.ff: {"snapshot_id": snap.snapshot_id,
                      "operation": snap.operation},
        }
    if args.delete_name:
        out["deleted"] = table.delete_branch(args.delete_name)
        out["deleted"]["name"] = args.delete_name
    out["refs"] = {
        name: {**ref, "chain_len": len(table.branch_chain(name))}
        if ref.get("type") == "branch" else ref
        for name, ref in table.refs.items()
    }
    emit(out)


if __name__ == "__main__":
    main()
