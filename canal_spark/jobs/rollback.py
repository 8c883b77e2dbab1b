"""spark-submit job: roll the table back to a past snapshot.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/rollback.py \\
      /warehouse/tokens --snapshot-id 42

The operational analogue of the reference's rollback/redelivery (C4,
store/.../MemoryEventStoreWithBuffer.java:416-470): state returns to the
target snapshot as a NEW commit and history stays time-travelable.

Replay semantics: by default the rollback is a REDELIVERY point — the
resume marks rewind with the data (the rollback snapshot reconstructs
the target's ancestry marks and carries a position-reset boundary), so
re-applying the fixed changelog slice at the same ordinals actually
lands, while replays of still-applied older slices stay no-ops.
``--keep-position`` preserves the old conservative behavior (cursor
untouched; redelivery then requires fresh ordinals) for rollbacks that
only undo engine-generated commits.
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("rollback to a past snapshot")
    p.add_argument("--snapshot-id", type=int, required=True)
    p.add_argument(
        "--keep-position", action="store_true",
        help="do NOT rewind the merge checkpoint marks with the data",
    )
    args = p.parse_args()

    from canal_spark import load_table

    spark = session(args, "canal-rollback")  # session kept for API symmetry
    table = load_table(args.table)
    snap = table.rollback_to(
        args.snapshot_id, reset_position=not args.keep_position
    )
    emit({
        "job": "rollback",
        "snapshot_id": snap.snapshot_id,
        "rolled_back_to": args.snapshot_id,
        "operation": snap.operation,
    })


if __name__ == "__main__":
    main()
