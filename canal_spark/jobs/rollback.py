"""spark-submit job: roll the table back to a past snapshot.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/rollback.py \\
      /warehouse/tokens --snapshot-id 42

The operational analogue of the reference's rollback/redelivery (C4,
store/.../MemoryEventStoreWithBuffer.java:416-470): state returns to the
target snapshot as a NEW commit and history stays time-travelable.

Replay semantics are deliberately conservative: the merge high-water
mark is the max over the table property and ALL retained snapshot
summaries, so after a rollback a replay of already-applied changelog
slices still filters to a no-op (state and cursor cannot diverge).  To
actually REDELIVER the rolled-back slice, expire the newer snapshots
(jobs/expire.py) and re-apply with fresh ordinals — the same contract
as the reference, where rollback rewinds the cursor only within the
un-acked window.
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("rollback to a past snapshot")
    p.add_argument("--snapshot-id", type=int, required=True)
    args = p.parse_args()

    from canal_spark import load_table

    spark = session(args, "canal-rollback")  # session kept for API symmetry
    table = load_table(args.table)
    snap = table.rollback_to(args.snapshot_id)
    emit({
        "job": "rollback",
        "snapshot_id": snap.snapshot_id,
        "rolled_back_to": args.snapshot_id,
        "operation": snap.operation,
    })


if __name__ == "__main__":
    main()
