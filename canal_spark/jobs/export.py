"""spark-submit job: export a pinned snapshot as sharded training data.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/export.py \\
      /warehouse/tokens --out /exports/train-v1 --tag train-v1 \\
      --shards 64 --epoch-seed 7

Writes ``shard=K/`` Parquet dirs in deterministic seeded epoch order
(see canal_spark/export.py for the layout contract) and emits one JSON
line with the export manifest.  ``--tag`` accepts any ref — a named
tag or a branch head; ``--snapshot-id`` pins an explicit snapshot.
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("export a pinned snapshot as sharded training data")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--tag", default=None,
                   help="export this ref (tag or branch head)")
    p.add_argument("--snapshot-id", type=int, default=None,
                   help="export this snapshot id (default: current)")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--epoch-seed", type=int, default=0)
    p.add_argument("--overwrite", action="store_true",
                   help="replace a non-empty output dir")
    args = p.parse_args()

    from canal_spark import load_table
    from canal_spark.export import export_snapshot

    spark = session(args, "canal-export")
    table = load_table(args.table)
    res = export_snapshot(
        spark, table, args.out,
        snapshot_id=args.snapshot_id, tag=args.tag,
        shards=args.shards, epoch_seed=args.epoch_seed,
        overwrite=args.overwrite,
    )
    emit({"job": "export", **res.__dict__})


if __name__ == "__main__":
    main()
