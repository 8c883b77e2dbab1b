"""spark-submit job: the streaming consume loop (Canal's deployment
mode — the long-running instance that tails the changelog and applies
it; deployer/.../CanalLauncher.java started the embedded server, this
starts the Structured Streaming equivalent).

  # drain whatever is staged, then exit (ops/backfill mode)
  spark-submit --py-files canal_spark.zip canal_spark/jobs/stream.py \\
      /warehouse/tokens --changelog /landing/binlog --checkpoint /ckpt/t

  # run continuously for an hour, low-latency MoR applies, every batch
  # write-audit-published with a dead-letter dir
  ... --continuous --await-seconds 3600 --merge-mode mor \\
      --max-pending-delete-files 8 --wap --quarantine /landing/_dead

  # Kafka ingest instead of files (FlatMessage wire format)
  ... --kafka-bootstrap broker:9092 --kafka-topic canal.tokens

Emits one JSON line: batches seen/applied, per-epoch merge results,
quarantined batches.  Exit code 3 if any batch was quarantined (the
data needs triage even though the stream itself kept going).
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("streaming changelog apply loop")
    p.add_argument("--changelog", required=False, default=None,
                   help="changelog landing dir (files reader)")
    p.add_argument("--checkpoint", required=True,
                   help="Structured Streaming checkpoint dir (progress "
                        "survives restarts; exactly-once via idempotent "
                        "MERGE replay)")
    p.add_argument("--continuous", action="store_true",
                   help="keep running (default: drain available input "
                        "then exit)")
    p.add_argument("--await-seconds", type=float, default=None,
                   help="with --continuous: stop after this long "
                        "(default: run until killed)")
    p.add_argument("--max-files-per-trigger", type=int, default=None,
                   help="backpressure: cap staged files per micro-batch")
    p.add_argument("--target-file-rows", type=int, default=200_000)
    p.add_argument("--merge-mode", choices=["cow", "mor"], default="cow")
    p.add_argument("--max-pending-delete-files", type=int, default=None,
                   help="mor: fold delete debt inline once this many "
                        "delete files pile up (default: defer to the "
                        "next maintenance pass)")
    p.add_argument("--convert-eq-debt-files", type=int, default=None,
                   help="mor: below the materialize threshold, convert "
                        "equality deletes to position deletes once this "
                        "many eq files pile up (zero data rewrites; "
                        "readers pay the cheap 2-key anti-join)")
    p.add_argument("--rewrite-pos-debt-files", type=int, default=None,
                   help="consolidate pos-delete files once this many pile "
                        "up (merges small delete files, GCs dangling rows, "
                        "zero data rewrites)")
    p.add_argument("--wap", action="store_true",
                   help="write-audit-publish every micro-batch")
    p.add_argument("--wap-max-delete-fraction", type=float, default=None)
    p.add_argument("--quarantine", default=None,
                   help="with --wap: dead-letter dir for batches that "
                        "fail the audit")
    p.add_argument("--band-index", default=None,
                   help="MinHash band-index table root — kept in sync "
                        "per micro-batch (created if absent)")
    p.add_argument("--ivf-index", default=None,
                   help="IVF ANN-index table root — kept in sync per "
                        "micro-batch (created if absent; the first "
                        "batch on an empty index trains the codebook)")
    p.add_argument("--emb-col", default="embedding",
                   help="embedding column name (with --ivf-index)")
    p.add_argument("--kafka-bootstrap", default=None,
                   help="Kafka bootstrap servers (switches to the Kafka "
                        "FlatMessage reader)")
    p.add_argument("--kafka-topic", default=None)
    args = p.parse_args()

    kafka_options = None
    reader = "files"
    if args.kafka_bootstrap:
        if not args.kafka_topic:
            p.error("--kafka-topic is required with --kafka-bootstrap")
        reader = "kafka"
        kafka_options = {
            "kafka.bootstrap.servers": args.kafka_bootstrap,
            "subscribe": args.kafka_topic,
        }
    elif not args.changelog:
        p.error("--changelog is required for the files reader")

    from canal_spark import load_table
    from canal_spark.streaming.apply import stream_apply

    spark = session(args, "canal-stream")
    table = load_table(args.table)
    from canal_spark.ann_index import load_or_create_ivf_index
    from canal_spark.dedup_index import load_or_create_band_index

    band_index = (
        load_or_create_band_index(args.band_index) if args.band_index else None
    )
    ivf_index = (
        load_or_create_ivf_index(args.ivf_index) if args.ivf_index else None
    )
    res = stream_apply(
        spark, table,
        changelog_dir=args.changelog,
        checkpoint_dir=args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
        target_file_rows=args.target_file_rows,
        available_now=not args.continuous,
        await_seconds=args.await_seconds,
        reader=reader,
        kafka_options=kafka_options,
        merge_mode=args.merge_mode,
        max_pending_delete_files=args.max_pending_delete_files,
        convert_eq_debt_files=args.convert_eq_debt_files,
        rewrite_pos_debt_files=args.rewrite_pos_debt_files,
        wap=args.wap,
        wap_max_delete_fraction=args.wap_max_delete_fraction,
        quarantine_dir=args.quarantine,
        band_index=band_index,
        ivf_index=ivf_index,
        ivf_emb_col=args.emb_col,
    )
    emit({"job": "stream", "batches_seen": res.batches_seen,
          "batches_applied": res.batches_applied, "merges": res.merges,
          "quarantined": res.quarantined,
          "index_refreshes": res.index_refreshes})
    if res.quarantined:
        raise SystemExit(3)


if __name__ == "__main__":
    main()
