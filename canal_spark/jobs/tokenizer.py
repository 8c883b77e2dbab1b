"""spark-submit job: BPE tokenizer training / corpus encoding.

  spark-submit --py-files canal_spark.zip canal_spark/jobs/tokenizer.py \\
      /data/documents --model /warehouse/bpe-v1 --train --n-merges 32
  ... /data/documents --model /warehouse/bpe-v1 --encode /out/enc

Training writes the model as a directory: ``merges.json`` (the ordered
merge list — driver-sized) and ``vocab/`` (the word -> symbols state
table as parquet — dictionary-scale, never collected).  Encoding joins
the corpus against that vocab table and writes per-doc
(doc_id, n_words, n_chars, n_tokens) parquet.
"""

from __future__ import annotations

import json
import os

from canal_spark.jobs.common import base_parser, emit, session


def main() -> None:
    p = base_parser("BPE tokenizer train/encode over a documents corpus")
    p.add_argument("--model", required=True,
                   help="model dir: merges.json + vocab/ parquet")
    p.add_argument("--train", action="store_true",
                   help="learn merges from the corpus and write the model")
    p.add_argument("--n-merges", type=int, default=32)
    p.add_argument("--min-pair-count", type=int, default=2)
    p.add_argument("--encode", default=None,
                   help="encode the corpus through --model; write per-doc "
                   "counts parquet to this dir")
    p.add_argument("--text-col", default="text")
    args = p.parse_args()
    if not (args.train or args.encode):
        p.error("one of --train/--encode is required")

    from pyspark.sql import functions as F

    from canal_spark.tokenizer import BpeModel, bpe_encode, bpe_train

    spark = session(args, "canal-tokenizer")
    docs = spark.read.parquet(args.table)  # positional arg = documents dir
    out = {"job": "tokenizer"}

    if args.train:
        model = bpe_train(spark, docs, n_merges=args.n_merges,
                          min_pair_count=args.min_pair_count,
                          text_col=args.text_col)
        model.vocab.write.mode("overwrite").parquet(
            os.path.join(args.model, "vocab")
        )
        os.makedirs(args.model, exist_ok=True)
        with open(os.path.join(args.model, "merges.json"), "w") as f:
            json.dump([list(m) for m in model.merges], f)
        out["train"] = {
            "n_merges": len(model.merges),
            "vocab_words": model.vocab.count(),
        }
        model.release()

    if args.encode:
        with open(os.path.join(args.model, "merges.json")) as f:
            merges = [tuple(m) for m in json.load(f)]
        model = BpeModel(
            merges=merges,
            vocab=spark.read.parquet(os.path.join(args.model, "vocab")),
        )
        enc = bpe_encode(docs, model, text_col=args.text_col)
        enc.write.mode("overwrite").parquet(args.encode)
        enc = spark.read.parquet(args.encode)
        row = enc.agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("tok"),
            F.sum("n_chars").alias("chars"),
        ).collect()[0]
        out["encode"] = {
            "docs": row["docs"],
            "total_tokens": int(row["tok"]),
            "compression_permille": int(row["tok"] * 1000 // row["chars"]),
        }
    emit(out)


if __name__ == "__main__":
    main()
