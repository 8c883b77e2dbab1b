"""Distributed BPE tokenizer training + encoding over the documents
corpus — the tokens-axis companion to the per-round statistic
``operators/text.q_bpe_pair_counts`` exposes as a driver query.

Reference behavior modeled: Sennrich et al. 2016 byte-pair encoding
(the `learn_bpe` loop of the public subword-nmt implementation):
greedily merge the most frequent adjacent symbol pair, weighted by word
frequency, with a deterministic tie-break; encoding applies the learned
merges to each word.

Spark-first shape (NOT a port of the reference's in-memory dict loop):

- The corpus collapses ONCE to the word-frequency dictionary (one
  partial-agg shuffle).  Every training round after that runs on the
  DISTINCT-word state table — vocab-bounded, dictionary-scale work per
  round regardless of corpus size, exactly like the IVF Lloyd step.
- Per round: one vocab-sized aggregation (pair counts), one O(1)
  driver ``limit(1).collect()`` for the arg-max pair (count desc, pair
  asc — engine-independent total order), one higher-order-function
  ``aggregate`` fold applying the merge greedily left-to-right inside
  each word.  No Python row path anywhere.
- State checkpoints each round (reliable when a checkpoint dir is
  configured, else local) — the fold expression nests per round, and
  without truncation 50 rounds of lineage would blow plan compilation,
  the same hygiene as ``propagate_min_labels``.
- Encoding is a DICTIONARY EQUI-JOIN: the trained state table already
  maps every seen word to its merged symbols, so encoding the corpus
  never re-runs merges — words join the vocab table (AQE broadcasts it
  while it fits), out-of-vocabulary words fall back to character
  symbols.  At 100 TB the corpus side never shuffles for the join.
"""

from __future__ import annotations

import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency dictionary: (w, c), one partial-agg
    shuffle (hot words combine map-side)."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )


def _apply_merge(syms, p1: str, p2: str):
    """Greedy left-to-right merge of adjacent (p1, p2) inside one
    word's symbol array — a higher-order ``aggregate`` fold, so a
    just-merged token is itself eligible as the left side of the next
    merge ('aaaa' + (a,a) -> [aa, aa]), matching the reference's
    re-scan semantics."""
    tok = p1 + p2
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(p1))
            & (s == F.lit(p2)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(tok))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


@dataclass
class BpeModel:
    """A trained model: the ordered merge list (driver-sized — one row
    per merge) and the persisted vocab state table (w, syms, c) —
    dictionary-scale, deliberately NOT collected to the driver (a
    100 TB corpus vocabulary is a table, not a list).  Call
    :meth:`release` when done."""

    merges: list[tuple[str, str, int]]
    vocab: DataFrame
    # reliable-mode parquet state dirs (ping/pong, see bpe_train) — the
    # vocab frame reads from one of them, so they live with the model
    state_dirs: tuple[str, ...] = field(default=())

    def release(self) -> None:
        self.vocab.unpersist()
        for d in self.state_dirs:
            # getCheckpointDir() hands back a resolved URI; reclaim
            # local state, leave remote schemes to the store's GC
            p = d
            for pre in ("file://", "file:"):
                if p.startswith(pre):
                    p = p[len(pre):]
                    break
            if not p.startswith(("s3:", "hdfs:", "gs:", "abfs:")):
                shutil.rmtree(p, ignore_errors=True)


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 16,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> BpeModel:
    """Learn ``n_merges`` BPE merges from the corpus (stops early when
    the best remaining pair occurs fewer than ``min_pair_count``
    times).  Tie-break: count desc, then (p1, p2) asc."""
    ckpt_root = spark.sparkContext.getCheckpointDir()
    reliable = ckpt_root is not None
    # Reliable mode is MANUAL ping-pong parquet state, not
    # df.checkpoint(): Spark never deletes reliable checkpoint files
    # (cleanCheckpoints defaults off), so n_merges rounds would leak
    # n_merges dictionary-scale directories per training run.  Writing
    # round i to dir (i % 2) truncates lineage identically (the next
    # round reads a plain parquet scan), overwrite reclaims round i-2
    # in place, and at most TWO state dirs ever exist — released with
    # the model (BpeModel.release).
    state_dirs: tuple[str, ...] = ()
    if reliable:
        job = uuid.uuid4().hex[:12]
        state_dirs = (
            f"{ckpt_root}/bpe-{job}-a", f"{ckpt_root}/bpe-{job}-b",
        )
    flip = [0]

    def _ckpt(df: DataFrame) -> DataFrame:
        if not reliable:
            return df.localCheckpoint(eager=True)
        path = state_dirs[flip[0]]
        flip[0] ^= 1
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    state = _ckpt(
        word_frequency(docs, text_col).withColumn("syms", F.split("w", ""))
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_struct = F.expr(
            "transform(sequence(0, size(syms) - 2), "
            "i -> struct(syms[i] AS p1, syms[i + 1] AS p2))"
        )
        best = (
            state.where(F.size("syms") >= 2)
            .select(F.explode(pair_struct).alias("p"), "c")
            .groupBy("p.p1", "p.p2")
            .agg(F.sum("c").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("p1"), F.asc("p2"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        p1, p2, n = best[0]["p1"], best[0]["p2"], int(best[0]["n"])
        merges.append((p1, p2, n))
        new_state = _ckpt(
            state.withColumn("syms", _apply_merge(F.col("syms"), p1, p2))
        )
        if not reliable:
            state.unpersist()
        state = new_state
    return BpeModel(merges=merges, vocab=state, state_dirs=state_dirs)


def bpe_encode(
    docs: DataFrame, model: BpeModel, text_col: str = "text"
) -> DataFrame:
    """Encode every document through the trained vocab: per-doc
    (doc_id, n_words, n_chars, n_tokens) — ``n_tokens`` is the BPE
    token count after the model's merges; out-of-vocabulary words fall
    back to character symbols (their char count).

    Scale shape: one map-side word explode, one equi-join against the
    dictionary-scale vocab (AQE broadcast while it fits — the corpus
    side never shuffles for it), one partial-agg rollup keyed by doc."""
    words = docs.select(
        "doc_id", F.explode(F.split(text_col, " ")).alias("w")
    ).where(F.length("w") > 0)
    enc = words.join(
        model.vocab.select("w", F.size("syms").alias("n_sym")), "w", "left"
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.length("w")).cast("long").alias("n_chars"),
        F.sum(F.coalesce(F.col("n_sym"), F.length("w")))
        .cast("long")
        .alias("n_tokens"),
    )
