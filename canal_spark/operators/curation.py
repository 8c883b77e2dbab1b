"""Training-corpus curation operators: deterministic train/val/test
splitting, data-mixture token budgeting, and context-window chunking.

These are the corpus-assembly verbs that sit between the cleaning ops
(`dedup`, `text`) and the export path (`export.py` / `epoch_shuffle`):
decide which documents belong to which split, how many tokens each
source contributes to the training mix, and how long documents break
into model-context-sized windows.  All determinism comes from the
shared cross-engine md5 hash (`common.md5int`), so every decision is
reproducible across engines, re-runs, and cluster sizes — the same
property the reference pins with binlog positions
(`parse/.../LogPosition.java`): a curation decision, like an ack
point, must never depend on execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.common import (
    attach_cached_deps,
    duck_md5int,
    load,
    md5int,
)

# --- deterministic stratified train/val/test split ---------------------------

SPLIT_SEED = 11
TEST_PCT = 5
VAL_PCT = 10  # val bucket is [TEST_PCT, TEST_PCT+VAL_PCT)


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by a seeded hash bucket
    (md5(doc_id#seed) % 100 -> test <5, val <15, train otherwise) and
    report per-(source, split) document and token counts.  The split is
    a pure function of the document id: adding data, reshuffling
    partitions, or re-running never moves a doc across splits — the
    property that keeps eval sets eval sets.

    Scale shape: one map (hash + bucket + token count) and ONE
    partial-aggregated shuffle keyed by (source, split) — low, fixed
    cardinality, so the final agg is trivially small at any corpus
    size.  No window, no join."""
    docs = load(spark, sf_dir, "documents")
    bucket = md5int(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.lit(str(SPLIT_SEED)))
    ) % 100
    split = (
        F.when(bucket < TEST_PCT, F.lit("test"))
        .when(bucket < TEST_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        docs.select(
            "source",
            split.alias("split"),
            F.size(F.split("text", " ")).cast("long").alias("_tok"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("n_tokens"),
        )
    )


_DUCK_BUCKET = (
    duck_md5int(f"CAST(doc_id AS VARCHAR) || '#' || '{SPLIT_SEED}'") + " % 100"
)

SQL_TRAIN_SPLIT = f"""
WITH b AS (
  SELECT source,
         CASE WHEN {_DUCK_BUCKET} < {TEST_PCT} THEN 'test'
              WHEN {_DUCK_BUCKET} < {TEST_PCT + VAL_PCT} THEN 'val'
              ELSE 'train' END AS split,
         len(string_split(text, ' ')) AS tok
  FROM documents)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens
FROM b GROUP BY source, split
"""


# --- data-mixture token budgeting --------------------------------------------

# budget = half the corpus (integer), split across sources by weight.
MIX_BUDGET_DEN = 2
PPM = 1_000_000


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan a training mixture: each source gets a deterministic config
    weight (1 + md5(source)%4 — standing in for the hand-tuned
    per-source weights of a real mixture config), the global token
    budget is half the corpus, and each source is allocated
    min(available, weight-share of budget) tokens with the implied
    per-document sampling rate in ppm.  All math is exact integer
    arithmetic, so the plan is identical on every engine and at every
    parallelism.

    Scale shape: one partial-agg shuffle keyed by source reduces the
    corpus to a config-cardinality frame; the totals row is an
    aggregate OF THAT FRAME (persisted, source-count rows), broadcast
    back with a cross join.  Nothing data-scale crosses the driver."""
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.size(F.split("text", " ")).cast("long").alias("_tok"))
        .groupBy("source")
        .agg(F.sum("_tok").cast("long").alias("avail_tokens"))
        .withColumn("weight", (md5int(F.col("source")) % 4 + 1).cast("long"))
        .persist()
    )
    totals = per_src.agg(
        F.sum("weight").alias("_sum_w"), F.sum("avail_tokens").alias("_sum_avail")
    )
    out = (
        per_src.crossJoin(F.broadcast(totals))
        .withColumn(
            "alloc_tokens",
            F.least(
                F.col("avail_tokens"),
                F.expr(f"weight * (_sum_avail DIV {MIX_BUDGET_DEN}) DIV _sum_w"),
            ).cast("long"),
        )
        .withColumn(
            "sample_ppm", F.expr(f"alloc_tokens * {PPM} DIV avail_tokens").cast("long")
        )
        .select("source", "weight", "avail_tokens", "alloc_tokens", "sample_ppm")
    )
    return attach_cached_deps(out, [per_src])


SQL_MIXTURE_PLAN = f"""
WITH per_src AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens,
         CAST({duck_md5int('source')} % 4 + 1 AS BIGINT) AS weight
  FROM documents GROUP BY source),
tot AS (SELECT sum(weight) AS sum_w, sum(avail_tokens) AS sum_avail FROM per_src),
a AS (
  SELECT source, weight, avail_tokens,
         CAST(least(avail_tokens,
                    (weight * (sum_avail // {MIX_BUDGET_DEN})) // sum_w)
              AS BIGINT) AS alloc_tokens
  FROM per_src CROSS JOIN tot)
SELECT source, weight, avail_tokens, alloc_tokens,
       CAST((alloc_tokens * {PPM}) // avail_tokens AS BIGINT) AS sample_ppm
FROM a
"""


# --- context-window chunking --------------------------------------------------

CHUNK_LEN = 64  # model context length (tokens)
CHUNK_STRIDE = 48  # overlap = CHUNK_LEN - CHUNK_STRIDE


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Break every document into overlapping context windows of
    CHUNK_LEN tokens at CHUNK_STRIDE (the sliding-window chunking that
    feeds long documents to a fixed-context model), emitting per-chunk
    offsets, true length, and an md5 signature of the chunk text — the
    signature proves both engines cut IDENTICAL windows, not just the
    same counts.  Unlike `pack_materialize` (corpus-order packing that
    crosses document boundaries), chunks here never span documents and
    overlap by design.

    Scale shape: chunk count per doc is computed from the token count
    alone, then `explode(sequence(...))` fans out map-side — no
    shuffle at all, the whole operator is narrow.  Each output row
    slices its own window from the doc's word array, so memory per row
    is O(CHUNK_LEN)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    d = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .withColumn("n_tok", F.size("w"))
        .withColumn(
            "n_chunks",
            F.expr(
                f"(greatest(n_tok - {CHUNK_LEN}, 0) + {CHUNK_STRIDE} - 1)"
                f" DIV {CHUNK_STRIDE} + 1"
            ),
        )
    )
    e = d.select(
        "doc_id",
        "w",
        "n_tok",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("cidx"),
    )
    start = F.col("cidx") * CHUNK_STRIDE
    clen = F.least(F.lit(CHUNK_LEN), F.col("n_tok") - start)
    return e.select(
        "doc_id",
        F.col("cidx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        clen.cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", F.slice("w", start + 1, clen))).alias("chunk_sig"),
    )


SQL_DOC_CHUNK = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
n AS (SELECT doc_id, w, len(w) AS n_tok FROM t),
c AS (SELECT doc_id, w, n_tok,
             (greatest(n_tok - {CHUNK_LEN}, 0) + {CHUNK_STRIDE} - 1)
               // {CHUNK_STRIDE} + 1 AS n_chunks
      FROM n),
e AS (SELECT doc_id, w, n_tok,
             unnest(generate_series(0, n_chunks - 1)) AS cidx
      FROM c)
SELECT doc_id,
       CAST(cidx AS BIGINT) AS chunk_idx,
       CAST(cidx * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(least({CHUNK_LEN}, n_tok - cidx * {CHUNK_STRIDE}) AS BIGINT) AS chunk_len,
       md5(array_to_string(
             w[cidx * {CHUNK_STRIDE} + 1 :
               cidx * {CHUNK_STRIDE} + least({CHUNK_LEN}, n_tok - cidx * {CHUNK_STRIDE})],
             ' ')) AS chunk_sig
FROM e
"""


QUERIES = {
    "train_split": q_train_split,
    "mixture_plan": q_mixture_plan,
    "doc_chunk": q_doc_chunk,
}

ORACLES = {
    "train_split": SQL_TRAIN_SPLIT,
    "mixture_plan": SQL_MIXTURE_PLAN,
    "doc_chunk": SQL_DOC_CHUNK,
}
